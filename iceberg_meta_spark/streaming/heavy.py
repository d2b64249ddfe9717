"""Streaming heavy hitters: a space-saving sketch per event-time window.

Batch twin: ``events_heavy_hitters`` (queries/extensions.py) computes the
exact per-window top-k with a salted two-phase window. On an unbounded
stream the exact per-user census cannot be held — one counter per (window,
user) is O(users) state — so this operator keeps the classic space-saving
summary (Metwally, Agrawal, El Abbadi 2005: "Efficient computation of
frequent and top-k elements in data streams"): ``m`` counters per window,
any element not tracked evicts the minimum counter and inherits its count
as its error bound. Guarantees: every true heavy hitter with frequency
> N/m is tracked; estimates overcount by at most the recorded ``err``.

State shape: three bounded arrays (ids, counts, errs — m entries each) per
window key, checkpointed by the engine; idle windows expire on a
processing-time timeout, so total state is O(active_windows × m)
regardless of stream length or key cardinality.

Determinism: batch rows are pre-aggregated per user and merged in sorted
user order; eviction picks the (count, -user_id)-minimal entry, so a replay
of the same micro-batch sequence rebuilds the identical sketch (the
sketch's content is sequence-dependent, as space-saving inherently is).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

HOUR_US = 3_600_000_000

HH_SCHEMA = StructType(
    [
        StructField("window_start_us", LongType()),
        StructField("rank", IntegerType()),
        StructField("user_id", LongType()),
        StructField("est_count", LongType()),
        StructField("err_bound", LongType()),
    ]
)

HH_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
    ]
)


def _make_update(m: int, k: int, timeout_ms: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ids, counts, errs = state.get if state.exists else ([], [], [])
        sketch = {i: [c, e] for i, c, e in zip(ids, counts, errs)}
        batch: dict[int, int] = {}
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            for uid, c in pdf.groupby("user_id").size().items():
                batch[int(uid)] = batch.get(int(uid), 0) + int(c)
        for uid in sorted(batch):
            c = batch[uid]
            if uid in sketch:
                sketch[uid][0] += c
            elif len(sketch) < m:
                sketch[uid] = [c, 0]
            else:
                # evict the (count, -uid)-minimal entry; the newcomer
                # inherits its count as the overestimation bound
                evict = min(sketch, key=lambda u: (sketch[u][0], -u))
                floor_c = sketch.pop(evict)[0]
                sketch[uid] = [floor_c + c, floor_c]
        items = sorted(sketch.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update(
            (
                [u for u, _ in items],
                [ce[0] for _, ce in items],
                [ce[1] for _, ce in items],
            )
        )
        state.setTimeoutDuration(timeout_ms)
        top = items[:k]
        yield pd.DataFrame(
            {
                "window_start_us": [key[0]] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "user_id": [u for u, _ in top],
                "est_count": [ce[0] for _, ce in top],
                "err_bound": [ce[1] for _, ce in top],
            }
        )

    return update


def window_heavy_hitters(
    events_stream: DataFrame,
    width_us: int = HOUR_US,
    m: int = 16,
    k: int = 3,
    timeout_ms: int = 60 * 60 * 1000,
) -> DataFrame:
    """Per tumbling event-time window, the space-saving top-``k`` users.

    Input stream needs (ts_us, user_id). Each micro-batch re-emits the
    window's current top-k (update semantics — downstream sinks upsert on
    (window_start_us, rank)).
    """
    keyed = events_stream.select(
        ((F.col("ts_us") / width_us).cast("long") * width_us).alias("window_start_us"),
        "user_id",
    )
    return keyed.groupBy("window_start_us").applyInPandasWithState(
        _make_update(m, k, timeout_ms),
        outputStructType=HH_SCHEMA,
        stateStructType=HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


SKEW_SCHEMA = StructType(
    [
        StructField("window_start_us", LongType()),
        StructField("n_rows", LongType()),
        StructField("top_key", LongType()),
        StructField("est_count", LongType()),
        StructField("err_bound", LongType()),
        StructField("hot_share_milli_lb", LongType()),
        StructField("alert", BooleanType()),
    ]
)

SKEW_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
        StructField("total", LongType()),
    ]
)


def _make_skew_update(m: int, threshold_milli: int, timeout_ms: int):
    """Space-saving sketch + an EXACT running row total per window; emits one
    skew-summary row per (window, micro-batch)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ids, counts, errs, total = state.get if state.exists else ([], [], [], 0)
        sketch = {i: [c, e] for i, c, e in zip(ids, counts, errs)}
        batch: dict[int, int] = {}
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            for uid, c in pdf.groupby("key").size().items():
                batch[int(uid)] = batch.get(int(uid), 0) + int(c)
        total += sum(batch.values())
        for uid in sorted(batch):
            c = batch[uid]
            if uid in sketch:
                sketch[uid][0] += c
            elif len(sketch) < m:
                sketch[uid] = [c, 0]
            else:
                evict = min(sketch, key=lambda u: (sketch[u][0], -u))
                floor_c = sketch.pop(evict)[0]
                sketch[uid] = [floor_c + c, floor_c]
        items = sorted(sketch.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update(
            (
                [u for u, _ in items],
                [ce[0] for _, ce in items],
                [ce[1] for _, ce in items],
                int(total),
            )
        )
        state.setTimeoutDuration(timeout_ms)
        if not items or total == 0:
            return
        top_key, (est, err) = items[0]
        # space-saving guarantees est - err <= true count: the share LOWER
        # bound can never fire a false alert
        lb_milli = ((est - err) * 1000) // total
        yield pd.DataFrame(
            {
                "window_start_us": [key[0]],
                "n_rows": [int(total)],
                "top_key": [top_key],
                "est_count": [est],
                "err_bound": [err],
                "hot_share_milli_lb": [int(lb_milli)],
                "alert": [bool(lb_milli >= threshold_milli)],
            }
        )

    return update


def window_skew_monitor(
    events_stream: DataFrame,
    key_col: str = "user_id",
    width_us: int = HOUR_US,
    m: int = 16,
    threshold_milli: int = 200,
    timeout_ms: int = 60 * 60 * 1000,
) -> DataFrame:
    """Continuously-maintained hot-key skew alarm — the streaming twin of
    ``operators/skew.py:key_skew_profile``.

    Per tumbling window: the exact running row count, the space-saving top
    key with its error bound, and the hot key's GUARANTEED share lower
    bound ``(est - err)·1000 DIV n`` in millis. ``alert`` fires only when
    that lower bound crosses ``threshold_milli`` — the sketch overcounts,
    so subtracting the error bound makes a false alarm impossible; a hot
    key with true share > n/m + threshold is always tracked and eventually
    fires. State: m counters + one total per active window, O(1) per key
    space regardless of key cardinality.
    """
    keyed = events_stream.select(
        ((F.col("ts_us") / width_us).cast("long") * width_us).alias("window_start_us"),
        F.col(key_col).alias("key"),
    )
    return keyed.groupBy("window_start_us").applyInPandasWithState(
        _make_skew_update(m, threshold_milli, timeout_ms),
        outputStructType=SKEW_SCHEMA,
        stateStructType=SKEW_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
