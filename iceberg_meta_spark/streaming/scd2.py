"""Streaming SCD Type-2 maintenance — the live twin of the batch
``scd2_user_state`` query (queries/extensions.py).

The batch build collapses each key's state runs into validity intervals
with two windows over the full history. The deployment path cannot re-read
history: this operator keeps ONE open interval per key as explicit state
(current state string, its valid_from, its ordering id) and, whenever a
micro-batch row changes the key's state, emits the now-CLOSED interval
downstream (append semantics — a closed interval is immutable, exactly the
contract of an SCD2 history table sink). The open interval is never
emitted; it lives in state until a change closes it, mirroring how the
batch twin marks it ``is_current``.

Within a batch, rows fold in (ts_us, event_id) order; on an in-order
stream per key the emitted interval sequence is identical to the batch
twin's closed rows over the same prefix (pinned by the split-invariance
test). Same-state repeats collapse silently — only transitions write.

State: (state string, valid_from_us long, n_intervals long,
n_late_dropped long) per key — O(1), engine-checkpointed. No timeout: an
SCD2 current row is legitimately open forever; expiring it would
fabricate a closure. Cross-batch late rows (ts_us < the open interval's
valid_from) are dropped and counted in state rather than emitting an
inverted interval into the immutable sink.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

CLOSED_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("state", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("valid_to_us", LongType()),
        StructField("interval_seq", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("cur_state", StringType()),
        StructField("cur_from_us", LongType()),
        StructField("n_closed", LongType()),
        StructField("n_late_dropped", LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    cur_state, cur_from, n_closed, n_late = (
        state.get if state.exists else (None, None, 0, 0)
    )
    closed: list[tuple[str, int, int]] = []
    rows = [pdf for pdf in pdfs if len(pdf)]
    if rows:
        batch = pd.concat(rows).sort_values(["ts_us", "event_id"])
        for ts_us, ev_state in zip(batch["ts_us"], batch["event_type"]):
            ts_us = int(ts_us)
            if cur_state is None:
                cur_state, cur_from = ev_state, ts_us
            elif ts_us < cur_from:
                # A cross-batch late arrival would close the open interval
                # with valid_to < valid_from — an inverted row in an
                # APPEND-ONLY (immutable) sink. Drop it and count it in
                # state instead of silently corrupting emitted history
                # (ADVICE r4). The count makes the data loss observable.
                n_late += 1
            elif ev_state != cur_state:
                closed.append((cur_state, cur_from, ts_us))
                cur_state, cur_from = ev_state, ts_us
    if cur_state is not None:
        state.update((cur_state, int(cur_from), n_closed + len(closed), n_late))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "state": [c[0] for c in closed],
                "valid_from_us": [c[1] for c in closed],
                "valid_to_us": [c[2] for c in closed],
                "interval_seq": list(range(n_closed + 1, n_closed + 1 + len(closed))),
            }
        )


def scd2_stream(changes: DataFrame) -> DataFrame:
    """Closed SCD2 intervals from a change stream of
    (user_id, ts_us, event_id, event_type) — append mode.

    Each key's updates see only that key's rows plus its one-interval
    state; parallelism is the state-store key partitioning, so 10⁹ keys
    spread over executors with three scalars each.
    """
    keyed = changes.select("user_id", "ts_us", "event_id", "event_type")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=CLOSED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
