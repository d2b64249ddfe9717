"""Heartbeat / silence-gap detection: batch twin + stateful streaming twin.

The monitoring shape behind "this asset stopped emitting": given a keyed
event stream, find the silent intervals — spans longer than ``gap_us``
between consecutive events of one key.

- ``heartbeat_gaps``   — batch: ONE ``lag()`` window partitioned by key
  (each key's history sorts independently inside its shuffle partition —
  no global ordering, scales with keys × per-key history).
- ``silence_stream``   — streaming: ``applyInPandasWithState`` keeping only
  ``last_seen_us`` per key (one long of state). Gaps that close inside the
  stream (a late heartbeat arrives after a long pause) are emitted exactly
  like the batch twin computes them; keys silent past the processing-time
  timeout emit an OPEN gap row (gap_end_us null) and drop their state, so
  an unbounded key space cannot grow state without bound.

The reference's watch loop (cli.py:987-1007) polls for NEW snapshots; this
is the complementary alert — the table that stopped committing.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window


def heartbeat_gaps(
    events: DataFrame,
    gap_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Silent intervals per key: consecutive-event spans exceeding ``gap_us``.

    One window shuffle keyed by ``key_col``; emits (key, gap_start_us,
    gap_end_us, gap_us) per detected gap, deterministic under the
    (ts, tie-break-free) ordering because equal timestamps produce a zero
    span and zero spans never exceed a positive threshold.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    return (
        events.select(key_col, F.col(ts_col))
        .withColumn("gap_start_us", prev)
        .filter(F.col("gap_start_us").isNotNull())
        .filter(F.col(ts_col) - F.col("gap_start_us") > F.lit(gap_us))
        .select(
            key_col,
            "gap_start_us",
            F.col(ts_col).alias("gap_end_us"),
            (F.col(ts_col) - F.col("gap_start_us")).alias("gap_us"),
        )
    )


GAP_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("gap_start_us", LongType()),
        StructField("gap_end_us", LongType()),  # null => still open at timeout
        StructField("gap_us", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("last_us", LongType())])


def _make_update(gap_us: int, timeout_ms: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            (last_us,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "gap_start_us": [last_us],
                    "gap_end_us": [None],
                    "gap_us": [None],
                }
            )
            return
        ts_sorted: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                ts_sorted.extend(int(v) for v in pdf["ts_us"])
        ts_sorted.sort()
        last_us = state.get[0] if state.exists else None
        out_start, out_end = [], []
        for t in ts_sorted:
            if last_us is not None and t - last_us > gap_us:
                out_start.append(last_us)
                out_end.append(t)
            last_us = t
        if last_us is not None:
            state.update((last_us,))
            state.setTimeoutDuration(timeout_ms)  # silence => open-gap row
        if out_start:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out_start),
                    "gap_start_us": out_start,
                    "gap_end_us": out_end,
                    "gap_us": [e - s for s, e in zip(out_start, out_end)],
                }
            )

    return update


def silence_stream(
    events_stream: DataFrame,
    gap_us: int,
    key_col: str = "user_id",
    timeout_ms: int = 60_000,
) -> DataFrame:
    """Streaming gap detector over (key_col, ts_us) rows.

    State per key is a single long (last event time); each micro-batch
    closes any gaps its new rows reveal (identical arithmetic to the batch
    twin), and ``timeout_ms`` of processing-time silence turns a quiet key
    into an open-ended gap row (gap_end_us null) before expiring its state.
    """
    keyed = events_stream.selectExpr(f"{key_col} AS key", "ts_us")
    return keyed.groupBy("key").applyInPandasWithState(
        _make_update(gap_us, timeout_ms),
        outputStructType=GAP_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
