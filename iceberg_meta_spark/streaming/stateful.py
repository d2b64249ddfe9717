"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only streaming state is the watch loop's seen-ids set
(cli.py:987-995). This operator generalizes it: per-key running counters with
first/last-seen tracking — the state shape a production snapshot/asset
monitor keeps. State is explicit, per-key, and bounded (three longs); the
engine checkpoints it and expires idle keys via the processing-time timeout,
so an unbounded key space cannot grow state without bound.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

RUNNING_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("total_events", LongType()),
        StructField("batch_events", LongType()),
        StructField("first_seen_us", LongType()),
        StructField("last_seen_us", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("total", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    total, first_us, last_us = state.get if state.exists else (0, None, None)
    batch = 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        batch += len(pdf)
        ts = pdf["ts_us"]
        lo, hi = int(ts.min()), int(ts.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    total += batch
    state.update((total, first_us, last_us))
    state.setTimeoutDuration(60 * 60 * 1000)  # expire idle keys after 1h
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "total_events": [total],
            "batch_events": [batch],
            "first_seen_us": [first_us],
            "last_seen_us": [last_us],
        }
    )


def running_counts(events_stream: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key running event counters over a stream of (key_col, ts_us).

    Arrow-batched state updates: each micro-batch groups by key, the update
    function sees all of a key's new rows as pandas frames plus that key's
    prior state — never another key's (state parallelism = key partitions).
    """
    keyed = events_stream.selectExpr(f"{key_col} AS key", "ts_us")
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
