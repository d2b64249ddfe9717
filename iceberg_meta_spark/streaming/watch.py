"""Snapshot watch (reference ST1: ``snapshots --watch``, cli.py:980-1023).

The reference polls the catalog every N seconds, diffs snapshot ids against a
``seen_ids`` set, and live-renders new ones, retrying on errors. Two
re-expressions here:

- ``poll_watch``       — exact semantics parity: a driver-side poll loop whose
  per-tick NEW detection is the ``new_snapshots`` anti-join kernel (A12/U2).
  State is the accumulated seen-ids DataFrame (kept small: ids only).
- ``watch_stream``     — Structured Streaming variant: a rate source supplies
  ticks; ``foreachBatch`` re-reads the snapshot source and anti-joins against
  the seen set. The engine owns scheduling/retry; semantics are identical.

At scale the snapshot log is tiny (metadata, not data) — the anti-join
broadcasts the seen side; an Iceberg deployment would instead use the
incremental streaming read (``stream-from-timestamp``) and skip the poll.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.operators.snapshots import new_snapshots


def poll_watch(
    get_snapshots: Callable[[], DataFrame],
    on_new: Callable[[DataFrame], None],
    ticks: int = 3,
    interval_s: float = 0.0,
    seen: DataFrame | None = None,
) -> DataFrame:
    """Reference-parity poll loop. Returns the final seen-ids DataFrame.

    Errors in a tick are swallowed and retried next tick (reference
    cli.py:1012-1016 behavior).
    """
    for i in range(ticks):
        try:
            current = get_snapshots()
            if seen is None:
                fresh = current
            else:
                fresh = new_snapshots(current, seen)
            on_new(fresh)
            ids = current.select("snapshot_id")
            seen = ids if seen is None else seen.select("snapshot_id").union(ids).distinct()
        except Exception:
            pass  # retry next tick, like the reference watch loop
        if interval_s and i < ticks - 1:
            time.sleep(interval_s)
    return seen


def watch_stream(
    spark: SparkSession,
    get_snapshots: Callable[[], DataFrame],
    on_new: Callable[[DataFrame], None],
    tick_seconds: int = 1,
):
    """Structured Streaming watch: rate-source ticks drive foreachBatch polls.

    Returns the started StreamingQuery; caller stops it. The seen-set lives
    across batches in the closure (ids-only DataFrame, broadcastable).
    """
    state: dict[str, DataFrame] = {}

    def tick(_batch_df, _batch_id) -> None:
        current = get_snapshots()
        seen = state.get("seen")
        fresh = current if seen is None else new_snapshots(current, seen)
        on_new(fresh)
        ids = current.select("snapshot_id")
        state["seen"] = ids if seen is None else seen.union(ids).distinct()

    ticks = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.col("timestamp"))
    )
    return (
        ticks.writeStream.trigger(processingTime=f"{tick_seconds} seconds")
        .foreachBatch(tick)
        .start()
    )
