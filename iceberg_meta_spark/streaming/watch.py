"""Snapshot watch (reference ST1: ``snapshots --watch``, cli.py:980-1023).

The reference polls the catalog every N seconds, diffs snapshot ids against a
``seen_ids`` set, and live-renders new ones, retrying on errors. Two
re-expressions here:

- ``poll_watch``       — exact semantics parity: a driver-side poll loop whose
  per-tick NEW detection is the ``new_snapshots`` anti-join kernel (A12/U2).
- ``watch_stream``     — Structured Streaming variant: a rate source supplies
  ticks; ``foreachBatch`` re-reads the snapshot source and anti-joins against
  the seen set. The engine owns scheduling/retry; semantics are identical.

Seen-set state is a MATERIALIZED driver-side id set (the reference's
``seen_ids``, cli.py:992). A lazy unioned-DataFrame seen-set silently breaks
over live sources: each re-evaluation re-lists the watched directory/catalog,
so the "seen" frame drifts with the source and new ids get re-reported. Ids
are metadata-tiny (a snapshot log is thousands of rows, not data-scale), so
collecting them is the correct — not merely convenient — design; a 10⁹-row
watch would use an incremental streaming read instead of polling.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.operators.snapshots import new_snapshots

_ID_SCHEMA = "snapshot_id long"


def _ids_df(spark: SparkSession, ids: set[int]) -> DataFrame:
    return spark.createDataFrame([(i,) for i in sorted(ids)], _ID_SCHEMA)


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
    seen_ids: set[int] | None = (
        None if seen is None else {r.snapshot_id for r in seen.select("snapshot_id").collect()}
    )
    spark = None
    for i in range(ticks):
        try:
            current = get_snapshots()
            spark = current.sparkSession
            if seen_ids is None:
                fresh = current
            else:
                fresh = new_snapshots(current, F.broadcast(_ids_df(spark, seen_ids)))
            # freeze the tick's result before the source moves on, so on_new
            # and the state update see the same rows
            fresh = fresh.localCheckpoint(eager=True)
            on_new(fresh)
            new_ids = {r.snapshot_id for r in fresh.select("snapshot_id").collect()}
            seen_ids = new_ids if seen_ids is None else seen_ids | new_ids
        except Exception:
            pass  # retry next tick, like the reference watch loop
        if interval_s and i < ticks - 1:
            time.sleep(interval_s)
    if spark is None:
        return seen
    return _ids_df(spark, seen_ids or set())


def watch_stream(
    spark: SparkSession,
    get_snapshots: Callable[[], DataFrame],
    on_new: Callable[[DataFrame], None],
    tick_seconds: int = 1,
):
    """Structured Streaming watch: rate-source ticks drive foreachBatch polls.

    Returns the started StreamingQuery; caller stops it. The seen-set lives
    across batches in the closure (materialized id set — see module note).
    """
    state: dict[str, set[int]] = {}

    def tick(_batch_df, _batch_id) -> None:
        current = get_snapshots()
        seen_ids = state.get("ids")
        if seen_ids is None:
            fresh = current
        else:
            fresh = new_snapshots(current, F.broadcast(_ids_df(spark, seen_ids)))
        fresh = fresh.localCheckpoint(eager=True)
        on_new(fresh)
        new_ids = {r.snapshot_id for r in fresh.select("snapshot_id").collect()}
        state["ids"] = new_ids if seen_ids is None else seen_ids | new_ids

    ticks = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.col("timestamp"))
    )
    return (
        ticks.writeStream.trigger(processingTime=f"{tick_seconds} seconds")
        .foreachBatch(tick)
        .start()
    )
