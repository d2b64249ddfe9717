"""Hypertable-style hierarchical time rollup (TimescaleDB continuous
aggregates, restated for Spark): aggregate raw events ONCE at the finest
grain, then derive every coarser grain by re-aggregating the finer grain's
partials — counts and sums are mergeable, so the hour rollup reads minute
rows (not raw events) and the day rollup reads hour rows.

Scale: raw data is scanned exactly once. The minute aggregate's shuffle is
the only event-sized exchange; hour/day exchanges carry one row per
(coarser-bucket) — and Spark's ReuseExchange dedups the shared minute
subtree across the union branches, which `test_time_rollup_reuses_exchange`
pins. At 100 TB this is the difference between one pass and three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_MIN = 60_000_000
US_HOUR = 3_600_000_000
US_DAY = 86_400_000_000


def _rollup(df: DataFrame, bucket_us: int, src_bucket: str) -> DataFrame:
    return (
        df.withColumn("__b", (F.col(src_bucket) - F.col(src_bucket) % bucket_us))
        .groupBy("__b")
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_cents").alias("sum_cents"))
        .withColumnRenamed("__b", "bucket_us")
    )


def time_rollup(events: DataFrame, ts_col: str = "ts_us", value_col: str = "value") -> DataFrame:
    """(grain, bucket_us, n_events, sum_cents) at minute/hour/day grains.

    ``sum_cents`` is the floor-scaled integer sum (``floor(value*100)``) so
    re-aggregation is exact and engine-portable.
    """
    minute = (
        events.withColumn("__b", (F.col(ts_col) - F.col(ts_col) % US_MIN))
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col(value_col) * 100).cast("long")).alias("sum_cents"),
        )
        .withColumnRenamed("__b", "bucket_us")
    )
    hour = _rollup(minute, US_HOUR, "bucket_us")
    day = _rollup(hour, US_DAY, "bucket_us")
    tag = lambda df, g: df.select(  # noqa: E731
        F.lit(g).alias("grain"), "bucket_us", "n_events", "sum_cents"
    )
    return tag(minute, "minute").unionAll(tag(hour, "hour")).unionAll(tag(day, "day"))
