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

from pyspark.sql import DataFrame, Window
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


def time_fill(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts_us",
    value_col: str = "value_cents",
    step_us: int = 60_000_000,
) -> DataFrame:
    """Gap-filled per-key time grid with last-observation-carried-forward.

    The TimescaleDB ``time_bucket_gapfill + locf`` shape: bucket
    observations, densify each key's [min, max] bucket span via
    sequence + explode (map-side row generation — the grid never shuffles
    at event grain), left-join observations back, and forward-fill with
    ``last(value, ignorenulls)`` over a window PARTITIONED BY KEY — the
    fill never crosses keys and never funnels through one partition.

    Output: (key, bucket_us, filled value, observed flag). Grid size is
    O(keys x span/step), independent of event count — the right asymptotic
    for dense dashboards over sparse high-cardinality streams.
    """
    bucket = (F.col(ts_col) - F.col(ts_col) % F.lit(step_us)).alias("bucket_us")
    obs = (
        events.select(key_col, bucket, F.col(value_col))
        .groupBy(key_col, "bucket_us")
        .agg(F.sum(value_col).alias("observed"))
    )
    span = obs.groupBy(key_col).agg(
        F.min("bucket_us").alias("lo"), F.max("bucket_us").alias("hi")
    )
    grid = span.select(
        key_col,
        F.explode(F.sequence("lo", "hi", F.lit(step_us))).alias("bucket_us"),
    )
    joined = grid.join(obs, [key_col, "bucket_us"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket_us",
        F.last("observed", ignorenulls=True).over(w).alias("filled"),
        F.col("observed").isNotNull().alias("observed_flag"),
    ).orderBy(key_col, "bucket_us")


def time_interpolate(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts_us",
    value_col: str = "value_cents",
    step_us: int = 60_000_000,
) -> DataFrame:
    """Gap-filled per-key grid with LINEAR interpolation between the
    neighboring observations — TimescaleDB's ``interpolate()`` beside
    :func:`time_fill`'s ``locf()``.

    Same densified grid; each gap row carries BOTH fence posts via two
    ignore-nulls windows (previous observation forward, next observation
    backward — each partitioned by key) and interpolates with integer
    arithmetic: ``prev + (next-prev)·(t-t_prev) DIV (t_next-t_prev)`` —
    exact, engine-reproducible, no float slope accumulation. Grid edges
    (before the first / after the last observation) fall back to the
    available fence post; observed rows pass through untouched.
    """
    bucket = (F.col(ts_col) - F.col(ts_col) % F.lit(step_us)).alias("bucket_us")
    obs = (
        events.select(key_col, bucket, F.col(value_col))
        .groupBy(key_col, "bucket_us")
        .agg(F.sum(value_col).alias("observed"))
    )
    span = obs.groupBy(key_col).agg(
        F.min("bucket_us").alias("lo"), F.max("bucket_us").alias("hi")
    )
    grid = span.select(
        key_col,
        F.explode(F.sequence("lo", "hi", F.lit(step_us))).alias("bucket_us"),
    )
    joined = grid.join(obs, [key_col, "bucket_us"], "left")
    fwd = (
        Window.partitionBy(key_col)
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the next fence post uses a DESC-ordered GROWING frame, not
    # [current, unboundedFollowing]: Spark evaluates unbounded-FOLLOWING
    # frames by rescanning to the partition end per row — O(rows²) per key
    # (measured 484s on a 216k-row grid); the reversed growing frame is the
    # same value in O(rows)
    bwd = (
        Window.partitionBy(key_col)
        .orderBy(F.desc("bucket_us"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_ts = F.when(F.col("observed").isNotNull(), F.col("bucket_us"))
    fenced = joined.select(
        key_col,
        "bucket_us",
        "observed",
        F.last("observed", ignorenulls=True).over(fwd).alias("prev_v"),
        F.last(obs_ts, ignorenulls=True).over(fwd).alias("prev_t"),
        F.last("observed", ignorenulls=True).over(bwd).alias("next_v"),
        F.last(obs_ts, ignorenulls=True).over(bwd).alias("next_t"),
    )
    interp = F.expr(
        "CAST(prev_v + ((next_v - prev_v) * (bucket_us - prev_t))"
        " DIV (next_t - prev_t) AS BIGINT)"
    )
    return fenced.select(
        key_col,
        "bucket_us",
        F.when(F.col("observed").isNotNull(), F.col("observed"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(interp)
        .alias("filled"),
        F.col("observed").isNotNull().alias("observed_flag"),
    ).orderBy(key_col, "bucket_us")
