"""Event-time windowing kernels, batch + Structured Streaming variants.

The batch kernel uses integer bucket math on epoch-micros (oracle-friendly,
engine-agnostic); the streaming variant expresses the identical semantics
with ``window()`` + watermark so late data is handled by the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events_us: DataFrame, width_us: int) -> DataFrame:
    """Tumbling-window counts/sums over (ts_us, event_type, value)."""
    bucket = (F.col("ts_us") - (F.col("ts_us") % F.lit(width_us))).alias("window_start_us")
    return events_us.groupBy(bucket, "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


def sliding_counts(events_us: DataFrame, width_us: int, slide_us: int) -> DataFrame:
    """Sliding-window counts over (ts_us, event_type, value): each event lands
    in width/slide overlapping windows (explode of the window-start sequence —
    the same fan-out Spark's streaming ``window(width, slide)`` performs).

    Scale: fan-out factor is width/slide (a small constant); the aggregate
    shuffles on (window_start, event_type) with map-side combine.
    """
    n_windows = width_us // slide_us
    hi = (F.col("ts_us") - (F.col("ts_us") % F.lit(slide_us))).cast("long")
    lo = hi - F.lit((n_windows - 1) * slide_us)
    exploded = events_us.select(
        F.explode(F.sequence(lo, hi, F.lit(slide_us))).alias("window_start_us"),
        "event_type",
        "value",
    )
    return exploded.groupBy("window_start_us", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


def streaming_sliding_counts(
    events_stream: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``sliding_counts`` via ``window(width, slide)``."""
    return (
        events_stream.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", width, slide).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "value_cents")
    )


def streaming_session_counts(
    events_stream: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming twin of the batch ``user_sessions`` kernel: engine-managed
    session windows (``session_window`` merges events closer than ``gap``).

    The batch kernel sessionizes with lag+cumsum windows (exact, oracle-
    checkable); this variant trades that for bounded state on an unbounded
    stream — the engine closes a session once the watermark passes its gap.
    """
    return (
        events_stream.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def tumbling_reach(events_us: DataFrame, width_us: int) -> DataFrame:
    """Per-window DISTINCT users (batch; exact, oracle-checkable)."""
    bucket = (F.col("ts_us") - (F.col("ts_us") % F.lit(width_us))).alias("window_start_us")
    return events_us.groupBy(bucket).agg(F.countDistinct("user_id").alias("reach"))


def streaming_tumbling_reach(
    events_stream: DataFrame, width: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming twin of ``tumbling_reach`` with SKETCHED distinct counts.

    Exact streaming distinct keeps one state entry per (window, user) —
    unbounded in users; ``approx_count_distinct`` keeps an HLL sketch per
    window (KBs, mergeable across partials), the same exact→sketch swap as
    the batch ``event_user_reach``/HLL pair. Bounded state at any user
    cardinality is what makes the distinct query runnable on a firehose.
    """
    return (
        events_stream.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", width).alias("w"))
        .agg(F.approx_count_distinct("user_id").alias("reach_approx"))
        .select(F.col("w.start").alias("window_start"), "reach_approx")
    )


def streaming_tumbling_counts(
    events_stream: DataFrame, width: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming twin of ``tumbling_counts``: watermarked event-time window.

    ``events_stream`` needs (event_time timestamp, event_type, value).
    Late rows beyond the watermark are dropped by the engine; state is
    bounded — safe for an unbounded 100 TB/day firehose.
    """
    return (
        events_stream.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_cents",
        )
    )
