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
