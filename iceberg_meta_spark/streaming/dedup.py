"""Streaming exact dedup: the live twin of pipeline/dedup.exact_dup_groups.

A training-data ingest stream re-delivers documents (at-least-once sources,
crawler re-fetches); the batch engine dedups with a hash-groupBy, but a
stream cannot hold unbounded "seen keys" state. Spark's
``dropDuplicatesWithinWatermark`` keeps a key only until the watermark
passes it, so state is bounded by (key arrival rate × watermark window) —
the production-safe shape: exact within the window, bounded memory forever.

Use the same dup key as the batch kernel (md5 of the normalized token
prefix) so a doc re-delivered inside the watermark window is dropped
exactly like the batch pass would drop it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs_stream: DataFrame,
    prefix_tokens: int = 3,
    watermark: str = "10 minutes",
    time_col: str = "event_time",
) -> DataFrame:
    """Drop re-deliveries of the same document within the watermark window.

    ``docs_stream`` needs (``time_col`` timestamp, ``text`` string, ...);
    rows whose dup key already arrived inside the watermark are dropped,
    and state for keys older than the watermark is freed.
    """
    key = F.md5(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, prefix_tokens)))
    return (
        docs_stream.withColumn("dup_key", key)
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["dup_key"])
    )
