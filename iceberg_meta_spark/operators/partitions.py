"""Partition-distribution and skew kernels (reference A3/A4/P6).

Reference: collect_partitions consumption (formatters.py:484-498) and the
skew flag/ratio (formatters.py:500-514: flag partitions with file_count >
2*avg, ratio = max/avg, 0 when avg is 0).

Scale posture: the global average is a 1-row aggregate cross-joined
(broadcast) back onto the per-partition rows — NOT a global window, which
would funnel every row through a single partition at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_distribution(files: DataFrame) -> DataFrame:
    """A3: per-partition file_count / record_count / total size."""
    return files.groupBy("part_key").agg(
        F.count(F.lit(1)).alias("file_count"),
        F.sum("record_count").alias("record_count"),
        F.sum("file_size_in_bytes").alias("total_size"),
    )


def partition_skew(files: DataFrame, factor: float = 2.0) -> DataFrame:
    """A4+P6: per-partition skew flags vs the global average file count.

    Output: one row per partition with avg_file_count (global), skewed flag
    (file_count > factor*avg) and skew_ratio (file_count/avg, 0 if avg=0,
    rounded to 4 — mirrors formatters.py:512 zero-guard).
    """
    parts = partition_distribution(files)
    stats = parts.agg(
        (F.sum("file_count").cast("double") / F.count(F.lit(1))).alias("avg_file_count")
    )
    joined = parts.crossJoin(F.broadcast(stats))
    avg = F.col("avg_file_count")
    return joined.select(
        "part_key",
        "file_count",
        "record_count",
        "total_size",
        F.round(avg, 4).alias("avg_file_count"),
        (F.col("file_count") > F.lit(factor) * avg).alias("skewed"),
        F.when(avg == 0, F.lit(0.0))
        .otherwise(F.round(F.col("file_count") / avg, 4))
        .alias("skew_ratio"),
    )
