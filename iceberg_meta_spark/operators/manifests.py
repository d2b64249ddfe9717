"""Manifest-tree kernels (reference J5/W1/W2/W5).

Reference: the tree view zips manifests with entries and shows each
manifest's share of snapshot rows plus a per-manifest display cap
(formatters.py:1283-1307, caps at 1296 / tui/widgets.py:551).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def manifest_row_share(files: DataFrame) -> DataFrame:
    """J5+W1: per (snapshot, manifest) rows/bytes + % of snapshot rows.

    The percent-of-total is a window sum partitioned by snapshot_id — exact
    BIGINT sums, parallel across snapshots (scales with snapshot count).
    """
    per_manifest = files.groupBy("snapshot_id", "manifest_path").agg(
        F.count(F.lit(1)).alias("file_count"),
        F.sum("record_count").alias("row_count"),
        F.sum("file_size_in_bytes").alias("total_size"),
    )
    snap_total = Window.partitionBy("snapshot_id")
    total_rows = F.sum("row_count").over(snap_total)
    return per_manifest.select(
        "snapshot_id",
        "manifest_path",
        "file_count",
        "row_count",
        "total_size",
        F.when(total_rows == 0, F.lit(0.0))
        .otherwise(F.round(F.lit(100.0) * F.col("row_count") / total_rows, 4))
        .alias("pct_of_snapshot_rows"),
    )


def top_files_per_partition(files: DataFrame, k: int = 3) -> DataFrame:
    """W5: largest k files per partition via a ranking window (the
    reference's display cap, expressed as compute pruning)."""
    w = Window.partitionBy("part_key").orderBy(
        F.desc("file_size_in_bytes"), F.asc("file_path")
    )
    return (
        files.withColumn("rank_in_partition", F.row_number().over(w))
        .filter(F.col("rank_in_partition") <= k)
        .select("part_key", "rank_in_partition", "file_path", "file_size_in_bytes", "record_count")
    )
