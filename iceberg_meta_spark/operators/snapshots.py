"""Snapshot-log kernels (reference O1, S8/A11, A12/U2).

Reference: recent-operations top-5 (formatters.py:953), the metadata-only
table summary fast path reading totals straight from the latest snapshot's
summary map with zero file I/O (formatters.py:1313-1362 — the reference's
key performance trick, preserved here), and watch-mode new-snapshot
detection (cli.py:987-995).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recent_snapshots(snapshots: DataFrame, k: int = 5) -> DataFrame:
    """O1: last-k snapshots, newest first (TakeOrderedAndProject top-k)."""
    return (
        snapshots.select(
            "snapshot_id", "committed_us", "operation", "added_records", "deleted_records"
        )
        .orderBy(F.desc("committed_us"), F.desc("snapshot_id"))
        .limit(k)
    )


def latest_snapshot_summary(snapshots: DataFrame) -> DataFrame:
    """S8/A11: totals from the latest snapshot only — metadata fast path."""
    return (
        snapshots.orderBy(F.desc("committed_us"), F.desc("snapshot_id"))
        .limit(1)
        .select(
            "snapshot_id",
            "operation",
            "total_data_files",
            "total_records",
            "total_files_size",
        )
    )


def new_snapshots(current: DataFrame, seen: DataFrame) -> DataFrame:
    """A12/U2: snapshots in ``current`` not yet in ``seen`` (anti-join) —
    the batch kernel behind watch mode (streaming variant in streaming/)."""
    return current.join(seen.select("snapshot_id"), "snapshot_id", "left_anti")


def snapshot_growth(snaps: DataFrame, k: int = 20) -> DataFrame:
    """Per-commit storage growth: each snapshot's delta vs its parent
    (total_files_size / total_data_files / total_records), top-``k`` largest
    commits by absolute size delta.

    Scale: ONE self-equi-join on the parent pointer (both sides the
    metadata-sized snapshot log, hash-partitioned the same way) + a
    TakeOrdered — deliberately NOT a cumulative window, which would funnel
    the whole (possibly 10⁶-commit) chain through one partition; the
    running total, when needed, is the as-of anchor's absolute value.
    """
    child = snaps.select(
        "snapshot_id",
        "parent_id",
        "operation",
        F.col("total_files_size").alias("size_now"),
        F.col("total_data_files").alias("files_now"),
        F.col("total_records").alias("records_now"),
    )
    parent = snaps.select(
        F.col("snapshot_id").alias("parent_id"),
        F.col("total_files_size").alias("size_prev"),
        F.col("total_data_files").alias("files_prev"),
        F.col("total_records").alias("records_prev"),
    )
    return (
        child.join(parent, "parent_id")
        .select(
            "snapshot_id",
            "operation",
            (F.col("size_now") - F.col("size_prev")).alias("size_delta"),
            (F.col("files_now") - F.col("files_prev")).alias("files_delta"),
            (F.col("records_now") - F.col("records_prev")).alias("records_delta"),
        )
        .orderBy(F.abs(F.col("size_delta")).desc(), F.col("snapshot_id"))
        .limit(k)
    )
