"""Snapshot diff kernels (reference J1/U1 + net aggregates).

Reference: collect_diff (formatters.py:1051-1111) — set-difference of file
paths between two snapshots, then size/row totals and signed net deltas.
The reference builds Python sets; here both directions come out of ONE
full-outer hash join on ``file_path`` (a path appears at most once per
snapshot file list, so presence-nullness classifies added/deleted). At scale
each side is scanned and shuffled exactly once — half the work of the
two-anti-join formulation — and no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(files_old: DataFrame, files_new: DataFrame) -> DataFrame:
    """J1: per-file diff rows — change ∈ {added, deleted} keyed by file_path."""
    o = files_old.select(
        "file_path",
        F.col("record_count").alias("o_rc"),
        F.col("file_size_in_bytes").alias("o_sz"),
        F.lit(True).alias("in_old"),
    )
    n = files_new.select(
        "file_path",
        F.col("record_count").alias("n_rc"),
        F.col("file_size_in_bytes").alias("n_sz"),
        F.lit(True).alias("in_new"),
    )
    return (
        o.join(n, "file_path", "full_outer")
        .filter(F.col("in_old").isNull() | F.col("in_new").isNull())
        .select(
            F.when(F.col("in_old").isNull(), F.lit("added")).otherwise(F.lit("deleted")).alias("change"),
            "file_path",
            F.coalesce("n_rc", "o_rc").alias("record_count"),
            F.coalesce("n_sz", "o_sz").alias("file_size_in_bytes"),
        )
    )


def snapshot_diff_summary(files_old: DataFrame, files_new: DataFrame) -> DataFrame:
    """J1 totals: added/deleted file counts, bytes, rows + net deltas."""
    diff = snapshot_diff(files_old, files_new)
    is_add = F.col("change") == "added"
    added_files = F.sum(F.when(is_add, 1).otherwise(0)).cast("long")
    deleted_files = F.sum(F.when(is_add, 0).otherwise(1)).cast("long")
    added_rows = F.sum(F.when(is_add, F.col("record_count")).otherwise(0))
    deleted_rows = F.sum(F.when(is_add, 0).otherwise(F.col("record_count")))
    added_bytes = F.sum(F.when(is_add, F.col("file_size_in_bytes")).otherwise(0))
    deleted_bytes = F.sum(F.when(is_add, 0).otherwise(F.col("file_size_in_bytes")))
    return diff.agg(
        added_files.alias("added_files"),
        deleted_files.alias("deleted_files"),
        added_rows.alias("added_rows"),
        deleted_rows.alias("deleted_rows"),
        added_bytes.alias("added_bytes"),
        deleted_bytes.alias("deleted_bytes"),
        (added_files - deleted_files).alias("net_files"),
        (added_rows - deleted_rows).alias("net_rows"),
        (added_bytes - deleted_bytes).alias("net_bytes"),
    )
