"""Snapshot diff kernels (reference J1/U1 + net aggregates).

Reference: collect_diff (formatters.py:1051-1111) — set-difference of file
paths between two snapshots, then size/row totals and signed net deltas.
The reference builds Python sets; here each direction is a hash anti-join on
``file_path``. At scale both sides shuffle-partition on the join key (or the
smaller snapshot broadcasts); no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(files_old: DataFrame, files_new: DataFrame) -> DataFrame:
    """J1: per-file diff rows — change ∈ {added, deleted} keyed by file_path."""
    added = files_new.join(files_old.select("file_path"), "file_path", "left_anti").select(
        F.lit("added").alias("change"), "file_path", "record_count", "file_size_in_bytes"
    )
    deleted = files_old.join(files_new.select("file_path"), "file_path", "left_anti").select(
        F.lit("deleted").alias("change"), "file_path", "record_count", "file_size_in_bytes"
    )
    return added.unionByName(deleted)


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
