"""Schema-evolution kernels (reference J2/J6).

Reference: per-version schema diff keyed by stable field_id — rename
detection survives because field_id is stable (tui/widgets.py:310-350) — and
cross-table field-type conflict detection (formatters.py:1385-1400).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def schema_diff(fields: DataFrame, old_id: int, new_id: int) -> DataFrame:
    """J2: full-outer join of two schema versions on (table_name, field_id).

    change ∈ {added, removed, changed}; unchanged fields are dropped.
    Output: table_name, field_id, change, old_name, new_name, old_type,
    new_type, old_required, new_required.
    """
    old = fields.filter(F.col("schema_id") == old_id).select(
        "table_name",
        "field_id",
        F.col("name").alias("old_name"),
        F.col("type").alias("old_type"),
        F.col("required").alias("old_required"),
    )
    new = fields.filter(F.col("schema_id") == new_id).select(
        "table_name",
        "field_id",
        F.col("name").alias("new_name"),
        F.col("type").alias("new_type"),
        F.col("required").alias("new_required"),
    )
    joined = old.join(new, ["table_name", "field_id"], "full_outer")
    change = (
        F.when(F.col("old_name").isNull(), F.lit("added"))
        .when(F.col("new_name").isNull(), F.lit("removed"))
        .when(
            (F.col("old_name") != F.col("new_name"))
            | (F.col("old_type") != F.col("new_type"))
            | (F.col("old_required") != F.col("new_required")),
            F.lit("changed"),
        )
        .otherwise(F.lit("same"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change") != "same")
        .select(
            "table_name",
            "field_id",
            "change",
            "old_name",
            "new_name",
            "old_type",
            "new_type",
            "old_required",
            "new_required",
        )
    )


def schema_conflicts(fields: DataFrame, schema_id: int) -> DataFrame:
    """J6: field names with >1 distinct type across tables (one schema version).

    Output: name, n_types, n_tables, types (sorted comma-joined — kept scalar
    for oracle hashing; the reference returns a list of (type, table)).
    """
    v = fields.filter(F.col("schema_id") == schema_id)
    return (
        v.groupBy("name")
        .agg(
            F.countDistinct("type").alias("n_types"),
            F.countDistinct("table_name").alias("n_tables"),
            F.concat_ws(",", F.array_sort(F.collect_set("type"))).alias("types"),
        )
        .filter(F.col("n_types") > 1)
    )
