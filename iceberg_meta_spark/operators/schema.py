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


def schema_field_history(fields: DataFrame) -> DataFrame:
    """J2 generalized to N versions: each field version vs its predecessor
    via lag() over schema_id, partitioned by (table_name, field_id).

    The reference walks consecutive version pairs procedurally
    (tui/widgets.py:289-297); relationally that is one analytic window —
    partition-parallel, no self-join. change ∈ {added, renamed, retyped,
    requirement_changed}; unchanged versions are dropped ('removed' needs the
    full-outer diff, see schema_diff, since a missing row has no successor).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("table_name", "field_id").orderBy("schema_id")
    with_prev = fields.select(
        "table_name",
        "field_id",
        "schema_id",
        "name",
        "type",
        "required",
        F.lag("name").over(w).alias("prev_name"),
        F.lag("type").over(w).alias("prev_type"),
        F.lag("required").over(w).alias("prev_required"),
        F.lag("schema_id").over(w).alias("prev_schema_id"),
    )
    change = (
        F.when(F.col("prev_schema_id").isNull(), F.lit("added"))
        .when(F.col("name") != F.col("prev_name"), F.lit("renamed"))
        .when(F.col("type") != F.col("prev_type"), F.lit("retyped"))
        .when(F.col("required") != F.col("prev_required"), F.lit("requirement_changed"))
        .otherwise(F.lit("same"))
    )
    return (
        with_prev.withColumn("change", change)
        .filter(F.col("change") != "same")
        .select("table_name", "field_id", "schema_id", "change", "prev_name", "name", "prev_type", "type")
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


# Iceberg's legal primitive type promotions (spec "Schema Evolution"):
# widening only — int->long, float->double, decimal precision growth.
# Everything else requires a rewrite.
WIDENINGS: tuple[tuple[str, str], ...] = (
    ("int", "long"),
    ("int", "bigint"),
    ("float", "double"),
    ("decimal(9,2)", "decimal(18,2)"),
    ("decimal(18,2)", "decimal(38,2)"),
)


def schema_compat(fields: DataFrame, old_id: int, new_id: int) -> DataFrame:
    """Schema-evolution safety classes per table: can new-schema readers
    consume old-schema files without a rewrite?

    Builds on :func:`schema_diff` (the J2 full-outer join): each changed
    field classifies as ``widened`` (the promotion is in Iceberg's legal
    widening set — old files remain readable), ``renamed`` (name-only
    change on the stable field id — safe, ids not names bind columns),
    ``tightened`` (optional->required — existing nulls may violate it),
    or ``incompatible`` (any other type change — rewrite required);
    added/removed pass through. One tiny-key aggregate per table.
    """
    d = schema_diff(fields, old_id, new_id)
    widened = F.lit(False)
    for old_t, new_t in WIDENINGS:
        widened = widened | ((F.col("old_type") == old_t) & (F.col("new_type") == new_t))
    cls = (
        F.when(F.col("change") == "added", "added")
        .when(F.col("change") == "removed", "removed")
        .when(F.col("old_type") != F.col("new_type"), F.when(widened, "widened").otherwise("incompatible"))
        .when(
            (F.col("old_required") == False) & (F.col("new_required") == True),  # noqa: E712
            "tightened",
        )
        .otherwise("renamed")
    )
    return (
        d.withColumn("compat", cls)
        .groupBy("table_name", "compat")
        .agg(F.count(F.lit(1)).alias("n_fields"))
        .orderBy("table_name", "compat")
    )
