"""Column-statistics kernels (reference A5/A6/A7 + J4).

Reference: single-pass accumulation of null/value/size/bounds maps over all
files (formatters.py:522-604). The reference iterates Python dicts; here the
pre-flattened (file, field) stats rows feed ONE hash-aggregate per field_id —
partial map-side combine, then a broadcast of the 1-row grand total for
storage percentages (no global window).

In the Iceberg adapter the same kernel runs after ``F.explode`` of the native
``map<int,long>`` stats columns; project only needed keys first on very wide
tables (SURVEY §4 scale note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_health(stats: DataFrame) -> DataFrame:
    """A5+A6+A7 fused: per-field null rate, storage share, value bounds.

    Output per field_id: value_count, null_count, null_pct, total_bytes,
    bytes_pct (share of all columns' storage), min_lower, max_upper.
    One scan, one groupBy, one broadcast of the grand total.
    """
    per_field = stats.groupBy("field_id").agg(
        F.sum("value_count").alias("value_count"),
        F.sum("null_count").alias("null_count"),
        F.sum("column_size").alias("total_bytes"),
        F.min("lower_bound").alias("min_lower"),
        F.max("upper_bound").alias("max_upper"),
    )
    total = per_field.agg(F.sum("total_bytes").alias("grand_total_bytes"))
    joined = per_field.crossJoin(F.broadcast(total))
    return joined.select(
        "field_id",
        "value_count",
        "null_count",
        F.when(F.col("value_count") == 0, F.lit(0.0))
        .otherwise(F.round(F.lit(100.0) * F.col("null_count") / F.col("value_count"), 4))
        .alias("null_pct"),
        "total_bytes",
        F.when(F.col("grand_total_bytes") == 0, F.lit(0.0))
        .otherwise(F.round(F.lit(100.0) * F.col("total_bytes") / F.col("grand_total_bytes"), 4))
        .alias("bytes_pct"),
        "min_lower",
        "max_upper",
    )


def column_health_named(stats: DataFrame, schema_fields: DataFrame) -> DataFrame:
    """J4: stats joined to the (small) schema dimension via broadcast hash join."""
    dim = schema_fields.select("field_id", "name", "type").dropDuplicates(["field_id"])
    return column_health(stats).join(F.broadcast(dim), "field_id", "left")
