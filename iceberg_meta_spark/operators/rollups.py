"""Namespace / warehouse rollups and table alert predicates
(reference A9/A10/A11, O2/O3, P7/P8/P9, F11).

Reference: namespace rollup (formatters.py:1403-1435), warehouse overview
with format-version histogram (formatters.py:1438-1494), freshness bucketing
and alert predicates (tui/widgets.py:789-817, 915-1001). These consume the
metadata-only fast path (_table_meta_summary, formatters.py:1313-1382): no
file-level scan — a deliberate design we preserve (SURVEY §4).

The warehouse rollup upgrades the reference's two hand-computed levels to a
single ``ROLLUP`` grouping set (one shuffle produces both levels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_meta_spark.sources.fixtures import NOW_MS

DAY_MS = 86_400_000


def namespace_rollup(tables: DataFrame) -> DataFrame:
    """A9: per-namespace totals + table count."""
    return tables.groupBy("namespace").agg(
        F.count(F.lit(1)).alias("table_count"),
        F.sum("total_files").alias("total_files"),
        F.sum("total_records").alias("total_records"),
        F.sum("total_size").alias("total_size"),
        F.max("last_updated_ms").alias("last_updated_ms"),
    )


def warehouse_rollup(tables: DataFrame) -> DataFrame:
    """A10: namespace + grand-total levels in one ROLLUP grouping set."""
    return (
        tables.rollup("namespace")
        .agg(
            F.count(F.lit(1)).alias("table_count"),
            F.sum("total_files").alias("total_files"),
            F.sum("total_records").alias("total_records"),
            F.sum("total_size").alias("total_size"),
        )
        .select(
            F.coalesce(F.col("namespace"), F.lit("(warehouse)")).alias("namespace"),
            "table_count",
            "total_files",
            "total_records",
            "total_size",
        )
    )


def warehouse_cube(tables: DataFrame) -> DataFrame:
    """A10 extension: all (namespace × format_version) grouping-set totals in
    one CUBE — per-namespace, per-version, per-(ns, version) and grand total
    from a single shuffle (the reference hand-computes two of these levels;
    SURVEY §2.4 flags cube/rollup as the natural upgrade)."""
    return (
        tables.cube("namespace", "format_version")
        .agg(
            F.count(F.lit(1)).alias("table_count"),
            F.sum("total_size").alias("total_size"),
        )
        .select(
            F.coalesce(F.col("namespace"), F.lit("(all)")).alias("namespace"),
            F.coalesce(F.col("format_version"), F.lit(-1)).alias("format_version"),
            "table_count",
            "total_size",
        )
    )


def format_version_histogram(tables: DataFrame) -> DataFrame:
    """A10 sub-kernel: count of tables per Iceberg format version."""
    return tables.groupBy("format_version").agg(F.count(F.lit(1)).alias("table_count"))


def _age_days(now_ms: int):
    return ((F.lit(now_ms) - F.col("last_updated_ms")) / F.lit(DAY_MS)).cast("long")


def freshness_histogram(
    tables: DataFrame, now_ms: int = NOW_MS, stale_days: int = 7, critical_days: int = 30
) -> DataFrame:
    """P7/F11: bucket tables by last-update age (fresh / stale / critical)."""
    age = _age_days(now_ms)
    bucket = (
        F.when(age >= critical_days, F.lit("critical"))
        .when(age >= stale_days, F.lit("stale"))
        .otherwise(F.lit("fresh"))
    )
    return (
        tables.select(bucket.alias("freshness"))
        .groupBy("freshness")
        .agg(F.count(F.lit(1)).alias("table_count"))
    )


def table_alerts(
    tables: DataFrame,
    now_ms: int = NOW_MS,
    critical_days: int = 30,
    snapshot_alert: int = 50,
) -> DataFrame:
    """P8/P9 + staleness: per-table alert flags, flagged tables only."""
    age = _age_days(now_ms)
    flagged = tables.select(
        "namespace",
        "table_name",
        age.alias("age_days"),
        (age >= critical_days).alias("is_stale"),
        (F.col("snapshot_count") >= snapshot_alert).alias("too_many_snapshots"),
        (F.col("format_version") == 1).alias("is_v1_format"),
    )
    return flagged.filter(
        F.col("is_stale") | F.col("too_many_snapshots") | F.col("is_v1_format")
    )


def stalest_tables(tables: DataFrame, k: int = 5, now_ms: int = NOW_MS) -> DataFrame:
    """O2: top-k stalest tables (TakeOrderedAndProject — no full sort)."""
    return (
        tables.select("namespace", "table_name", "last_updated_ms", _age_days(now_ms).alias("age_days"))
        .orderBy(F.asc("last_updated_ms"), F.asc("table_name"))
        .limit(k)
    )


def most_snapshots(tables: DataFrame, k: int = 5) -> DataFrame:
    """O3: top-k tables by snapshot count."""
    return (
        tables.select("namespace", "table_name", "snapshot_count")
        .orderBy(F.desc("snapshot_count"), F.asc("table_name"))
        .limit(k)
    )
