"""Composite command DAGs (reference §2.11): the `health` report.

Reference: ``iceberg-meta health`` composes A1+A2+A3+A4+A5+A6+A7+J3 over one
table (cli.py:1114-1168, formatters.py:375-660). Our composite returns a
long-format (section, metric, value) DataFrame — the flagship query for
``__spark_entry__.entry``.

Scale note: the reference reuses one materialized ``file_rows`` list across
sections; we achieve the same via sharing the derived DataFrames (Catalyst
dedupes scans across the union's branches; at cluster scale one would
``.persist()`` the files frame explicitly across the sections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.fixtures import SMALL_FILE_THRESHOLD, derive, oracle_query


def _metric(section: str, metric: str, value) -> list:
    return [F.lit(section).alias("section"), F.lit(metric).alias("metric"), value.cast("double").alias("value")]


def health_report_df(files: DataFrame, col_stats: DataFrame, manifests: DataFrame, ranges: DataFrame) -> DataFrame:
    """Long-format health report over metadata-shaped inputs."""
    from iceberg_meta_spark.operators.overlap import overlap_sweepline

    # Every aggregate is zero-guarded: an empty table produces the all-zero
    # report shape, never NULLs (reference formatters.py:384-414).
    zero = F.lit(0).cast("long")
    file_metrics = files.agg(
        F.count(F.lit(1)).alias("fc"),
        F.coalesce(F.sum("file_size_in_bytes"), zero).alias("ts"),
        F.coalesce(
            F.sum(F.when(F.col("file_size_in_bytes") < SMALL_FILE_THRESHOLD, 1).otherwise(0)).cast("long"),
            zero,
        ).alias("sf"),
    )
    parts = files.groupBy("part_key").agg(F.count(F.lit(1)).alias("fc"))
    part_metrics = parts.agg(
        F.count(F.lit(1)).alias("pc"),
        F.coalesce(F.max("fc"), zero).alias("max_fc"),
        F.coalesce(F.sum("fc").cast("double") / F.count(F.lit(1)), F.lit(0.0)).alias("avg_fc"),
    )
    col_metrics = col_stats.agg(
        F.coalesce(
            F.when(
                F.coalesce(F.sum("value_count"), zero) == 0, F.lit(0.0)
            ).otherwise(F.lit(100.0) * F.sum("null_count") / F.sum("value_count")),
            F.lit(0.0),
        ).alias("null_pct")
    )
    man_metrics = manifests.agg(
        F.coalesce(
            F.sum(F.when(F.col("content") != 0, 1).otherwise(0)).cast("long"), zero
        ).alias("dm")
    )
    ov = overlap_sweepline(ranges)

    sections = [
        file_metrics.select(*_metric("files", "file_count", F.col("fc"))),
        file_metrics.select(*_metric("files", "total_size", F.col("ts"))),
        file_metrics.select(*_metric("files", "small_files", F.col("sf"))),
        part_metrics.select(*_metric("partitions", "partition_count", F.col("pc"))),
        part_metrics.select(
            *_metric(
                "partitions",
                "max_skew_ratio",
                F.when(F.col("avg_fc") == 0, F.lit(0.0)).otherwise(
                    F.round(F.col("max_fc") / F.col("avg_fc"), 4)
                ),
            )
        ),
        col_metrics.select(*_metric("columns", "overall_null_pct", F.round(F.col("null_pct"), 4))),
        man_metrics.select(*_metric("manifests", "delete_manifests", F.col("dm"))),
        ov.select(*_metric("overlap", "overlapping_files", F.col("overlapping_files"))),
    ]
    out = sections[0]
    for s in sections[1:]:
        out = out.unionByName(s)
    return out


@register(
    "health_report",
    oracle=oracle_query(
        f"""
        , parts AS (SELECT part_key, CAST(count(*) AS BIGINT) AS fc FROM meta_files GROUP BY part_key),
        flagged AS (
            SELECT lo, coalesce(max(hi) OVER (ORDER BY lo, file_path
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= lo, false) AS ov
            FROM file_ranges)
        SELECT 'files' AS section, 'file_count' AS metric, CAST(count(*) AS DOUBLE) AS value FROM meta_files
        UNION ALL
        SELECT 'files', 'total_size', CAST(CAST(sum(file_size_in_bytes) AS BIGINT) AS DOUBLE) FROM meta_files
        UNION ALL
        SELECT 'files', 'small_files', CAST(CAST(sum(CASE WHEN file_size_in_bytes < {SMALL_FILE_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) FROM meta_files
        UNION ALL
        SELECT 'partitions', 'partition_count', CAST(count(*) AS DOUBLE) FROM parts
        UNION ALL
        SELECT 'partitions', 'max_skew_ratio',
               CASE WHEN CAST(sum(fc) AS DOUBLE) / count(*) = 0 THEN CAST(0 AS DOUBLE)
                    ELSE round(max(fc) / (CAST(sum(fc) AS DOUBLE) / count(*)), 4) END
        FROM parts
        UNION ALL
        SELECT 'columns', 'overall_null_pct',
               round(CAST(100 AS DOUBLE) * CAST(sum(null_count) AS BIGINT) / CAST(sum(value_count) AS BIGINT), 4)
        FROM meta_column_stats
        UNION ALL
        SELECT 'manifests', 'delete_manifests',
               CAST(CAST(sum(CASE WHEN content <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
        FROM meta_manifests
        UNION ALL
        SELECT 'overlap', 'overlapping_files',
               CAST(CAST(sum(CASE WHEN ov THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
        FROM flagged
        """,
        "meta_files",
        "meta_column_stats",
        "meta_manifests",
        "file_ranges",
    ),
    tags=("bench", "flagship"),
    doc="Composite health report DAG (reference `health` command, "
    "cli.py:1114-1168): A1+A3+A4+A5+A2+J3 in one long-format result",
)
def health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return health_report_df(
        derive(spark, sf_dir, "meta_files"),
        derive(spark, sf_dir, "meta_column_stats"),
        derive(spark, sf_dir, "meta_manifests"),
        derive(spark, sf_dir, "file_ranges"),
    )
