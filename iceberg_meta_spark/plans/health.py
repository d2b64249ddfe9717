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


def health_report_df(files: DataFrame, col_stats: DataFrame, manifests: DataFrame, ranges: DataFrame) -> DataFrame:
    """Long-format health report over metadata-shaped inputs.

    Plan shape: each source collapses to ONE single-row aggregate, the five
    1-row frames cross-join (broadcast — free), and one ``stack`` unpivots
    the combined row into the 8-row (section, metric, value) report. A
    union-of-branches formulation re-scans every source once per metric
    (18 FileScans at 8 branches); this reads files twice (whole-table +
    per-partition grain) and every other source once — 5 scans total,
    whatever the metric count grows to.
    """
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

    skew = F.when(F.col("avg_fc") == 0, F.lit(0.0)).otherwise(
        F.round(F.col("max_fc") / F.col("avg_fc"), 4)
    )
    combined = (
        file_metrics.crossJoin(F.broadcast(part_metrics))
        .crossJoin(F.broadcast(col_metrics))
        .crossJoin(F.broadcast(man_metrics))
        .crossJoin(F.broadcast(ov))
        .select(
            F.col("fc").cast("double").alias("v_fc"),
            F.col("ts").cast("double").alias("v_ts"),
            F.col("sf").cast("double").alias("v_sf"),
            F.col("pc").cast("double").alias("v_pc"),
            skew.cast("double").alias("v_skew"),
            F.round(F.col("null_pct"), 4).cast("double").alias("v_null"),
            F.col("dm").cast("double").alias("v_dm"),
            F.col("overlapping_files").cast("double").alias("v_ov"),
        )
    )
    return combined.selectExpr(
        """stack(8,
           'files', 'file_count', v_fc,
           'files', 'total_size', v_ts,
           'files', 'small_files', v_sf,
           'partitions', 'partition_count', v_pc,
           'partitions', 'max_skew_ratio', v_skew,
           'columns', 'overall_null_pct', v_null,
           'manifests', 'delete_manifests', v_dm,
           'overlap', 'overlapping_files', v_ov
        ) AS (section, metric, value)"""
    )


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
