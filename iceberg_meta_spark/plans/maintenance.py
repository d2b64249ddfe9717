"""Composite maintenance report: the planning counterpart of `health`.

The reference's health report *detects* maintenance debt; this composite
rolls the three maintenance planners (operators/maintenance.py) into one
long-format (section, metric, value) result — what an operator pages
through before kicking off rewrites: how much a compaction pass would
rewrite, how many snapshots a retention pass would expire, how much orphan
debris a cleanup pass would delete.

Same sharing posture as the health composite: the derived frames feed
multiple sections and Catalyst dedupes the scans across the union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark import operators as ops
from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.fixtures import SMALL_FILE_THRESHOLD, derive, oracle_query

# Mirror the standalone maintenance queries' pinned policy (queries/meta_ext.py).
from iceberg_meta_spark.queries.meta_ext import (  # noqa: E402
    _COMPACT_TARGET,
    _EXPIRY_KEEP,
    _EXPIRY_MAX_AGE_US,
    _EXPIRY_NOW_US,
)


def maintenance_report_df(
    files: DataFrame, snapshots: DataFrame, storage: DataFrame
) -> DataFrame:
    zero = F.lit(0).cast("long")
    comp = ops.compaction_plan(files, target_bytes=_COMPACT_TARGET).agg(
        F.count(F.lit(1)).alias("groups"),
        F.coalesce(F.sum("n_files"), zero).alias("files"),
        F.coalesce(F.sum("group_bytes"), zero).alias("bytes"),
    )
    exp = ops.snapshot_expiry(
        snapshots,
        keep_last=_EXPIRY_KEEP,
        max_age_us=_EXPIRY_MAX_AGE_US,
        now_us=_EXPIRY_NOW_US,
    ).agg(
        F.count(F.lit(1)).alias("snaps"),
        F.coalesce(F.sum("total_data_files"), zero).alias("files"),
    )
    orp = ops.orphan_files(storage, files).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("file_size_in_bytes"), zero).alias("obytes"),
    )
    # One 1-row frame per planner, cross-joined (broadcast — free) and
    # unpivoted with a single stack: each planner's subtree executes once,
    # instead of once per union branch (same restructure as the health
    # composite — see plans/health.py).
    combined = (
        comp.crossJoin(F.broadcast(exp.withColumnsRenamed({"files": "efiles"})))
        .crossJoin(F.broadcast(orp))
        .select(
            F.col("groups").cast("double").alias("v_groups"),
            F.col("files").cast("double").alias("v_files"),
            F.col("bytes").cast("double").alias("v_bytes"),
            F.col("snaps").cast("double").alias("v_snaps"),
            F.col("efiles").cast("double").alias("v_efiles"),
            F.col("n").cast("double").alias("v_n"),
            F.col("obytes").cast("double").alias("v_obytes"),
        )
    )
    return combined.selectExpr(
        """stack(7,
           'compaction', 'rewrite_groups', v_groups,
           'compaction', 'files_to_rewrite', v_files,
           'compaction', 'bytes_to_rewrite', v_bytes,
           'expiry', 'expired_snapshots', v_snaps,
           'expiry', 'reclaimable_file_refs', v_efiles,
           'orphans', 'orphan_files', v_n,
           'orphans', 'orphan_bytes', v_obytes
        ) AS (section, metric, value)"""
    )


@register(
    "maintenance_report",
    oracle=oracle_query(
        f"""
        , small AS (SELECT * FROM meta_files
                    WHERE file_size_in_bytes < {SMALL_FILE_THRESHOLD}),
        offs AS (SELECT snapshot_id, part_key, file_size_in_bytes, record_count,
                        sum(file_size_in_bytes) OVER (
                            PARTITION BY snapshot_id, part_key
                            ORDER BY file_path, file_size_in_bytes, record_count
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
                 FROM small),
        groups AS (SELECT snapshot_id, part_key,
                          (end_off - file_size_in_bytes) // {_COMPACT_TARGET} AS group_id,
                          CAST(count(*) AS BIGINT) AS n_files,
                          CAST(sum(file_size_in_bytes) AS BIGINT) AS group_bytes
                   FROM offs GROUP BY snapshot_id, part_key, group_id),
        ranked AS (SELECT *, row_number() OVER (
                       ORDER BY committed_us DESC, snapshot_id DESC) AS rn
                   FROM meta_snapshots),
        expired AS (SELECT * FROM ranked
                    WHERE rn > {_EXPIRY_KEEP}
                      AND committed_us < {_EXPIRY_NOW_US - _EXPIRY_MAX_AGE_US}),
        orph AS (SELECT s.file_path, s.file_size_in_bytes FROM storage_files s
                 WHERE NOT EXISTS (SELECT 1 FROM meta_files m
                                   WHERE m.file_path = s.file_path))
        SELECT 'compaction' AS section, 'rewrite_groups' AS metric,
               CAST(count(*) AS DOUBLE) AS value FROM groups
        UNION ALL
        SELECT 'compaction', 'files_to_rewrite',
               CAST(coalesce(CAST(sum(n_files) AS BIGINT), 0) AS DOUBLE) FROM groups
        UNION ALL
        SELECT 'compaction', 'bytes_to_rewrite',
               CAST(coalesce(CAST(sum(group_bytes) AS BIGINT), 0) AS DOUBLE) FROM groups
        UNION ALL
        SELECT 'expiry', 'expired_snapshots', CAST(count(*) AS DOUBLE) FROM expired
        UNION ALL
        SELECT 'expiry', 'reclaimable_file_refs',
               CAST(coalesce(CAST(sum(total_data_files) AS BIGINT), 0) AS DOUBLE) FROM expired
        UNION ALL
        SELECT 'orphans', 'orphan_files', CAST(count(*) AS DOUBLE) FROM orph
        UNION ALL
        SELECT 'orphans', 'orphan_bytes',
               CAST(coalesce(CAST(sum(file_size_in_bytes) AS BIGINT), 0) AS DOUBLE) FROM orph
        """,
        "meta_files",
        "meta_snapshots",
        "storage_files",
    ),
    tags=("maintenance", "composite"),
    doc="Composite maintenance report: compaction + expiry + orphan "
    "planners rolled into one long-format result (the planning "
    "counterpart of the reference's health report)",
)
def maintenance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return maintenance_report_df(
        derive(spark, sf_dir, "meta_files"),
        derive(spark, sf_dir, "meta_snapshots"),
        derive(spark, sf_dir, "storage_files"),
    )
