"""Composite command queries beyond `health` (reference §2.11 DAGs):
`summary` and `snapshot-detail`, bound to the driver contract through the
fixture source. The api.py functions are the user entry points; these
registrations make the same DAGs oracle-verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iceberg_meta_spark import api
from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.fixtures import oracle_query


@register(
    "summary_report",
    oracle=oracle_query(
        """
        , totals AS (
            SELECT CAST(count(*) AS BIGINT) AS file_count,
                   CAST(sum(file_size_in_bytes) AS BIGINT) AS total_size,
                   CAST(sum(record_count) AS BIGINT) AS total_records,
                   CAST(count(DISTINCT part_key) AS BIGINT) AS partition_count
            FROM meta_files),
        sc AS (SELECT CAST(count(*) AS BIGINT) AS snapshot_count FROM meta_snapshots),
        h AS (SELECT total_size,
                     CASE WHEN total_size < 1024 THEN concat(CAST(total_size * 10 // 10 AS STRING), '.', CAST(total_size * 10 % 10 AS STRING), ' B')
                          WHEN total_size < 1048576 THEN concat(CAST((total_size * 10 + 512) // 1024 // 10 AS STRING), '.', CAST((total_size * 10 + 512) // 1024 % 10 AS STRING), ' KB')
                          WHEN total_size < 1073741824 THEN concat(CAST((total_size * 10 + 524288) // 1048576 // 10 AS STRING), '.', CAST((total_size * 10 + 524288) // 1048576 % 10 AS STRING), ' MB')
                          WHEN total_size < 1099511627776 THEN concat(CAST((total_size * 10 + 536870912) // 1073741824 // 10 AS STRING), '.', CAST((total_size * 10 + 536870912) // 1073741824 % 10 AS STRING), ' GB')
                          WHEN total_size < 1125899906842624 THEN concat(CAST((total_size * 10 + 549755813888) // 1099511627776 // 10 AS STRING), '.', CAST((total_size * 10 + 549755813888) // 1099511627776 % 10 AS STRING), ' TB')
                          ELSE concat(CAST((total_size * 10 + 562949953421312) // 1125899906842624 // 10 AS STRING), '.', CAST((total_size * 10 + 562949953421312) // 1125899906842624 % 10 AS STRING), ' PB')
                     END AS total_size_h
              FROM totals)
        SELECT t.file_count, t.total_size, h.total_size_h, t.total_records,
               t.partition_count, sc.snapshot_count
        FROM totals t, sc, h
        """,
        "meta_files",
        "meta_snapshots",
    ),
    tags=("bench",),
    doc="Composite `summary` command DAG (reference cli.py:1194-1207): "
    "A8 totals + partition count + snapshot count + humanized size (F1)",
)
def summary_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return api.summary(api.FixtureSource(spark, sf_dir))


@register(
    "snapshot_detail",
    oracle=oracle_query(
        """
        SELECT CAST(1 AS BIGINT) AS snapshot_id,
               CAST(count(*) AS BIGINT) AS file_count,
               CAST(sum(file_size_in_bytes) AS BIGINT) AS total_size,
               CAST(sum(record_count) AS BIGINT) AS total_records,
               CAST(count(DISTINCT part_key) AS BIGINT) AS partition_count
        FROM meta_files WHERE snapshot_id = 1
        """,
        "meta_files",
    ),
    doc="Composite `snapshot-detail` command DAG (reference cli.py:1174-1188): "
    "P1 snapshot filter + A8 totals over that snapshot's files",
)
def snapshot_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    return api.snapshot_detail(api.FixtureSource(spark, sf_dir), snapshot_id=1)
