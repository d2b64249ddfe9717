"""Metadata-shaped fixture derivations (shared Spark/DuckDB SQL).

The reference's kernels consume the Iceberg metadata tree: data files,
snapshots, manifests, schema versions, table listings (reference
formatters.py:263-281, 156-173, 193-220; FIXTURES.md §2). The driver's
correctness oracle, however, runs over plain TPC-H-ish parquet. Bridge: each
metadata shape is *derived deterministically* from a base table with a single
dialect-neutral SQL text that BOTH engines execute — Spark via ``spark.sql``
over temp views (fully Catalyst-optimized: the derivation is a projection that
fuses into the scan) and DuckDB via a WITH-clause in the oracle SQL. One text,
two engines, zero drift.

Dialect-neutral subset used: concat() with explicit CAST(.. AS STRING)
(DuckDB accepts STRING as a VARCHAR alias), floor(), %, CASE, IN, lower(),
DATE literals. Divisions are guarded (ANSI mode errors on div-by-zero).
The single per-engine difference: Spark reads events.ts as epoch-nanos bigint
(legacy.parquet.nanosAsLong), DuckDB as TIMESTAMP_NS -> ``epoch_ns(ts)``;
the ``{TS_NS}`` placeholder covers it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iceberg_meta_spark.sources.parquet import register_views

# Reference: small-file threshold 32 MiB (formatters.py:340).
SMALL_FILE_THRESHOLD = 32 * 1024 * 1024

# Fixed "now" for freshness/staleness predicates (reference tui/widgets.py:789-817
# uses wall-clock; we pin it for deterministic oracle parity). 2024-04-15 UTC.
NOW_MS = 1713139200000

# ---------------------------------------------------------------------------
# One dialect-neutral SELECT per metadata shape.
# ---------------------------------------------------------------------------

CTE: dict[str, str] = {
    # One row per data file; two snapshot views keyed by l_linestatus so diff
    # kernels have overlapping-but-different file sets (reference
    # formatters.py:263-281 shape; FIXTURES.md meta_files).
    "meta_files": """
        SELECT
          CASE WHEN l_linestatus = 'F' THEN 1 ELSE 2 END AS snapshot_id,
          concat('file_', CAST(l_orderkey AS STRING), '_', CAST(l_linenumber AS STRING)) AS file_path,
          'PARQUET' AS file_format,
          l_returnflag AS part_key,
          concat('manifest_', CAST(l_orderkey % 500 AS STRING)) AS manifest_path,
          CAST(floor(l_quantity) AS BIGINT) AS record_count,
          CAST(floor(l_extendedprice * 1024) AS BIGINT) AS file_size_in_bytes
        FROM lineitem
    """,
    # One row per (file, field): pre-flattened column stats (reference reads
    # these as map<field_id, long> columns, formatters.py:522-540; flattened
    # for oracle parity per SURVEY §7.3).
    "meta_column_stats": """
        SELECT
          concat('file_', CAST(l_orderkey AS STRING), '_', CAST(l_linenumber AS STRING)) AS file_path,
          CAST(l_partkey % 16 + 1 AS INT) AS field_id,
          CAST(floor(l_quantity) AS BIGINT) AS value_count,
          CAST(floor(l_quantity * l_discount) AS BIGINT) AS null_count,
          CAST(floor(l_extendedprice / 10) AS BIGINT) AS column_size,
          l_partkey AS lower_bound,
          l_partkey + CAST(floor(l_quantity) AS BIGINT) * 25 AS upper_bound
        FROM lineitem
    """,
    # Snapshot log (reference formatters.py:156-173 + summary-map extraction
    # S8 at 953-965; committed_us is epoch micros).
    "meta_snapshots": """
        SELECT
          event_id AS snapshot_id,
          CASE WHEN event_id = 0 THEN NULL ELSE event_id - 1 END AS parent_id,
          {TS_US} AS committed_us,
          CASE WHEN event_type = 'purchase' THEN 'overwrite'
               WHEN event_type = 'error' THEN 'delete'
               ELSE 'append' END AS operation,
          CAST(floor(value * 1000) AS BIGINT) AS added_records,
          CASE WHEN event_type IN ('purchase', 'error')
               THEN CAST(floor(value * 100) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS deleted_records,
          CAST(event_id % 500 + 1 AS BIGINT) AS total_data_files,
          CAST(floor(value * 10000) AS BIGINT) AS total_records,
          CAST(floor(value * 1000000) AS BIGINT) AS total_files_size
        FROM events
    """,
    # One row per manifest (reference formatters.py:193-220; content 0=data,
    # 1=deletes per formatters.py:452-456).
    "meta_manifests": """
        SELECT
          event_id % 100 AS snapshot_id,
          concat('manifest_', CAST(event_id AS STRING)) AS manifest_path,
          CAST(floor(value * 50000) AS BIGINT) AS manifest_length,
          CAST(event_id % 3 AS INT) AS partition_spec_id,
          CAST(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS INT) AS content,
          CAST(event_id % 20 AS INT) AS added_files_count,
          CAST(event_id % 13 AS INT) AS existing_files_count,
          CAST(CASE WHEN event_id % 7 = 0 THEN event_id % 5 ELSE 0 END AS INT) AS deleted_files_count
        FROM events
    """,
    # Two schema versions per table keyed by stable field_id, with removals
    # (v1-only), additions (v2-only), renames and type changes (reference
    # tui/widgets.py:310-350 diff input shape; FIXTURES.md meta_schema_fields).
    "meta_schema_fields": """
        SELECT
          concat('tbl_', CAST(p_partkey % 10 AS STRING)) AS table_name,
          CAST(1 AS INT) AS schema_id,
          CAST(p_partkey AS INT) AS field_id,
          lower(p_name) AS name,
          p_type AS type,
          p_size > 25 AS required
        FROM part WHERE p_partkey % 5 <> 0
        UNION ALL
        SELECT
          concat('tbl_', CAST(p_partkey % 10 AS STRING)) AS table_name,
          CAST(2 AS INT) AS schema_id,
          CAST(p_partkey AS INT) AS field_id,
          CASE WHEN p_partkey % 11 = 0 THEN concat(lower(p_name), '_v2') ELSE lower(p_name) END AS name,
          CASE WHEN p_partkey % 13 = 0 THEN 'string' ELSE p_type END AS type,
          p_size > 25 AS required
        FROM part WHERE p_partkey % 7 <> 0
    """,
    # One row per table: namespace rollup / freshness input (reference
    # _table_meta_summary formatters.py:1313-1382; FIXTURES.md meta_tables).
    "meta_tables": """
        SELECT
          c_mktsegment AS namespace,
          concat('tbl_', CAST(c_custkey AS STRING)) AS table_name,
          CAST(1 + c_custkey % 2 AS INT) AS format_version,
          CAST(c_nationkey * 3 + c_custkey % 7 AS INT) AS snapshot_count,
          1704067200000 + (c_custkey % 90) * 86400000 AS last_updated_ms,
          CAST(c_nationkey + 1 AS BIGINT) AS total_files,
          CAST(floor(c_acctbal * 100) AS BIGINT) AS total_records,
          CAST(floor(c_acctbal * 1000000) AS BIGINT) AS total_size
        FROM customer
    """,
    # Per-file value ranges for the overlap kernels (reference decodes
    # first-partition-column bounds, formatters.py:606-658; monster-table
    # analog: heavily overlapping ranges).
    "file_ranges": """
        SELECT
          concat('pf_', CAST(p_partkey AS STRING)) AS file_path,
          CAST(floor(p_retailprice) AS BIGINT) AS lo,
          CAST(floor(p_retailprice) AS BIGINT) + CAST(p_size AS BIGINT) * 40 AS hi
        FROM part
    """,
    # Object-store listing for orphan-file detection: every metadata-tracked
    # file (same derivation as meta_files) plus abandoned tmp files no
    # snapshot references (the write-path debris `remove_orphan_files`
    # procedures clean up).
    "storage_files": """
        SELECT
          concat('file_', CAST(l_orderkey AS STRING), '_', CAST(l_linenumber AS STRING)) AS file_path,
          CAST(floor(l_extendedprice * 1024) AS BIGINT) AS file_size_in_bytes
        FROM lineitem
        UNION ALL
        SELECT
          concat('tmp_', CAST(o_orderkey AS STRING)) AS file_path,
          CAST(floor(o_totalprice * 512) AS BIGINT) AS file_size_in_bytes
        FROM orders WHERE o_orderkey % 13 = 0
    """,
}

# Base tables each derivation reads.
DEPS: dict[str, tuple[str, ...]] = {
    "meta_files": ("lineitem",),
    "meta_column_stats": ("lineitem",),
    "meta_snapshots": ("events",),
    "meta_manifests": ("events",),
    "meta_schema_fields": ("part",),
    "meta_tables": ("customer",),
    "file_ranges": ("part",),
    "storage_files": ("lineitem", "orders"),
}


def cte_sql(name: str, engine: str) -> str:
    """The derivation SELECT for one engine ('spark' | 'duckdb')."""
    # Spark reads events.ts as epoch-nanos bigint (nanosAsLong); DuckDB reads
    # it as a timestamp it truncates to µs -> align both sides on epoch-µs.
    ts_us = "(ts DIV 1000)" if engine == "spark" else "epoch_us(ts)"
    return CTE[name].format(TS_US=ts_us)


def derive(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Materialize one metadata-shaped DataFrame (lazy; fuses into the scan)."""
    register_views(spark, sf_dir, DEPS[name])
    return spark.sql(cte_sql(name, "spark"))


def oracle_query(body: str, *fixture_names: str) -> str:
    """Compose a DuckDB oracle: WITH <fixtures> <body>."""
    if not fixture_names:
        return body
    withs = ",\n".join(f"{n} AS ({cte_sql(n, 'duckdb')})" for n in fixture_names)
    return f"WITH {withs}\n{body}"
