"""Parquet source adapter for the driver's synthetic tables.

Loads ``/root/testdata/sf*/{table}.parquet`` as DataFrames and registers them
as temp views so that fixture derivations (dialect-neutral SQL, see
``fixtures.py``) can run through ``spark.sql``.

Scale note: these are plain ``spark.read.parquet`` scans — columnar,
vectorized, filter-pushdown-enabled. On a real deployment the same adapter
points at an Iceberg catalog instead (see ``sources/iceberg.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_meta_spark.session import prepare_session

BASE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Opt-in hot-table cache (SPARK_GRAFT_CACHE=1 or enable_cache()). The driver's
# testdata parquet has a single row group per file, so a cold scan runs on one
# task no matter how many cores exist; repartition+persist spreads the cached
# blocks across the cluster, which is how a real deployment serves repeated
# metadata analytics (the reference equivalently holds its file list in
# process memory between commands). Keyed per (session, sf_dir, table);
# correctness paths never require it.
_CACHE: dict[tuple[int, str, str], DataFrame] = {}
_CACHE_ENABLED = os.environ.get("SPARK_GRAFT_CACHE", "") == "1"

# Scan-parallelism floor for the UNCACHED path (guide §2.5 "one huge
# unsplittable file ... repartition immediately after the read"): the
# testdata parquet is one row group per table, so a cold scan plans one
# task and every map-heavy pipeline stage (explode, levenshtein, md5,
# tokenize, Arrow kernels) runs serially until its first exchange —
# measured 10.1 s of the 10.9 s cold customer_fuzzy_matches run at sf0.1
# on 32 cores. Two guards keep it from becoming a tax:
#   * it only fires when the scan plans FEWER partitions than the cluster
#     has slots (at data scale scans have thousands of splits — no-op);
#   * it only fires when the table's on-disk bytes are under
#     SPARK_GRAFT_SCAN_FLOOR_BYTES (default 1 MB): the round-robin
#     exchange it inserts shuffles EVERY row, which is free for a 0.3 MB
#     customer table but measurably regressed scan->aggregate queries
#     over the 2-10 MB events/orders/lineitem tables (canary-normalized
#     +0.25-0.3 s each: map-side combine beats repartition there, the
#     serial map work being only cheap column arithmetic). The winners
#     (customer, documents, embeddings — levenshtein/tokenize/Arrow-kernel
#     pipelines) are all under 1 MB at every SF the driver benches.
# Column pruning and filter pushdown travel through Repartition, so
# PushedFilters / ReadSchema at the scan are unchanged. Memoized per
# (session, dir, table): the probe costs one driver-side plan, no job.
_SCAN_FLOOR_BYTES = int(os.environ.get("SPARK_GRAFT_SCAN_FLOOR_BYTES", 1024 * 1024))
_SCAN_PARTS: dict[tuple[int, str, str], int] = {}


def _table_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    return total


def _parallelize_scan(
    spark: SparkSession, df: DataFrame, path: str, key: tuple
) -> DataFrame:
    par = spark.sparkContext.defaultParallelism
    if key not in _SCAN_PARTS:
        small = _table_bytes(path) < _SCAN_FLOOR_BYTES
        _SCAN_PARTS[key] = df.rdd.getNumPartitions() if small else par
    return df.repartition(par) if _SCAN_PARTS[key] < par else df


def enable_cache(on: bool = True) -> None:
    global _CACHE_ENABLED
    _CACHE_ENABLED = on


def _normalize(df: DataFrame, name: str) -> DataFrame:
    """Guard against testdata schema drift on ``events.ts``.

    Earlier driver drops stored TIMESTAMP(NANOS), which ``nanosAsLong`` reads
    as epoch-nanos bigint; later drops store timestamp[us], which Spark reads
    as TIMESTAMP_NTZ. Every kernel consumes epoch-nanos bigint (``ts DIV
    1000`` -> micros, matching DuckDB ``epoch_us(ts)``), so convert timestamp
    types here. The session zone is pinned to UTC (session.py) so the
    NTZ->TIMESTAMP cast is an identity on the wall-clock value.
    """
    if name != "events":
        return df
    dt = df.schema["ts"].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        ts = F.col("ts").cast("timestamp") if isinstance(dt, T.TimestampNTZType) else F.col("ts")
        df = df.withColumn("ts", (F.unix_micros(ts) * F.lit(1000)).cast("long"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in BASE_TABLES:
        raise ValueError(f"unknown table {name!r}")
    prepare_session(spark)  # nanosAsLong for events.ts, AQE, UTC session tz
    if _CACHE_ENABLED:
        key = (id(spark), sf_dir, name)
        if key not in _CACHE:
            parallelism = spark.sparkContext.defaultParallelism
            df = _normalize(spark.read.parquet(f"{sf_dir}/{name}.parquet"), name)
            df = df.repartition(parallelism).persist()
            df.count()  # materialize eagerly so queries never pay the scan
            _CACHE[key] = df
        return _CACHE[key]
    path = f"{sf_dir}/{name}.parquet"
    df = _normalize(spark.read.parquet(path), name)
    return _parallelize_scan(spark, df, path, (id(spark), sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = BASE_TABLES) -> None:
    """Register the base tables as session temp views (idempotent per call)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
