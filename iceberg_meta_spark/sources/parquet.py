"""Parquet source adapter for the driver's synthetic tables.

Loads ``/root/testdata/sf*/{table}.parquet`` as DataFrames and registers them
as temp views so that fixture derivations (dialect-neutral SQL, see
``fixtures.py``) can run through ``spark.sql``.

Scale note: these are plain ``spark.read.parquet`` scans — columnar,
vectorized, filter-pushdown-enabled. On a real deployment the same adapter
points at an Iceberg catalog instead (see ``sources/iceberg.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in BASE_TABLES:
        raise ValueError(f"unknown table {name!r}")
    prepare_session(spark)  # nanosAsLong for events.ts, AQE
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = BASE_TABLES) -> None:
    """Register the base tables as session temp views (idempotent per call)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
