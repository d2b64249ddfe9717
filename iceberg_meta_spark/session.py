"""SparkSession construction and runtime-conf preparation.

The reference configures its connection via YAML/env (catalog.py:99-142 in the
reference); our equivalent is Spark session conf. Two entry paths:

- ``get_spark()``        — build a tuned local session (tests / bench).
- ``prepare_session()``  — set the *runtime-settable* confs we rely on, on a
                           session we did not build (the driver harness owns
                           the session for ``__spark_entry__`` calls).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs every query path needs.
_RUNTIME_CONFS = {
    # testdata events.parquet stores TIMESTAMP(NANOS) which Spark 4 refuses to
    # read as a timestamp; read it as epoch-nanos bigint instead (exactly what
    # DuckDB's epoch_ns() yields -> stable oracle parity, no tz ambiguity).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive parquet timestamps (TIMESTAMP_NTZ) must map to the same epoch the
    # DuckDB oracle computes; pinning the session zone makes the NTZ->TIMESTAMP
    # cast in sources/parquet.py an identity on the wall-clock value.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed ones.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Row-level runtime filtering: when a selective filter sits on the build
    # side of a shuffle join, inject a bloom filter into the probe-side scan
    # so pruned rows never enter the shuffle. The size thresholds stay at
    # Spark's production defaults (build side <= 10 MB, probe scan >= 10 GB)
    # so this only fires where it pays — i.e. at the 100 TB deployment scale,
    # not in local tests (test_plans pins injection with lowered thresholds).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Let custom Python DataSources (sources/pyds.py) accept pushed filters
    # so filtered rows never cross the Python->JVM boundary.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def prepare_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-created session (idempotent)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable in this deployment -> keep going; only
            # nanosAsLong is strictly required and it is runtime-settable.
            pass
    return spark


def get_spark(app_name: str = "iceberg-meta-spark", cpus: str | None = None) -> SparkSession:
    """Tuned local session. ``cpus`` defaults to $SPARK_GRAFT_CPUS or '*'."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # One shuffle partition per core locally; on a real cluster this is
        # sized to keep post-shuffle partitions ~128-256 MB (AQE coalesces).
        .config("spark.sql.shuffle.partitions", str(os.cpu_count() or 32))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "268435456")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # Console progress bars write \r-terminated noise that lands in the
        # driver's bounded output-tail capture right before bench.py's one
        # JSON line — keep the channel clean.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    return prepare_session(builder.getOrCreate())
