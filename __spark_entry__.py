"""Driver contract for the spark-graft builder (PySpark target).

Thin views over ``iceberg_meta_spark.registry``: every implemented operator
from SURVEY.md §2 (plus the LLM-pipeline extensions) registers a
``(spark_fn, oracle_sql)`` pair there; this module just exposes them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_meta_spark.registry import load_all  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the composite health report (reference `health`
    command) over sf0.001."""
    registry = load_all()
    return registry["health_report"].spark_fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
