"""Query registry: the single source of truth for the driver contract.

Each operator module registers named queries. A query is:

- ``spark_fn(spark, sf_dir) -> DataFrame``  — the Spark-first implementation
- ``oracle``                                — equivalent DuckDB SQL over the
  raw parquet views (``region nation customer supplier part orders lineitem
  events documents embeddings``), or ``None`` for non-SQL-expressible ops
  (driver then records a weaker rows-only check).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry. Column names are aliased identically on both sides (the driver's
comparator sorts columns by name before hashing values).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Modules whose import populates the registry.
#
# ORDER MATTERS for the driver contract: the driver's correctness gate checks
# the first 50 registrations in order.  metadata (29) + pipeline (18) +
# health (1) + commands (2) = exactly 50, so every SURVEY §2 operator and the
# whole LLM-pipeline family sits inside the checked window.  The TPC-H-shaped
# breadth queries in ``queries.analytics`` are supplementary and register
# last; round-2+ additions go in ``queries.extensions`` (loaded last) so they
# never push a critical query out of the window.
_OPERATOR_MODULES = [
    "iceberg_meta_spark.queries.metadata",
    "iceberg_meta_spark.queries.pipeline",
    "iceberg_meta_spark.plans.health",
    "iceberg_meta_spark.plans.commands",
    "iceberg_meta_spark.queries.analytics",
    "iceberg_meta_spark.queries.extensions",
    "iceberg_meta_spark.plans.maintenance",
]


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable:
    """Decorator registering ``fn(spark, sf_dir) -> DataFrame`` as a query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return REGISTRY
