"""Skew-mitigation utilities: salted joins and salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew at
runtime; salting is the plan-level tool for the cases AQE can't fix — a
broadcast-ineligible join where one key holds a disproportionate share of
rows (the partition-skew situation A4 *detects*, this module *mitigates*),
or a groupBy whose hot key floods one reducer.

Pattern (public knowledge, e.g. the Spark docs' skew guidance): explode the
small side into N salt replicas, salt the big side randomly-but-
deterministically, join on (key, salt) — the hot key's rows spread over N
reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(col: Column, n: int) -> Column:
    """Deterministic salt in [0, n): hash-mod, stable across retries
    (rand() would break task-retry idempotence)."""
    return F.pmod(F.xxhash64(col), F.lit(n)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Join ``big`` with ``small`` on ``key``, spreading each key over
    ``n_salts`` partitions.

    The big side gets a per-row salt (hashed from ``salt_by`` or a stable
    row discriminator); the small side is exploded ×n_salts so every
    (key, salt) bucket can match. Shuffle cost: small side replicated
    n_salts times — only worth it when the key histogram is heavy-tailed.
    """
    discriminator = F.col(salt_by) if salt_by else F.monotonically_increasing_id().cast("string")
    b = big.withColumn("__salt", _salt_of(discriminator, n_salts))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0).cast("int"), F.lit(n_salts - 1).cast("int")))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-stage aggregation for hot-key counts: partial count per
    (key, salt) — spreads the hot key over n_salts reducers — then final
    re-aggregate per key (tiny: n_salts rows per key).

    Spark's partial aggregation usually makes this unnecessary; it matters
    when the payload per group is large (collect_list/distinct) or partial
    aggregation is defeated.
    """
    salted = df.withColumn(
        "__salt", _salt_of(F.monotonically_increasing_id().cast("string"), n_salts)
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias("n"))
