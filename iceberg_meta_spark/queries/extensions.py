"""Round-2+ extension queries.

This module is loaded LAST by the registry (see ``registry._OPERATOR_MODULES``)
so additions here can never push a SURVEY §2-critical query out of the
driver's 50-query correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.parquet import load_table


@register(
    "user_value_deciles_approx",
    oracle=None,  # percentile_approx sketch boundaries are engine-specific;
    # the exact twin user_value_deciles is oracle-gated and
    # test_deciles_approx_matches_exact pins the two together.
    doc="Scale twin of user_value_deciles: decile BOUNDARIES from one "
    "percentile_approx aggregate (1 row, broadcast back), bucket assignment "
    "map-side — no global ntile window funneling every user through a "
    "single partition (the 10⁹-user deployment path)",
)
def user_value_deciles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("total_cents")
    )
    bounds = per_user.agg(
        F.percentile_approx(
            "total_cents", [i / 10 for i in range(1, 10)], 10000
        ).alias("bounds")
    )
    # decile = 1 + #boundaries strictly below the user's total: pure map-side
    # arithmetic against the broadcast 9-element boundary array.
    tiled = per_user.crossJoin(F.broadcast(bounds)).withColumn(
        "decile",
        F.lit(1)
        + F.aggregate(
            F.col("bounds"),
            F.lit(0),
            lambda acc, b: acc + F.when(F.col("total_cents") > b, 1).otherwise(0),
        ),
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("total_cents").alias("min_cents"),
        F.max("total_cents").alias("max_cents"),
    )