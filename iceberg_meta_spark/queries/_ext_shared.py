"""Helpers shared by more than one of the split extension-family
modules (single-family helpers live beside their consumers).

Split from the former monolithic queries/extensions.py (round 7); the
registration order of the full extension family is pinned by
queries/extensions.py::_CANONICAL_ORDER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.parquet import load_table


_BM25_TERMS = ("hash", "join", "spark", "window", "stream")

from iceberg_meta_spark.pipeline import classifier, winnow  # noqa: E402

def _classifier_feature_sql() -> str:
    return """
        x AS (
          SELECT lang,
                 CAST(1 AS BIGINT) AS f0,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS f1,
                 CAST(len(text) AS BIGINT) AS f2,
                 CAST(len(list_filter(string_split(text, ' '),
                      t -> list_contains(['the','a','of','and','to'], t)))
                      AS BIGINT) AS f3,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS f4
          FROM documents),
        xy AS (SELECT *, CAST(CASE WHEN f3 * 16 >= f1 AND f1 >= 24
                              THEN 1 ELSE 0 END AS BIGINT) AS y FROM x)
    """

def _score_sql() -> str:
    w = classifier.SCORE_WEIGHTS_MICRO
    terms = " + ".join(f"({w[i]} * f{i})" for i in range(classifier.N_FEATURES))
    return f"CAST({terms} AS BIGINT)"
