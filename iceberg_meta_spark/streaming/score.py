"""Streaming quality-classifier scoring: filter documents at ingest.

The deployment shape of the frozen linear filter
(pipeline/classifier.py): training happened offline (Gram aggregate +
driver-side ridge solve), the committed integer weights ride in the plan,
and every newly-crawled document is scored THE MOMENT it arrives — before
it ever lands in the corpus, so downstream storage and dedup never see
the rejects. Scoring is pure stateless column math (no state store, no
watermark, no shuffle), which is exactly why the same expression runs
unchanged on a batch frame and a Structured Streaming source, emitting
bit-identical integer scores either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline.classifier import (
    DECISION_MICRO,
    _feature_cols,
    score_expr,
)


def _decision() -> Column:
    return (
        F.when(F.col("score_micro") >= DECISION_MICRO, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("decision")
    )


def score_stream(doc_stream: DataFrame) -> DataFrame:
    """Attach (score_micro, decision) to a documents stream.

    Works identically on batch and streaming frames — the test pins the
    stream output against the batch twin on the same rows.
    """
    return (
        doc_stream.select("doc_id", "lang", "text", *_feature_cols())
        .withColumn("score_micro", score_expr())
        .withColumn("decision", _decision())
        .select("doc_id", "lang", "score_micro", "decision")
    )
