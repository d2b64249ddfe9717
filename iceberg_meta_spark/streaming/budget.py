"""Continuously-maintained token-budget thresholds: the streaming half of
``pipeline/sampling.token_budget_mix``.

As a crawl accumulates, "the best ~B tokens per language" is a moving
target — the score threshold that fit the budget yesterday over-admits
today. The batch kernel already answers from a (lang, score-bucket)
HISTOGRAM, and histograms are mergeable: each micro-batch's bucket
partials fold into a keyed store via ``foreachBatch`` (same high-water
``batch_id`` replay guard as ``streaming/incremental.py`` — effectively
exactly-once), and the per-language threshold is recomputed from the
bounded store (langs x buckets rows) after every merge. Per-batch work is
O(batch + touched buckets), never O(corpus); the stored histogram IS the
batch kernel's intermediate, so the maintained thresholds are identical
to re-running ``token_budget_mix`` over everything seen so far — pinned
by the live test.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _batch_histogram(batch: DataFrame, bucket_micro: int) -> DataFrame:
    from iceberg_meta_spark.pipeline.classifier import _feature_cols, score_expr

    return (
        batch.select("lang", *_feature_cols())
        .withColumn("score_micro", score_expr())
        .select(
            "lang",
            F.col("f1").alias("n_tokens"),
            F.expr(f"(score_micro + 10000000) DIV {bucket_micro}").alias("bucket"),
        )
        .groupBy("lang", "bucket")
        .agg(
            F.sum("n_tokens").cast("long").alias("tok"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    )


def thresholds_from_store(store: DataFrame, budget_tokens: int) -> DataFrame:
    """(lang, thr_bucket) from an accumulated (lang, bucket, tok) histogram
    — the same descending-bucket prefix rule as the batch kernel, computed
    over the bounded store."""
    from pyspark.sql import Window

    desc = (
        Window.partitionBy("lang")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = store.withColumn("cum_tok", F.sum("tok").over(desc))
    return (
        cum.where(F.col("cum_tok") - F.col("tok") < budget_tokens)
        .groupBy("lang")
        .agg(F.min("bucket").alias("thr_bucket"))
    )


def budget_merge_sink(
    state_dir: str, budget_tokens: int, bucket_micro: int = 50_000
):
    """``foreachBatch`` function folding each document micro-batch into the
    per-(lang, bucket) histogram store and refreshing the threshold table
    at ``state_dir + '__thresholds'``."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        partial = _batch_histogram(batch, bucket_micro).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        try:
            old = spark.read.parquet(state_dir)
        except AnalysisException as exc:
            msg = str(exc)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            merged = partial
        else:
            # NULL high-water mark (zero-row state table) must not be
            # compared against batch_id — see quota.py's guard.
            old_max = old.agg(F.max("batch_id")).collect()[0][0]
            if old_max is not None and old_max >= batch_id:
                return  # replayed micro-batch: already folded in
            merged = (
                old.unionByName(partial)
                .groupBy("lang", "bucket")
                .agg(
                    F.sum("tok").alias("tok"),
                    F.sum("n_docs").alias("n_docs"),
                    F.max("batch_id").alias("batch_id"),
                )
            )
        merged.write.mode("overwrite").parquet(state_dir + "__tmp")
        spark.read.parquet(state_dir + "__tmp").write.mode("overwrite").parquet(
            state_dir
        )
        thresholds_from_store(
            spark.read.parquet(state_dir), budget_tokens
        ).write.mode("overwrite").parquet(state_dir + "__thresholds")

    return apply


def maintain_budget_thresholds(
    doc_stream: DataFrame,
    state_dir: str,
    budget_tokens: int,
    bucket_micro: int = 50_000,
):
    """Wire a documents stream into :func:`budget_merge_sink`; returns the
    started StreamingQuery (caller owns stop())."""
    return (
        doc_stream.writeStream.outputMode("update")
        .foreachBatch(budget_merge_sink(state_dir, budget_tokens, bucket_micro))
        .start()
    )
