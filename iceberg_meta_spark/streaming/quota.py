"""Continuously-maintained per-source quota: the streaming half of
``queries.text.source_quota_cap``.

The batch kernel keeps the Q best-classifier-scored docs per source (the
Gopher/CommonCrawl "domain cap"). At ingest that keep-set is a moving
target: a new crawl batch may displace yesterday's weakest survivor. The
key property making it streamable is that top-Q is MERGEABLE — top-Q of
(old keep-set ∪ batch's local top-Q) equals top-Q of everything seen —
so the state is the keep-set itself: at most Q rows per source, folded
per micro-batch via ``foreachBatch`` with the same high-water
``batch_id`` replay guard as ``streaming/budget.py`` (effectively
exactly-once). Per-batch work is O(batch + touched-sources × Q), never
O(corpus); after any prefix of the stream the store is identical to the
batch kernel's keep-set over everything seen so far — pinned live.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STORE_SCHEMA = "doc_id long, source string, n_chars long, score_micro long, batch_id long"


def _batch_topq(batch: DataFrame, q: int) -> DataFrame:
    """Score a micro-batch and keep its local top-Q per source — at most
    Q rows per (source in batch), the only part of the batch that can
    ever enter the store."""
    from pyspark.sql import Window

    from iceberg_meta_spark.pipeline import classifier

    scored = classifier.features_frame(
        batch, extra_cols=("source", "n_chars")
    ).select("doc_id", "source", "n_chars", classifier.score_expr())
    w = Window.partitionBy("source").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= q)
        .drop("rk")
    )


def merge_topq(store: DataFrame, partial: DataFrame, q: int) -> DataFrame:
    """top-Q(store ∪ partial) per source — the mergeable fold step."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        store.unionByName(partial)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= q)
        .drop("rk")
    )


def quota_merge_sink(state_dir: str, q: int):
    """``foreachBatch`` function folding each document micro-batch into
    the per-source keep-set store (≤ Q rows per source)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        partial = _batch_topq(batch, q).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        try:
            old = spark.read.schema(STORE_SCHEMA).parquet(state_dir)
            # force the read so a missing path surfaces here, not at write
            old_max = old.agg(F.max("batch_id")).collect()[0][0]
        except AnalysisException as exc:
            msg = str(exc)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            merged = partial
        else:
            if old_max is not None and old_max >= batch_id:
                return  # replayed micro-batch: already folded in
            merged = merge_topq(old, partial, q)
        merged.write.mode("overwrite").parquet(state_dir + "__tmp")
        spark.read.parquet(state_dir + "__tmp").write.mode("overwrite").parquet(
            state_dir
        )

    return apply


def maintain_source_quota(doc_stream: DataFrame, state_dir: str, q: int):
    """Wire a documents stream into :func:`quota_merge_sink`; returns the
    started StreamingQuery (caller owns stop())."""
    return (
        doc_stream.writeStream.outputMode("update")
        .foreachBatch(quota_merge_sink(state_dir, q))
        .start()
    )
