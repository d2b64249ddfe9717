"""Streaming substring-boilerplate detection at ingest.

The batch kernel (``pipeline.dedup.substring_dup_stats``) audits the whole
corpus for duplicated token windows; an ingest pipeline needs the
incremental question — "how much of this newly-crawled document is
boilerplate ALREADY SEEN in the accepted corpus (or repeated inside this
batch)?" — without re-hashing the corpus per micro-batch.

Design mirrors ``streaming/lsh.py``: the accepted corpus is represented by
its window-hash index (one row per (doc_id, window-hash), the same
20-token-window md5 the batch kernel computes, so batch and stream agree on
what collides). Each micro-batch:

1. computes its docs' window hashes (a batch DataFrame inside
   ``foreachBatch``);
2. LEFT SEMI probes the stored index on the hash — O(batch × collisions),
   never a corpus re-scan; history is partition-pruned to prior batches;
3. also counts in-batch cross-doc repeats (the batch kernel's rule applied
   within the batch);
4. writes per-doc stats (n_windows, n_dup_windows, dup_permille) to
   ``stats_dir`` and appends its window rows to the store under
   ``batch_id=<id>``, so a replayed micro-batch overwrites its own
   partition — idempotent under at-least-once delivery.

Unlike the batch audit, the verdict is prefix-causal: a document is scored
against what the corpus contained WHEN IT ARRIVED (an earlier doc is not
retro-flagged when its twin arrives later) — exactly the accept/reject
signal an ingest filter applies. At deployment scale the store is a table
bucketed by hash so the semi join is shuffle-free on the probe side.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_hash_rows(docs: DataFrame, window_tokens: int = 20) -> DataFrame:
    """(doc_id, h): one row per sliding window, hashed exactly like the
    batch kernel (``substring_dup_stats``) so stream and batch collide on
    identical spans."""
    w = window_tokens
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= w
    )
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) - {w}),"
                f" i -> md5(concat_ws(' ', slice(t, i + 1, {w}))))"
            )
        ).alias("h"),
    )


def substring_dedup_sink(store_dir: str, stats_dir: str, window_tokens: int = 20):
    """``foreachBatch`` function scoring each micro-batch's documents for
    boilerplate coverage against the accumulated window-hash store, then
    folding the batch's windows into the store."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        new = window_hash_rows(batch, window_tokens).localCheckpoint()

        try:
            hist = spark.read.parquet(store_dir).filter(F.col("batch_id") < batch_id)
        except AnalysisException as exc:
            # only the first-batch missing-directory case may fall through
            msg = str(exc)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            hist = None

        # in-batch cross-doc repeats: the batch kernel's >=2-distinct-docs
        # rule applied within the micro-batch
        in_batch = new.groupBy("h").agg(
            F.count_distinct("doc_id").alias("nd_batch")
        )
        scored = new.join(in_batch, "h")
        if hist is not None:
            seen = hist.select("h").distinct().withColumn("in_hist", F.lit(True))
            scored = scored.join(seen, "h", "left")
        else:
            scored = scored.withColumn("in_hist", F.lit(None).cast("boolean"))
        dup = (F.col("nd_batch") >= 2) | F.coalesce(F.col("in_hist"), F.lit(False))
        stats = (
            scored.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_windows"),
                F.sum(dup.cast("int")).cast("long").alias("n_dup_windows"),
            )
            .select(
                "doc_id",
                "n_windows",
                "n_dup_windows",
                F.expr("CAST(n_dup_windows * 1000 DIV n_windows AS BIGINT)").alias(
                    "dup_permille"
                ),
            )
        )
        stats.write.mode("overwrite").parquet(f"{stats_dir}/batch_id={batch_id}")
        new.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")

    return apply


def substring_dedup_stream(
    docs_stream: DataFrame,
    store_dir: str,
    stats_dir: str,
    checkpoint_dir: str,
    window_tokens: int = 20,
):
    """Start the ingest boilerplate-scoring stream over a (doc_id, text)
    source."""
    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(substring_dedup_sink(store_dir, stats_dir, window_tokens))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )
