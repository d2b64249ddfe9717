"""Streaming MinHash-LSH near-dup detection at ingest.

The batch engine finds near-duplicates corpus-wide (pipeline/dedup.py); an
ingest pipeline needs the same answer INCREMENTALLY — "is this newly-crawled
document a near-dup of anything already accepted?" — without re-running the
corpus pair join per micro-batch.

Design: the accepted corpus is represented by its LSH band index (one row
per doc per band, ``pipeline.dedup.minhash_band_rows`` — the same banding as
the batch kernel, so batch and stream agree on what collides). Each
micro-batch:

1. computes its docs' band rows (a batch DataFrame inside ``foreachBatch``);
2. joins them against the STORED index on (band_idx, band_key) — per-batch
   work is O(batch × collisions), never O(corpus²); the historical side is
   partition-pruned to prior batches only;
3. emits flagged pairs (vs history, and within the batch via the batch
   kernel) to ``dups_dir``;
4. appends its band rows to the index under ``batch_id=<id>`` so a replayed
   micro-batch OVERWRITES its own partition — idempotent under
   at-least-once delivery, and step 2's ``batch_id < current`` pruning never
   sees the batch's own rows as history.

At deployment scale the store is a table partitioned/bucketed by band_key so
the probe join is partition-pruned; here it is a parquet directory with the
same layout.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline.dedup import minhash_band_rows, minhash_lsh_pairs

_EST = "est_jaccard"


def _match_expr(num_hashes: int):
    return F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("double") / num_hashes


def lsh_dedup_sink(
    store_dir: str,
    dups_dir: str,
    num_hashes: int = 8,
    shingle_k: int = 2,
    band_size: int = 2,
    min_bands: int = 1,
):
    """``foreachBatch`` function flagging near-dups of each micro-batch
    against the accumulated signature store (and within the batch), then
    folding the batch's signatures into the store."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        new = minhash_band_rows(batch, num_hashes, shingle_k, band_size).localCheckpoint()

        try:
            hist = spark.read.parquet(store_dir).filter(F.col("batch_id") < batch_id)
        except AnalysisException as exc:
            # only the first-batch missing-directory case may fall through;
            # any other failure must surface (see cdc.upsert_sink)
            msg = str(exc)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            hist = None

        parts = []
        if hist is not None:
            a = new.select(
                F.col("doc_id").alias("doc_id"),
                F.col("sig").alias("sig_a"),
                "band_idx",
                "band_key",
            )
            b = hist.select(
                F.col("doc_id").alias("dup_of"),
                F.col("sig").alias("sig_b"),
                "band_idx",
                "band_key",
            )
            vs_hist = (
                a.join(b, ["band_idx", "band_key"])
                .filter(F.col("doc_id") != F.col("dup_of"))
                .withColumn("m", _match_expr(num_hashes))
                .groupBy("doc_id", "dup_of")
                .agg(F.count(F.lit(1)).alias("n_bands"), F.round(F.first("m"), 4).alias(_EST))
                .filter(F.col("n_bands") >= min_bands)
                .withColumn("kind", F.lit("history"))
            )
            parts.append(vs_hist)

        in_batch = minhash_lsh_pairs(
            batch, num_hashes, shingle_k, band_size, min_bands
        ).select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("dup_of"),
            "n_bands",
            _EST,
            F.lit("batch").alias("kind"),
        )
        parts.append(in_batch)

        dups = parts[0]
        for p in parts[1:]:
            dups = dups.unionByName(p)
        dups.write.mode("overwrite").parquet(f"{dups_dir}/batch_id={batch_id}")
        new.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")

    return apply


def near_dup_stream(
    docs_stream: DataFrame,
    store_dir: str,
    dups_dir: str,
    checkpoint_dir: str,
    **kwargs,
):
    """Start the ingest-dedup stream over a (doc_id, text, ...) source."""
    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(lsh_dedup_sink(store_dir, dups_dir, **kwargs))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )
