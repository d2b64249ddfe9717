"""Streaming embedding-drift monitor: online twin of pipeline/quality.py's
``embedding_drift``.

A feature pipeline computes per-label REFERENCE centroids offline (the
training snapshot); at serving time every micro-batch's per-label centroid
is compared against that reference and an alarm row is emitted when the
cosine drops under the threshold — drift surfaces within one trigger
interval instead of at the next offline audit.

Same integer-exact math as the batch kernel (1e6-quantized component means,
floor-scaled exact dots), so a micro-batch's centroid equals what a batch
recompute of the same rows would produce. Alarms land in
``out_dir/batch_id=<id>`` so replayed batches overwrite their own partition
(idempotent under at-least-once delivery — the signature-store pattern of
streaming/lsh.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000
SCALE = 1e12


def label_centroids(emb: DataFrame, dims: int = 64) -> dict[int, tuple[int, list[int]]]:
    """Reference artifact: label -> (n, quantized centroid) from a batch
    frame — the offline half the stream compares against."""
    q = F.transform(
        F.col("embedding"), lambda x: F.floor(x.cast("double") * QUANT).cast("long")
    )
    rows = (
        emb.select("label", q.alias("qv"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at("qv", i + 1)).alias(f"s{i}") for i in range(dims)],
        )
        .select(
            "label",
            "n",
            F.array(*[F.expr(f"CAST(s{i} DIV n AS BIGINT)") for i in range(dims)]).alias("c"),
        )
        .collect()
    )
    return {r["label"]: (r["n"], list(r["c"])) for r in rows}


def _cos(c0: list[int], c1: list[int]) -> float:
    d0 = [x / QUANT for x in c0]
    d1 = [x / QUANT for x in c1]
    dot = sum(int(math.floor(a * b * SCALE)) for a, b in zip(d0, d1))
    n0 = sum(int(math.floor(a * a * SCALE)) for a in d0)
    n1 = sum(int(math.floor(b * b * SCALE)) for b in d1)
    return dot / (math.sqrt(n0) * math.sqrt(n1))


def drift_sink(
    reference: dict[int, tuple[int, list[int]]],
    out_dir: str,
    threshold: float = 0.995,
    dims: int = 64,
):
    """``foreachBatch`` function: per-label micro-batch centroid vs the
    reference; one row per label seen in the batch, ``drifted`` flagged
    under ``threshold`` (labels absent from the reference flag too — a new
    label IS a distribution change). Reference labels entirely ABSENT from
    the batch also emit a drifted row (n_batch=0): a vanished input class
    is the strongest drift signal of all."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        cents = label_centroids(batch, dims)
        rows = []
        for label, (n, c) in sorted(cents.items()):
            ref = reference.get(label)
            cos = _cos(ref[1], c) if ref else None
            drifted = cos is None or cos < threshold
            rows.append((label, n, ref[0] if ref else None, cos, drifted))
        for label in sorted(set(reference) - set(cents)):
            rows.append((label, 0, reference[label][0], None, True))
        out = spark.createDataFrame(
            rows, "label int, n_batch long, n_ref long, centroid_cos double, drifted boolean"
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return apply


def drift_stream(
    emb_stream: DataFrame,
    reference: dict[int, tuple[int, list[int]]],
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.995,
    dims: int = 64,
):
    """Start the monitor over a (vec_id, embedding, label) stream."""
    return (
        emb_stream.writeStream.outputMode("append")
        .foreachBatch(drift_sink(reference, out_dir, threshold, dims))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )
