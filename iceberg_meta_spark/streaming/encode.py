"""Streaming PQ encoding: train batch, apply to the stream.

The canonical feature-transform split for a 100 TB ingest pipeline — the PQ
codebooks are trained OFFLINE on a corpus snapshot (pipeline/pq.py, bounded
K·m rows), then every newly-arriving embedding is encoded ONLINE by the same
Arrow kernel riding in the task closure. Encoding is stateless (pure
map-side), so it runs identically on a batch frame and a Structured
Streaming source: no state store, no watermark, no shuffle — each
micro-batch's vectors are coded in place with exactly the batch kernel's
floor-scaled integer arithmetic, so stream output is bit-identical to what
a batch re-encode of the same rows would produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline import kmeans, pq
from iceberg_meta_spark.pipeline.similarity import scaled_dot


def encode_stream(
    emb_stream: DataFrame,
    codebooks: list[list[tuple[int, list[int]]]],
    dims: int = 64,
) -> DataFrame:
    """Attach PQ codes to a (vec_id, embedding) stream.

    ``codebooks`` come from :func:`pipeline.pq.train_codebooks` (or any
    driver-side list with the same shape). The per-subspace norms the kernel
    needs are computed as stateless expressions on the stream; the combined
    kernel then emits (vec_id, s0..s{m-1}) plus the joined ``code`` string —
    the same output contract as the batch :func:`pipeline.pq.pq_codes`.
    """
    m = len(codebooks)
    dims_sub = dims // m
    cols = [F.col("vec_id"), F.col("embedding")]
    for s in range(m):
        sl = F.slice("embedding", s * dims_sub + 1, dims_sub)
        cols.append(scaled_dot(sl, sl).alias(f"norm_{s}"))
        cols.append(kmeans._quantize(sl).alias(f"q_{s}"))
    base = emb_stream.select(*cols)
    coded = pq._encode(base, codebooks, dims_sub)
    return coded.select(
        "vec_id",
        *[f"s{s}" for s in range(m)],
        F.concat_ws("-", *[F.col(f"s{s}").cast("string") for s in range(m)]).alias("code"),
    )
