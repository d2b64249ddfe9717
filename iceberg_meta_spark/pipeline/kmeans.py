"""Deterministic Lloyd k-means refinement for the IVF coarse quantizer.

``ivf_probe_topk`` (pipeline/similarity.py) assigns vectors to a
deterministic centroid *sample*; this module runs the k-means iterations that
a real IVF index build performs — and does it with integer-exact arithmetic
so the result is bit-identical in any engine and any partition order,
letting an ITERATIVE algorithm carry a full hash-gated DuckDB oracle:

- centroid components are floor-quantized BIGINTs at 1e6 scale
  (``floor(x * 1e6)``); means are integer division (``sum DIV n``);
- assignment cosine uses the same floor-scaled 1e12 dot products as the rest
  of the similarity module — exact integer sums, order-independent.

Scale posture (10⁹ vectors, K ≈ √N centroids): each iteration is one
broadcast of the K-row centroid table + a map-side argmax (partial-agg
``max(struct)``, ONE row per vector through the shuffle) + a per-cell
component-sum aggregate (64 ``sum`` columns, map-side combined — one row per
cell on the wire). ``localCheckpoint`` per round bounds lineage, the standard
iterative-DataFrame idiom (see pipeline/graph.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline.similarity import scaled_dot, with_self_norm

QUANT = 1_000_000  # centroid component quantization scale


def _quantize(vec: Column) -> Column:
    return F.transform(vec, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def _dequantize(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double") / QUANT)


def _with_cnorm(cents: DataFrame) -> DataFrame:
    return cents.withColumn("c_norm", scaled_dot(_dequantize(F.col("c")), _dequantize(F.col("c"))))


def _assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cell): argmax-cosine cell per vector. Broadcast centroids,
    map-side ``max(struct)`` argmax — never an N×K window shuffle."""
    dot = scaled_dot(F.col("embedding"), _dequantize(F.col("c")))
    cos = dot.cast("double") / (
        F.sqrt(F.col("norm_s").cast("double")) * F.sqrt(F.col("c_norm").cast("double"))
    )
    return (
        base.crossJoin(F.broadcast(_with_cnorm(cents)))
        .select("vec_id", F.col("cent_id"), cos.alias("cos"))
        .groupBy("vec_id")
        .agg(F.max(F.struct(F.col("cos"), (-F.col("cent_id")).alias("neg"))).alias("m"))
        .select("vec_id", (-F.col("m.neg")).cast("long").alias("cell"))
    )


def _update(base: DataFrame, assign: DataFrame, dims: int) -> DataFrame:
    """New quantized centroids: per-cell integer mean of quantized vectors.
    Empty cells drop out (identically in the oracle's GROUP BY)."""
    joined = assign.join(base.select("vec_id", "q"), "vec_id")
    sums = joined.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.element_at(F.col("q"), i + 1)).alias(f"s{i}") for i in range(dims)],
    )
    mean = F.array(*[F.expr(f"CAST(s{i} DIV n AS BIGINT)") for i in range(dims)])
    return sums.select(F.col("cell").alias("cent_id"), mean.alias("c"))


def _refined(
    emb: DataFrame, centroid_mod: int, iters: int, dims: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared Lloyd prologue: (base, refined centroids, final assignment).
    ``base`` is localCheckpointed once; each round's centroid table (K rows)
    is checkpointed to keep lineage flat across iterations."""
    base = (
        with_self_norm(emb)
        .select("vec_id", "embedding", "norm_s", _quantize(F.col("embedding")).alias("q"))
        .localCheckpoint()
    )
    cents = base.filter(F.col("vec_id") % centroid_mod == 1).select(
        F.col("vec_id").alias("cent_id"), F.col("q").alias("c")
    )
    for _ in range(iters):
        assign = _assign(base, cents)
        cents = _update(base, assign, dims).localCheckpoint()
    return base, cents, _assign(base, cents)


def kmeans_cells(
    emb: DataFrame, centroid_mod: int = 31, iters: int = 2, dims: int = 64
) -> DataFrame:
    """Run ``iters`` Lloyd rounds from the deterministic id-sample init, then
    report the final partition: one row per surviving cell with its member
    count and the md5 of the refined quantized centroid.

    Returns (cell, n_vectors, centroid_md5) — compact, exact, and
    hash-comparable across engines.
    """
    base, cents, final = _refined(emb, centroid_mod, iters, dims)
    sizes = final.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    cmd5 = cents.select(
        F.col("cent_id").alias("cell"),
        F.md5(F.concat_ws(",", F.transform(F.col("c"), lambda x: x.cast("string")))).alias(
            "centroid_md5"
        ),
    )
    return sizes.join(cmd5, "cell").select("cell", "n_vectors", "centroid_md5")


def semantic_dedup(
    emb: DataFrame,
    centroid_mod: int = 31,
    iters: int = 2,
    dims: int = 64,
    threshold: float = 0.9,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023 shape): cluster with the refined k-means
    cells, then find near-duplicate pairs ONLY within each cell — the
    cluster replaces the all-pairs product as the candidate blocker, and
    unlike data-independent LSH buckets the blocks adapt to the corpus.

    Per cell: member count, pairs at cosine >= ``threshold``, and the
    removable count (distinct higher-id members of a dup pair — keep-lowest
    survivor rule, matching the exact-dedup convention).

    Scale: the in-cell self-join is quadratic per cell by design — with
    K ≈ √N centroids a cell holds ~√N vectors, so total pair work is ~N^1.5
    spread evenly across cells, each an independent shuffle partition; grow
    K with N to hold cell size constant.
    """
    base, _, final = _refined(emb, centroid_mod, iters, dims)
    cellv = final.join(base.select("vec_id", "embedding", "norm_s"), "vec_id")
    a = cellv.select(
        "cell",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm_s").alias("norm_a"),
    )
    b = cellv.select(
        "cell",
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm_s").alias("norm_b"),
    )
    cos = scaled_dot(F.col("emb_a"), F.col("emb_b")).cast("double") / (
        F.sqrt(F.col("norm_a").cast("double")) * F.sqrt(F.col("norm_b").cast("double"))
    )
    hits = (
        a.join(b, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("cell", "vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
    per_cell = hits.groupBy("cell").agg(
        F.count(F.lit(1)).alias("dup_pairs"),
        F.countDistinct("vec_b").alias("removable"),
    )
    sizes = final.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        sizes.join(per_cell, "cell", "left")
        .select(
            "cell",
            "n_vectors",
            F.coalesce(F.col("dup_pairs"), F.lit(0).cast("long")).alias("dup_pairs"),
            F.coalesce(F.col("removable"), F.lit(0).cast("long")).alias("removable"),
        )
        .orderBy("cell")
    )
