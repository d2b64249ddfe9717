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

Scale posture (10⁹ vectors, K ≈ √N centroids): each iteration broadcasts the
K-row centroid table to every executor and computes the N×K argmax INSIDE an
Arrow-batched ``mapInPandas`` kernel — a numpy matrix product per batch, the
same design Spark MLlib uses (BLAS distance blocks against driver-collected
centroids, see mllib's KMeans.findClosest).  The interpreted higher-order
expression form (``aggregate(zip_with(...))`` per pair) costs ~230 ns per
element; the vectorized kernel does the identical floor-scaled arithmetic at
numpy speed, ~50× faster, with ZERO rows shuffled during assignment.  The
new-centroid update is FUSED into the same kernel pass (r12,
:func:`_assign_update`): per-cell sums/counts accumulate in numpy
map-side, so at most K partial rows per task reach the one small merge
aggregate — nothing row-shaped crosses the wire.  Centroids live
driver-side between rounds (K ≈ √N rows, bounded — MLlib keeps them on the
driver too), which also keeps lineage flat across iterations without
per-round checkpoints.

Exactness contract of the kernel (must mirror similarity.scaled_dot and the
DuckDB oracle in queries/extensions.py BIT FOR BIT):

- dequantized centroid component: ``c_long / 1e6`` (exact f64 division)
- per-element product:  ``floor((x * c) * 1e12)`` → int64
- dot: int64 sum of those (≤ 64·1e13 < 2^53, exact)
- cosine: ``dot / (sqrt(norm_s) * sqrt(c_norm))`` in f64
- argmax ties break to the LOWEST cent_id (centroid rows sorted ascending;
  ``np.argmax`` takes the first maximum — equivalent to the previous
  ``max(struct(cos, -cent_id))`` tie rule, which the oracle also uses)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline.similarity import SCALE, with_self_norm
from iceberg_meta_spark.sources.localrel import local_frame

QUANT = 1_000_000  # centroid component quantization scale


def _quantize(vec: Column) -> Column:
    return F.transform(vec, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def _compact(
    base: DataFrame, n_est: int, threshold: int = 100_000, target: int = 8
) -> DataFrame:
    """Task-count right-sizing for a materialized (localCheckpointed) frame:
    an iterative trainer re-reads its base once per Lloyd round, and when
    the base is metadata-scale (a quantizer trained on a sample, test
    fixtures) 32-way parallelism costs more in task/Arrow-worker overhead
    per round than the compute is worth. ``n_est`` is the caller's row
    estimate (sample size × sample modulus — the init collect already
    returned it, so sizing costs ZERO extra jobs; r12 replaced the
    dedicated .count() job here). At data scale the estimate exceeds the
    threshold and this is a no-op (the analog of AQE's post-shuffle
    coalescing for the scan side, which AQE cannot touch)."""
    if n_est < threshold:
        return base.coalesce(target)
    return base


def _collect_cents(cents: DataFrame) -> list[tuple[int, list[int]]]:
    """Materialize the K-row centroid table driver-side, sorted by cent_id
    ascending (the tie-break order the assignment argmax relies on)."""
    return sorted((r["cent_id"], list(r["c"])) for r in cents.collect())


def _assign(
    base: DataFrame,
    cent_rows: list[tuple[int, list[int]]],
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(vec_id, cell[, carry...]): argmax-cosine cell per vector.

    Vectorized Arrow kernel: centroids ride to executors inside the task
    closure (K×dims int64 — a few hundred KB at K=√10⁹); each Arrow batch
    computes its N_batch×K cosine block with numpy and emits one (vec_id,
    cell) row per vector.  No join, no shuffle, no per-pair interpreted
    expression — and the floor-scaled integer arithmetic is identical to
    ``similarity.scaled_dot``, so results match the hash-gated oracle
    bit for bit (see module docstring for the exactness contract).

    ``carry`` passes base columns through the narrow map (semantic_dedup
    carries embedding/norm_s so the in-cell pair kernel needs no N⋈N
    back-join to re-fetch vectors). Lloyd TRAINING rounds do not use this
    — :func:`_assign_update` fuses assignment with the centroid update.
    """
    carry = tuple(c for c in carry if c != "vec_id")
    types = {f.name: f.dataType.simpleString() for f in base.schema.fields}
    schema = "vec_id long, cell long"
    for c in carry:
        schema += f", {c} {types[c]}"
    if not cent_rows:  # empty corpus → empty centroid sample → no cells
        return base.sparkSession.createDataFrame([], schema)
    ids = np.asarray([cid for cid, _ in cent_rows], dtype=np.int64)
    dq = np.asarray([c for _, c in cent_rows], dtype=np.float64) / QUANT  # K×dims
    c_norm = np.floor((dq * dq) * SCALE).astype(np.int64).sum(axis=1)
    c_sqrt = np.sqrt(c_norm.astype(np.float64))
    k, dims = dq.shape
    # bound the dense N_chunk×K×dims product block to ~50M f64 elements
    step = max(1, 50_000_000 // max(1, k * dims))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n_sqrt = np.sqrt(pdf["norm_s"].to_numpy().astype(np.float64))
            best = np.empty(len(pdf), dtype=np.int64)
            for lo in range(0, len(pdf), step):
                hi = min(lo + step, len(pdf))
                dot = (
                    np.floor((x[lo:hi, None, :] * dq[None, :, :]) * SCALE)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                cos = dot.astype(np.float64) / (n_sqrt[lo:hi, None] * c_sqrt[None, :])
                best[lo:hi] = np.argmax(cos, axis=1)  # first max = lowest cent_id
            out = {"vec_id": pdf["vec_id"].to_numpy(), "cell": ids[best]}
            for c in carry:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    cols = ["vec_id", "embedding", "norm_s"]
    cols += [c for c in carry if c not in cols]
    return base.select(*cols).mapInPandas(kernel, schema)


def _assign_update(
    base: DataFrame, cent_rows: list[tuple[int, list[int]]], dims: int
) -> DataFrame:
    """One Lloyd round in ONE pass: the assignment kernel ALSO accumulates
    each cell's vector sums and counts in numpy (``np.add.at`` /
    ``np.bincount`` — a map-side combine), so a round shuffles at most K
    partial rows per task instead of every (vec_id, cell, q) row, and the
    post-kernel plan is one small fixed-shape aggregate instead of dims+1
    sum columns. The previous shape (``_assign(with_q=True)`` feeding a
    65-column ``_update`` aggregate) spent most of each round COMPILING:
    the centroids are baked into the kernel, so every round is a fresh
    plan, and whole-stage codegen of the wide aggregate dominated at
    metadata scale (~0.5 s/round at sf0.1 vs ~0.1 s execution).

    Result (cent_id, c) is bit-identical to the old pair: the assignment
    arithmetic is the module's exactness contract verbatim, int64 partial
    sums are exact and order-independent, and the mean stays the same
    ``sum DIV n``. Empty cells drop out (never emitted by any kernel)."""
    if not cent_rows:
        return base.sparkSession.createDataFrame([], "cent_id long, c array<long>")
    ids = np.asarray([cid for cid, _ in cent_rows], dtype=np.int64)
    dq = np.asarray([c for _, c in cent_rows], dtype=np.float64) / QUANT
    c_norm = np.floor((dq * dq) * SCALE).astype(np.int64).sum(axis=1)
    c_sqrt = np.sqrt(c_norm.astype(np.float64))
    k, kd = dq.shape
    step = max(1, 50_000_000 // max(1, k * kd))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros((k, dims), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            n_sqrt = np.sqrt(pdf["norm_s"].to_numpy().astype(np.float64))
            best = np.empty(len(pdf), dtype=np.int64)
            for lo in range(0, len(pdf), step):
                hi = min(lo + step, len(pdf))
                dot = (
                    np.floor((x[lo:hi, None, :] * dq[None, :, :]) * SCALE)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                cos = dot.astype(np.float64) / (n_sqrt[lo:hi, None] * c_sqrt[None, :])
                best[lo:hi] = np.argmax(cos, axis=1)  # first max = lowest cent_id
            np.add.at(sums, best, q)
            counts += np.bincount(best, minlength=k)
        live = np.nonzero(counts)[0]
        if live.size:  # empty partitions yield no batch (an empty 's'
            # column would carry float64 dtype Arrow cannot cast to list)
            yield pd.DataFrame(
                {
                    "cell": ids[live],
                    "n": counts[live],
                    "s": [sums[i].tolist() for i in live],
                }
            )

    partials = base.select("vec_id", "embedding", "norm_s", "q").mapInPandas(
        kernel, "cell long, n long, s array<long>"
    )
    merged = partials.groupBy("cell").agg(
        F.sum("n").alias("n"),
        F.aggregate(
            F.collect_list("s"),
            F.array_repeat(F.lit(0).cast("long"), dims),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("s"),
    )
    return merged.select(
        F.col("cell").alias("cent_id"),
        F.expr("transform(s, x -> CAST(x DIV n AS BIGINT))").alias("c"),
    )


def _refined(
    emb: DataFrame, centroid_mod: int, iters: int, dims: int
) -> tuple[DataFrame, list[tuple[int, list[int]]], DataFrame]:
    """Shared Lloyd prologue: (base, refined centroid rows, final assignment).
    ``base`` is localCheckpointed LAZILY (reused by every round): the init
    centroid-sample collect is the first action, so ONE job materializes
    the checkpoint AND returns the sample (r12 — previously the eager
    checkpoint, a count, and the sample collect were three separate jobs);
    each later round's K-row centroid table is collected to the driver —
    the collect IS the round's materialization, replacing a checkpoint
    job."""
    base = (
        with_self_norm(emb)
        .select("vec_id", "embedding", "norm_s", _quantize(F.col("embedding")).alias("q"))
        .localCheckpoint(eager=False)
    )
    cent_rows = _collect_cents(
        base.filter(F.col("vec_id") % centroid_mod == 1).select(
            F.col("vec_id").alias("cent_id"), F.col("q").alias("c")
        )
    )
    base = _compact(base, len(cent_rows) * centroid_mod)
    for _ in range(iters):
        cent_rows = _collect_cents(_assign_update(base, cent_rows, dims))
    return base, cent_rows, _assign(base, cent_rows)


def kmeans_cells(
    emb: DataFrame, centroid_mod: int = 31, iters: int = 2, dims: int = 64
) -> DataFrame:
    """Run ``iters`` Lloyd rounds from the deterministic id-sample init, then
    report the final partition: one row per surviving cell with its member
    count and the md5 of the refined quantized centroid.

    Returns (cell, n_vectors, centroid_md5) — compact, exact, and
    hash-comparable across engines.
    """
    import hashlib

    base, cent_rows, final = _refined(emb, centroid_mod, iters, dims)
    sizes = final.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    # md5(concat_ws(",", c)) computed driver-side on the collected K rows —
    # Python str(int) and hashlib.md5 match Spark's CAST(STRING)/md5 exactly
    cmd5 = local_frame(
        base.sparkSession,
        [
            (cid, hashlib.md5(",".join(str(v) for v in c).encode()).hexdigest())
            for cid, c in cent_rows
        ],
        "cell bigint, centroid_md5 string",
    )
    return sizes.join(F.broadcast(cmd5), "cell").select("cell", "n_vectors", "centroid_md5")


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

    Scale: the in-cell pair work is quadratic per cell by design — with
    K ≈ √N centroids a cell holds ~√N vectors, so total pair work is ~N^1.5
    spread evenly across cells, each an independent shuffle partition; grow
    K with N to hold cell size constant.

    Physical shape: ONE shuffle (groupBy cell) feeds a grouped Arrow kernel
    that scores every in-cell pair as a chunked numpy block product and
    emits the per-cell aggregate row directly — replacing the previous
    cell⋈cell self-join + pair filter + two aggregates, and swapping the
    ~230 ns/element interpreted ``zip_with``/``aggregate`` pair expression
    for vectorized arithmetic.  The kernel floors each elementwise product
    before summing (``floor((a·b)*1e12)`` per element, int64 sum — the
    :func:`~iceberg_meta_spark.pipeline.similarity.scaled_dot` contract),
    so results stay bit-identical to the expression form and the DuckDB
    oracle.
    """
    base, cent_rows, _ = _refined(emb, centroid_mod, iters, dims)
    # final assignment carries embedding/norm_s through the kernel — the
    # grouped pair kernel below needs no N⋈N back-join to re-fetch vectors
    cellv = _assign(base, cent_rows, carry=("embedding", "norm_s"))

    def cell_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        row = {"cell": [key[0]], "n_vectors": [n], "dup_pairs": [0], "removable": [0]}
        if n > 1:
            # pair order (vec_a < vec_b) = upper triangle after a vec_id sort
            pdf = pdf.sort_values("vec_id")
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n_sqrt = np.sqrt(pdf["norm_s"].to_numpy().astype(np.float64))
            d = x.shape[1]
            hit_b = np.zeros(n, dtype=bool)
            pairs = 0
            step = max(1, 50_000_000 // max(1, n * d))
            for lo in range(0, n, step):
                hi = min(lo + step, n)
                dot = (
                    np.floor((x[lo:hi, None, :] * x[None, :, :]) * SCALE)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                # dot / (sqrt(na)*sqrt(nb)) — the exact operation order of
                # similarity.cosine and the oracle (reciprocal-multiply is
                # NOT bit-identical and could flip threshold-edge pairs)
                cos = dot.astype(np.float64) / (n_sqrt[lo:hi, None] * n_sqrt[None, :])
                hits = cos >= threshold
                # keep only the strict upper triangle of the full matrix
                hits &= np.arange(n)[None, :] > np.arange(lo, hi)[:, None]
                pairs += int(hits.sum())
                hit_b |= hits.any(axis=0)
            row["dup_pairs"] = [pairs]
            row["removable"] = [int(hit_b.sum())]
        return pd.DataFrame(row)

    return (
        cellv.groupBy("cell")
        .applyInPandas(cell_kernel, "cell long, n_vectors long, dup_pairs long, removable long")
        .orderBy("cell")
    )


def knn_graph(
    emb: DataFrame,
    centroid_mod: int = 31,
    iters: int = 2,
    dims: int = 64,
    k: int = 3,
) -> DataFrame:
    """Approximate KNN graph: exact top-``k`` cosine neighbors per vector
    WITHIN its refined k-means cell — the neighbor structure SemDeDup-style
    curation, diversity sampling, and graph-based ANN indexes (NN-descent
    seeds, NSW entry layers) all start from.  The cell is the candidate
    blocker, so edge candidates are ~N·cellsize instead of N².

    Returns (vec_id, rank, neighbor_id, cos_sim): rank 1..k by
    (cos DESC, neighbor_id ASC), self excluded; vectors alone in their cell
    contribute no rows.  Cell-boundary neighbors are missed by construction
    (the accepted IVF trade-off; raise ``iters``/probe count to recover).

    Scale: same shape as :func:`semantic_dedup` — ONE shuffle groups each
    cell onto an executor, a chunked numpy kernel scores the in-cell block
    and keeps k rows per vector; ~N^1.5 work total at K ≈ √N, no driver
    funnel, no global window (ranking happens inside the cell kernel).
    The floor-scaled arithmetic matches ``similarity.scaled_dot`` bit for
    bit, so the edge list is hash-comparable across engines.
    """
    base, cent_rows, _ = _refined(emb, centroid_mod, iters, dims)
    cellv = _assign(base, cent_rows, carry=("embedding", "norm_s"))

    def cell_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"vec_id": [], "rank": [], "neighbor_id": [], "cos": []}).astype(
                {"vec_id": "int64", "rank": "int32", "neighbor_id": "int64", "cos": "float64"}
            )
        # column order = vec_id ascending, so a STABLE descending-cos sort
        # breaks ties toward the lower neighbor id
        pdf = pdf.sort_values("vec_id")
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        vids = pdf["vec_id"].to_numpy()
        n_sqrt = np.sqrt(pdf["norm_s"].to_numpy().astype(np.float64))
        d = x.shape[1]
        kk = min(k, n - 1)
        out_v, out_r, out_n, out_c = [], [], [], []
        step = max(1, 50_000_000 // max(1, n * d))
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            dot = (
                np.floor((x[lo:hi, None, :] * x[None, :, :]) * SCALE)
                .astype(np.int64)
                .sum(axis=2)
            )
            cos = dot.astype(np.float64) / (n_sqrt[lo:hi, None] * n_sqrt[None, :])
            cos[np.arange(lo, hi) - lo, np.arange(lo, hi)] = -np.inf  # self
            order = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(vids[lo:hi], kk)
            out_v.append(rows)
            out_r.append(np.tile(np.arange(1, kk + 1, dtype=np.int32), hi - lo))
            out_n.append(vids[order].ravel())
            out_c.append(np.take_along_axis(cos, order, axis=1).ravel())
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_v),
                "rank": np.concatenate(out_r),
                "neighbor_id": np.concatenate(out_n),
                "cos": np.concatenate(out_c),
            }
        )

    return (
        cellv.groupBy("cell")
        .applyInPandas(cell_kernel, "vec_id long, rank int, neighbor_id long, cos double")
        .select("vec_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos_sim"))
        .orderBy("vec_id", "rank")
    )


def prototype_stats(
    emb: DataFrame, centroid_mod: int = 31, iters: int = 2, dims: int = 64
) -> DataFrame:
    """Prototype-distance data pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws" shape): rank every vector by cosine to its own
    refined k-means centroid.  The most prototypical member (max cos) is
    the cell's medoid-like exemplar; the least prototypical (min cos) is
    the "hardest" example; in the large-data regime the keep-hard rule
    retains the ceil(n/2) hardest members per cell.

    Physical shape: the final assignment carries embedding/norm_s through
    the Arrow kernel (no N⋈N back-join), the K-row centroid table joins by
    BROADCAST, cos-to-own-centroid is a pure expression (floor-scaled
    integer products — bit-identical to the oracle), and the per-cell
    ranking windows all ride ONE hashpartitioning(cell) exchange.
    """
    base, cent_rows, _ = _refined(emb, centroid_mod, iters, dims)
    out_schema = (
        "cell long, n_vectors long, prototype_id long, hardest_id long, "
        "n_keep long, min_cos double, max_cos double"
    )
    if not cent_rows:
        return base.sparkSession.createDataFrame([], out_schema)
    cellv = _assign(base, cent_rows, carry=("embedding", "norm_s"))
    cdf = local_frame(
        base.sparkSession,
        [(cid, list(c)) for cid, c in cent_rows], "cell bigint, c array<bigint>"
    )
    j = cellv.join(F.broadcast(cdf), "cell")
    dot = F.aggregate(
        F.zip_with(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            F.transform(F.col("c"), lambda y: y.cast("double") / F.lit(1e6)),
            lambda x, y: F.floor(x * y * F.lit(SCALE)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cn = F.aggregate(
        F.transform(
            F.col("c"),
            lambda y: F.floor(
                (y.cast("double") / F.lit(1e6))
                * (y.cast("double") / F.lit(1e6))
                * F.lit(SCALE)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = j.select(
        "cell",
        "vec_id",
        (
            dot.cast("double")
            / (F.sqrt(F.col("norm_s").cast("double")) * F.sqrt(cn.cast("double")))
        ).alias("cos"),
    )
    w = Window.partitionBy("cell")
    ranked = scored.select(
        "cell",
        "vec_id",
        "cos",
        F.row_number()
        .over(w.orderBy(F.desc("cos"), F.asc("vec_id")))
        .alias("rn_proto"),
        F.row_number()
        .over(w.orderBy(F.asc("cos"), F.asc("vec_id")))
        .alias("rn_hard"),
    )
    return (
        ranked.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.max(F.when(F.col("rn_proto") == 1, F.col("vec_id")))
            .cast("long")
            .alias("prototype_id"),
            F.max(F.when(F.col("rn_hard") == 1, F.col("vec_id")))
            .cast("long")
            .alias("hardest_id"),
            F.round(F.min("cos"), 6).alias("min_cos"),
            F.round(F.max("cos"), 6).alias("max_cos"),
        )
        .select(
            "cell",
            "n_vectors",
            "prototype_id",
            "hardest_id",
            F.expr("(n_vectors + 1) DIV 2").alias("n_keep"),
            "min_cos",
            "max_cos",
        )
        .orderBy("cell")
    )
