"""Product quantization (PQ): the ANN compression path.

A PQ index splits each vector into ``m`` contiguous subvectors and learns an
independent k-means codebook per subspace; a vector's code is the tuple of
its per-subspace cell ids — ``m * log2(K)`` bits instead of ``dims * 32``.
This module trains the ``m`` codebooks with the same integer-exact Lloyd
machinery as the IVF coarse quantizer (pipeline/kmeans.py — floor-quantized
centroids at 1e6, floor-scaled 1e12 dots, deterministic id-sample init), so
the WHOLE training run carries a hash-gated DuckDB oracle despite being
iterative.

Scale posture mirrors kmeans.py: ONE localCheckpoint of the corpus-sized
base (embedding + per-subspace norms and quantized slices), per-subspace
codebooks live driver-side between rounds (K·m rows, bounded), assignment is
the Arrow-batched numpy argmax kernel. The final encoding pass computes ALL
``m`` subspace argmaxes in a single ``mapInPandas`` over one scan — never an
m-way self-join on vec_id.

Reference parity: the reference engine has no PQ; this is part of the
training-data-pipeline surface (ANN at 10⁹ vectors needs compressed codes —
IVF-PQ is the standard pairing with pipeline/similarity.py's IVF probe).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline import kmeans
from iceberg_meta_spark.pipeline.similarity import SCALE, scaled_dot, with_self_norm

QUANT = kmeans.QUANT


def train_codebooks(
    emb: DataFrame, m: int = 4, dims: int = 64, centroid_mod: int = 63, iters: int = 1
) -> tuple[DataFrame, list[list[tuple[int, list[int]]]]]:
    """(base, codebooks): run ``iters`` Lloyd rounds per subspace — but every
    subspace advances in the SAME pass over the data.

    ``base`` carries embedding plus per-subspace norms / quantized slices and
    is checkpointed ONCE. Each round is one combined kernel (all m argmaxes,
    q slices carried through the narrow map) feeding ONE unpivoted
    (subspace, cell) integer-mean aggregate — so a Lloyd round costs one scan
    and one shuffle regardless of m, and one driver collect retrieves every
    codebook (K·m rows, bounded). The per-subspace math is identical to
    training each codebook separately; only the scheduling is fused.
    """
    dims_sub = dims // m
    cols = [F.col("vec_id"), F.col("embedding")]
    for s in range(m):
        sl = F.slice("embedding", s * dims_sub + 1, dims_sub)
        cols.append(scaled_dot(sl, sl).alias(f"norm_{s}"))
        cols.append(kmeans._quantize(sl).alias(f"q_{s}"))
    # lazy checkpoint: the init-sample collect below is the first action,
    # so one job materializes the base AND seeds every codebook (r12)
    base = emb.select(*cols).localCheckpoint(eager=False)

    # one collect seeds every subspace's centroid sample
    init = base.filter(F.col("vec_id") % centroid_mod == 1).select(
        "vec_id", *[f"q_{s}" for s in range(m)]
    )
    seeds = sorted((r["vec_id"], [list(r[f"q_{s}"]) for s in range(m)]) for r in init.collect())
    base = kmeans._compact(base, len(seeds) * centroid_mod)
    codebooks = [[(vid, qs[s]) for vid, qs in seeds] for s in range(m)]

    for _ in range(iters):
        rows = _encode_update(base, codebooks, dims_sub).collect()
        codebooks = [
            sorted((r["cell"], list(r["c"])) for r in rows if r["subspace"] == s)
            for s in range(m)
        ]
    return base, codebooks


def _encode_update(
    base: DataFrame,
    codebooks: list[list[tuple[int, list[int]]]],
    dims_sub: int,
) -> DataFrame:
    """One fused PQ-Lloyd round: every subspace's argmax AND its per-cell
    partial sums/counts accumulate inside ONE kernel pass (``np.add.at``
    map-side combine), merged by a small fixed-shape aggregate — the PQ
    sibling of :func:`kmeans._assign_update`, replacing the previous
    ``_encode(carry_q=True)`` + posexplode + (dims_sub+1)-column aggregate
    whose fresh-plan codegen dominated each round at metadata scale.
    Result rows (subspace, cell, c) are bit-identical: same assignment
    arithmetic, exact int64 sums, the same ``sum DIV n`` mean."""
    m = len(codebooks)
    out_schema = "subspace int, cell long, n long, s array<long>"
    if any(not cb for cb in codebooks):  # empty corpus → empty codebooks
        return base.sparkSession.createDataFrame(
            [], "subspace int, cell long, c array<long>"
        )
    preps = []
    for cent_rows in codebooks:
        ids = np.asarray([cid for cid, _ in cent_rows], dtype=np.int64)
        dq = np.asarray([c for _, c in cent_rows], dtype=np.float64) / QUANT
        c_norm = np.floor((dq * dq) * SCALE).astype(np.int64).sum(axis=1)
        preps.append((ids, dq, np.sqrt(c_norm.astype(np.float64))))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = [np.zeros((len(p[0]), dims_sub), dtype=np.int64) for p in preps]
        counts = [np.zeros(len(p[0]), dtype=np.int64) for p in preps]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            for s, (ids, dq, c_sqrt) in enumerate(preps):
                xs = x[:, s * dims_sub : (s + 1) * dims_sub]
                n_sqrt = np.sqrt(pdf[f"norm_{s}"].to_numpy().astype(np.float64))
                dot = (
                    np.floor((xs[:, None, :] * dq[None, :, :]) * SCALE)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                cos = dot.astype(np.float64) / (n_sqrt[:, None] * c_sqrt[None, :])
                best = np.argmax(cos, axis=1)  # first max = lowest cent_id
                q = np.stack(pdf[f"q_{s}"].to_numpy()).astype(np.int64)
                np.add.at(sums[s], best, q)
                counts[s] += np.bincount(best, minlength=len(ids))
        out = []
        for s, (ids, _dq, _cs) in enumerate(preps):
            for i in np.nonzero(counts[s])[0]:
                out.append((s, int(ids[i]), int(counts[s][i]), sums[s][i].tolist()))
        if out:  # empty partitions yield no batch (dtype-less empty cols)
            yield pd.DataFrame(out, columns=["subspace", "cell", "n", "s"])

    cols = (["vec_id", "embedding"] + [f"norm_{s}" for s in range(m)]
            + [f"q_{s}" for s in range(m)])
    partials = base.select(*cols).mapInPandas(kernel, out_schema)
    merged = partials.groupBy("subspace", "cell").agg(
        F.sum("n").alias("n"),
        F.aggregate(
            F.collect_list("s"),
            F.array_repeat(F.lit(0).cast("long"), dims_sub),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("s"),
    )
    return merged.select(
        "subspace", "cell",
        F.expr("transform(s, x -> CAST(x DIV n AS BIGINT))").alias("c"),
    )


def _encode(
    base: DataFrame,
    codebooks: list[list[tuple[int, list[int]]]],
    dims_sub: int,
) -> DataFrame:
    """(vec_id, s0..s{m-1}): every subspace argmax in ONE kernel pass over
    the checkpointed base — same exactness contract as kmeans._assign
    (floor-scaled integer dots, cosine in f64, ties to the lowest
    cent_id). Lloyd TRAINING rounds use :func:`_encode_update`, which
    fuses this argmax with the per-cell centroid update.
    """
    m = len(codebooks)
    schema = "vec_id long, " + ", ".join(f"s{s} long" for s in range(m))
    if any(not cb for cb in codebooks):  # empty corpus → empty codebooks
        return base.sparkSession.createDataFrame([], schema)
    preps = []
    for cent_rows in codebooks:
        ids = np.asarray([cid for cid, _ in cent_rows], dtype=np.int64)
        dq = np.asarray([c for _, c in cent_rows], dtype=np.float64) / QUANT
        c_norm = np.floor((dq * dq) * SCALE).astype(np.int64).sum(axis=1)
        preps.append((ids, dq, np.sqrt(c_norm.astype(np.float64))))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for s, (ids, dq, c_sqrt) in enumerate(preps):
                xs = x[:, s * dims_sub : (s + 1) * dims_sub]
                n_sqrt = np.sqrt(pdf[f"norm_{s}"].to_numpy().astype(np.float64))
                dot = (
                    np.floor((xs[:, None, :] * dq[None, :, :]) * SCALE)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                cos = dot.astype(np.float64) / (n_sqrt[:, None] * c_sqrt[None, :])
                out[f"s{s}"] = ids[np.argmax(cos, axis=1)]
            yield pd.DataFrame(out)

    cols = ["vec_id", "embedding"] + [f"norm_{s}" for s in range(m)]
    return base.select(*cols).mapInPandas(kernel, schema)


def pq_codes(
    emb: DataFrame, m: int = 4, dims: int = 64, centroid_mod: int = 63, iters: int = 1
) -> DataFrame:
    """Per-vector PQ code: (vec_id, s0..s{m-1}, code)."""
    dims_sub = dims // m
    base, codebooks = train_codebooks(emb, m, dims, centroid_mod, iters)
    coded = _encode(base, codebooks, dims_sub)
    return coded.select(
        "vec_id",
        *[f"s{s}" for s in range(m)],
        F.concat_ws("-", *[F.col(f"s{s}").cast("string") for s in range(m)]).alias("code"),
    )


def _adc_sum(qvec, codebooks, dims_sub):
    """ADC scoring expression for one query: Σ_s LUT_s[code_s].

    One small map literal PER SUBSPACE, keyed by the integer code column
    directly — integer map probes inside whole-stage codegen. (The first
    version keyed one big map by a concat_ws(\"s:cid\") string, paying a
    per-row-per-subspace string build + string hash; at nq×m lookups per
    corpus row that concat dominated the scan.) Values are the exact
    floor-scaled integer dots the trainer uses, so results are unchanged.
    """
    terms = []
    for s, cent_rows in enumerate(codebooks):
        qs = qvec[s * dims_sub : (s + 1) * dims_sub]
        entries = []
        for cid, c in cent_rows:
            dq = np.asarray(c, dtype=np.float64) / QUANT
            val = int(np.floor((qs * dq) * SCALE).astype(np.int64).sum())
            entries.append(f"{int(cid)}L, {val}L")
        terms.append(f"element_at(map({', '.join(entries)}), s{s})")
    # ONE F.expr per query, not thousands of F.lit Columns: each Column
    # constructor is a py4j round-trip, and at nq×m×K literals the driver
    # chatter dominated the whole query (build was 2s+, execution 0.3s)
    return F.expr(" + ".join(terms))


def adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 4,
    dims: int = 64,
    centroid_mod: int = 63,
    iters: int = 1,
) -> DataFrame:
    """Asymmetric distance computation — approximate top-k over PQ codes.

    The payoff of PQ at 10⁹ vectors: the corpus is scanned as m small ints
    per vector, and each query's similarity to a vector is approximated by
    table lookups — ``adc(q, x) = Σ_s LUT_q[s][code_s(x)]`` where
    ``LUT_q[s][cell] = scaled_dot(q_slice_s, centroid_{s,cell})``, the exact
    integer dot the trainer uses. The LUTs (nq × m × K entries) are baked
    into the plan as map literals, so scoring is PURE MAP-SIDE expression
    work over the codes — zero joins, zero shuffles before the per-query
    top-k window (same shape as brute_force_topk's ranking).

    Ranking is by approximate inner product (adc_s DESC, neighbor_id ASC),
    self-matches excluded. Returns (query_id, rank, neighbor_id, adc_s).

    Approximation quality: ADC preserves ranking to the extent the corpus
    is clusterable — on clustered embeddings (real text/image models) the
    quantization error is small next to the neighbor/non-neighbor gap and
    recall is high (``test_adc_recall_on_clustered_corpus`` pins ≥0.8);
    on near-uniform random vectors (the synthetic test corpus) top-k gaps
    are tiny and recall collapses at ANY codebook size — an inherent PQ
    property, not an implementation artifact (verified against a float
    numpy reference). The hash-gated oracle gates the computation, not
    retrieval quality.
    """
    dims_sub = dims // m
    base, codebooks = train_codebooks(emb, m, dims, centroid_mod, iters)
    coded = _encode(base, codebooks, dims_sub)

    # query vectors: a driver-side handful (the broadcast query set of every
    # ANN kernel here); LUT arithmetic mirrors the assignment kernel exactly
    qvecs = {
        r["vec_id"]: np.asarray(list(r["embedding"]), dtype=np.float64)
        for r in emb.filter(F.col("vec_id").isin(query_ids)).select("vec_id", "embedding").collect()
    }
    query_ids = [q for q in query_ids if q in qvecs]  # absent queries have no answers
    if not query_ids or any(not cb for cb in codebooks):
        return emb.sparkSession.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, adc_s long"
        )

    def adc_expr(qid: int):
        return _adc_sum(qvecs[qid], codebooks, dims_sub)

    scored = coded.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).cast("long").alias("query_id"),
                        adc_expr(qid).cast("long").alias("adc_s"),
                    )
                    for qid in query_ids
                ]
            )
        ).alias("x"),
    ).select(F.col("x.query_id"), F.col("vec_id").alias("neighbor_id"), F.col("x.adc_s"))
    from pyspark.sql import Window

    ranked = scored.filter(F.col("neighbor_id") != F.col("query_id")).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("adc_s"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select("query_id", "rank", "neighbor_id", "adc_s")


def pq_codebook_summary(
    emb: DataFrame, m: int = 4, dims: int = 64, centroid_mod: int = 63, iters: int = 1
) -> DataFrame:
    """Codebook profile: one row per (subspace, cell) with member count —
    the balance diagnostic an index build reports (skewed cells mean the
    codebook wastes bits)."""
    codes = pq_codes(emb, m, dims, centroid_mod, iters)
    # unpivot in-row (posexplode) so the encoding kernel runs ONCE and a
    # single map-side-combined groupBy covers every subspace
    pairs = codes.select(
        F.posexplode(F.array(*[F.col(f"s{s}") for s in range(m)])).alias(
            "subspace", "cell"
        )
    )
    return (
        pairs.groupBy(F.col("subspace").cast("long").alias("subspace"), "cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("subspace", "cell")
    )


def save_codebooks(
    spark, codebooks: list[list[tuple[int, list[int]]]], path: str
) -> None:
    """Persist the trained codebooks as a (subspace, cent_id, c) parquet
    table — the index artifact a build job ships to query/ingest jobs
    (streaming/encode.py consumes the loaded form)."""
    rows = [
        (s, cid, c)
        for s, rows_s in enumerate(codebooks)
        for cid, c in rows_s
    ]
    spark.createDataFrame(
        rows, "subspace int, cent_id long, c array<long>"
    ).write.mode("overwrite").parquet(path)


def load_codebooks(spark, path: str) -> list[list[tuple[int, list[int]]]]:
    """Inverse of :func:`save_codebooks`; subspaces come back sorted with
    each codebook in ascending cent_id order (the argmax tie-break
    contract)."""
    rows = spark.read.parquet(path).collect()
    if not rows:
        # codebooks trained on an empty corpus round-trip as [] (mirrors
        # the empty-codebook handling in _encode/adc_topk)
        return []
    m = max(r["subspace"] for r in rows) + 1
    books: list[list[tuple[int, list[int]]]] = [[] for _ in range(m)]
    for r in rows:
        books[r["subspace"]].append((r["cent_id"], list(r["c"])))
    return [sorted(b) for b in books]


def build_ivf_pq_index(
    emb: DataFrame,
    ivf_mod: int = 31,
    ivf_iters: int = 1,
    m: int = 4,
    dims: int = 64,
    pq_mod: int = 63,
    pq_iters: int = 1,
):
    """The full ANN index build: one frame of (vec_id, cell, s0..s{m-1}) —
    IVF coarse cell over the full vector plus the m PQ subspace codes —
    computed in a SINGLE kernel pass over one checkpointed base.

    Returns (index_df, ivf_cent_rows, codebooks). This is the table a
    deployment persists (partitioned by cell): probes prune to nprobe
    cells, ADC ranks inside them without touching raw vectors.
    """
    dims_sub = dims // m
    cols = [F.col("vec_id"), F.col("embedding"),
            scaled_dot(F.col("embedding"), F.col("embedding")).alias("norm_full"),
            kmeans._quantize(F.col("embedding")).alias("q_full")]
    for s in range(m):
        sl = F.slice("embedding", s * dims_sub + 1, dims_sub)
        cols.append(scaled_dot(sl, sl).alias(f"norm_{s}"))
        cols.append(kmeans._quantize(sl).alias(f"q_{s}"))
    # lazy checkpoint: the IVF init-sample collect is the first action, so
    # one job materializes the base AND seeds the coarse quantizer (r12)
    base = emb.select(*cols).localCheckpoint(eager=False)

    # IVF training on the full vector (kmeans contract via projection)
    ivf_view = base.select(
        "vec_id", "embedding", F.col("norm_full").alias("norm_s"), F.col("q_full").alias("q")
    )
    ivf_cents = kmeans._collect_cents(
        ivf_view.filter(F.col("vec_id") % ivf_mod == 1).select(
            F.col("vec_id").alias("cent_id"), F.col("q").alias("c")
        )
    )
    base = kmeans._compact(base, len(ivf_cents) * ivf_mod)
    ivf_view = base.select(
        "vec_id", "embedding", F.col("norm_full").alias("norm_s"),
        F.col("q_full").alias("q"),
    )
    for _ in range(ivf_iters):
        ivf_cents = kmeans._collect_cents(
            kmeans._assign_update(ivf_view, ivf_cents, dims)
        )

    # PQ codebooks per subspace (fused rounds — reuse the training loop
    # against the shared base by projecting the same column contract)
    init = base.filter(F.col("vec_id") % pq_mod == 1).select(
        "vec_id", *[f"q_{s}" for s in range(m)]
    )
    seeds = sorted((r["vec_id"], [list(r[f"q_{s}"]) for s in range(m)]) for r in init.collect())
    codebooks = [[(vid, qs[s]) for vid, qs in seeds] for s in range(m)]
    for _ in range(pq_iters):
        rows = _encode_update(base, codebooks, dims_sub).collect()
        codebooks = [
            sorted((r["cell"], list(r["c"])) for r in rows if r["subspace"] == s)
            for s in range(m)
        ]

    # empty corpus (or an empty training sample): no centroids exist, so
    # the numpy preps below would be 1-D empties — return the schema-stable
    # empty index instead (ivf_pq_topk's not-ivf_cents guard handles it)
    if not ivf_cents or any(not cb for cb in codebooks):
        empty_schema = "vec_id long, cell long, " + ", ".join(
            f"s{s} long" for s in range(m)
        )
        return emb.sparkSession.createDataFrame([], empty_schema), ivf_cents, codebooks

    # ONE combined kernel: IVF cell + all subspace codes per vector
    ivf_ids = np.asarray([cid for cid, _ in ivf_cents], dtype=np.int64)
    ivf_dq = np.asarray([c for _, c in ivf_cents], dtype=np.float64) / QUANT
    ivf_cn = np.floor((ivf_dq * ivf_dq) * SCALE).astype(np.int64).sum(axis=1)
    ivf_csqrt = np.sqrt(ivf_cn.astype(np.float64))
    preps = []
    for cent_rows in codebooks:
        ids = np.asarray([cid for cid, _ in cent_rows], dtype=np.int64)
        dq = np.asarray([c for _, c in cent_rows], dtype=np.float64) / QUANT
        cn = np.floor((dq * dq) * SCALE).astype(np.int64).sum(axis=1)
        preps.append((ids, dq, np.sqrt(cn.astype(np.float64))))

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            dot = np.floor((x[:, None, :] * ivf_dq[None, :, :]) * SCALE).astype(np.int64).sum(axis=2)
            nf = np.sqrt(pdf["norm_full"].to_numpy().astype(np.float64))
            cos = dot.astype(np.float64) / (nf[:, None] * ivf_csqrt[None, :])
            out["cell"] = ivf_ids[np.argmax(cos, axis=1)]
            for s, (ids, dq, c_sqrt) in enumerate(preps):
                xs = x[:, s * dims_sub : (s + 1) * dims_sub]
                ns = np.sqrt(pdf[f"norm_{s}"].to_numpy().astype(np.float64))
                d = np.floor((xs[:, None, :] * dq[None, :, :]) * SCALE).astype(np.int64).sum(axis=2)
                cs = d.astype(np.float64) / (ns[:, None] * c_sqrt[None, :])
                out[f"s{s}"] = ids[np.argmax(cs, axis=1)]
            yield pd.DataFrame(out)

    schema = "vec_id long, cell long, " + ", ".join(f"s{s} long" for s in range(m))
    index_df = base.select(
        "vec_id", "embedding", "norm_full", *[f"norm_{s}" for s in range(m)]
    ).mapInPandas(kernel, schema)
    return index_df, ivf_cents, codebooks


def ivf_pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    ivf_mod: int = 31,
    m: int = 4,
    dims: int = 64,
    pq_mod: int = 63,
) -> DataFrame:
    """IVF-PQ search — the billion-scale ANN pairing: the IVF cell prunes
    candidates to ``nprobe`` probed cells per query, ADC ranks ONLY those
    candidates from their compact codes. Scoring touches no raw vectors:
    probed-cell membership is a map-side IN over the broadcast probe set and
    the ADC lookups are plan-baked map literals (see :func:`adc_topk`).

    Returns (query_id, rank, neighbor_id, adc_s) — rank over probed cells
    by (adc_s DESC, neighbor_id), self excluded.
    """
    dims_sub = dims // m
    index_df, ivf_cents, codebooks = build_ivf_pq_index(
        emb, ivf_mod=ivf_mod, ivf_iters=1, m=m, dims=dims, pq_mod=pq_mod, pq_iters=1
    )
    qvecs = {
        r["vec_id"]: np.asarray(list(r["embedding"]), dtype=np.float64)
        for r in emb.filter(F.col("vec_id").isin(query_ids)).select("vec_id", "embedding").collect()
    }
    query_ids = [q for q in query_ids if q in qvecs]
    if not query_ids or not ivf_cents or any(not cb for cb in codebooks):
        return emb.sparkSession.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, adc_s long"
        )

    ivf_ids = np.asarray([cid for cid, _ in ivf_cents], dtype=np.int64)
    ivf_dq = np.asarray([c for _, c in ivf_cents], dtype=np.float64) / QUANT
    ivf_cn = np.floor((ivf_dq * ivf_dq) * SCALE).astype(np.int64).sum(axis=1)

    def probed_cells(qid: int) -> list[int]:
        q = qvecs[qid]
        dot = np.floor((q[None, :] * ivf_dq) * SCALE).astype(np.int64).sum(axis=1)
        qn = np.floor((q * q) * SCALE).astype(np.int64).sum()
        cos = dot.astype(np.float64) / (
            np.sqrt(float(qn)) * np.sqrt(ivf_cn.astype(np.float64))
        )
        order = sorted(range(len(ivf_ids)), key=lambda i: (-cos[i], ivf_ids[i]))
        return [int(ivf_ids[i]) for i in order[:nprobe]]

    def adc_expr(qid: int):
        return _adc_sum(qvecs[qid], codebooks, dims_sub)

    probes = {qid: probed_cells(qid) for qid in query_ids}
    scored = index_df.select(
        "vec_id",
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).cast("long").alias("query_id"),
                        # CaseWhen evaluates lazily per row: rows outside the
                        # probed cells (the vast majority at scale — that IS
                        # the IVF prune) never pay the m map lookups
                        F.when(
                            F.col("cell").isin(probes[qid]),
                            adc_expr(qid).cast("long"),
                        ).alias("adc_s"),
                        F.col("cell").isin(probes[qid]).alias("probed"),
                    )
                    for qid in query_ids
                ]
            )
        ).alias("x"),
    ).select(
        F.col("x.query_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("x.adc_s"),
        F.col("x.probed"),
    )
    from pyspark.sql import Window

    ranked = (
        scored.filter(F.col("probed") & (F.col("neighbor_id") != F.col("query_id")))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("adc_s"), F.asc("neighbor_id"))
            ),
        )
    )
    return ranked.filter(F.col("rank") <= k).select("query_id", "rank", "neighbor_id", "adc_s")


def ivf_pq_refined_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    shortlist: int = 20,
    nprobe: int = 2,
    ivf_mod: int = 31,
    m: int = 4,
    dims: int = 64,
    pq_mod: int = 63,
) -> DataFrame:
    """The complete production ANN path: IVF probe → ADC shortlist → EXACT
    refinement. ADC ranking is approximate (quantization error); real
    deployments take an ADC shortlist (``shortlist`` ≥ k) and re-score just
    those rows against the raw vectors — the refinement join touches
    ``nq × shortlist`` rows however large the corpus is, so the exact pass
    costs nothing at scale while recovering exact-cosine ordering within
    the probed region.

    Returns (query_id, rank, neighbor_id, cos_sim) ranked by exact cosine.
    """
    from pyspark.sql import Window

    cand = ivf_pq_topk(
        emb, query_ids, k=shortlist, nprobe=nprobe, ivf_mod=ivf_mod,
        m=m, dims=dims, pq_mod=pq_mod,
    ).select("query_id", "neighbor_id")
    base = with_self_norm(emb)
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_s").alias("q_norm"),
    )
    refined = (
        base.join(F.broadcast(cand), base["vec_id"] == cand["neighbor_id"])
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                scaled_dot(F.col("q_emb"), F.col("embedding")).cast("double")
                / (
                    F.sqrt(F.col("q_norm").cast("double"))
                    * F.sqrt(F.col("norm_s").cast("double"))
                )
            ).alias("cos"),
        )
    )
    ranked = refined.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos_sim")
    )
