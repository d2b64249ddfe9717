"""Embedding / ANN queries: IVF & PQ training and search, semantic dedup,
kNN graph, hard negatives, hybrid retrieval, drift, matryoshka recall,
prototype pruning.

Split from the former monolithic queries/extensions.py (round 7); the
registration order of the full extension family is pinned by
queries/extensions.py::_CANONICAL_ORDER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.parquet import load_table

from iceberg_meta_spark.queries._ext_shared import (  # noqa: E402
    _BM25_TERMS,
)


from iceberg_meta_spark.pipeline import graph, quality  # noqa: E402

from iceberg_meta_spark.pipeline import corpus  # noqa: E402

from iceberg_meta_spark.pipeline import kmeans  # noqa: E402

_KM_NORM = """(SELECT CAST(sum(CAST(floor(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)*1e12) AS BIGINT)) AS BIGINT)
    FROM (SELECT unnest(b.embedding) AS x) zn)"""

def _km_assign(cents: str, out: str) -> str:
    """One unrolled assignment CTE: argmax-cosine cell per vector against
    quantized centroids (components at 1e6 scale, dots floor-scaled 1e12)."""
    dot = """(SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * (CAST(xb AS DOUBLE)/1000000.0) * 1e12) AS BIGINT)) AS BIGINT)
        FROM (SELECT unnest(b.embedding) AS xa, unnest(c.c) AS xb) zd)"""
    cn = """(SELECT CAST(sum(CAST(floor((CAST(xc AS DOUBLE)/1000000.0)*(CAST(xc AS DOUBLE)/1000000.0)*1e12) AS BIGINT)) AS BIGINT)
        FROM (SELECT unnest(c.c) AS xc) zc)"""
    return f"""{out} AS (
        SELECT vec_id, CAST(cent_id AS BIGINT) AS cell FROM (
            SELECT b.vec_id, c.cent_id,
                   row_number() OVER (PARTITION BY b.vec_id ORDER BY
                     CAST({dot} AS DOUBLE)
                       / (sqrt(CAST(b.norm_s AS DOUBLE)) * sqrt(CAST({cn} AS DOUBLE)))
                     DESC, c.cent_id) AS rn
            FROM base b, {cents} c) WHERE rn = 1)"""

def _km_update(assign: str, out: str) -> str:
    """One unrolled update CTE: per-cell integer mean of quantized vectors."""
    return f"""{out}_s AS (
        SELECT a.cell, g.i, CAST(sum(b.q[g.i]) // count(*) AS BIGINT) AS s
        FROM {assign} a JOIN base b USING (vec_id), generate_series(1, 64) AS g(i)
        GROUP BY a.cell, g.i),
    {out} AS (SELECT cell AS cent_id, list(s ORDER BY i) AS c FROM {out}_s GROUP BY cell)"""

def _km_prefix(iters: int, centroid_mod: int) -> list[str]:
    """Shared unrolled-Lloyd CTE chain ending at the final assignment
    ``af`` and refined centroids ``c{iters}``."""
    parts = [
        f"""WITH base AS (
        SELECT b.vec_id, b.embedding, {_KM_NORM} AS norm_s,
               list_transform(b.embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS q
        FROM embeddings b),
    c0 AS (SELECT vec_id AS cent_id, q AS c FROM base WHERE vec_id % {centroid_mod} = 1)"""
    ]
    for i in range(iters):
        parts.append(_km_assign(f"c{i}", f"a{i}"))
        parts.append(_km_update(f"a{i}", f"c{i+1}"))
    parts.append(_km_assign(f"c{iters}", "af"))
    return parts

def _kmeans_oracle(iters: int = 2, centroid_mod: int = 31) -> str:
    parts = _km_prefix(iters, centroid_mod)
    parts.append(
        f"""sizes AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors FROM af GROUP BY cell),
    cm AS (SELECT cent_id AS cell, md5(array_to_string(c, ',')) AS centroid_md5 FROM c{iters})"""
    )
    return (
        ",\n    ".join(parts)
        + "\n    SELECT s.cell, s.n_vectors, cm.centroid_md5 FROM sizes s JOIN cm USING (cell)"
    )

@register(
    "ann_ivf_train",
    tags=("bench",),
    oracle=_kmeans_oracle(iters=2, centroid_mod=31),
    doc="IVF coarse-quantizer training: 2 Lloyd rounds from the "
    "deterministic id-sample init — broadcast centroids, map-side argmax "
    "assignment (one row per vector through the shuffle), per-cell integer "
    "centroid means at 1e6 quantization; iterative yet hash-gated because "
    "every step is integer-exact",
)
def ann_ivf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans.kmeans_cells(
        load_table(spark, sf_dir, "embeddings"), centroid_mod=31, iters=2, dims=64
    )

def _semantic_dedup_oracle(
    iters: int = 2, centroid_mod: int = 31, threshold: float = 0.9
) -> str:
    pair_dot = """(SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE)*CAST(xb AS DOUBLE)*1e12) AS BIGINT)) AS BIGINT)
        FROM (SELECT unnest(x.embedding) AS xa, unnest(y.embedding) AS xb) zp)"""
    parts = _km_prefix(iters, centroid_mod)
    parts.append(
        f"""cellv AS (SELECT a.cell, b.vec_id, b.embedding, b.norm_s
               FROM af a JOIN base b USING (vec_id)),
    hits AS (SELECT x.cell, x.vec_id AS va, y.vec_id AS vb
             FROM cellv x JOIN cellv y
               ON x.cell = y.cell AND x.vec_id < y.vec_id
             WHERE CAST({pair_dot} AS DOUBLE)
                     / (sqrt(CAST(x.norm_s AS DOUBLE)) * sqrt(CAST(y.norm_s AS DOUBLE)))
                   >= {threshold}),
    per_cell AS (SELECT cell, CAST(count(*) AS BIGINT) AS dup_pairs,
                   CAST(count(DISTINCT vb) AS BIGINT) AS removable
                 FROM hits GROUP BY cell),
    sizes AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors FROM af GROUP BY cell)"""
    )
    return (
        ",\n    ".join(parts)
        + """
    SELECT s.cell, s.n_vectors,
           CAST(coalesce(p.dup_pairs, 0) AS BIGINT) AS dup_pairs,
           CAST(coalesce(p.removable, 0) AS BIGINT) AS removable
    FROM sizes s LEFT JOIN per_cell p USING (cell)
    ORDER BY cell"""
    )

@register(
    "dedup_semantic",
    tags=("bench",),
    oracle=_semantic_dedup_oracle(iters=2, centroid_mod=31, threshold=0.9),
    doc="SemDeDup (Abbas et al. 2023 shape): near-dup pairs found ONLY "
    "within refined k-means cells — the learned cluster is the candidate "
    "blocker instead of an all-pairs product or a data-independent LSH "
    "bucket. Per cell: members, pairs at cosine >= 0.9, removable count "
    "under the keep-lowest survivor rule. In-cell self-join is ~cell² by "
    "design; K grows with N to hold cell size constant",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans.semantic_dedup(
        load_table(spark, sf_dir, "embeddings"),
        centroid_mod=31,
        iters=2,
        dims=64,
        threshold=0.9,
    )

def _knn_graph_oracle(iters: int = 2, centroid_mod: int = 31, k: int = 3) -> str:
    pair_dot = """(SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE)*CAST(xb AS DOUBLE)*1e12) AS BIGINT)) AS BIGINT)
        FROM (SELECT unnest(x.embedding) AS xa, unnest(y.embedding) AS xb) zp)"""
    parts = _km_prefix(iters, centroid_mod)
    parts.append(
        f"""cellv AS (SELECT a.cell, b.vec_id, b.embedding, b.norm_s
               FROM af a JOIN base b USING (vec_id)),
    scored AS (SELECT x.vec_id, y.vec_id AS neighbor_id,
                      CAST({pair_dot} AS DOUBLE)
                        / (sqrt(CAST(x.norm_s AS DOUBLE)) * sqrt(CAST(y.norm_s AS DOUBLE))) AS cos
               FROM cellv x JOIN cellv y
                 ON x.cell = y.cell AND x.vec_id <> y.vec_id),
    ranked AS (SELECT vec_id, neighbor_id, cos,
                      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
               FROM scored)"""
    )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT vec_id, rank, neighbor_id, round(cos, 6) AS cos_sim
    FROM ranked WHERE rank <= {k} ORDER BY vec_id, rank"""
    )

@register(
    "knn_graph",
    tags=("bench",),
    oracle=_knn_graph_oracle(iters=2, centroid_mod=31, k=3),
    doc="Approximate KNN graph: exact top-3 cosine neighbors per vector "
    "within its refined k-means cell (the seed structure for SemDeDup-style "
    "curation, diversity sampling, and NN-descent/NSW index builds). One "
    "shuffle groups cells; a chunked numpy kernel scores the in-cell block "
    "and ranks inside the kernel — no global window, ~N^1.5 total work at "
    "K ~ sqrt(N)",
)
def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans.knn_graph(
        load_table(spark, sf_dir, "embeddings"), centroid_mod=31, iters=2, dims=64, k=3
    )

@register(
    "embedding_quantize",
    oracle="""
        WITH base AS (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) AS scale
            FROM embeddings)
        SELECT vec_id,
               CASE WHEN scale = 0 THEN 0
                    ELSE CAST(floor(scale * 1000000000) AS BIGINT) END AS scale_s,
               CASE WHEN scale = 0
                    THEN md5(array_to_string(list_transform(embedding, x -> '0'), ','))
                    ELSE md5(array_to_string(list_transform(embedding,
                        x -> CAST(CAST(floor((CAST(x AS DOUBLE) / scale) * 127) AS BIGINT)
                                  AS VARCHAR)), ','))
               END AS q_md5,
               CASE WHEN scale = 0 THEN 0
                    ELSE CAST(list_sum(list_transform(embedding,
                        x -> CAST(floor(abs(CAST(x AS DOUBLE)
                             - (CAST(floor((CAST(x AS DOUBLE) / scale) * 127) AS DOUBLE)
                                * scale) / 127.0) * 1000000000) AS BIGINT))) AS BIGINT)
               END AS err_s
        FROM base
    """,
    doc="Symmetric int8 embedding quantization (the 4x ANN memory "
    "reduction): per-vector scale, quantized-array md5, and floor-scaled "
    "reconstruction error — integer-exact, pure map-side, zero shuffle",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.similarity import int8_quantize

    return int8_quantize(load_table(spark, sf_dir, "embeddings"))

from iceberg_meta_spark.pipeline.similarity import hard_negatives  # noqa: E402

_HN_NORM = """(SELECT CAST(sum(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT)
             FROM unnest(embedding) AS u(x))"""

_HN_DOT = """(SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT)
             FROM (SELECT unnest(q.q_emb) AS xa, unnest(b.embedding) AS xb) z)"""

@register(
    "hard_negatives",
    oracle=f"""
        WITH base AS (SELECT vec_id, label, embedding, {_HN_NORM} AS norm_s FROM embeddings),
        q AS (SELECT vec_id AS query_id, label AS q_label, embedding AS q_emb, norm_s AS q_norm
              FROM base WHERE vec_id IN (1, 7, 42)),
        pairs AS (SELECT q.query_id, q.q_label, b.vec_id AS negative_id, b.label AS neg_label,
                         {_HN_DOT} AS dot_s, q.q_norm, b.norm_s
                  FROM base b, q
                  WHERE b.vec_id <> q.query_id AND b.label <> q.q_label),
        scored AS (SELECT query_id, q_label, negative_id, neg_label,
                          CAST(dot_s AS DOUBLE) / (sqrt(CAST(q_norm AS DOUBLE)) * sqrt(CAST(norm_s AS DOUBLE))) AS cos
                   FROM pairs),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, negative_id) AS rank
                   FROM scored)
        SELECT query_id, q_label, rank, negative_id, neg_label, round(cos, 6) AS cos_sim
        FROM ranked WHERE rank <= 5
    """,
    doc="Hard-negative mining for contrastive training: per query vector, "
    "the top-5 most-similar DIFFERENT-label candidates (high-cosine wrong-"
    "class neighbors). Brute-force plan shape: broadcast query set, one "
    "candidate pass, label-mismatch predicate before the per-query ranking "
    "window; exact integer dot products keep it hash-gated",
)
def hard_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives(emb, query_ids=[1, 7, 42], k=5)

from iceberg_meta_spark.pipeline import pq  # noqa: E402

def _pq_norm(basename: str) -> str:
    return f"""(SELECT CAST(sum(CAST(floor(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)*1e12) AS BIGINT)) AS BIGINT)
    FROM (SELECT unnest({basename}.e) AS x) zn)"""

def _pq_assign(base: str, cents: str, out: str) -> str:
    dot = f"""(SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * (CAST(xb AS DOUBLE)/1000000.0) * 1e12) AS BIGINT)) AS BIGINT)
        FROM (SELECT unnest(b.e) AS xa, unnest(c.c) AS xb) zd)"""
    cn = """(SELECT CAST(sum(CAST(floor((CAST(xc AS DOUBLE)/1000000.0)*(CAST(xc AS DOUBLE)/1000000.0)*1e12) AS BIGINT)) AS BIGINT)
        FROM (SELECT unnest(c.c) AS xc) zc)"""
    return f"""{out} AS (
        SELECT vec_id, CAST(cent_id AS BIGINT) AS cell FROM (
            SELECT b.vec_id, c.cent_id,
                   row_number() OVER (PARTITION BY b.vec_id ORDER BY
                     CAST({dot} AS DOUBLE)
                       / (sqrt(CAST(b.norm_s AS DOUBLE)) * sqrt(CAST({cn} AS DOUBLE)))
                     DESC, c.cent_id) AS rn
            FROM {base} b, {cents} c) WHERE rn = 1)"""

def _pq_update(base: str, assign: str, out: str, dims_sub: int) -> str:
    return f"""{out}_s AS (
        SELECT a.cell, g.i, CAST(sum(b.q[g.i]) // count(*) AS BIGINT) AS s
        FROM {assign} a JOIN {base} b USING (vec_id), generate_series(1, {dims_sub}) AS g(i)
        GROUP BY a.cell, g.i),
    {out} AS (SELECT cell AS cent_id, list(s ORDER BY i) AS c FROM {out}_s GROUP BY cell)"""

def _pq_prefix(m: int, dims_sub: int, centroid_mod: int, iters: int) -> list[str]:
    """Per-subspace unrolled-Lloyd CTE chains, each ending at ``af{s}``."""
    parts = []
    for s in range(m):
        lo, hi = s * dims_sub + 1, (s + 1) * dims_sub
        bname = f"pb{s}"
        head = f"""{bname} AS (
        SELECT b.vec_id, b.embedding[{lo}:{hi}] AS e, 0 AS _z FROM embeddings b),
    {bname}n AS (
        SELECT {bname}.vec_id, {bname}.e, {_pq_norm(bname)} AS norm_s,
               list_transform({bname}.e,
                   x -> CAST(floor(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS q
        FROM {bname}),
    {bname}c0 AS (SELECT vec_id AS cent_id, q AS c FROM {bname}n
                  WHERE vec_id % {centroid_mod} = 1)"""
        parts.append(head)
        prev = f"{bname}c0"
        for i in range(iters):
            parts.append(_pq_assign(f"{bname}n", prev, f"{bname}a{i}"))
            parts.append(_pq_update(f"{bname}n", f"{bname}a{i}", f"{bname}c{i+1}", dims_sub))
            prev = f"{bname}c{i+1}"
        parts.append(_pq_assign(f"{bname}n", prev, f"af{s}"))
    return parts

def _pq_codes_oracle(m: int = 4, dims_sub: int = 16, centroid_mod: int = 63, iters: int = 1) -> str:
    parts = _pq_prefix(m, dims_sub, centroid_mod, iters)
    joins = " ".join(f"JOIN af{s} ON af{s}.vec_id = af0.vec_id" for s in range(1, m))
    cells = ", ".join(f"af{s}.cell AS s{s}" for s in range(m))
    code = " || '-' || ".join(f"CAST(af{s}.cell AS VARCHAR)" for s in range(m))
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT af0.vec_id, {cells}, {code} AS code
    FROM af0 {joins}"""
    )

@register(
    "pq_codes",
    oracle=_pq_codes_oracle(m=4, dims_sub=16, centroid_mod=63, iters=1),
    tags=("bench",),
    doc="Product quantization: 4 independent per-subspace Lloyd codebooks "
    "(16 dims each, integer-exact like the IVF trainer), then ONE combined "
    "Arrow kernel encodes every vector's 4 subspace argmax cells in a "
    "single pass — never an m-way self-join; iterative yet hash-gated",
)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.pq_codes(load_table(spark, sf_dir, "embeddings"))

@register(
    "pq_codebook_balance",
    oracle=_pq_codes_oracle(m=4, dims_sub=16, centroid_mod=63, iters=1).replace(
        """
    SELECT af0.vec_id, af0.cell AS s0, af1.cell AS s1, af2.cell AS s2, af3.cell AS s3, CAST(af0.cell AS VARCHAR) || '-' || CAST(af1.cell AS VARCHAR) || '-' || CAST(af2.cell AS VARCHAR) || '-' || CAST(af3.cell AS VARCHAR) AS code
    FROM af0 JOIN af1 ON af1.vec_id = af0.vec_id JOIN af2 ON af2.vec_id = af0.vec_id JOIN af3 ON af3.vec_id = af0.vec_id""",
        """,
    pairs AS (SELECT 0 AS subspace, cell FROM af0 UNION ALL
              SELECT 1, cell FROM af1 UNION ALL
              SELECT 2, cell FROM af2 UNION ALL
              SELECT 3, cell FROM af3)
    SELECT CAST(subspace AS BIGINT) AS subspace, cell,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM pairs GROUP BY subspace, cell ORDER BY subspace, cell""",
    ),
    doc="PQ codebook balance diagnostic: member count per (subspace, cell) "
    "via in-row posexplode of the code columns — one encode pass, one "
    "map-side-combined groupBy",
)
def pq_codebook_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.pq_codebook_summary(load_table(spark, sf_dir, "embeddings"))

def _adc_oracle(
    query_ids=(1, 7, 42), k=5, m=4, dims_sub=16, centroid_mod=63, iters=1
) -> str:
    """ADC scores rebuilt in SQL: per (query, subspace), each vector's
    contribution is the exact integer dot of the query slice with the
    vector's ASSIGNED refined centroid — m × nq union blocks, then a
    per-query sum + rank."""
    parts = _pq_prefix(m, dims_sub, centroid_mod, iters)
    blocks = []
    for qid in query_ids:
        for s in range(m):
            lo, hi = s * dims_sub + 1, (s + 1) * dims_sub
            dot = f"""(SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * (CAST(xb AS DOUBLE)/1000000.0) * 1e12) AS BIGINT)) AS BIGINT)
                FROM (SELECT unnest(qv.embedding[{lo}:{hi}]) AS xa, unnest(c.c) AS xb) zq)"""
            blocks.append(
                f"""SELECT a.vec_id, CAST({qid} AS BIGINT) AS query_id, {dot} AS contrib
              FROM af{s} a
              JOIN pb{s}c{iters} c ON c.cent_id = a.cell,
                   (SELECT embedding FROM embeddings WHERE vec_id = {qid}) qv"""
            )
    union = "\n              UNION ALL ".join(blocks)
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    contrib AS ({union}),
    scores AS (SELECT query_id, vec_id AS neighbor_id,
                 CAST(sum(contrib) AS BIGINT) AS adc_s
               FROM contrib GROUP BY query_id, vec_id),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY adc_s DESC, neighbor_id) AS rank
               FROM scores WHERE neighbor_id <> query_id)
    SELECT query_id, rank, neighbor_id, adc_s FROM ranked WHERE rank <= {k}"""
    )

@register(
    "ann_pq_adc",
    oracle=_adc_oracle(query_ids=(1, 7, 42), k=5, m=4, dims_sub=16, centroid_mod=63, iters=1),
    tags=("bench",),
    doc="Asymmetric distance computation over PQ codes — the 10^9-vector "
    "search path: corpus scanned as m small ints per vector, per-query "
    "similarity via broadcast LUT map-literal lookups (LUT[s][cell] = exact "
    "integer dot of query slice x refined centroid), pure map-side scoring, "
    "per-query top-k window; approximate ranking, hash-gated exactly",
)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.adc_topk(load_table(spark, sf_dir, "embeddings"), query_ids=[1, 7, 42], k=5)

@register(
    "hybrid_retrieval",
    oracle=f"""
        WITH corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
                        FROM documents),
        tok AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
                       unnest(string_split(text, ' ')) AS token
                FROM documents),
        tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
               FROM tok WHERE token IN {_BM25_TERMS!r}
               GROUP BY doc_id, token),
        dfreq AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                  FROM tf GROUP BY token),
        contrib AS (SELECT doc_id,
                      CAST(floor(((n_docs - df + 0.5) / (df + 0.5))
                        * ((tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (total_tokens / n_docs))))
                        * 1000000) AS BIGINT) AS si
                    FROM tf JOIN dfreq USING (token), corpus),
        bm AS (SELECT doc_id, CAST(sum(si) AS BIGINT) AS score_scaled
               FROM contrib GROUP BY doc_id
               ORDER BY score_scaled DESC, doc_id LIMIT 25),
        cands AS (SELECT doc_id, score_scaled,
                    row_number() OVER (ORDER BY score_scaled DESC, doc_id) AS bm25_rank
                  FROM bm),
        norms AS (SELECT vec_id, embedding,
                    (SELECT CAST(sum(CAST(floor(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)*1e12) AS BIGINT)) AS BIGINT)
                     FROM (SELECT unnest(embedding) AS x) zn) AS norm_s
                  FROM embeddings),
        qv AS (SELECT embedding AS q_emb, norm_s AS q_norm FROM norms WHERE vec_id = 7),
        rer AS (SELECT c.doc_id, c.bm25_rank,
                  CAST((SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE)*CAST(xb AS DOUBLE)*1e12) AS BIGINT)) AS BIGINT)
                        FROM (SELECT unnest(n.embedding) AS xa, unnest(q.q_emb) AS xb) zd) AS DOUBLE)
                    / (sqrt(CAST(n.norm_s AS DOUBLE)) * sqrt(CAST(q.q_norm AS DOUBLE))) AS cos
                FROM cands c JOIN norms n ON n.vec_id = c.doc_id, qv q),
        ranked AS (SELECT doc_id, bm25_rank,
                     row_number() OVER (ORDER BY cos DESC, doc_id) AS cos_rank
                   FROM rer),
        fused AS (SELECT doc_id, bm25_rank, cos_rank,
                    CAST(1000000 // (60 + bm25_rank) + 1000000 // (60 + cos_rank) AS BIGINT)
                      AS rrf_scaled
                  FROM ranked)
        SELECT CAST(row_number() OVER (ORDER BY rrf_scaled DESC, doc_id) AS BIGINT) AS rank,
               doc_id, CAST(bm25_rank AS BIGINT) AS bm25_rank,
               CAST(cos_rank AS BIGINT) AS cos_rank, rrf_scaled
        FROM fused ORDER BY rrf_scaled DESC, doc_id LIMIT 10
    """,
    doc="Two-stage hybrid search (RAG retriever shape): BM25 keyword "
    "candidates -> candidates broadcast into the embeddings scan (the "
    "10^9-vector table is filtered by a <=25-row hash join, never "
    "shuffled) -> cosine rerank vs one query vector -> integer reciprocal-"
    "rank fusion; every window runs over <=25 candidate rows",
)
def hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.hybrid_retrieval(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        _BM25_TERMS,
        query_vec_id=7,
    )

@register(
    "embedding_drift",
    oracle="""
        WITH q AS (SELECT label, vec_id % 2 AS cohort,
                     list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS qv
                   FROM embeddings),
        qi AS (SELECT label, cohort, g.i,
                 CAST(sum(qv[g.i]) // count(*) AS BIGINT) AS s
               FROM q, generate_series(1, 64) AS g(i)
               GROUP BY label, cohort, g.i),
        cnt AS (SELECT label, cohort, CAST(count(*) AS BIGINT) AS n
                FROM q GROUP BY label, cohort),
        cent AS (SELECT label, cohort, list(s ORDER BY i) AS c
                 FROM qi GROUP BY label, cohort),
        pair AS (SELECT a.label, ca.n AS n_ref, cb.n AS n_cur,
                   a.c AS c0, b.c AS c1
                 FROM cent a
                 JOIN cent b ON b.label = a.label AND a.cohort = 0 AND b.cohort = 1
                 JOIN cnt ca ON ca.label = a.label AND ca.cohort = 0
                 JOIN cnt cb ON cb.label = a.label AND cb.cohort = 1),
        scored AS (SELECT label, n_ref, n_cur,
                     CAST((SELECT CAST(sum(CAST(floor((CAST(xa AS DOUBLE)/1000000.0)*(CAST(xb AS DOUBLE)/1000000.0)*1e12) AS BIGINT)) AS BIGINT)
                           FROM (SELECT unnest(c0) AS xa, unnest(c1) AS xb) zd) AS DOUBLE)
                     / (sqrt(CAST((SELECT CAST(sum(CAST(floor((CAST(x0 AS DOUBLE)/1000000.0)*(CAST(x0 AS DOUBLE)/1000000.0)*1e12) AS BIGINT)) AS BIGINT)
                                   FROM (SELECT unnest(c0) AS x0) z0) AS DOUBLE))
                        * sqrt(CAST((SELECT CAST(sum(CAST(floor((CAST(x1 AS DOUBLE)/1000000.0)*(CAST(x1 AS DOUBLE)/1000000.0)*1e12) AS BIGINT)) AS BIGINT)
                                   FROM (SELECT unnest(c1) AS x1) z1) AS DOUBLE))) AS cos
                   FROM pair)
        SELECT label, n_ref, n_cur, round(cos, 6) AS centroid_cos,
               cos < 0.995 AS drifted
        FROM scored ORDER BY label
    """,
    doc="Per-label embedding distribution-shift monitor: cosine between "
    "id-parity cohort centroids (integer means of 1e6-quantized "
    "components, exact scaled dots) — the training/serving-skew query a "
    "feature-store pipeline schedules; 2 rows per label through the one "
    "shuffle, tiny centroid self-join after",
)
def embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.embedding_drift(load_table(spark, sf_dir, "embeddings"))

from iceberg_meta_spark.pipeline import multimodal  # noqa: E402

@register(
    "multimodal_near_dup",
    oracle="""
        WITH a AS (SELECT doc_id AS asset_id, hex(encode(text)) AS hx
                   FROM documents),
        c AS (SELECT asset_id,
                CAST((length(hx) + 127) // 128 AS BIGINT) AS n
              FROM a),
        fp AS (SELECT DISTINCT a.asset_id,
                 md5(substring(a.hx, u.i * 128 + 1, 128)) AS chunk_md5
               FROM a JOIN c USING (asset_id),
                    UNNEST(generate_series(0, c.n - 1)) AS u(i)
               WHERE c.n > 0),
        counts AS (SELECT asset_id, CAST(count(*) AS BIGINT) AS n_chunks
                   FROM fp GROUP BY asset_id),
        shared AS (SELECT x.asset_id AS asset_a, y.asset_id AS asset_b,
                     CAST(count(*) AS BIGINT) AS shared_chunks
                   FROM fp x JOIN fp y USING (chunk_md5)
                   WHERE x.asset_id < y.asset_id
                   GROUP BY 1, 2)
        SELECT s.asset_a, s.asset_b, s.shared_chunks,
               CAST((s.shared_chunks * 1000) // least(ca.n_chunks, cb.n_chunks) AS BIGINT)
                 AS overlap_permille
        FROM shared s
        JOIN counts ca ON ca.asset_id = s.asset_a
        JOIN counts cb ON cb.asset_id = s.asset_b
        WHERE (s.shared_chunks * 1000) // least(ca.n_chunks, cb.n_chunks) >= 500
    """,
    doc="Media near-duplicate pairs WITHOUT decoding: fixed-window chunk "
    "hashes of the raw payload (the storage-dedup signal), candidate pairs "
    "from a chunk-hash equi-join — shingle-join shape, never all-pairs "
    "byte comparison; overlap_permille vs the smaller asset, identical "
    "payloads score 1000",
)
def multimodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = multimodal.assets_from_documents(load_table(spark, sf_dir, "documents"))
    return multimodal.near_dup_assets(assets)

def _ivf_pq_oracle(query_ids=(1, 7, 42), k=5, nprobe=2, ivf_mod=31, m=4, dims_sub=16, pq_mod=63) -> str:
    """IVF-PQ search unrolled: the full-vector IVF chain (_km_prefix, 1
    round) + the per-subspace PQ chains (_pq_prefix) + per-query probed
    cells + ADC contributions restricted to probed candidates."""
    km = _km_prefix(1, ivf_mod)
    km[0] = km[0].removeprefix("WITH ")  # _km_prefix embeds the WITH keyword
    parts = km + _pq_prefix(m, dims_sub, pq_mod, 1)
    qdot = """(SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * (CAST(xb AS DOUBLE)/1000000.0) * 1e12) AS BIGINT)) AS BIGINT)
        FROM (SELECT unnest(q.embedding) AS xa, unnest(c.c) AS xb) zq)"""
    cn = """(SELECT CAST(sum(CAST(floor((CAST(xc AS DOUBLE)/1000000.0)*(CAST(xc AS DOUBLE)/1000000.0)*1e12) AS BIGINT)) AS BIGINT)
        FROM (SELECT unnest(c.c) AS xc) zc)"""
    for qid in query_ids:
        parts.append(
            f"""probed{qid} AS (
        SELECT cent_id AS cell FROM (
            SELECT c.cent_id,
                   row_number() OVER (ORDER BY
                     CAST({qdot} AS DOUBLE)
                       / (sqrt(CAST(q.norm_s AS DOUBLE)) * sqrt(CAST({cn} AS DOUBLE)))
                     DESC, c.cent_id) AS rn
            FROM c1 c, (SELECT embedding, norm_s FROM base WHERE vec_id = {qid}) q)
        WHERE rn <= {nprobe})"""
        )
    blocks = []
    for qid in query_ids:
        for s in range(m):
            lo, hi = s * dims_sub + 1, (s + 1) * dims_sub
            dot = f"""(SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * (CAST(xb AS DOUBLE)/1000000.0) * 1e12) AS BIGINT)) AS BIGINT)
                FROM (SELECT unnest(qv.embedding[{lo}:{hi}]) AS xa, unnest(c.c) AS xb) zd)"""
            blocks.append(
                f"""SELECT a.vec_id, CAST({qid} AS BIGINT) AS query_id, {dot} AS contrib
              FROM af a
              JOIN probed{qid} p ON p.cell = a.cell
              JOIN af{s} ps ON ps.vec_id = a.vec_id
              JOIN pb{s}c1 c ON c.cent_id = ps.cell,
                   (SELECT embedding FROM embeddings WHERE vec_id = {qid}) qv"""
            )
    union = "\n              UNION ALL ".join(blocks)
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    contrib AS ({union}),
    scores AS (SELECT query_id, vec_id AS neighbor_id,
                 CAST(sum(contrib) AS BIGINT) AS adc_s
               FROM contrib GROUP BY query_id, vec_id),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY adc_s DESC, neighbor_id) AS rank
               FROM scores WHERE neighbor_id <> query_id)
    SELECT query_id, rank, neighbor_id, adc_s FROM ranked WHERE rank <= {k}"""
    )

@register(
    "ann_ivf_pq",
    oracle=_ivf_pq_oracle(),
    tags=("bench",),
    doc="IVF-PQ search, the billion-scale ANN pairing: the full-vector IVF "
    "cell prunes candidates to nprobe probed cells per query (probe set "
    "computed against the K-row centroid table), ADC ranks only those "
    "candidates from their compact codes — scoring touches no raw vectors; "
    "ONE combined kernel builds (vec_id, cell, s0..s3) as the index table. "
    "Fully unrolled hash-gated oracle",
)
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.ivf_pq_topk(
        load_table(spark, sf_dir, "embeddings"), query_ids=[1, 7, 42], k=5, nprobe=2
    )

def _ivf_pq_refined_oracle(
    query_ids=(1, 7, 42), k=5, shortlist=20, nprobe=2, ivf_mod=31, m=4, dims_sub=16, pq_mod=63
) -> str:
    """The refined search: reuse the IVF-PQ unroll up to the ADC ranking,
    take the top-``shortlist`` per query, then re-rank those by EXACT
    cosine against the raw vectors."""
    inner = _ivf_pq_oracle(query_ids, shortlist, nprobe, ivf_mod, m, dims_sub, pq_mod)
    # strip the trailing SELECT (the inner query ends with the shortlist
    # selection) and keep its CTE chain + ranked CTE
    marker = "SELECT query_id, rank, neighbor_id, adc_s FROM ranked WHERE rank <= "
    head = inner[: inner.rindex(marker)].rstrip()
    return (
        head
        + f""",
    shortl AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= {shortlist}),
    nrm AS (SELECT vec_id, embedding,
              (SELECT CAST(sum(CAST(floor(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)*1e12) AS BIGINT)) AS BIGINT)
               FROM (SELECT unnest(embedding) AS x) zn) AS norm_s
            FROM embeddings),
    ref AS (SELECT s.query_id, s.neighbor_id,
              CAST((SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE)*CAST(xb AS DOUBLE)*1e12) AS BIGINT)) AS BIGINT)
                    FROM (SELECT unnest(qn.embedding) AS xa, unnest(nn.embedding) AS xb) zd) AS DOUBLE)
                / (sqrt(CAST(qn.norm_s AS DOUBLE)) * sqrt(CAST(nn.norm_s AS DOUBLE))) AS cos
            FROM shortl s
            JOIN nrm nn ON nn.vec_id = s.neighbor_id
            JOIN nrm qn ON qn.vec_id = s.query_id),
    rranked AS (SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rank
                FROM ref)
    SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_sim
    FROM rranked WHERE rank <= {k}"""
    )

@register(
    "ann_ivf_pq_refined",
    oracle=_ivf_pq_refined_oracle(),
    doc="The complete production ANN path: IVF probe -> ADC shortlist "
    "(top-20 per query from compact codes) -> EXACT cosine refinement of "
    "just the shortlist rows (nq x 20 rows however large the corpus) -> "
    "final top-k; recovers exact ordering within the probed region at "
    "negligible added cost",
)
def ann_ivf_pq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq.ivf_pq_refined_topk(
        load_table(spark, sf_dir, "embeddings"), query_ids=[1, 7, 42], k=5,
        shortlist=20, nprobe=2,
    )

_TNORM_SUBQ = """(SELECT CAST(sum(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT)
             FROM unnest(embedding[1:16]) AS u(x))"""

_FULL_NORM_SUBQ = """(SELECT CAST(sum(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT)
             FROM unnest(embedding) AS u(x))"""

@register(
    "matryoshka_recall",
    oracle=f"""
        WITH base AS (SELECT vec_id, label, embedding,
                             embedding[1:16] AS t_emb,
                             {_FULL_NORM_SUBQ} AS norm_s,
                             {_TNORM_SUBQ} AS tnorm_s
                      FROM embeddings),
        q AS (SELECT vec_id AS query_id, label AS q_label,
                     embedding AS q_emb, t_emb AS qt_emb,
                     norm_s AS q_norm, tnorm_s AS qt_norm
              FROM base WHERE vec_id % 10 = 0),
        pairs AS (SELECT q.query_id, q.q_label AS label, b.vec_id AS neighbor_id,
                    (SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT)
                     FROM (SELECT unnest(q.q_emb) AS xa, unnest(b.embedding) AS xb) z) AS dot_f,
                    (SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT)
                     FROM (SELECT unnest(q.qt_emb) AS xa, unnest(b.t_emb) AS xb) zt) AS dot_t,
                    q.q_norm, q.qt_norm, b.norm_s, b.tnorm_s
                  FROM base b, q WHERE b.label = q.q_label AND b.vec_id <> q.query_id),
        scored AS (SELECT query_id, label, neighbor_id,
                     CAST(dot_f AS DOUBLE) / (sqrt(CAST(q_norm AS DOUBLE)) * sqrt(CAST(norm_s AS DOUBLE))) AS cos_f,
                     CAST(dot_t AS DOUBLE) / (sqrt(CAST(qt_norm AS DOUBLE)) * sqrt(CAST(tnorm_s AS DOUBLE))) AS cos_t
                   FROM pairs),
        ranked AS (SELECT *,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos_f DESC, neighbor_id) AS rank_f,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos_t DESC, neighbor_id) AS rank_t
                   FROM scored),
        top AS (SELECT query_id, label,
                       max(CASE WHEN rank_f = 1 THEN neighbor_id END) AS nn_full,
                       max(CASE WHEN rank_t = 1 THEN neighbor_id END) AS nn_trunc
                FROM ranked GROUP BY query_id, label)
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_queries,
               CAST(sum(CASE WHEN nn_full = nn_trunc THEN 1 ELSE 0 END) AS BIGINT) AS n_top1_agree,
               round(CAST(sum(CASE WHEN nn_full = nn_trunc THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS recall_at_1
        FROM top GROUP BY label ORDER BY label
    """,
    doc="Matryoshka-representation audit: for a deterministic 10% query "
    "sample, does the top-1 in-label neighbor under the TRUNCATED first-16-"
    "dim prefix embedding agree with the top-1 under the full 64 dims? "
    "Per-label recall@1 of the cheap prefix index - the go/no-go gate for "
    "serving a shorter Matryoshka prefix at 1/4 the memory. Both rankings "
    "ride ONE broadcast candidate join and ONE hash partitioning by "
    "query_id (two row_number windows share the shuffle); dot products are "
    "integer-exact so the argmax is engine- and partition-order-"
    "deterministic",
)
def matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline import similarity as sim

    return sim.truncated_recall(
        load_table(spark, sf_dir, "embeddings"), sample_mod=10, trunc_dims=16
    )

def _prototype_oracle(iters: int = 2, centroid_mod: int = 31) -> str:
    dot = """(SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * (CAST(xb AS DOUBLE)/1000000.0) * 1e12) AS BIGINT)) AS BIGINT)
        FROM (SELECT unnest(b.embedding) AS xa, unnest(c.c) AS xb) zd)"""
    cn = """(SELECT CAST(sum(CAST(floor((CAST(xc AS DOUBLE)/1000000.0)*(CAST(xc AS DOUBLE)/1000000.0)*1e12) AS BIGINT)) AS BIGINT)
        FROM (SELECT unnest(c.c) AS xc) zc)"""
    parts = _km_prefix(iters, centroid_mod)
    parts.append(
        f"""scored AS (
        SELECT a.cell, b.vec_id,
               CAST({dot} AS DOUBLE)
                 / (sqrt(CAST(b.norm_s AS DOUBLE)) * sqrt(CAST({cn} AS DOUBLE))) AS cos
        FROM af a JOIN base b ON b.vec_id = a.vec_id
                  JOIN c{iters} c ON c.cent_id = a.cell),
    ranked AS (SELECT *,
                 row_number() OVER (PARTITION BY cell ORDER BY cos DESC, vec_id) AS rn_proto,
                 row_number() OVER (PARTITION BY cell ORDER BY cos ASC, vec_id) AS rn_hard
               FROM scored)"""
    )
    return (
        ",\n    ".join(parts)
        + """
    SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(max(CASE WHEN rn_proto = 1 THEN vec_id END) AS BIGINT) AS prototype_id,
           CAST(max(CASE WHEN rn_hard = 1 THEN vec_id END) AS BIGINT) AS hardest_id,
           CAST((count(*) + 1) // 2 AS BIGINT) AS n_keep,
           round(min(cos), 6) AS min_cos,
           round(max(cos), 6) AS max_cos
    FROM ranked GROUP BY cell ORDER BY cell"""
    )

@register(
    "prototype_pruning",
    oracle=_prototype_oracle(iters=2, centroid_mod=31),
    doc="Prototype-distance data pruning (Sorscher et al. 2022 shape): "
    "every vector ranked by cosine to its own refined k-means centroid - "
    "max-cos member is the cell's exemplar, min-cos the hardest example, "
    "keep-hard rule retains ceil(n/2) per cell in the large-data regime. "
    "Assignment carries vectors through the Arrow kernel (no back-join), "
    "K-row centroid table joins broadcast, both ranking windows share one "
    "hashpartitioning(cell) exchange; integer-exact products keep the "
    "ranking engine-deterministic",
)
def prototype_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline import kmeans as km

    return km.prototype_stats(
        load_table(spark, sf_dir, "embeddings"), centroid_mod=31, iters=2, dims=64
    )

from iceberg_meta_spark.pipeline import dedup  # noqa: E402
