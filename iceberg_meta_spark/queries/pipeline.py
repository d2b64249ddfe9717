"""LLM-data-pipeline queries bound to the driver contract: dedup (exact /
MinHash-LSH / SimHash / n-gram Jaccard), embedding similarity (brute-force +
LSH-bucketed ANN, near-dup), text analysis, multimodal feature extraction.

Oracles mirror the kernels' integer-exact arithmetic (see pipeline/ module
docstrings); DuckDB zips parallel ``unnest`` columns for the dot products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iceberg_meta_spark.pipeline import dedup, multimodal, similarity, text
from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    oracle="""
        WITH keys AS (
            SELECT doc_id,
                   md5(array_to_string((string_split(text, ' '))[1:3], ' ')) AS dup_key
            FROM documents)
        SELECT dup_key, CAST(count(*) AS BIGINT) AS n_docs,
               min(doc_id) AS keep_doc_id, max(doc_id) AS max_doc_id
        FROM keys GROUP BY dup_key HAVING count(*) > 1
    """,
    doc="Exact dedup: hash-groupBy on normalized 3-token prefix, keep-min-id",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dup_groups(load_table(spark, sf_dir, "documents"), prefix_tokens=3)


_MINHASH_ORACLE = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 2),
    sh AS (SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1]) AS shingle
           FROM sized, UNNEST(range(1, n)) AS g(i)),
    mh AS (SELECT doc_id, seed, min(md5(concat(CAST(seed AS STRING), ':', shingle))) AS mh
           FROM sh, generate_series(0, 7) AS s(seed) GROUP BY doc_id, seed),
    bands AS (SELECT doc_id, seed // 2 AS band_idx,
                     string_agg(mh, '|' ORDER BY seed) AS band_key
              FROM mh GROUP BY doc_id, seed // 2),
    cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_bands
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
             GROUP BY 1, 2 HAVING count(*) >= 1)
    SELECT c.doc_a, c.doc_b, c.n_bands,
           round(CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE) / 8, 4) AS est_jaccard
    FROM cand c
    JOIN mh x ON x.doc_id = c.doc_a
    JOIN mh y ON y.doc_id = c.doc_b AND y.seed = x.seed
    GROUP BY 1, 2, 3
"""


@register(
    "dedup_minhash_lsh",
    oracle=_MINHASH_ORACLE,
    tags=("bench",),
    doc="MinHash-LSH near-dup candidates: shingle -> 8 minhashes -> 4 bands "
    "of 2 -> band-bucket equi-join (never all-pairs; ~0.5 Jaccard threshold)",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), num_hashes=8, shingle_k=2, band_size=2, min_bands=1
    )


@register(
    "source_overlap_matrix",
    tags=("bench",),
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 2),
        sh AS (SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1]) AS shingle
               FROM sized, UNNEST(range(1, n)) AS g(i)),
        mh AS (SELECT doc_id, seed, min(md5(concat(CAST(seed AS STRING), ':', shingle))) AS mh
               FROM sh, generate_series(0, 7) AS s(seed) GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 AS band_idx,
                         string_agg(mh, '|' ORDER BY seed) AS band_key
                  FROM mh GROUP BY doc_id, seed // 2),
        pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM bands a JOIN bands b
                    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                   AND a.doc_id < b.doc_id),
        labeled AS (SELECT least(da.source, db.source) AS source_x,
                           greatest(da.source, db.source) AS source_y
                    FROM pairs p
                    JOIN documents da ON da.doc_id = p.doc_a
                    JOIN documents db ON db.doc_id = p.doc_b)
        SELECT source_x, source_y, CAST(count(*) AS BIGINT) AS dup_pairs
        FROM labeled GROUP BY 1, 2 ORDER BY source_x, source_y
    """,
    doc="Cross-source duplication matrix: distinct LSH near-dup candidate "
    "pairs per unordered source pair (diagonal = within-source redundancy) "
    "— the audit a curation team reads before ingesting or re-weighting an "
    "overlapping crawl. Source tags ride the band rows through the "
    "equi-join (grouped with the functionally-dependent doc_id key), so "
    "candidates arrive labeled with no corpus back-join",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.source_overlap_matrix(
        load_table(spark, sf_dir, "documents"), num_hashes=8, shingle_k=2, band_size=2
    )


@register(
    "dedup_simhash",
    oracle="""
        WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        h AS (SELECT doc_id, md5(tok) AS hx FROM tk),
        bits AS (SELECT doc_id, g.bit AS bit,
                 CASE WHEN ((strpos('0123456789abcdef', substr(hx, CAST(1 + bit // 4 AS INT), 1)) - 1)
                            // CAST(power(2, bit % 4) AS BIGINT)) % 2 = 1
                      THEN 1 ELSE -1 END AS w
                 FROM h, generate_series(0, 15) AS g(bit)),
        agg AS (SELECT doc_id, bit, CASE WHEN sum(w) > 0 THEN 1 ELSE 0 END AS bitval
                FROM bits GROUP BY doc_id, bit),
        sig AS (SELECT doc_id,
                       CAST(sum(bitval * CAST(power(2, bit) AS BIGINT)) AS BIGINT) AS simhash
                FROM agg GROUP BY doc_id)
        SELECT simhash, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS min_doc_id
        FROM sig GROUP BY simhash
    """,
    doc="SimHash(16-bit) signatures from token md5s, grouped (near-dup buckets)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_groups(load_table(spark, sf_dir, "documents"), bits=16)


@register(
    "dedup_ngram_jaccard",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 2),
        sh AS (SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1]) AS shingle
               FROM sized, UNNEST(range(1, n)) AS g(i)),
        mh AS (SELECT doc_id, seed, min(md5(concat(CAST(seed AS STRING), ':', shingle))) AS mh
               FROM sh, generate_series(0, 7) AS s(seed) GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 AS band_idx,
                         string_agg(mh, '|' ORDER BY seed) AS band_key
                  FROM mh GROUP BY doc_id, seed // 2),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_inter
                  FROM cand c
                  JOIN sh a ON a.doc_id = c.doc_a
                  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
                  GROUP BY 1, 2)
        SELECT doc_a, doc_b, n_inter,
               round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.05
    """,
    doc="Exact n-gram Jaccard, LSH-then-verify: MinHash band join generates "
    "candidates, exact shingle intersection verifies only those pairs "
    "(no block-wide self-join — the quadratic term is gone)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), shingle_k=2, min_jaccard=0.05
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_NORM_SUBQ = """(SELECT CAST(sum(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT)
             FROM unnest(embedding) AS u(x))"""

_DOT_SUBQ = """(SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT)
             FROM (SELECT unnest(q.q_emb) AS xa, unnest(b.embedding) AS xb) z)"""


@register(
    "ann_cosine_topk",
    oracle=f"""
        WITH base AS (SELECT vec_id, embedding, {_NORM_SUBQ} AS norm_s FROM embeddings),
        q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm_s AS q_norm
              FROM base WHERE vec_id IN (1, 7, 42)),
        pairs AS (SELECT q.query_id, b.vec_id AS neighbor_id, {_DOT_SUBQ} AS dot_s,
                         q.q_norm, b.norm_s
                  FROM base b, q WHERE b.vec_id <> q.query_id),
        scored AS (SELECT query_id, neighbor_id,
                          CAST(dot_s AS DOUBLE) / (sqrt(CAST(q_norm AS DOUBLE)) * sqrt(CAST(norm_s AS DOUBLE))) AS cos
                   FROM pairs),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
                   FROM scored)
        SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_sim
        FROM ranked WHERE rank <= 5
    """,
    tags=("bench",),
    doc="Brute-force cosine top-k (exact ANN baseline): broadcast query set, "
    "integer-exact scaled dot products",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.brute_force_topk(
        load_table(spark, sf_dir, "embeddings"), query_ids=[1, 7, 42], k=5
    )


def _bucket_sql(planes: int = 4, dims: int = 64) -> str:
    """DuckDB mirror of :func:`similarity.sign_bucket`: the same md5-seeded
    ±1 hyperplane matrix baked in as array literals, the same exact-integer
    projection (parallel ``unnest`` is DuckDB's zip)."""
    signs = similarity.hyperplane_signs(planes, dims)
    bits = []
    for p in range(planes):
        arr = "[" + ", ".join(str(s) for s in signs[p]) + "]"
        proj = (
            "(SELECT sum(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT) * s)"
            f" FROM (SELECT unnest(embedding) AS x, unnest({arr}) AS s) z)"
        )
        bits.append(f"CAST({proj} >= 0 AS INT) * {2 ** (planes - 1 - p)}")
    return "(" + "\n              + ".join(bits) + ")"


_BUCKET_SQL = _bucket_sql()


@register(
    "ann_lsh_bucketed",
    oracle=f"""
        WITH base AS (SELECT vec_id, embedding, {_NORM_SUBQ} AS norm_s,
                             {_BUCKET_SQL} AS bucket
                      FROM embeddings),
        q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm_s AS q_norm, bucket AS q_bucket
              FROM base WHERE vec_id IN (3, 11)),
        pairs AS (SELECT q.query_id, b.bucket, b.vec_id AS neighbor_id, {_DOT_SUBQ} AS dot_s,
                         q.q_norm, b.norm_s
                  FROM base b, q WHERE b.bucket = q.q_bucket AND b.vec_id <> q.query_id),
        scored AS (SELECT query_id, bucket, neighbor_id,
                          CAST(dot_s AS DOUBLE) / (sqrt(CAST(q_norm AS DOUBLE)) * sqrt(CAST(norm_s AS DOUBLE))) AS cos
                   FROM pairs),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
                   FROM scored)
        SELECT query_id, bucket, rank, neighbor_id, round(cos, 6) AS cos_sim
        FROM ranked WHERE rank <= 3
    """,
    doc="LSH-bucketed ANN: sign-plane bucket equi-join prunes candidates "
    "(the 10⁹-vector scale path)",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_bucketed_topk(
        load_table(spark, sf_dir, "embeddings"), query_ids=[3, 11], k=3, planes=4
    )


_CENT_DOT_SUBQ = """(SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT)
             FROM (SELECT unnest(b.embedding) AS xa, unnest(c.c_emb) AS xb) z)"""


@register(
    "ann_ivf_probe",
    oracle=f"""
        WITH base AS (SELECT vec_id, embedding, {_NORM_SUBQ} AS norm_s FROM embeddings),
        cent AS (SELECT vec_id AS cent_id, embedding AS c_emb, norm_s AS c_norm
                 FROM base WHERE vec_id % 31 = 1),
        acs AS (SELECT b.vec_id, c.cent_id,
                       CAST({_CENT_DOT_SUBQ} AS DOUBLE)
                         / (sqrt(CAST(b.norm_s AS DOUBLE)) * sqrt(CAST(c.c_norm AS DOUBLE))) AS cos
                FROM base b, cent c),
        assign AS (SELECT vec_id, CAST(cent_id AS BIGINT) AS cell
                   FROM (SELECT vec_id, cent_id,
                                row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
                         FROM acs) WHERE rn = 1),
        probes AS (SELECT vec_id AS query_id, CAST(cent_id AS BIGINT) AS cell
                   FROM (SELECT vec_id, cent_id,
                                row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
                         FROM acs WHERE vec_id IN (5, 23)) WHERE rn <= 2),
        q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm_s AS q_norm
              FROM base WHERE vec_id IN (5, 23)),
        cand AS (SELECT p.query_id, a.vec_id AS neighbor_id, {_DOT_SUBQ} AS dot_s,
                        q.q_norm, b.norm_s
                 FROM probes p
                 JOIN assign a ON a.cell = p.cell
                 JOIN base b ON b.vec_id = a.vec_id
                 JOIN q ON q.query_id = p.query_id
                 WHERE a.vec_id <> p.query_id),
        scored AS (SELECT query_id, neighbor_id,
                          CAST(dot_s AS DOUBLE) / (sqrt(CAST(q_norm AS DOUBLE)) * sqrt(CAST(norm_s AS DOUBLE))) AS cos
                   FROM cand),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
                   FROM scored)
        SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_sim
        FROM ranked WHERE rank <= 5
    """,
    doc="IVF-style ANN: deterministic centroid sample (broadcast), map-side "
    "argmax cell assignment, nprobe=2 cell probe via equi-join — the "
    "data-dependent counterpart to the LSH scale path",
)
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_probe_topk(
        load_table(spark, sf_dir, "embeddings"), query_ids=[5, 23], k=5, centroid_mod=31, nprobe=2
    )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
        WITH base AS (SELECT vec_id, embedding, {_NORM_SUBQ} AS norm_s,
                             {_BUCKET_SQL} AS bucket
                      FROM embeddings),
        pairs AS (SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
                         (SELECT CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT)
                          FROM (SELECT unnest(a.embedding) AS xa, unnest(b.embedding) AS xb) z) AS dot_s,
                         a.norm_s AS norm_a, b.norm_s AS norm_b
                  FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        scored AS (SELECT bucket, vec_a, vec_b,
                          CAST(dot_s AS DOUBLE) / (sqrt(CAST(norm_a AS DOUBLE)) * sqrt(CAST(norm_b AS DOUBLE))) AS cos
                   FROM pairs)
        SELECT bucket, vec_a, vec_b, round(cos, 6) AS cos_sim
        FROM scored WHERE cos >= 0.3
    """,
    doc="Embedding-cosine near-dup pairs: sign-bucket LSH self-join, "
    "cosine >= 0.3 (threshold fits the synthetic corpus, whose max "
    "pairwise cosine is ~0.51; the dedup variant of ANN, never all-pairs)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dups(
        load_table(spark, sf_dir, "embeddings"), planes=4, threshold=0.3
    )


@register(
    "embedding_nearest_in_label",
    oracle=f"""
        WITH base AS (SELECT vec_id, label, embedding, {_NORM_SUBQ} AS norm_s FROM embeddings),
        q AS (SELECT vec_id AS query_id, label AS q_label, embedding AS q_emb, norm_s AS q_norm
              FROM base WHERE vec_id % 10 = 0),
        pairs AS (SELECT q.query_id, q.q_label AS label, b.vec_id AS neighbor_id, {_DOT_SUBQ} AS dot_s,
                         q.q_norm, b.norm_s
                  FROM base b, q WHERE b.label = q.q_label AND b.vec_id <> q.query_id),
        scored AS (SELECT query_id, label, neighbor_id,
                          CAST(dot_s AS DOUBLE) / (sqrt(CAST(q_norm AS DOUBLE)) * sqrt(CAST(norm_s AS DOUBLE))) AS cos
                   FROM pairs),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
                   FROM scored)
        SELECT query_id, label, neighbor_id, round(cos, 6) AS cos_sim
        FROM ranked WHERE rank = 1
    """,
    doc="Embedding near-dup: nearest neighbor within label block "
    "(cosine, label blocking)",
)
def embedding_nearest_in_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.nearest_in_label(load_table(spark, sf_dir, "embeddings"), sample_mod=10)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@register(
    "text_token_stats",
    oracle="""
        SELECT lang, CAST(count(*) AS BIGINT) AS doc_count,
               CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS ws_tokens,
               CAST(sum(CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+', 0)) AS BIGINT)) AS BIGINT) AS re_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang
    """,
    tags=("bench",),
    doc="Token counting: whitespace + BPE-ish regex tokenizer, per language",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "text_quality_scores",
    oracle="""
        WITH f AS (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                          CAST(len(list_filter(string_split(text, ' '),
                               x -> list_contains(['the', 'a', 'of', 'and', 'to'], x))) AS BIGINT) AS stopword_count,
                          CAST(length(replace(text, ' ', '')) AS BIGINT) AS no_space
                   FROM documents)
        SELECT doc_id, n_tokens, stopword_count,
               CASE WHEN n_tokens = 0 THEN CAST(0 AS DOUBLE)
                    ELSE round(CAST(stopword_count AS DOUBLE) / n_tokens, 4) END AS stopword_ratio,
               CASE WHEN n_tokens = 0 THEN CAST(0 AS DOUBLE)
                    ELSE round(CAST(no_space AS DOUBLE) / n_tokens, 4) END AS avg_token_len,
               CASE WHEN n_tokens >= 20 AND n_tokens <= 400
                         AND (CASE WHEN n_tokens = 0 THEN CAST(0 AS DOUBLE)
                                   ELSE round(CAST(stopword_count AS DOUBLE) / n_tokens, 4) END) >= 0.05
                    THEN 'good'
                    WHEN n_tokens >= 10 THEN 'ok'
                    ELSE 'low' END AS quality
        FROM f
    """,
    doc="Per-doc quality features: length, stopword ratio, mean token length",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_scores(load_table(spark, sf_dir, "documents"))


@register(
    "text_language_id",
    oracle="""
        WITH s AS (SELECT doc_id, lang AS labeled_lang,
                          CAST(len(list_filter(string_split(text, ' '),
                               x -> list_contains(['the', 'a', 'of'], x))) AS BIGINT) AS score_en,
                          CAST(len(list_filter(string_split(text, ' '),
                               x -> list_contains(['der', 'die', 'das'], x))) AS BIGINT) AS score_de,
                          CAST(len(list_filter(string_split(text, ' '),
                               x -> list_contains(['le', 'les', 'une'], x))) AS BIGINT) AS score_fr,
                          CAST(len(list_filter(string_split(text, ' '),
                               x -> list_contains(['el', 'los', 'una'], x))) AS BIGINT) AS score_es
                   FROM documents)
        SELECT doc_id, labeled_lang, score_en, score_de, score_fr, score_es,
               CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
                    WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                    WHEN score_fr >= score_es THEN 'fr'
                    ELSE 'es' END AS pred_lang
        FROM s
    """,
    doc="Heuristic marker-word language ID with deterministic tie-break",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.language_id(load_table(spark, sf_dir, "documents"))


@register(
    "text_fingerprints",
    oracle="""
        SELECT doc_id,
               md5(lower(text)) AS fp_exact,
               md5(replace(lower(text), ' ', '')) AS fp_normalized,
               md5(substr(text, 1, 64)) AS fp_head
        FROM documents
    """,
    doc="Document fingerprinting: exact / whitespace-normalized / head-64 md5",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprints(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------

@register(
    "multimodal_features",
    oracle="""
        WITH a AS (SELECT doc_id AS asset_id,
                          CASE WHEN doc_id % 3 = 0 THEN 'image'
                               WHEN doc_id % 3 = 1 THEN 'audio'
                               ELSE 'video' END AS media_type,
                          CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
                   FROM documents)
        SELECT asset_id, media_type, byte_len,
               byte_len % 640 + 16 AS width,
               byte_len % 480 + 16 AS height,
               CASE WHEN media_type = 'image' THEN CAST(1 AS BIGINT)
                    ELSE byte_len % 24 + 2 END AS n_frames
        FROM a
    """,
    doc="Multimodal plumbing: binary payload column -> Arrow-batched "
    "mapInPandas feature extraction (decode stubbed deterministically)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = multimodal.assets_from_documents(load_table(spark, sf_dir, "documents"))
    return multimodal.extract_features(assets)


@register(
    "multimodal_resize",
    oracle="""
        WITH a AS (SELECT doc_id AS asset_id,
                          CAST(octet_length(encode(text)) AS BIGINT) AS src_bytes
                   FROM documents WHERE doc_id % 3 = 0)
        SELECT asset_id, 'image' AS media_type, src_bytes,
               CAST(greatest(1, (224 * 224) // 64) AS BIGINT) AS dst_bytes,
               CAST(224 AS BIGINT) AS dst_width, CAST(224 AS BIGINT) AS dst_height
        FROM a
    """,
    doc="Multimodal resize: image assets -> 224x224 via Arrow-batched "
    "mapInPandas (decode/resize stubbed deterministically; zero-shuffle)",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = multimodal.assets_from_documents(load_table(spark, sf_dir, "documents"))
    return multimodal.resize_assets(assets, width=224, height=224)


@register(
    "multimodal_frame_sample",
    oracle="""
        WITH a AS (SELECT doc_id AS asset_id,
                          CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
                   FROM documents WHERE doc_id % 3 = 2),
        v AS (SELECT asset_id, byte_len, byte_len % 24 + 2 AS n_frames FROM a)
        SELECT asset_id, CAST(i AS BIGINT) AS frame_idx,
               CAST(greatest(1, byte_len // n_frames) AS BIGINT) AS frame_bytes
        FROM v, UNNEST(range(0, n_frames)) AS g(i)
        WHERE i % 4 = 0
    """,
    doc="Multimodal frame sampling: every 4th frame of each video asset, "
    "one row per kept frame (row fan-out inside the Arrow batch)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = multimodal.assets_from_documents(load_table(spark, sf_dir, "documents"))
    return multimodal.sample_frames(assets, every_n=4)


@register(
    "multimodal_decode",
    oracle="""
        WITH a AS (SELECT doc_id AS asset_id,
                          CASE WHEN doc_id % 3 = 0 THEN 'image'
                               WHEN doc_id % 3 = 1 THEN 'audio'
                               ELSE 'video' END AS media_type,
                          CAST(octet_length(encode(text)) AS BIGINT) AS n
                   FROM documents),
        e AS (SELECT asset_id, media_type, n,
                     (greatest((n + 2) // 3, 1) + 31) // 32 AS img_h,
                     (n + 1) // 2 AS n_samples,
                     greatest((n + 383) // 384, 1) AS vid_frames
              FROM a)
        SELECT asset_id, media_type,
               CAST(CASE media_type
                 WHEN 'image' THEN 11 + length(CAST(img_h AS VARCHAR)) + 96 * img_h
                 WHEN 'audio' THEN 44 + 2 * n_samples
                 ELSE 37 + 390 * vid_frames END AS BIGINT) AS container_bytes,
               CAST(CASE media_type WHEN 'image' THEN 32
                    WHEN 'audio' THEN 1 ELSE 16 END AS BIGINT) AS width,
               CAST(CASE media_type WHEN 'image' THEN img_h
                    WHEN 'audio' THEN 1 ELSE 16 END AS BIGINT) AS height,
               CAST(CASE media_type WHEN 'image' THEN 1
                    WHEN 'audio' THEN n_samples ELSE vid_frames END AS BIGINT)
                   AS n_frames,
               CAST(CASE media_type WHEN 'audio' THEN 8000 ELSE 0 END AS BIGINT)
                   AS sample_rate
        FROM e ORDER BY asset_id
    """,
    doc="REAL end-to-end media decode: each document's bytes are wrapped "
    "into a genuine container (binary PPM image / 16-bit PCM WAV / "
    "YUV4MPEG2 video) and then decoded by the matching dependency-free "
    "decoder — pixel buffer, sample array, frame split — inside ONE "
    "Arrow-batched mapInPandas pass, zero shuffle. The oracle mirrors the "
    "container arithmetic (header sizes, row/sample/frame padding), so a "
    "decoder that misreads any header field hash-fails",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = multimodal.media_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return multimodal.decode_media_features(assets).orderBy("asset_id")


@register(
    "training_mix",
    oracle="""
        WITH t AS (SELECT doc_id, lang, source, n_chars,
                          substr(md5(concat('mix:', CAST(doc_id AS STRING))), 1, 2) AS b
                   FROM documents)
        SELECT doc_id, lang, source, n_chars,
               md5(concat('shuffle:', CAST(doc_id AS STRING))) AS shuffle_key
        FROM t
        WHERE b < CASE lang WHEN 'en' THEN '80' WHEN 'zh' THEN 'c0' ELSE '40' END
    """,
    doc="Data mixing: per-language deterministic sampling (en 128/256, zh "
    "192/256, rest 64/256) via md5 hex-prefix thresholds + reproducible "
    "shuffle key — a pure map-side filter, no RNG, no shuffle, identical "
    "sample on any engine/partitioning (pipeline/sampling.py)",
)
def training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline import sampling

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    mixed = sampling.stratified_sample(
        docs, key_col="doc_id", stratum_col="lang",
        rates_256={"en": 128, "zh": 192}, default_256=64, salt="mix",
    )
    return sampling.with_shuffle_key(mixed, "doc_id")


@register(
    "corpus_curation",
    oracle="""
        WITH f AS (SELECT doc_id, lang, source, text,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                          CAST(len(list_filter(string_split(text, ' '),
                               x -> list_contains(['the', 'a', 'of', 'and', 'to'], x))) AS BIGINT) AS sw
                   FROM documents),
        q AS (SELECT doc_id, lang, source, text,
                     CASE WHEN n_tokens >= 20 AND n_tokens <= 400
                               AND (CASE WHEN n_tokens = 0 THEN CAST(0 AS DOUBLE)
                                         ELSE round(CAST(sw AS DOUBLE) / n_tokens, 4) END) >= 0.05
                          THEN 'good'
                          WHEN n_tokens >= 10 THEN 'ok'
                          ELSE 'low' END AS quality
              FROM f),
        keyed AS (SELECT doc_id, lang, source, quality,
                         md5(array_to_string((string_split(text, ' '))[1:3], ' ')) AS dup_key
                  FROM q WHERE quality <> 'low'),
        deduped AS (SELECT doc_id, lang, source, quality FROM (
                        SELECT *, min(doc_id) OVER (PARTITION BY dup_key) AS keeper
                        FROM keyed)
                    WHERE doc_id = keeper)
        SELECT doc_id, lang, source, quality
        FROM deduped
        WHERE substr(md5(concat('mix:', CAST(doc_id AS STRING))), 1, 2)
              < CASE lang WHEN 'en' THEN '80' WHEN 'zh' THEN 'c0' ELSE '40' END
    """,
    tags=("bench",),
    doc="End-to-end corpus curation: quality filter -> exact-dedup keep-min "
    "(one partitioned window, no self-join) -> per-lang stratified mix "
    "(map-side filter) — the composed production pipeline shape "
    "(pipeline/curation.py)",
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline import curation

    return curation.curate_corpus(
        load_table(spark, sf_dir, "documents"),
        rates_256={"en": 128, "zh": 192}, default_256=64,
    )


# ---------------------------------------------------------------------------
# Round-4 additions: containment dedup, incremental corpus dedup, adaptive
# quality bucketing.
# ---------------------------------------------------------------------------

@register(
    "dedup_containment",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 2),
        sh AS (SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1]) AS shingle
               FROM sized, UNNEST(range(1, n)) AS g(i)),
        rare AS (SELECT shingle FROM sh GROUP BY shingle
                 HAVING count(*) BETWEEN 2 AND 8),
        rsh AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM rsh a JOIN rsh b
                   ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_inter
                  FROM cand c
                  JOIN sh a ON a.doc_id = c.doc_a
                  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
                  GROUP BY 1, 2)
        SELECT doc_a, doc_b, n_inter,
               round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 4) AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 4) >= 0.5
    """,
    doc="Asymmetric containment near-dup (|A∩B|/min|A|,|B| — catches a small "
    "doc quoted inside a large one where Jaccard stays low); candidates from "
    "a frequency-capped inverted index (PPJoin-style prefix filter), exact "
    "intersection verifies only those pairs",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.containment_pairs(
        load_table(spark, sf_dir, "documents"), shingle_k=2, df_cap=8, min_containment=0.5
    )


@register(
    "dedup_incremental",
    oracle="""
        WITH tagged AS (SELECT *, substr(md5(CAST(doc_id AS STRING)), 1, 1) >= 'd' AS is_batch
                        FROM documents),
        toks AS (SELECT doc_id, is_batch, string_split(text, ' ') AS t FROM tagged),
        sized AS (SELECT doc_id, is_batch, t, len(t) AS n FROM toks WHERE len(t) >= 2),
        sh AS (SELECT DISTINCT doc_id, is_batch, concat(t[i], ' ', t[i+1]) AS shingle
               FROM sized, UNNEST(range(1, n)) AS g(i)),
        mh AS (SELECT doc_id, is_batch, seed,
                      min(md5(concat(CAST(seed AS STRING), ':', shingle))) AS mh
               FROM sh, generate_series(0, 7) AS s(seed) GROUP BY 1, 2, 3),
        bands AS (SELECT doc_id, is_batch, seed // 2 AS band_idx,
                         string_agg(mh, '|' ORDER BY seed) AS band_key
                  FROM mh GROUP BY doc_id, is_batch, seed // 2),
        store AS (SELECT DISTINCT band_idx, band_key FROM bands WHERE NOT is_batch),
        hits AS (SELECT DISTINCT b.doc_id FROM bands b
                 JOIN store s ON s.band_idx = b.band_idx AND s.band_key = b.band_key
                 WHERE b.is_batch)
        SELECT d.doc_id, d.lang,
               (h.doc_id IS NOT NULL) AS dup_candidate
        FROM tagged d LEFT JOIN hits h ON h.doc_id = d.doc_id
        WHERE d.is_batch
    """,
    doc="Incremental corpus dedup: the nightly-crawl shape — new-batch docs "
    "(deterministic ~19% hash split) probe the existing corpus's LSH band "
    "store with ONE left-semi equi-join; per-night work is O(batch), the "
    "corpus is never re-paired against itself",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    is_batch = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) >= "d"
    return dedup.novel_batch_docs(
        docs.filter(~is_batch), docs.filter(is_batch),
        num_hashes=8, shingle_k=2, band_size=2,
    )


@register(
    "quality_adaptive_buckets",
    oracle="""
        WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        sc AS (SELECT doc_id, lang,
                      CASE WHEN len(t) = 0 THEN 0
                           ELSE CAST(floor(10000 * len(list_filter(t,
                                    x -> x IN ('the', 'a', 'of', 'and', 'to'))) / len(t)) AS BIGINT)
                      END AS q_score
               FROM toks),
        b AS (SELECT lang, quantile_cont(q_score, 0.25) AS p25,
                     quantile_cont(q_score, 0.75) AS p75
              FROM sc GROUP BY lang)
        SELECT sc.lang,
               CASE WHEN q_score >= p75 THEN 'head'
                    WHEN q_score < p25 THEN 'tail'
                    ELSE 'middle' END AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(q_score) AS min_score, max(q_score) AS max_score
        FROM sc JOIN b ON b.lang = sc.lang
        GROUP BY 1, 2 ORDER BY sc.lang, bucket
    """,
    doc="CCNet head/middle/tail bucketing with corpus-adaptive per-language "
    "thresholds: exact DYADIC p25/p75 of an integer-scaled stopword-density "
    "score (dyadic probes interpolate to exact binary fractions — "
    "bit-identical across engines); boundaries broadcast, bucket CASE "
    "map-side (pipeline/quality.py)",
)
def quality_adaptive_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline import quality

    return quality.adaptive_quality_buckets(load_table(spark, sf_dir, "documents"))


@register(
    "dsir_importance",
    tags=("bench",),
    oracle="""
        WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        sized AS (SELECT doc_id, lang, t, len(t) AS n FROM toks WHERE len(t) >= 2),
        bg AS (SELECT doc_id, lang, concat(t[i], ' ', t[i+1]) AS bigram
               FROM sized, UNNEST(range(1, n)) AS g(i)),
        bk AS (SELECT doc_id, lang,
                      ((strpos('0123456789abcdef', substr(md5(bigram), 1, 1)) - 1) * 256
                       + (strpos('0123456789abcdef', substr(md5(bigram), 2, 1)) - 1) * 16
                       + (strpos('0123456789abcdef', substr(md5(bigram), 3, 1)) - 1)) % 1024
                        AS bucket
               FROM bg),
        freqs AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rc,
                         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tc
                  FROM bk GROUP BY bucket),
        ratio AS (SELECT bucket, CAST(((tc + 1) * 1000000) // (rc + 1) AS BIGINT) AS r
                  FROM freqs)
        SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_feats,
               CAST(sum(r) // count(*) AS BIGINT) AS importance
        FROM bk JOIN ratio USING (bucket)
        GROUP BY doc_id, lang ORDER BY doc_id
    """,
    doc="DSIR-shaped data selection (Xie et al. 2023): hashed-bigram "
    "importance ratio (target=en slice, add-1 smoothing, floor-scaled "
    "BIGINT instead of platform log) averaged per doc; bucket tables are "
    "one-scan map-side aggregates, the KB ratio table broadcasts, per-doc "
    "mean is the only corpus shuffle",
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline import sampling

    return sampling.dsir_importance(
        load_table(spark, sf_dir, "documents"), target_lang="en", buckets=1024
    )


@register(
    "split_leakage_audit",
    oracle="""
        WITH s AS (SELECT doc_id,
                          CASE WHEN substr(md5('naive:' || CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                                 THEN 'test'
                               WHEN substr(md5('naive:' || CAST(doc_id AS VARCHAR)), 1, 2) < '34'
                                 THEN 'validation'
                               ELSE 'train' END AS split
                   FROM documents),
        toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 2),
        sh AS (SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1]) AS shingle
               FROM sized, UNNEST(range(1, n)) AS g(i)),
        mh AS (SELECT doc_id, seed, min(md5(concat(CAST(seed AS STRING), ':', shingle))) AS mh
               FROM sh, generate_series(0, 7) AS s(seed) GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 AS band_idx,
                         string_agg(mh, '|' ORDER BY seed) AS band_key
                  FROM mh GROUP BY doc_id, seed // 2),
        pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM bands a JOIN bands b
                    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                   AND a.doc_id < b.doc_id),
        leaks AS (SELECT least(sa.split, sb.split) AS split_x,
                         greatest(sa.split, sb.split) AS split_y,
                         p.doc_a, p.doc_b
                  FROM pairs p
                  JOIN s sa ON sa.doc_id = p.doc_a
                  JOIN s sb ON sb.doc_id = p.doc_b
                  WHERE sa.split <> sb.split)
        SELECT split_x, split_y, CAST(count(*) AS BIGINT) AS leaky_pairs,
               CAST(count(DISTINCT doc_b) AS BIGINT) AS contaminated_docs
        FROM leaks GROUP BY 1, 2 ORDER BY split_x, split_y
    """,
    doc="Eval-hygiene audit: LSH near-dup pairs that STRADDLE a naive "
    "per-doc hash split (the split people actually ship) - per split pair, "
    "leaky pairs and distinct contaminated higher-id docs. Nonzero rows "
    "here are exactly why corpus_splits hashes the duplicate-CLUSTER label "
    "instead; the split tag rides the band rows through the equi-join "
    "(carry), no corpus back-join",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.concat(F.lit("naive:"), F.col("doc_id").cast("string"))), 1, 2)
    split = (
        F.when(b < "1a", F.lit("test")).when(b < "34", F.lit("validation")).otherwise(F.lit("train"))
    )
    tagged = docs.withColumn("split", split)
    bands = dedup.minhash_band_rows(tagged, 8, 2, 2, carry=("split",))
    a = bands.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"),
                     "band_idx", "band_key")
    bb = bands.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"),
                      "band_idx", "band_key")
    pairs = (
        a.join(bb, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "split_a", "split_b")
        .distinct()
        .filter(F.col("split_a") != F.col("split_b"))
    )
    return (
        pairs.select(
            F.least("split_a", "split_b").alias("split_x"),
            F.greatest("split_a", "split_b").alias("split_y"),
            "doc_a", "doc_b",
        )
        .groupBy("split_x", "split_y")
        .agg(
            F.count(F.lit(1)).alias("leaky_pairs"),
            F.countDistinct("doc_b").alias("contaminated_docs"),
        )
        .orderBy("split_x", "split_y")
    )


@register(
    "weak_label_vote",
    oracle="""
        WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        feats AS (SELECT doc_id, lang,
                         CAST(len(t) AS BIGINT) AS n,
                         CAST(len(list_filter(t,
                              x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) AS stop,
                         CAST(len(list_filter(t,
                              x -> len(x) > 0 AND substr(x, 1, 1) = upper(substr(x, 1, 1))
                                   AND NOT regexp_matches(substr(x, 1, 1), '[0-9]'))) AS BIGINT)
                           AS upper_
                  FROM toks),
        lfs AS (SELECT doc_id, lang,
                       CASE WHEN n = 0 THEN 0
                            WHEN stop * 100 >= n * 8 THEN 1
                            WHEN stop = 0 AND n >= 5 THEN -1
                            ELSE 0 END AS lf1,
                       CASE WHEN n >= 30 THEN 1 WHEN n < 8 THEN -1 ELSE 0 END AS lf2,
                       CASE WHEN n > 0 AND upper_ * 2 > n THEN -1 ELSE 0 END AS lf3
                FROM feats)
        SELECT doc_id, lang, lf1, lf2, lf3,
               CASE WHEN lf1 + lf2 + lf3 > 0 THEN 'keep'
                    WHEN lf1 + lf2 + lf3 < 0 THEN 'drop'
                    ELSE 'abstain' END AS label,
               CAST(abs(lf1) + abs(lf2) + abs(lf3) AS BIGINT) AS n_votes,
               CAST(CASE WHEN lf1 + lf2 + lf3 <> 0
                         THEN (abs(lf1) + abs(lf2) + abs(lf3) - abs(lf1 + lf2 + lf3)) // 2
                         ELSE (abs(lf1) + abs(lf2) + abs(lf3)) // 2 END AS BIGINT) AS n_disagree
        FROM lfs ORDER BY doc_id
    """,
    doc="Weak supervision (Snorkel shape): three cheap labeling functions "
    "(stopword density, length, uppercase-start share) vote keep/drop/"
    "abstain per doc; majority label + minority-vote count (the "
    "active-learning disagreement rank). Pure map-side expression pass - "
    "no shuffle at all before the ordered emit",
)
def weak_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline import quality

    return quality.weak_label_votes(load_table(spark, sf_dir, "documents"))


@register(
    "embedding_coverage",
    oracle="""
        WITH j AS (SELECT d.doc_id, d.lang, e.vec_id
                   FROM documents d FULL OUTER JOIN embeddings e
                     ON e.vec_id = d.doc_id)
        SELECT coalesce(lang, '<orphan_embedding>') AS lang,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS embedded,
               CAST(sum(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS missing_embedding,
               CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS orphan_embeddings
        FROM j GROUP BY 1 ORDER BY lang
    """,
    doc="Referential-integrity audit between the text corpus and its "
    "embedding table (vec_id = doc_id contract): per language, docs with "
    "and without a vector plus orphan vectors with no document - the "
    "check an embedding-backfill pipeline runs before and after each "
    "batch. ONE full-outer equi-join on the id, per-lang rollup map-side "
    "combined",
)
def embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    j = docs.join(emb, docs.doc_id == emb.vec_id, "full_outer")
    return (
        j.groupBy(F.coalesce(F.col("lang"), F.lit("<orphan_embedding>")).alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull(), 1).otherwise(0)
            ).alias("embedded"),
            F.sum(F.when(F.col("vec_id").isNull(), 1).otherwise(0)).alias("missing_embedding"),
            F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0)).alias("orphan_embeddings"),
        )
        .orderBy("lang")
    )


@register(
    "multimodal_segments",
    oracle="""
        WITH av AS (SELECT doc_id AS asset_id, text FROM documents
                    WHERE doc_id % 3 <> 0),
        chars AS (SELECT asset_id, i, ascii(substr(text, CAST(i AS INT), 1)) AS b
                  FROM av, UNNEST(range(1, len(text) + 1)) AS g(i)),
        frames AS (SELECT asset_id, (i - 1) // 16 AS f,
                          CAST(sum(b) AS BIGINT) AS e
                   FROM chars GROUP BY 1, 2),
        tot AS (SELECT asset_id, CAST(count(*) AS BIGINT) AS nf,
                       CAST(sum(e) AS BIGINT) AS te
                FROM frames GROUP BY 1),
        act AS (SELECT fr.asset_id, fr.f, fr.e
                FROM frames fr JOIN tot USING (asset_id)
                WHERE fr.e * tot.nf > tot.te),
        isl AS (SELECT asset_id, f, e,
                       f - row_number() OVER (PARTITION BY asset_id ORDER BY f) AS grp
                FROM act),
        segs AS (SELECT asset_id, grp, min(f) AS start_frame, max(f) AS end_frame,
                        CAST(sum(e) AS BIGINT) AS seg_energy
                 FROM isl GROUP BY 1, 2)
        SELECT asset_id,
               CAST(row_number() OVER (PARTITION BY asset_id ORDER BY start_frame) - 1
                    AS BIGINT) AS seg_idx,
               CAST(start_frame AS BIGINT) AS start_frame,
               CAST(end_frame AS BIGINT) AS end_frame, seg_energy
        FROM segs
    """,
    doc="VAD-style activity segmentation over audio/video payloads: 16-byte "
    "frames, integer byte-sum energy, maximal runs of above-average frames "
    "(integer cross-multiplied threshold) emitted as segments. A real "
    "VAD/shot-boundary model swaps into the SAME Arrow kernel; framing, "
    "run-merging and the zero-shuffle narrow flow are the tested plumbing. "
    "Oracle rebuilds the runs via SQL islands-and-gaps",
)
def multimodal_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.segment_assets(
        multimodal.assets_from_documents(load_table(spark, sf_dir, "documents")),
        frame_bytes=16,
    )


@register(
    "ann_recall_audit",
    oracle=f"""
        WITH base AS (SELECT vec_id, embedding, {_NORM_SUBQ} AS norm_s,
                             {_BUCKET_SQL} AS bucket
                      FROM embeddings),
        q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm_s AS q_norm,
                     bucket AS q_bucket
              FROM base WHERE vec_id IN (1, 3, 7, 11, 42)),
        pairs AS (SELECT q.query_id, b.vec_id AS neighbor_id, {_DOT_SUBQ} AS dot_s,
                         q.q_norm, b.norm_s
                  FROM base b, q WHERE b.vec_id <> q.query_id),
        ranked AS (SELECT query_id, neighbor_id,
                          row_number() OVER (PARTITION BY query_id
                              ORDER BY CAST(dot_s AS DOUBLE)
                                  / (sqrt(CAST(q_norm AS DOUBLE)) * sqrt(CAST(norm_s AS DOUBLE))) DESC,
                                  neighbor_id) AS rank
                   FROM pairs),
        exact AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5),
        cand AS (SELECT q.query_id, b.vec_id AS neighbor_id
                 FROM base b, q
                 WHERE b.bucket = q.q_bucket AND b.vec_id <> q.query_id),
        hits AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
                 FROM exact e JOIN cand c
                   ON c.query_id = e.query_id AND c.neighbor_id = e.neighbor_id
                 GROUP BY e.query_id),
        cc AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates
               FROM cand GROUP BY query_id)
        SELECT q.query_id, CAST(5 AS BIGINT) AS n_exact,
               CAST(coalesce(cc.n_candidates, 0) AS BIGINT) AS n_candidates,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               CAST(coalesce(h.n_hits, 0) * 1000 // 5 AS BIGINT) AS recall_permille
        FROM q LEFT JOIN cc ON cc.query_id = q.query_id
        LEFT JOIN hits h ON h.query_id = q.query_id
        ORDER BY q.query_id
    """,
    doc="ANN quality as a first-class ENGINE query (tools/ann_eval.py "
    "measures it externally; this hash-gates it): recall@5 of LSH "
    "sign-bucket candidate generation vs the exact cosine top-5, per "
    "query. Candidate-set recall is the quantity bucketing risks — "
    "in-bucket ranking is exact. One broadcast-query exact pass + the "
    "same bucket equi-join as retrieval + a LeftSemi and two per-query "
    "aggregates; every term integer-exact or rank-deterministic",
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_recall_audit(
        load_table(spark, sf_dir, "embeddings"),
        query_ids=[1, 3, 7, 11, 42],
        k=5,
        planes=4,
    )
