"""Round-2+ extension queries.

This module is loaded LAST by the registry (see ``registry._OPERATOR_MODULES``)
so additions here can never push a SURVEY §2-critical query out of the
driver's 50-query correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.parquet import load_table


@register(
    "user_value_deciles_approx",
    oracle=None,  # percentile_approx sketch boundaries are engine-specific;
    # the exact twin user_value_deciles is oracle-gated and
    # test_deciles_approx_matches_exact pins the two together.
    doc="Scale twin of user_value_deciles: decile BOUNDARIES from one "
    "percentile_approx aggregate (1 row, broadcast back), bucket assignment "
    "map-side — no global ntile window funneling every user through a "
    "single partition (the 10⁹-user deployment path)",
)
def user_value_deciles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("total_cents")
    )
    bounds = per_user.agg(
        F.percentile_approx(
            "total_cents", [i / 10 for i in range(1, 10)], 10000
        ).alias("bounds")
    )
    # decile = 1 + #boundaries strictly below the user's total: pure map-side
    # arithmetic against the broadcast 9-element boundary array.
    tiled = per_user.crossJoin(F.broadcast(bounds)).withColumn(
        "decile",
        F.lit(1)
        + F.aggregate(
            F.col("bounds"),
            F.lit(0),
            lambda acc, b: acc + F.when(F.col("total_cents") > b, 1).otherwise(0),
        ),
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("total_cents").alias("min_cents"),
        F.max("total_cents").alias("max_cents"),
    )

# ---------------------------------------------------------------------------
# Round-2 LLM-pipeline extensions: quality rules, repetition, contamination,
# domain mixing, duplicate clustering (see pipeline/quality.py, graph.py).
# ---------------------------------------------------------------------------

from iceberg_meta_spark.pipeline import graph, quality  # noqa: E402


@register(
    "quality_rule_summary",
    oracle="""
        WITH toks AS (SELECT lang, source, text, string_split(text, ' ') AS t
                      FROM documents),
        feat AS (SELECT lang, source,
                   CAST(len(t) AS BIGINT) AS n,
                   CAST(len(replace(text, ' ', '')) AS BIGINT) AS chars,
                   CAST(len(list_intersect(list_distinct(t),
                        ['the','a','of','and','to'])) AS BIGINT) AS nstop,
                   CAST(list_max(list_transform(list_distinct(t),
                        u -> len(list_filter(t, v -> v = u)))) AS BIGINT) AS top
                 FROM toks),
        r AS (SELECT lang, source,
                (n >= 20 AND n <= 400) AS r_len,
                (chars >= 2*n AND chars <= 12*n) AS r_word,
                (nstop >= 2) AS r_stop,
                (top * 5 <= n) AS r_rep
              FROM feat)
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN r_len THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
               CAST(sum(CASE WHEN r_word THEN 1 ELSE 0 END) AS BIGINT) AS n_word_ok,
               CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_ok,
               CAST(sum(CASE WHEN r_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_ok,
               CAST(sum(CASE WHEN r_len AND r_word AND r_stop AND r_rep
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               round(CAST(sum(CASE WHEN r_len AND r_word AND r_stop AND r_rep
                        THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS pass_rate
        FROM r GROUP BY lang, source
    """,
    tags=("bench",),
    doc="Gopher/C4-style quality-rule pass rates per (lang, source): token "
    "count, mean word length, stopword presence, top-token share — all "
    "integer-exact comparisons, one tiny-key groupBy",
)
def quality_rule_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.quality_rule_summary(load_table(spark, sf_dir, "documents"))


@register(
    "doc_repetition",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        base AS (SELECT doc_id,
                   CAST(len(t) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
                   CASE WHEN len(t) >= 2
                        THEN list_transform(generate_series(1, len(t)-1),
                                            i -> concat(t[i], ' ', t[i+1]))
                        ELSE list_slice(t, 1, 0) END AS bg
                 FROM toks),
        sized AS (SELECT doc_id, n_tokens, n_distinct_tokens,
                    CAST(len(bg) AS BIGINT) AS n_bigrams,
                    CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct_bigrams
                  FROM base)
        SELECT doc_id, n_tokens, n_distinct_tokens,
               round(1.0 - CAST(n_distinct_tokens AS DOUBLE) / n_tokens, 4)
                 AS dup_token_ratio,
               n_bigrams, n_distinct_bigrams,
               CASE WHEN n_bigrams = 0 THEN 0.0
                    ELSE round(1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams, 4)
               END AS dup_bigram_ratio,
               (n_bigrams > 0 AND n_distinct_bigrams * 10 < n_bigrams * 7)
                 AS repetitive
        FROM sized
    """,
    doc="Intra-document repetition: duplicate-token / duplicate-bigram "
    "ratios + repetitive flag, fully map-side (bigrams via in-row "
    "transform(sequence), no explode, zero shuffle)",
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.repetition_profile(load_table(spark, sf_dir, "documents"))


@register(
    "contamination_check",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 3),
        sh AS (SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS shingle
               FROM sized, UNNEST(range(1, n - 1)) AS g(i)),
        tag AS (SELECT doc_id,
                  substr(md5(concat('eval:', CAST(doc_id AS VARCHAR))), 1, 2) < '18'
                    AS is_eval
                FROM toks),
        ev AS (SELECT DISTINCT shingle FROM sh JOIN tag USING (doc_id) WHERE is_eval),
        tr AS (SELECT sh.doc_id, shingle FROM sh JOIN tag USING (doc_id)
               WHERE NOT is_eval),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
                  FROM tr GROUP BY doc_id),
        hits AS (SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_hits
                 FROM tr JOIN ev USING (shingle) GROUP BY tr.doc_id)
        SELECT s.doc_id, s.n_grams,
               COALESCE(h.n_hits, 0) AS n_hits,
               round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / s.n_grams, 4)
                 AS contamination,
               (COALESCE(h.n_hits, 0) * 2 >= s.n_grams) AS contaminated
        FROM sizes s LEFT JOIN hits h USING (doc_id)
    """,
    doc="Eval-set contamination: per-train-doc trigram overlap against the "
    "deterministic md5-sampled eval split; eval n-gram set is broadcast so "
    "the train side never shuffles (the 100 TB decontamination shape)",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.contamination_flags(load_table(spark, sf_dir, "documents"))


@register(
    "domain_mix_temperature",
    oracle="""
        WITH counts AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
                        FROM documents GROUP BY lang, source),
        weighted AS (SELECT lang, source, n_docs,
                       CAST(floor(sqrt(n_docs) * 1000000.0) AS BIGINT) AS w
                     FROM counts),
        tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs,
                       CAST(sum(w) AS BIGINT) AS total_w
                FROM weighted)
        SELECT lang, source, n_docs,
               round(CAST(n_docs AS DOUBLE) / total_docs, 4) AS raw_share,
               round(CAST(w AS DOUBLE) / total_w, 4) AS mix_rate,
               CAST((100000 * w) // total_w AS BIGINT) AS alloc_docs
        FROM weighted, tot
    """,
    doc="Temperature-0.5 domain mixing: rate ∝ sqrt(n_docs) per (lang, "
    "source), floor-scaled BIGINT weights so the allocation is exact; "
    "1-row total broadcast back (A4's shape), no window",
)
def domain_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.domain_mix_temperature(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_clusters",
    oracle="""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        keys AS (
            SELECT doc_id, md5(concat('p|', array_to_string(t[1:3], ' '))) AS fp
            FROM toks
            UNION ALL
            SELECT doc_id,
                   md5(concat('s|', array_to_string(
                        list_reverse(list_slice(list_reverse(t), 1, 3)), ' '))) AS fp
            FROM toks),
        reps AS (SELECT fp, min(doc_id) AS rep FROM keys GROUP BY fp),
        e0 AS (SELECT DISTINCT k.doc_id AS src, r.rep AS dst
               FROM keys k JOIN reps r USING (fp) WHERE k.doc_id <> r.rep),
        edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        walk (node, lab) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node),
        cc AS (SELECT node, min(lab) AS cluster_id FROM walk GROUP BY node)
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
               max(node) AS max_doc_id
        FROM cc GROUP BY cluster_id
    """,
    doc="Duplicate clusters: connected components over prefix/suffix "
    "fingerprint star edges via iterative min-label propagation (one "
    "shuffle per round, localCheckpoint-bounded lineage); oracle replays "
    "the closure with a recursive CTE",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.dedup_clusters(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Corpus-statistics extensions: n-gram counts, vocabulary profiles, unigram
# rarity scoring, PII scrubbing (see pipeline/corpus.py).
# ---------------------------------------------------------------------------

from iceberg_meta_spark.pipeline import corpus  # noqa: E402


@register(
    "corpus_top_bigrams",
    oracle="""
        WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        sized AS (SELECT t, len(t) AS n FROM toks WHERE len(t) >= 2),
        grams AS (SELECT concat(t[i], ' ', t[i+1]) AS ngram
                  FROM sized, UNNEST(range(1, n)) AS g(i))
        SELECT ngram, CAST(count(*) AS BIGINT) AS occurrences
        FROM grams GROUP BY ngram
        ORDER BY occurrences DESC, ngram LIMIT 20
    """,
    doc="Corpus-wide top-20 bigrams: in-row ngram build, explode with "
    "map-side partial agg, TakeOrdered top-k (never a global sort "
    "materialization); deterministic count-desc/text-asc tiebreak",
)
def corpus_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.top_ngrams(load_table(spark, sf_dir, "documents"), n=2, k=20)


@register(
    "vocabulary_stats",
    oracle="""
        WITH tok AS (SELECT lang, source, unnest(string_split(text, ' ')) AS token
                     FROM documents),
        per_token AS (SELECT lang, source, token, CAST(count(*) AS BIGINT) AS cnt
                      FROM tok GROUP BY lang, source, token)
        SELECT lang, source,
               CAST(sum(cnt) AS BIGINT) AS total_tokens,
               CAST(count(*) AS BIGINT) AS vocab_size,
               CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
               round(CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 4)
                 AS type_token_ratio
        FROM per_token GROUP BY lang, source
    """,
    doc="Per-(lang, source) vocabulary profile: total/vocab/hapax token "
    "counts + type-token ratio; two shrinking shuffles (explode combines "
    "map-side to one row per distinct domain-token)",
)
def vocabulary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.vocabulary_stats(load_table(spark, sf_dir, "documents"))


@register(
    "token_rarity_scores",
    oracle="""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                     FROM documents),
        counts AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
                   FROM tok GROUP BY token),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
        vocab AS (SELECT token,
                    CAST((cnt * 1000000000) // total AS BIGINT) AS w, cnt
                  FROM counts, tot
                  ORDER BY cnt DESC, token LIMIT 65536),
        scored AS (SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum(COALESCE(v.w, 0)) // count(*) AS BIGINT)
                       AS mean_commonness,
                     CAST(min(COALESCE(v.w, 0)) AS BIGINT) AS min_commonness
                   FROM tok LEFT JOIN vocab v USING (token)
                   GROUP BY doc_id),
        exp AS (SELECT CAST(sum(cnt * w) // sum(cnt) AS BIGINT) AS expected_w
                FROM vocab)
        SELECT doc_id, n_tokens, mean_commonness, min_commonness,
               (mean_commonness * 2 < expected_w) AS rare_heavy
        FROM scored, exp
    """,
    tags=("bench",),
    doc="CCNet-style unigram rarity scoring with integer-exact floor-scaled "
    "weights (no platform log()): capped vocab broadcast onto exploded "
    "tokens, per-doc mean commonness, rare_heavy flag vs the broadcast "
    "1-row corpus expectation",
)
def token_rarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.token_rarity_scores(load_table(spark, sf_dir, "documents"))


@register(
    "pii_scrub",
    oracle="""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(text,
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT)
                 AS n_ips,
               CAST(len(regexp_extract_all(text,
                 '\\+[0-9][0-9 -]{7,}[0-9]')) AS BIGINT) AS n_phones,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                 + len(regexp_extract_all(text,
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
                 + len(regexp_extract_all(text,
                 '\\+[0-9][0-9 -]{7,}[0-9]')) AS BIGINT) AS n_redactions,
               md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
                 '\\+[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g')) AS redacted_md5
        FROM documents
    """,
    doc="PII detection + redaction: email/IPv4/intl-phone counts and the "
    "md5 of the redacted text; regex subset with identical Java-regex/RE2 "
    "semantics; pure map-side, zero shuffle",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.pii_scrub(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# IVF k-means training (pipeline/kmeans.py): an ITERATIVE algorithm with a
# full hash-gated oracle — integer-exact quantized arithmetic makes the
# fixed-iteration Lloyd refinement bit-identical across engines, so the
# oracle simply unrolls the iterations as CTEs.
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# Custom operators the brief names that Spark lacks natively: bucketed range
# join (operators/rangejoin.py) and hypertable-style hierarchical time
# rollup (operators/hypertable.py).
# ---------------------------------------------------------------------------

from iceberg_meta_spark.operators.hypertable import time_rollup  # noqa: E402
from iceberg_meta_spark.operators.rangejoin import (  # noqa: E402
    bucketed_range_join,
    session_intervals,
)


@register(
    "session_purchase_match",
    oracle="""
        WITH clicks AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
                        WHERE event_type = 'click'),
        lagged AS (SELECT user_id, ts_us,
                     lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_ts
                   FROM clicks),
        marked AS (SELECT user_id, ts_us,
                     CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
                   FROM lagged),
        sess AS (SELECT user_id, ts_us,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                 FROM marked),
        iv AS (SELECT user_id, session_id, min(ts_us) AS lo,
                      max(ts_us) + 1800000000 AS hi
               FROM sess GROUP BY user_id, session_id),
        pur AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
                WHERE event_type = 'purchase'),
        matched AS (SELECT p.user_id, iv.session_id
                    FROM pur p JOIN iv ON iv.user_id = p.user_id
                    AND p.ts_us >= iv.lo AND p.ts_us <= iv.hi)
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions_hit
        FROM matched GROUP BY user_id
    """,
    doc="Range join (point-in-interval): purchases matched into the same "
    "user's click-session windows via the bucketed range join — intervals "
    "explode to covered 30-min buckets, points tag their single bucket, "
    "candidates come from an EQUI-join on (user_id, bucket), never a "
    "nested-loop BETWEEN join",
)
def session_purchase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us")
    )
    # a session window stays open until its gap expires: hi = last click + gap
    iv = session_intervals(
        ev.filter(F.col("event_type") == "click").select("user_id", "ts_us"),
        key="user_id",
        ts_col="ts_us",
    ).withColumn("hi", F.col("hi") + 1_800_000_000)
    pur = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts_us")
    matched = bucketed_range_join(
        pur, iv, key="user_id", ts_col="ts_us", width=1_800_000_000
    )
    return matched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.countDistinct("session_id").alias("n_sessions_hit"),
    )


@register(
    "events_time_rollup",
    tags=("bench",),
    oracle="""
        WITH ev AS (SELECT epoch_us(ts) AS ts_us, value FROM events),
        minute AS (SELECT ts_us - ts_us % 60000000 AS bucket_us,
                     CAST(count(*) AS BIGINT) AS n_events,
                     CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
                   FROM ev GROUP BY 1),
        hour AS (SELECT bucket_us - bucket_us % 3600000000 AS bucket_us,
                   CAST(sum(n_events) AS BIGINT) AS n_events,
                   CAST(sum(sum_cents) AS BIGINT) AS sum_cents
                 FROM minute GROUP BY 1),
        day AS (SELECT bucket_us - bucket_us % 86400000000 AS bucket_us,
                  CAST(sum(n_events) AS BIGINT) AS n_events,
                  CAST(sum(sum_cents) AS BIGINT) AS sum_cents
                FROM hour GROUP BY 1)
        SELECT 'minute' AS grain, bucket_us, n_events, sum_cents FROM minute
        UNION ALL
        SELECT 'hour' AS grain, bucket_us, n_events, sum_cents FROM hour
        UNION ALL
        SELECT 'day' AS grain, bucket_us, n_events, sum_cents FROM day
    """,
    doc="Hypertable-style hierarchical rollup: raw events aggregated ONCE "
    "at minute grain; hour derives from minute partials and day from hour "
    "(mergeable integer sums) — Spark's ReuseExchange dedups the shared "
    "minute subtree across the union branches, so raw data is scanned once",
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts DIV 1000").alias("ts_us"), "value"
    )
    return time_rollup(ev, ts_col="ts_us", value_col="value")


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


@register(
    "dedup_survivors",
    oracle="""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        keys AS (
            SELECT doc_id, md5(concat('p|', array_to_string(t[1:3], ' '))) AS fp
            FROM toks
            UNION ALL
            SELECT doc_id,
                   md5(concat('s|', array_to_string(
                        list_reverse(list_slice(list_reverse(t), 1, 3)), ' '))) AS fp
            FROM toks),
        reps AS (SELECT fp, min(doc_id) AS rep FROM keys GROUP BY fp),
        e0 AS (SELECT DISTINCT k.doc_id AS src, r.rep AS dst
               FROM keys k JOIN reps r USING (fp) WHERE k.doc_id <> r.rep),
        edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        walk (node, lab) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node),
        cc AS (SELECT node, min(lab) AS cluster_id FROM walk GROUP BY node),
        dropped AS (SELECT node AS doc_id FROM cc WHERE cluster_id <> node)
        SELECT d.lang, d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_survivors
        FROM documents d LEFT JOIN dropped dr USING (doc_id)
        GROUP BY d.lang, d.source
    """,
    doc="Corpus after transitive dedup: per-domain survivor counts — every "
    "clustered doc except its component's min-id representative is dropped "
    "(LeftAnti against the propagated labels); completes the dedup_clusters "
    "story into an actionable keep-list",
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cc = graph.connected_components(graph.fingerprint_edges(docs))
    dropped = cc.filter(F.col("label") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    kept = docs.join(dropped, "doc_id", "left_anti")
    per_kept = kept.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_survivors"))
    per_all = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_docs"))
    return per_all.join(per_kept, ["lang", "source"], "left").select(
        "lang",
        "source",
        "n_docs",
        F.coalesce(F.col("n_survivors"), F.lit(0).cast("long")).alias("n_survivors"),
    )


# ---------------------------------------------------------------------------
# Additional hard TPC-H decorrelation shapes: Q13 (outer-join histogram),
# Q17 (correlated per-group average), Q21 (compound-condition semi + anti).
# ---------------------------------------------------------------------------


@register(
    "customer_order_histogram",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey)
        SELECT c_count, CAST(count(*) AS BIGINT) AS n_customers
        FROM per_cust GROUP BY c_count
        ORDER BY n_customers DESC, c_count DESC
    """,
    doc="Q13 shape: customer-order-count distribution including zero-order "
    "customers — LEFT OUTER join then two shrinking aggregations; the "
    "per-customer count reuses the join's custkey partitioning (no extra "
    "exchange) and the histogram key space is tiny",
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("c_count").desc())
    )


@register(
    "small_quantity_revenue",
    oracle="""
        WITH li AS (SELECT l_partkey, l_extendedprice,
                           CAST(floor(l_quantity * 100) AS BIGINT) AS lq
                    FROM lineitem),
        pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
        stats AS (SELECT l_partkey, CAST(sum(lq) AS BIGINT) AS sum_lq,
                         CAST(count(*) AS BIGINT) AS cnt
                  FROM li JOIN pk ON p_partkey = l_partkey GROUP BY l_partkey)
        SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM li JOIN stats USING (l_partkey)
        WHERE lq * cnt * 5 < sum_lq
    """,
    doc="Q17 shape: revenue from below-one-fifth-of-part-average quantity "
    "lines of one brand — the correlated per-part AVG decorrelated into a "
    "groupBy broadcast back onto the fact scan; the threshold compare is "
    "integer cross-multiplication (lq*cnt*5 < sum_lq), no float division",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_extendedprice",
        F.floor(F.col("l_quantity") * 100).cast("long").alias("lq"),
    )
    pk = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    brand_li = li.join(F.broadcast(pk), li.l_partkey == pk.p_partkey).drop("p_partkey")
    stats = brand_li.groupBy("l_partkey").agg(
        F.sum("lq").alias("sum_lq"), F.count(F.lit(1)).alias("cnt")
    )
    hits = brand_li.join(F.broadcast(stats), "l_partkey").filter(
        F.col("lq") * F.col("cnt") * 5 < F.col("sum_lq")
    )
    return hits.agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "sole_return_suppliers",
    oracle="""
        WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem
                    WHERE l_returnflag = 'R'),
        multi AS (
            SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
            FROM l1
            WHERE EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R'))
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM multi JOIN supplier s ON s.s_suppkey = multi.l_suppkey
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    doc="Q21 shape: suppliers who were the SOLE returner in multi-supplier "
    "orders — compound-condition LeftSemi (another supplier exists) and "
    "LeftAnti (no other returner) on the orderkey with a suppkey "
    "inequality, then a broadcast supplier-dim join and top-k",
)
def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = l1.select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    multi = l1.join(
        l2, (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")), "leftsemi"
    ).join(
        l3, (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")), "leftanti"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        multi.join(F.broadcast(sup), multi.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@register(
    "duplicated_ngram_share",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
                FROM toks WHERE len(t) >= 8),
        grams AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS gram FROM idx),
        g1 AS (SELECT gram, doc_id, CAST(count(*) AS BIGINT) AS pos_cnt
               FROM grams GROUP BY 1, 2),
        dup AS (SELECT gram FROM g1 GROUP BY gram HAVING count(*) >= 2),
        per_doc AS (SELECT doc_id, CAST(sum(pos_cnt) AS BIGINT) AS dup_grams
                    FROM g1 JOIN dup USING (gram) GROUP BY doc_id),
        base AS (SELECT doc_id,
                   CAST(greatest(len(t) - 7, 0) AS BIGINT) AS n_grams
                 FROM toks)
        SELECT b.doc_id, b.n_grams,
               CAST(coalesce(p.dup_grams, 0) AS BIGINT) AS dup_grams,
               CASE WHEN b.n_grams > 0
                    THEN CAST((coalesce(p.dup_grams, 0) * 1000) // b.n_grams AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS dup_permille
        FROM base b LEFT JOIN per_doc p USING (doc_id)
        ORDER BY dup_permille DESC, doc_id
        LIMIT 100
    """,
    doc="Exact substring-duplication score (Lee et al. shape at 8-gram "
    "granularity): per doc, the share of 8-gram positions whose gram occurs "
    "in >= 2 distinct docs. groupBy(gram, doc) combines map-side; the dup "
    "set is a shrinking aggregate re-attached by gram equi-join — never an "
    "all-pairs doc comparison",
)
def duplicated_ngram_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.corpus import duplicated_ngram_share

    return duplicated_ngram_share(load_table(spark, sf_dir, "documents"))


@register(
    "sequence_packing",
    oracle="""
        WITH t AS (SELECT lang, source, doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                   FROM documents),
        c AS (SELECT lang, source, doc_id, n_tok,
                CAST(coalesce(sum(n_tok) OVER (
                  PARTITION BY lang, source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS prev_tokens
              FROM t)
        SELECT lang, source, CAST(prev_tokens // 256 AS BIGINT) AS bin_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM c
        GROUP BY 1, 2, 3
        ORDER BY lang, source, bin_id
    """,
    doc="Token-budget sequence packing: greedy-fill bins of 256 tokens per "
    "(lang, source) shard via a partitioned prefix-sum window (bin = "
    "prev_tokens DIV budget) — no global ordering, no single-partition "
    "funnel; the per-bin rollup extends the window partition keys",
)
def sequence_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.packing import sequence_packing

    return sequence_packing(load_table(spark, sf_dir, "documents"), budget=256)


@register(
    "sole_return_suppliers_agg",
    oracle="""
        WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem
                    WHERE l_returnflag = 'R'),
        multi AS (
            SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
            FROM l1
            WHERE EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R'))
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM multi JOIN supplier s ON s.s_suppkey = multi.l_suppkey
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    doc="Scale twin of sole_return_suppliers: the semi/anti formulation "
    "shuffles lineitem three times (base + EXISTS + NOT EXISTS probes); "
    "this one reduces each order in ONE groupBy — distinct suppliers, "
    "distinct returners, and the sole returner id via conditional "
    "aggregates — then filters (n_supp >= 2, n_ret = 1). Same rows, "
    "one-third the shuffle volume; the plan test pins the single exchange",
)
def sole_return_suppliers_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    ret_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(ret_supp).alias("n_ret"),
        F.max(ret_supp).alias("ret_supp"),
    )
    hits = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        hits.join(F.broadcast(sup), hits.ret_supp == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Table-maintenance planning (operators/maintenance.py): the reference stops
# at detecting maintenance debt (small-file counts, compaction_recommended,
# snapshot-count alerts); these plan the action itself.
# ---------------------------------------------------------------------------

from iceberg_meta_spark import operators as ops  # noqa: E402
from iceberg_meta_spark.sources.fixtures import (  # noqa: E402
    NOW_MS,
    SMALL_FILE_THRESHOLD,
    derive,
    oracle_query,
)

_COMPACT_TARGET = 128 * 1024 * 1024

# Expiry policy pinned for oracle determinism: keep the 5 most recent
# snapshots, expire anything older than 80 days before the fixture "now"
# (NOW_MS, 2024-04-15) — the cutoff lands mid-way through the snapshot log
# so both retention conditions bind.
_EXPIRY_KEEP = 5
_EXPIRY_MAX_AGE_US = 80 * 86400 * 1_000_000
_EXPIRY_NOW_US = NOW_MS * 1000


@register(
    "meta_compaction_plan",
    oracle=oracle_query(
        f"""
        , small AS (SELECT * FROM meta_files
                    WHERE file_size_in_bytes < {SMALL_FILE_THRESHOLD}),
        offs AS (SELECT snapshot_id, part_key, file_size_in_bytes, record_count,
                        sum(file_size_in_bytes) OVER (
                            PARTITION BY snapshot_id, part_key
                            ORDER BY file_path, file_size_in_bytes, record_count
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
                 FROM small)
        SELECT snapshot_id, part_key,
               CAST((end_off - file_size_in_bytes) // {_COMPACT_TARGET}
                    AS BIGINT) AS group_id,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(file_size_in_bytes) AS BIGINT) AS group_bytes,
               CAST(sum(record_count) AS BIGINT) AS group_records
        FROM offs GROUP BY snapshot_id, part_key, group_id
        ORDER BY snapshot_id, part_key, group_id
        """,
        "meta_files",
    ),
    tags=("maintenance", "bench"),
    doc="Compaction planning: greedy bin-packing of small files (reference "
    "detects them at formatters.py:416-443 but plans nothing) into ~128 MiB "
    "rewrite groups. One window partitioned by (snapshot, partition) — the "
    "cumulative sum never crosses a partition, so no global funnel — then "
    "one hash aggregate; each output group is exactly one rewrite task",
)
def meta_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.compaction_plan(
        derive(spark, sf_dir, "meta_files"),
        target_bytes=_COMPACT_TARGET,
        small_threshold=SMALL_FILE_THRESHOLD,
    )


@register(
    "meta_snapshot_expiry",
    oracle=oracle_query(
        f"""
        , ranked AS (
            SELECT *, row_number() OVER (
                ORDER BY committed_us DESC, snapshot_id DESC) AS recency_rank
            FROM meta_snapshots)
        SELECT snapshot_id, committed_us, recency_rank, operation,
               total_data_files, total_files_size
        FROM ranked
        WHERE recency_rank > {_EXPIRY_KEEP}
          AND committed_us < {_EXPIRY_NOW_US - _EXPIRY_MAX_AGE_US}
        ORDER BY recency_rank
        """,
        "meta_snapshots",
    ),
    tags=("maintenance",),
    doc="Snapshot-retention planning (keep last 5 AND keep 80 days): expiry "
    "candidates from one rank window over the metadata-sized snapshot log "
    "(the reference holds the same list in memory, formatters.py:156-173; "
    "its only retention signal is the snapshot-count alert, "
    "tui/widgets.py:791). Multi-table deployments partition the window by "
    "table",
)
def meta_snapshot_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.snapshot_expiry(
        derive(spark, sf_dir, "meta_snapshots"),
        keep_last=_EXPIRY_KEEP,
        max_age_us=_EXPIRY_MAX_AGE_US,
        now_us=_EXPIRY_NOW_US,
    )


@register(
    "meta_orphan_files",
    oracle=oracle_query(
        """
        SELECT s.file_path, s.file_size_in_bytes
        FROM storage_files s
        WHERE NOT EXISTS (SELECT 1 FROM meta_files m
                          WHERE m.file_path = s.file_path)
        ORDER BY s.file_path
        """,
        "storage_files",
        "meta_files",
    ),
    tags=("maintenance",),
    doc="Orphan-file detection (remove_orphan_files scan): object-store "
    "listing LEFT ANTI metadata-tracked paths — U1's set-difference idiom "
    "(reference formatters.py:1066-1069) pointed at the storage listing; "
    "one equi-anti-join, AQE broadcasts the smaller side",
)
def meta_orphan_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.orphan_files(
        derive(spark, sf_dir, "storage_files"),
        derive(spark, sf_dir, "meta_files"),
    )


# ---------------------------------------------------------------------------
# TPC-H breadth: Q7 / Q8 / Q10 shapes over the star schema.
# ---------------------------------------------------------------------------

_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


@register(
    "nation_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(CAST(l.l_shipdate AS DATE)) AS INT) AS l_year,
               round(CAST(sum({_CENTS.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) / 100, 2) AS revenue
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l.l_shipdate AS DATE) <= DATE '1997-12-31'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape (volume shipping between two nations): fact scanned "
    "once, every dimension broadcast, the two-nation disjunction applied "
    "after the joins on broadcast-joined attributes; integer-cents revenue",
)
def nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") <= F.lit("1997-12-31").cast("date"))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cus = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cus), ords.o_custkey == cus.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).alias("l_year"),
        )
        .agg(F.round(F.sum(cents).cast("double") / 100, 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "nation_market_share",
    oracle="""
        WITH vol AS (
            SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS INT) AS o_year,
                   CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS cents,
                   n1.n_name AS supp_nation
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n2.n_regionkey
            WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
              AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
              AND CAST(o.o_orderdate AS DATE) <= DATE '1997-12-31')
        SELECT o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS DOUBLE)
                     / sum(cents), 6) AS mkt_share
        FROM vol GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): one pass over the filtered "
    "fact with all six dimensions broadcast; share = conditional sum over "
    "total per order-year — no second scan, no self-join",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    par = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    # customer-side nation restricted to the target region before the join:
    # the filter prunes the broadcast build side, not the probe stream
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n2 = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    ords = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") <= F.lit("1997-12-31").cast("date"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cus = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    vol = (
        li.join(F.broadcast(par), li.l_partkey == par.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cus), ords.o_custkey == cus.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .select(
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
            cents.alias("cents"),
            F.col("supp_nation"),
        )
    )
    national = F.when(F.col("supp_nation") == "NATION_3", F.col("cents")).otherwise(F.lit(0))
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(national).cast("double") / F.sum("cents"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "returned_item_customers",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               round(CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100, 2) AS revenue,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item top customers): returnflag filter "
    "pushed to the lineitem scan, quarter filter to the orders scan, "
    "customer/nation broadcast, top-20 via TakeOrderedAndProject",
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    ords = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    cus = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cus), ords.o_custkey == cus.c_custkey)
        .join(F.broadcast(nat), cus.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(cents).cast("double") / 100, 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# VARIANT ingestion (Spark 4): shredded semi-structured access.
# ---------------------------------------------------------------------------

@register(
    "events_props_variant",
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
               CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k
        FROM events GROUP BY event_type
    """,
    doc="VARIANT twin of events_props_extract: parse_json once into a "
    "VARIANT column, then typed variant_get paths — Spark 4's binary "
    "variant encoding is parsed once per row instead of per-path "
    "re-parsing under get_json_object; same oracle semantics",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_with_k"),
        )
    )


# ---------------------------------------------------------------------------
# Training-pipeline extensions: context-window chunking, bounded attribution.
# ---------------------------------------------------------------------------

from iceberg_meta_spark.operators.asof import asof_join  # noqa: E402
from iceberg_meta_spark.pipeline.text import chunk_documents  # noqa: E402

_CHUNK, _OVERLAP = 64, 16
_CHUNK_STRIDE = _CHUNK - _OVERLAP


@register(
    "doc_chunks",
    tags=("bench",),
    oracle=f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        ex AS (SELECT doc_id, t,
                      unnest(range(1, greatest(len(t) - {_OVERLAP}, 1) + 1, {_CHUNK_STRIDE})) AS start
               FROM toks)
        SELECT doc_id,
               CAST((start - 1) // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               array_to_string(t[start:start + {_CHUNK - 1}], ' ') AS chunk_text,
               CAST(len(t[start:start + {_CHUNK - 1}]) AS BIGINT) AS chunk_len
        FROM ex
        ORDER BY doc_id, chunk_id
    """,
    doc="Context-window chunking: overlapping 64-token windows every 48 "
    "tokens per document — split + sequence + explode + slice, pure "
    "map-side row expansion (no shuffle, no Python workers); the "
    "tokenize-and-window preprocessing step of a training pipeline",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, _CHUNK, _OVERLAP).orderBy("doc_id", "chunk_id")


@register(
    "purchase_click_attribution_1h",
    oracle="""
        WITH ev AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
                    FROM events),
        p AS (SELECT event_id, user_id, ts_us,
                     CAST(floor(value * 100) AS BIGINT) AS value_cents
              FROM ev WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, p.ts_us, p.value_cents,
               (SELECT c.event_id FROM ev c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts_us <= p.ts_us AND c.ts_us >= p.ts_us - 3600000000
                ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1) AS click_event_id,
               (SELECT p.ts_us - c.ts_us FROM ev c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts_us <= p.ts_us AND c.ts_us >= p.ts_us - 3600000000
                ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1) AS gap_us
        FROM p ORDER BY event_id
    """,
    doc="Tolerance-bounded as-of join (pandas merge_asof(tolerance=1h) "
    "semantics): same union + forward-fill plan as the unbounded "
    "attribution — one shuffle, no join operator — with the lookback bound "
    "applied as a map-side predicate after the fill",
)
def purchase_click_attribution_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.expr("ts DIV 1000").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_us")
    out = asof_join(
        purchases, clicks, key="user_id", ts="ts_us", right_cols=["event_id"],
        tiebreak="event_id", prefix="click_", tolerance=3_600_000_000,
    )
    return out.select(
        "event_id", "user_id", "ts_us", "value_cents",
        F.col("click_event_id"),
        (F.col("ts_us") - F.col("click_ts_us")).alias("gap_us"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Z-order layout planning + CDC latest-state compaction.
# ---------------------------------------------------------------------------

from iceberg_meta_spark.operators.maintenance import _interleave_expr  # noqa: E402

_Z_BITS, _Z_BUCKETS = 16, 16
_Z_SHIFT = 2 * _Z_BITS - (_Z_BUCKETS - 1).bit_length()
_Z_TOP = (1 << _Z_BITS) - 1


@register(
    "meta_zorder_layout",
    oracle=oracle_query(
        f"""
        , stats AS (SELECT min(lo) AS lo_min, max(lo) AS lo_max,
                           min(hi - lo) AS sp_min, max(hi - lo) AS sp_max
                    FROM file_ranges),
        scaled AS (SELECT file_path,
                          CAST((lo - lo_min) * {_Z_TOP} // greatest(lo_max - lo_min, 1) AS BIGINT) AS x,
                          CAST((hi - lo - sp_min) * {_Z_TOP} // greatest(sp_max - sp_min, 1) AS BIGINT) AS y
                   FROM file_ranges, stats)
        SELECT file_path,
               {_interleave_expr('x', 'y', _Z_BITS)} AS zvalue,
               ({_interleave_expr('x', 'y', _Z_BITS)}) >> {_Z_SHIFT} AS zbucket
        FROM scaled ORDER BY zvalue, file_path
        """,
        "file_ranges",
    ),
    tags=("maintenance", "bench"),
    doc="Z-order clustering plan (OPTIMIZE ... ZORDER BY shape): Morton "
    "code over min-max-normalized (lo, span) per file, bucketed by the "
    "code's high bits — files in one bucket are range-local in both "
    "dimensions, the precondition for effective multi-column min/max "
    "pruning. One 1-row bounds aggregate broadcast back, then pure "
    "map-side bit arithmetic; no window, no shuffle of the file list",
)
def meta_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.zorder_layout(
        derive(spark, sf_dir, "file_ranges"), bits=_Z_BITS, n_buckets=_Z_BUCKETS
    )


@register(
    "cdc_latest_state",
    tags=("bench",),
    oracle="""
        WITH ch AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
                           CAST(floor(value * 100) AS BIGINT) AS value_cents
                    FROM events),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
                   FROM ch)
        SELECT user_id, ts_us AS last_ts_us, event_id AS last_event_id,
               event_type AS last_event_type, value_cents AS last_value_cents
        FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
    doc="CDC latest-state compaction (upsert-materialization): one "
    "groupBy(key).max(struct(ts, id, payload)) — partial aggregation "
    "reduces each partition's changes map-side before ONE shuffle of "
    "per-key maxima, strictly less data movement than the row_number "
    "window formulation that shuffles every change row",
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts DIV 1000").alias("ts_us"),
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    latest = ch.groupBy("user_id").agg(
        F.max(
            F.struct("ts_us", "event_id", "event_type", "value_cents")
        ).alias("s")
    )
    return latest.select(
        "user_id",
        F.col("s.ts_us").alias("last_ts_us"),
        F.col("s.event_id").alias("last_event_id"),
        F.col("s.event_type").alias("last_event_type"),
        F.col("s.value_cents").alias("last_value_cents"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Aggregation-surface breadth: exact quantiles, integer-exact correlation,
# GROUPING SETS.
# ---------------------------------------------------------------------------

@register(
    "doc_length_quantiles",
    oracle="""
        WITH q AS (SELECT lang, quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9]) AS qs
                   FROM documents GROUP BY lang)
        SELECT lang, CAST(i - 1 AS INT) AS q_idx, round(qs[i], 4) AS chars_q
        FROM q, generate_series(1, 4) t(i)
        ORDER BY lang, q_idx
    """,
    doc="Exact interpolated quantiles of document length per language "
    "(percentile == DuckDB quantile_cont, identical linear interpolation); "
    "one groupBy per language, the quantile list explodes to rows "
    "post-aggregation — per-group sort buffers are the documented exact-"
    "quantile cliff, with percentile_approx as the >10^8-doc twin pattern",
)
def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    qs = docs.groupBy("lang").agg(
        F.percentile("n_chars", [0.25, 0.5, 0.75, 0.9]).alias("qs")
    )
    return qs.select(
        "lang", F.posexplode("qs").alias("q_idx", "chars_q")
    ).select("lang", "q_idx", F.round("chars_q", 4).alias("chars_q")).orderBy(
        "lang", "q_idx"
    )


@register(
    "value_hour_correlation",
    oracle="""
        WITH ev AS (SELECT event_type,
                           (epoch_us(ts) // 3600000000) % 24 AS hour,
                           CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM events),
        sums AS (SELECT event_type,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(hour) AS BIGINT) AS sx,
                        CAST(sum(cents) AS BIGINT) AS sy,
                        CAST(sum(hour * hour) AS BIGINT) AS sxx,
                        CAST(sum(cents * cents) AS BIGINT) AS syy,
                        CAST(sum(hour * cents) AS BIGINT) AS sxy
                 FROM ev GROUP BY event_type)
        SELECT event_type, n,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS corr_hour_value
        FROM sums ORDER BY event_type
    """,
    doc="Pearson correlation from integer-exact sums: the six BIGINT "
    "accumulators (n, Sx, Sy, Sxx, Syy, Sxy) are order-insensitive so the "
    "shuffle combine is bit-deterministic across engines and partitionings; "
    "the float division happens once on the final 1-row-per-group result — "
    "the built-in corr() accumulates in floating point and is not "
    "reproducible under re-partitioning",
)
def value_hour_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.expr("(ts DIV 1000) DIV 3600000000") % 24).alias("hour"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("hour").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("hour") * F.col("hour")).alias("sxx"),
        F.sum(F.col("cents") * F.col("cents")).alias("syy"),
        F.sum(F.col("hour") * F.col("cents")).alias("sxy"),
    )
    n, sx, sy = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n * F.col("sxy") - sx * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - sx * F.col("sx")) * F.sqrt(n * F.col("syy") - sy * F.col("sy"))
    return s.select(
        "event_type", "n", F.round(num / den, 6).alias("corr_hour_value")
    ).orderBy("event_type")


@register(
    "events_grouping_sets",
    oracle="""
        WITH ev AS (SELECT event_type,
                           (epoch_us(ts) // 3600000000) % 24 AS hour,
                           CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM events)
        SELECT CAST(grouping(event_type) AS INT) AS g_type,
               CAST(grouping(hour) AS INT) AS g_hour,
               event_type, hour,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM ev
        GROUP BY GROUPING SETS ((event_type, hour), (event_type), ())
        ORDER BY g_type, g_hour, event_type, hour
    """,
    doc="Explicit GROUPING SETS (finer than ROLLUP/CUBE: an arbitrary "
    "level list) with grouping() indicators — all levels computed from one "
    "Expand + single hash aggregate, one shuffle total",
)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.expr("(ts DIV 1000) DIV 3600000000") % 24).alias("hour"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = ev.groupingSets(
        [["event_type", "hour"], ["event_type"], []], "event_type", "hour"
    ).agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("hour").cast("int").alias("g_hour"),
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
    )
    return out.select(
        "g_type", "g_hour", "event_type", "hour", "n", "sum_cents"
    ).orderBy("g_type", "g_hour", "event_type", "hour")


# ---------------------------------------------------------------------------
# Snapshot-lineage ancestry (operators/lineage.py): pointer doubling.
# ---------------------------------------------------------------------------

from iceberg_meta_spark.operators.lineage import ancestry  # noqa: E402


@register(
    "snapshot_ancestry",
    oracle="""
        WITH RECURSIVE nodes AS (
            SELECT event_id AS snapshot_id,
                   CASE WHEN event_id % 64 = 0 THEN NULL
                        ELSE event_id - 1 END AS parent_id
            FROM events),
        walk AS (
            SELECT snapshot_id, snapshot_id AS cur, 0 AS depth FROM nodes
            UNION ALL
            SELECT w.snapshot_id, n.parent_id, w.depth + 1
            FROM walk w JOIN nodes n ON n.snapshot_id = w.cur
            WHERE n.parent_id IS NOT NULL)
        SELECT w.snapshot_id, w.cur AS root_id, CAST(w.depth AS BIGINT) AS depth
        FROM walk w JOIN nodes n ON n.snapshot_id = w.cur
        WHERE n.parent_id IS NULL
        ORDER BY w.snapshot_id
    """,
    doc="Snapshot-lineage ancestry (reference walks parent_snapshot_id one "
    "hop at a time, formatters.py:886-934): pointer doubling resolves every "
    "node's root + depth in ceil(log2(depth)) self-joins — 6 rounds for "
    "this forest of 64-deep chains vs 64 sequential hops; rows stay "
    "one-per-node through every round, localCheckpoint caps lineage. The "
    "oracle is the recursive-CTE formulation of the same walk",
)
def snapshot_ancestry(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("snapshot_id"),
        F.when(F.col("event_id") % 64 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("event_id") - 1)
        .alias("parent_id"),
    )
    return ancestry(nodes, max_depth=64)


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q9 shapes (partsupp derived from lineitem history).
# ---------------------------------------------------------------------------

@register(
    "min_cost_supplier",
    oracle="""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   CAST(min(floor(l_extendedprice / l_quantity * 100)) AS BIGINT) AS cost_cents
            FROM lineitem WHERE l_quantity > 0
            GROUP BY l_partkey, l_suppkey),
        eur AS (
            SELECT ps.l_partkey, ps.l_suppkey, ps.cost_cents, s.s_name, n.n_name
            FROM ps
            JOIN supplier s ON s.s_suppkey = ps.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'),
        best AS (
            SELECT *, row_number() OVER (
                PARTITION BY l_partkey ORDER BY cost_cents, l_suppkey) AS rn
            FROM eur)
        SELECT b.l_partkey AS p_partkey, p.p_name, b.cost_cents,
               b.l_suppkey AS s_suppkey, b.s_name, b.n_name
        FROM best b JOIN part p ON p.p_partkey = b.l_partkey
        WHERE b.rn = 1 AND p.p_size >= 45
        ORDER BY b.cost_cents, p_partkey
        LIMIT 25
    """,
    doc="TPC-H Q2 shape (min-cost supplier per part in a region): partsupp "
    "derived from lineitem history, region filter prunes the broadcast "
    "supplier/nation build side, per-part argmin via min(struct(cost, "
    "suppkey)) — a partial-aggregating groupBy, not a row_number window "
    "over every quote",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100)
        ).cast("long").alias("cost_cents")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dim = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    eur = ps.join(F.broadcast(dim), ps.l_suppkey == dim.s_suppkey)
    best = eur.groupBy("l_partkey").agg(
        F.min(F.struct("cost_cents", "l_suppkey", "s_name", "n_name")).alias("b")
    )
    par = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 45).select(
        "p_partkey", "p_name"
    )
    return (
        best.join(F.broadcast(par), best.l_partkey == par.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("b.cost_cents").alias("cost_cents"),
            F.col("b.l_suppkey").alias("s_suppkey"),
            F.col("b.s_name").alias("s_name"),
            F.col("b.n_name").alias("n_name"),
        )
        .orderBy("cost_cents", "p_partkey")
        .limit(25)
    )


@register(
    "nation_profit",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(year(CAST(o.o_orderdate AS DATE)) AS INT) AS o_year,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                        - CAST(floor(p.p_retailprice * l.l_quantity) AS BIGINT)) AS BIGINT) AS profit_cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-line profit by nation and year): LIKE "
    "filter prunes the broadcast part build side, revenue minus derived "
    "supply cost in integer cents, one pass over the fact",
)
def nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    par = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
        - F.floor(F.col("p_retailprice") * F.col("l_quantity")).cast("long")
    )
    return (
        li.join(F.broadcast(par), li.l_partkey == par.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
        )
        .agg(F.sum(amount).alias("profit_cents"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# PageRank power iteration (pipeline/graph.py): supplier influence network.
# ---------------------------------------------------------------------------

from iceberg_meta_spark.pipeline.graph import pagerank  # noqa: E402


@register(
    "supplier_pagerank",
    oracle="""
        WITH e AS (SELECT DISTINCT l_suppkey AS src, (l_partkey % 100) + 1 AS dst
                   FROM lineitem WHERE l_suppkey <> (l_partkey % 100) + 1),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_scaled FROM nodes),
        c1 AS (SELECT e.dst, CAST(sum(r0.rank_scaled // od.outdeg) AS BIGINT) AS in_sum
               FROM e JOIN r0 ON r0.node = e.src JOIN od ON od.src = e.src
               GROUP BY e.dst),
        r1 AS (SELECT n.node,
                      CAST(150000 + (850000 * coalesce(c1.in_sum, 0)) // 1000000 AS BIGINT) AS rank_scaled
               FROM nodes n LEFT JOIN c1 ON c1.dst = n.node),
        c2 AS (SELECT e.dst, CAST(sum(r1.rank_scaled // od.outdeg) AS BIGINT) AS in_sum
               FROM e JOIN r1 ON r1.node = e.src JOIN od ON od.src = e.src
               GROUP BY e.dst),
        r2 AS (SELECT n.node,
                      CAST(150000 + (850000 * coalesce(c2.in_sum, 0)) // 1000000 AS BIGINT) AS rank_scaled
               FROM nodes n LEFT JOIN c2 ON c2.dst = n.node)
        SELECT node, rank_scaled FROM r2 ORDER BY rank_scaled DESC, node
    """,
    doc="PageRank power iteration (2 rounds, damping 0.85) over a supplier "
    "co-supply graph derived from lineitem: fixed-point BIGINT arithmetic "
    "makes the iteration bit-deterministic, so the unrolled recursive "
    "oracle hash-gates it like the k-means trainer; per round one "
    "edge-side shuffle with map-side combine, rank/outdeg dims broadcast",
)
def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dst = (F.col("l_partkey") % 100) + 1
    edges = (
        li.select(F.col("l_suppkey").alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return pagerank(edges, n_iters=2)


# ---------------------------------------------------------------------------
# Product-analytics shapes: ordered funnel, retention cohorts.
# ---------------------------------------------------------------------------

@register(
    "event_funnel",
    oracle="""
        WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        v AS (SELECT user_id, min(ts_us) AS t1 FROM ev
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts_us) AS t2
              FROM ev e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts_us > v.t1
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts_us) AS t3
              FROM ev e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts_us > c.t2
              GROUP BY e.user_id)
        SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS viewed,
               CAST((SELECT count(*) FROM c) AS BIGINT) AS clicked_after_view,
               CAST((SELECT count(*) FROM p) AS BIGINT) AS purchased_after_click
    """,
    doc="Ordered funnel (view -> click -> purchase, strict temporal order): "
    "each stage is a per-user MIN aggregate semi-joined onto the previous "
    "stage's timestamps — per-user rows through every shuffle, no event-"
    "level self-join, no window; the standard conversion-funnel kernel",
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("purchased_after_click")))
    )


@register(
    "user_retention_cohorts",
    oracle="""
        WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        first_day AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
        activity AS (SELECT DISTINCT e.user_id, f.cohort_day,
                            e.day - f.cohort_day AS day_offset
                     FROM ev e JOIN first_day f ON f.user_id = e.user_id)
        SELECT cohort_day, day_offset,
               CAST(count(*) AS BIGINT) AS active_users
        FROM activity
        WHERE day_offset <= 7
        GROUP BY cohort_day, day_offset
        ORDER BY cohort_day, day_offset
    """,
    doc="Retention cohorts: cohort = first-active day per user (one per-user "
    "aggregate), activity matrix = distinct (user, day) re-joined to the "
    "cohort and offset-bucketed — the (cohort x day-offset) retention "
    "triangle, week-one window; cohort dimension rides a per-user equi-join, "
    "never an event-level self-join",
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("(ts DIV 1000) DIV 86400000000").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(first_day, "user_id")
        .select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# Gap-filled time series (operators/hypertable.time_fill): locf densify.
# ---------------------------------------------------------------------------

from iceberg_meta_spark.operators.hypertable import time_fill  # noqa: E402


@register(
    "events_minute_locf",
    oracle="""
        WITH ev AS (SELECT event_type,
                           epoch_us(ts) - epoch_us(ts) % 60000000 AS bucket_us,
                           CAST(floor(value * 100) AS BIGINT) AS value_cents
                    FROM events),
        obs AS (SELECT event_type, bucket_us, CAST(sum(value_cents) AS BIGINT) AS observed
                FROM ev GROUP BY event_type, bucket_us),
        span AS (SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
                 FROM obs GROUP BY event_type),
        grid AS (SELECT s.event_type, g AS bucket_us
                 FROM span s, LATERAL (SELECT unnest(generate_series(s.lo, s.hi, 60000000)) g)),
        j AS (SELECT g.event_type, g.bucket_us, o.observed
              FROM grid g LEFT JOIN obs o
                ON o.event_type = g.event_type AND o.bucket_us = g.bucket_us)
        SELECT event_type, bucket_us,
               last_value(observed IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
               observed IS NOT NULL AS observed_flag
        FROM j ORDER BY event_type, bucket_us
    """,
    doc="Gap-filled minute series with last-observation-carried-forward "
    "(time_bucket_gapfill + locf shape): bucketed observations, per-key "
    "grid densified map-side via sequence + explode, forward-fill window "
    "partitioned by key — grid size is O(keys x span/step), independent "
    "of event count",
)
def events_minute_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts DIV 1000").alias("ts_us"),
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return time_fill(ev)


# ---------------------------------------------------------------------------
# Hard-negative mining (pipeline/similarity.py): contrastive training pairs.
# ---------------------------------------------------------------------------

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


@register(
    "doc_length_quantiles_approx",
    oracle=None,  # percentile_approx sketches are engine-specific; the exact
    # twin doc_length_quantiles carries the hash gate and
    # test_doc_quantiles_approx_close_to_exact pins the two together.
    doc="Scale twin of doc_length_quantiles: percentile_approx's mergeable "
    "KLL-style sketch aggregates in constant memory per group — the "
    ">10^8-doc path where exact percentile's per-group sort buffer is the "
    "documented cliff (same twin pattern as meta_file_health_approx)",
)
def doc_length_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    qs = docs.groupBy("lang").agg(
        F.percentile_approx("n_chars", [0.25, 0.5, 0.75, 0.9], 10_000).alias("qs")
    )
    return qs.select(
        "lang", F.posexplode("qs").alias("q_idx", "chars_q")
    ).select(
        "lang", "q_idx", F.col("chars_q").cast("double").alias("chars_q")
    ).orderBy("lang", "q_idx")


# ---------------------------------------------------------------------------
# Data-quality expectation checks (Deequ / dbt-test shape).
# ---------------------------------------------------------------------------

@register(
    "data_quality_checks",
    oracle="""
        SELECT 'referential' AS check_name, 'lineitem_orphan_orderkeys' AS metric,
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS value
        UNION ALL
        SELECT 'referential', 'orders_orphan_custkeys',
               CAST((SELECT count(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        UNION ALL
        SELECT 'uniqueness', 'orders_duplicate_pk',
               CAST((SELECT coalesce(sum(n - 1), 0) FROM (
                     SELECT count(*) AS n FROM orders GROUP BY o_orderkey) g
                     WHERE n > 1) AS BIGINT)
        UNION ALL
        SELECT 'completeness', 'customer_null_names',
               CAST((SELECT count(*) FROM customer WHERE c_name IS NULL) AS BIGINT)
        UNION ALL
        SELECT 'domain', 'lineitem_discount_out_of_range',
               CAST((SELECT count(*) FROM lineitem
                     WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
        UNION ALL
        SELECT 'domain', 'lineitem_nonpositive_quantity',
               CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT)
        ORDER BY check_name, metric
    """,
    doc="Data-quality expectations (Deequ / dbt-test shape): referential "
    "integrity via LeftAnti probes against broadcast key sets, primary-key "
    "uniqueness via a shrinking groupBy, completeness and domain "
    "constraints as map-side conditional counts — one long-format result "
    "a pipeline gate can assert on",
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ords = load_table(spark, sf_dir, "orders")
    cus = load_table(spark, sf_dir, "customer")

    def row(check: str, metric: str, df_count) -> DataFrame:
        return df_count.select(
            F.lit(check).alias("check_name"),
            F.lit(metric).alias("metric"),
            F.col("n").cast("long").alias("value"),
        )

    li_orphans = (
        li.select("l_orderkey")
        .join(ords.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    o_orphans = (
        ords.select("o_custkey")
        .join(cus.select("c_custkey"), ords.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dup_pk = (
        ords.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("n"))
    )
    null_names = cus.agg(
        F.sum(F.when(F.col("c_name").isNull(), 1).otherwise(0)).alias("n")
    )
    disc_range = li.agg(
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)
        ).alias("n")
    )
    bad_qty = li.agg(
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("n")
    )
    out = (
        row("referential", "lineitem_orphan_orderkeys", li_orphans)
        .unionByName(row("referential", "orders_orphan_custkeys", o_orphans))
        .unionByName(row("uniqueness", "orders_duplicate_pk", dup_pk))
        .unionByName(row("completeness", "customer_null_names", null_names))
        .unionByName(row("domain", "lineitem_discount_out_of_range", disc_range))
        .unionByName(row("domain", "lineitem_nonpositive_quantity", bad_qty))
    )
    return out.orderBy("check_name", "metric")


@register(
    "weekly_active_users",
    oracle="""
        WITH act AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                     FROM events),
        bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM act),
        contrib AS (SELECT a.user_id, a.day + g AS target_day
                    FROM act a, generate_series(0, 6) t(g)),
        wau AS (SELECT target_day AS day,
                       CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
                FROM contrib GROUP BY target_day)
        SELECT w.day, w.active_7d FROM wau w, bounds b
        WHERE w.day <= b.hi
        ORDER BY w.day
    """,
    doc="Rolling 7-day active users (WAU): distinct (user, day) activity "
    "explodes each day into the 7 target days it contributes to (map-side "
    "x7 row expansion of the ALREADY-distinct per-day frame, not of raw "
    "events), then one distinct-count aggregate per target day — no "
    "range self-join, no window over event rows",
)
def weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    act = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr("(ts DIV 1000) DIV 86400000000").alias("day"))
        .distinct()
    )
    hi = act.agg(F.max("day").alias("hi"))
    contrib = act.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day")
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("active_7d"))
    return (
        wau.join(F.broadcast(hi), wau.day <= F.col("hi"))
        .select("day", "active_7d")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Round-3 extensions.
# ---------------------------------------------------------------------------

from iceberg_meta_spark.operators.maintenance import hilbert_step_exprs  # noqa: E402
from iceberg_meta_spark.streaming.gaps import heartbeat_gaps  # noqa: E402

_GAP_US = 86_400_000_000  # 24h of per-user silence


@register(
    "user_heartbeat_gaps",
    tags=("bench",),
    oracle="""
        WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        l AS (SELECT user_id, ts_us,
                lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev
              FROM e)
        SELECT user_id, prev AS gap_start_us, ts_us AS gap_end_us,
               ts_us - prev AS gap_us
        FROM l WHERE ts_us - prev > 86400000000
        ORDER BY user_id, gap_start_us
    """,
    doc="Heartbeat/silence-gap detection (batch twin of "
    "streaming/gaps.silence_stream): spans > 24h between consecutive "
    "events of one user — ONE lag() window partitioned by user, no global "
    "ordering; the complementary alert to the reference's new-snapshot "
    "watch (cli.py:987-1007): the asset that STOPPED emitting",
)
def user_heartbeat_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts DIV 1000").alias("ts_us")
    )
    return heartbeat_gaps(ev, gap_us=_GAP_US).orderBy("user_id", "gap_start_us")


_H_BITS, _H_BUCKETS = 8, 16
_H_TOP = (1 << _H_BITS) - 1
_H_SHIFT = 2 * _H_BITS - (_H_BUCKETS - 1).bit_length()


def _hilbert_oracle() -> str:
    ctes = [
        f"""stats AS (SELECT min(lo) AS lo_min, max(lo) AS lo_max,
                           min(hi - lo) AS sp_min, max(hi - lo) AS sp_max
                    FROM file_ranges),
        h{_H_BITS} AS (SELECT file_path,
                          CAST(0 AS BIGINT) AS d,
                          CAST((lo - lo_min) * {_H_TOP} // greatest(lo_max - lo_min, 1) AS BIGINT) AS x,
                          CAST((hi - lo - sp_min) * {_H_TOP} // greatest(sp_max - sp_min, 1) AS BIGINT) AS y
                   FROM file_ranges, stats)"""
    ]
    for level in range(_H_BITS - 1, -1, -1):
        d_e, x_e, y_e = hilbert_step_exprs(level, "x", "y", "d")
        ctes.append(
            f"h{level} AS (SELECT file_path, {d_e} AS d, {x_e} AS x, {y_e} AS y FROM h{level + 1})"
        )
    body = (
        ", " + ",\n        ".join(ctes)
        + f"""
        SELECT file_path, d AS hvalue, d >> {_H_SHIFT} AS hbucket
        FROM h0 ORDER BY hvalue, file_path"""
    )
    return oracle_query(body, "file_ranges")


@register(
    "meta_hilbert_layout",
    oracle=_hilbert_oracle(),
    tags=("maintenance", "bench"),
    doc="Hilbert-curve clustering plan: the locality-preserving alternative "
    "to meta_zorder_layout — consecutive codes are always grid-adjacent "
    "(no Morton seam jumps), so equal-width code buckets have tighter "
    "bounding boxes for the same bucket count. Same plan shape: one 1-row "
    "bounds aggregate broadcast back, then 8 fused map-side integer "
    "projections (one per curve level); the oracle unrolls the identical "
    "per-level arithmetic as chained CTEs",
)
def meta_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.hilbert_layout(
        derive(spark, sf_dir, "file_ranges"), bits=_H_BITS, n_buckets=_H_BUCKETS
    )


# --- TPC-H Q11/Q16/Q20 shapes over the derived partsupp -------------------
# The testdata has no partsupp table; the canonical derivation is the
# distinct (l_partkey, l_suppkey) pairs with per-pair aggregates from
# lineitem — the same star-schema access pattern as the real queries.


@register(
    "important_stock",
    oracle="""
        WITH s7 AS (SELECT s_suppkey FROM supplier s JOIN nation n
                      ON s.s_nationkey = n.n_nationkey
                    WHERE n.n_name = 'NATION_7'),
        v AS (SELECT l_partkey AS partkey,
                     CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS value_cents
              FROM lineitem l JOIN s7 ON l.l_suppkey = s7.s_suppkey
              GROUP BY l_partkey),
        t AS (SELECT sum(value_cents) AS tot FROM v)
        SELECT partkey, value_cents FROM v, t
        WHERE value_cents * 1000 > tot
        ORDER BY value_cents DESC, partkey
    """,
    doc="TPC-H Q11 shape (important stock): per-part inventory value held "
    "by one nation's suppliers, kept when above 1/1000 of that nation's "
    "total — supplier dim broadcast onto lineitem, ONE partkey groupBy, "
    "1-row total broadcast back for the threshold (no second scan); "
    "integer cents keep the hash gate exact",
)
def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    s7 = supp.join(
        F.broadcast(nat.filter(F.col("n_name") == "NATION_7")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    v = (
        li.join(F.broadcast(s7), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
                "value_cents"
            )
        )
    )
    tot = v.agg(F.sum("value_cents").alias("tot"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("tot"))
        .select("partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "partkey")
    )


@register(
    "supplier_part_variety",
    oracle="""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        ok AS (SELECT ps.l_suppkey, p.p_brand, p.p_type, p.p_size
               FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
               WHERE p.p_brand <> 'Brand#1'
                 AND p.p_type NOT LIKE 'PROMO%'
                 AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
                 AND ps.l_suppkey NOT IN
                     (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM ok GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): distinct supplier "
    "count per (brand, type, size) over the derived partsupp, excluding a "
    "blacklist (negative-balance suppliers as the complaints stand-in) — "
    "part dim and the tiny blacklist both broadcast (the NOT IN compiles "
    "to LeftAnti), distinct-count is the only wide aggregate",
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    pok = part.filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    blacklist = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    ok = (
        ps.join(F.broadcast(pok), ps.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(blacklist), ps.l_suppkey == F.col("s_suppkey"), "left_anti")
    )
    return (
        ok.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "excess_stock_suppliers",
    oracle="""
        WITH q97 AS (SELECT l_partkey, l_suppkey,
                       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS q
                     FROM lineitem
                     WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
                       AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
                     GROUP BY l_partkey, l_suppkey),
        tot AS (SELECT l_partkey, l_suppkey,
                  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS aq
                FROM lineitem GROUP BY l_partkey, l_suppkey),
        cand AS (SELECT DISTINCT t.l_suppkey
                 FROM tot t JOIN q97 USING (l_partkey, l_suppkey)
                 JOIN part p ON t.l_partkey = p.p_partkey
                 WHERE p.p_name LIKE 'red%' AND t.aq > 2 * q97.q)
        SELECT s.s_suppkey, s.s_name
        FROM supplier s JOIN cand ON s.s_suppkey = cand.l_suppkey
        ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 shape (excess stock): suppliers holding more than 2x a "
    "year's shipments of a named part family — availqty derives as the "
    "all-time quantity per partsupp pair, compared against the 1997 "
    "aggregate of the same pair; ONE shuffle keyed (partkey, suppkey) "
    "serves both aggregates via conditional sums, part dim broadcast, "
    "then a semi-join to supplier; integer quantities keep it exact",
)
def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    in97 = (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date")) & (
        F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date")
    )
    qty = F.floor(F.col("l_quantity")).cast("long")
    # one aggregation pass: all-time and 1997 sums from the same shuffle
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty).alias("aq"),
        F.sum(F.when(in97, qty).otherwise(F.lit(0))).alias("q97"),
        F.max(F.when(in97, F.lit(1)).otherwise(F.lit(0))).alias("has97"),
    )
    reds = part.filter(F.col("p_name").startswith("red")).select("p_partkey")
    cand = (
        pair.filter((F.col("has97") == 1) & (F.col("aq") > 2 * F.col("q97")))
        .join(F.broadcast(reds), pair.l_partkey == F.col("p_partkey"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(cand, supp.s_suppkey == cand.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


from iceberg_meta_spark.pipeline.corpus import bm25_scores  # noqa: E402
from iceberg_meta_spark.pipeline.sampling import pps_sample  # noqa: E402

_BM25_TERMS = ("hash", "join", "spark", "window", "stream")


@register(
    "bm25_retrieval",
    tags=("bench",),
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
                    FROM tf JOIN dfreq USING (token), corpus)
        SELECT doc_id, CAST(sum(si) AS BIGINT) AS score_scaled,
               CAST(count(*) AS BIGINT) AS n_terms_matched
        FROM contrib GROUP BY doc_id
        ORDER BY score_scaled DESC, doc_id LIMIT 25
    """,
    doc="BM25 retrieval for a fixed query-term set: tf filtered to query "
    "terms at the scan, per-term df (<=|terms| rows) and the 1-row corpus "
    "aggregate both broadcast, top-k via TakeOrdered. IDF uses the raw "
    "odds (N-df+.5)/(df+.5) instead of its log — log() is libm-dependent "
    "and breaks cross-engine hash gates; log is monotone so ranking is "
    "unchanged. Per-term contributions floor-scaled to BIGINT before the "
    "per-doc sum (no float-sum ordering hazard)",
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_scores(load_table(spark, sf_dir, "documents"), _BM25_TERMS)


@register(
    "pps_documents",
    oracle="""
        WITH h AS (SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
                     md5('pps:' || CAST(doc_id AS VARCHAR)) AS hk
                   FROM documents),
        c AS (SELECT lang, doc_id, w,
                sum(w) OVER (PARTITION BY lang ORDER BY hk, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(w) OVER (PARTITION BY lang) AS tot
              FROM h)
        SELECT lang, doc_id, w AS weight, CAST(cum AS BIGINT) AS cum_weight
        FROM (SELECT *, greatest(tot // 20, 1) AS step FROM c)
        WHERE (cum - w) // step < cum // step
        ORDER BY lang, cum_weight
    """,
    doc="Systematic PPS sampling: ~20 docs per language, inclusion "
    "probability proportional to n_chars — md5-hash ordering replaces the "
    "random shuffle, running-sum boundary crossings replace the random "
    "start, so any engine and any partitioning selects the same rows; ONE "
    "window shuffle keyed by stratum, integer weights throughout",
)
def pps_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pps_sample(
        load_table(spark, sf_dir, "documents"),
        key_col="doc_id",
        weight_col="n_chars",
        stratum_col="lang",
        k=20,
    ).orderBy("lang", "cum_weight")


from iceberg_meta_spark.pipeline.corpus import (  # noqa: E402
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
)


@register(
    "events_hourly_unpivot",
    oracle="""
        WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type
                   FROM events),
        wide AS (SELECT hour,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
                 FROM e GROUP BY hour)
        SELECT hour, event_type, n FROM wide
        UNPIVOT (n FOR event_type IN (click, view, purchase))
        ORDER BY hour, event_type
    """,
    doc="Wide-to-long UNPIVOT (melt): the hourly pivot matrix stacked back "
    "to (hour, event_type, n) rows via DataFrame.unpivot — the inverse of "
    "events_hourly_pivot, both from one conditional-aggregation pass; "
    "unpivot is a zero-shuffle row expansion of the already-aggregated "
    "hour-grain frame",
)
def events_hourly_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.expr("(ts DIV 1000) DIV 3600000000").alias("hour"), "event_type"
    )
    wide = e.groupBy("hour").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(t)
            for t in ("click", "view", "purchase")
        ]
    )
    return (
        wide.unpivot(["hour"], ["click", "view", "purchase"], "event_type", "n")
        .orderBy("hour", "event_type")
    )


@register(
    "events_tumbling_reach",
    oracle="""
        WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events)
        SELECT ts_us - (ts_us % 3600000000) AS window_start_us,
               CAST(count(DISTINCT user_id) AS BIGINT) AS reach
        FROM e GROUP BY window_start_us ORDER BY window_start_us
    """,
    doc="Per-hour distinct users (batch twin of "
    "streaming/windows.streaming_tumbling_reach): exact countDistinct per "
    "tumbling bucket — the streaming twin swaps in approx_count_distinct "
    "so per-window state is an HLL sketch (KBs) instead of one entry per "
    "(window, user), the exact-to-sketch trade the reach/HLL pair already "
    "documents",
)
def events_tumbling_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.streaming.windows import tumbling_reach

    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts DIV 1000").alias("ts_us")
    )
    return tumbling_reach(e, 3_600_000_000).orderBy("window_start_us")


@register(
    "customer_rolling_revenue",
    oracle="""
        WITH d AS (SELECT o_custkey,
                     CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS BIGINT) AS day,
                     CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents
                   FROM orders GROUP BY o_custkey, day)
        SELECT o_custkey, day, day_cents,
               CAST(sum(day_cents) OVER (PARTITION BY o_custkey ORDER BY day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_7d_cents
        FROM d ORDER BY o_custkey, day
    """,
    doc="Rolling 7-day revenue per customer via a RANGE-frame window: "
    "day-grain pre-aggregation first (the wide work, map-side combined), "
    "then the RANGE BETWEEN 6 PRECEDING frame over the per-customer "
    "day-grain rows — value-based framing handles day gaps correctly "
    "where a ROWS frame would not; window partitions by customer, integer "
    "cents end to end",
)
def customer_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            F.expr(
                "CAST(unix_micros(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)) DIV 86400000000 AS BIGINT)"
            ).alias("day"),
        )
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("day_cents"))
    )
    w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-6, 0)
    return d.select(
        "o_custkey", "day", "day_cents",
        F.sum("day_cents").over(w).alias("rolling_7d_cents"),
    ).orderBy("o_custkey", "day")


@register(
    "copurchase_pairs",
    oracle="""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                    CAST(count(*) AS BIGINT) AS n_orders
                  FROM items a JOIN items b
                    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                  GROUP BY part_a, part_b)
        SELECT part_a, part_b, n_orders FROM pairs
        WHERE n_orders >= 2
        ORDER BY n_orders DESC, part_a, part_b LIMIT 50
    """,
    doc="Market-basket co-purchase pairs: distinct (order, part) items "
    "self-joined WITHIN an order key — the blocked self-join is bounded by "
    "basket size (quadratic per order, never per corpus), the classic "
    "item-item co-occurrence shape; map-side combine on the pair counts, "
    "top-k via TakeOrdered",
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(50)
    )


@register(
    "monthly_revenue_growth",
    oracle="""
        WITH m AS (SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS VARCHAR) AS month,
                     CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
                   FROM orders GROUP BY month)
        SELECT month, revenue_cents,
               CAST(CASE WHEN lag(revenue_cents) OVER (ORDER BY month) IS NULL THEN NULL
                    ELSE (revenue_cents - lag(revenue_cents) OVER (ORDER BY month)) * 1000000
                         // lag(revenue_cents) OVER (ORDER BY month) END AS BIGINT) AS growth_ppm
        FROM m ORDER BY month
    """,
    doc="Month-over-month revenue growth: one month-keyed aggregate (the "
    "wide work) then a lag() window over the MONTH-grain frame — the "
    "global ordering is over #months rows, metadata-sized, so the "
    "single-partition window is safe at any data scale; integer-ppm "
    "growth keeps the gate exact",
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("month"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("revenue_cents"))
    )
    prev = F.lag("revenue_cents").over(Window.orderBy("month"))
    return m.select(
        "month",
        "revenue_cents",
        F.when(prev.isNull(), F.lit(None).cast("long"))
        .otherwise(F.expr(
            "(revenue_cents - lag(revenue_cents) OVER (ORDER BY month)) * 1000000"
            " DIV lag(revenue_cents) OVER (ORDER BY month)"
        ))
        .alias("growth_ppm"),
    ).orderBy("month")


@register(
    "corpus_report",
    tags=("bench", "composite"),
    oracle=f"""
        WITH d AS (SELECT doc_id, text, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                   FROM documents)
        SELECT 'corpus' AS section, 'doc_count' AS metric,
               CAST(count(*) AS DOUBLE) AS value FROM d
        UNION ALL
        SELECT 'corpus', 'languages', CAST(count(DISTINCT lang) AS DOUBLE) FROM d
        UNION ALL
        SELECT 'corpus', 'total_tokens', CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE) FROM d
        UNION ALL
        SELECT 'dedup', 'exact_dup_docs',
               CAST(count(*) - count(DISTINCT md5(lower(text))) AS DOUBLE) FROM d
        UNION ALL
        SELECT 'dedup', 'dup_head_docs',
               CAST(count(*) - count(DISTINCT md5(substring(text, 1, 64))) AS DOUBLE) FROM d
        UNION ALL
        SELECT 'quality', 'short_docs',
               CAST(CAST(sum(CASE WHEN n_tokens < 50 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) FROM d
        UNION ALL
        SELECT 'pii', 'total_redactions',
               CAST(CAST(sum(len(regexp_extract_all(text, '{PII_EMAIL}'))
                 + len(regexp_extract_all(text, '{PII_IPV4}'))
                 + len(regexp_extract_all(text, '{PII_PHONE}'))) AS BIGINT) AS DOUBLE) FROM d
    """,
    doc="Composite corpus-health report: the pipeline-side flagship "
    "mirroring health_report's long (section, metric, value) contract — "
    "corpus size/languages/token volume, exact- and head-fingerprint dup "
    "counts, short-doc share input, and total PII redactions, all from "
    "ONE documents scan (Catalyst dedupes the union's branches); every "
    "branch is a 1-row aggregate so the union is metadata-sized",
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )

    def metric(section: str, name: str, value) -> DataFrame:
        return docs.agg(value.cast("double").alias("value")).select(
            F.lit(section).alias("section"), F.lit(name).alias("metric"), "value"
        )

    n_redact = (
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL))
        + F.regexp_count(F.col("text"), F.lit(PII_IPV4))
        + F.regexp_count(F.col("text"), F.lit(PII_PHONE))
    )
    sections = [
        metric("corpus", "doc_count", F.count(F.lit(1))),
        metric("corpus", "languages", F.countDistinct("lang")),
        metric("corpus", "total_tokens", F.sum("n_tokens")),
        metric(
            "dedup",
            "exact_dup_docs",
            F.count(F.lit(1)) - F.countDistinct(F.md5(F.lower(F.col("text")))),
        ),
        metric(
            "dedup",
            "dup_head_docs",
            F.count(F.lit(1)) - F.countDistinct(F.md5(F.substring(F.col("text"), 1, 64))),
        ),
        metric(
            "quality",
            "short_docs",
            F.sum(F.when(F.col("n_tokens") < 50, 1).otherwise(0)).cast("long"),
        ),
        metric("pii", "total_redactions", F.sum(n_redact.cast("long"))),
    ]
    out = sections[0]
    for s in sections[1:]:
        out = out.unionByName(s)
    return out


@register(
    "event_transitions",
    oracle="""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
                   FROM events),
        nxt AS (SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS to_type
                FROM e),
        pairs AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
                  FROM nxt WHERE to_type IS NOT NULL
                  GROUP BY from_type, to_type),
        tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t
                FROM pairs GROUP BY from_type)
        SELECT from_type, to_type, n,
               CAST(n * 1000000 // t AS BIGINT) AS p_ppm
        FROM pairs JOIN tot USING (from_type)
        ORDER BY from_type, to_type
    """,
    doc="Markov next-event transition matrix: per-user lead() window "
    "(key-partitioned, ordered by (ts, event_id) — deterministic under "
    "duplicate-free ids), pair counts with map-side combine, per-source "
    "totals broadcast back for integer-ppm probabilities; the "
    "sequence-mining shape behind funnel discovery",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("t"))
    return (
        pairs.join(F.broadcast(tot), "from_type")
        .select("from_type", "to_type", "n", F.expr("n * 1000000 DIV t").alias("p_ppm"))
        .orderBy("from_type", "to_type")
    )


@register(
    "user_value_twa",
    oracle="""
        WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                     CAST(floor(value * 100) AS BIGINT) AS cents
                   FROM events),
        seg AS (SELECT user_id, cents, ts_us,
                  lead(ts_us) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS next_us
                FROM e),
        agg AS (SELECT user_id,
                  CAST(sum((next_us - ts_us) * cents) AS BIGINT) AS area,
                  CAST(max(next_us) - min(ts_us) AS BIGINT) AS span_us,
                  CAST(count(*) AS BIGINT) AS n_segments
                FROM seg WHERE next_us IS NOT NULL GROUP BY user_id)
        SELECT user_id, n_segments, span_us,
               CAST(area // span_us AS BIGINT) AS twa_cents
        FROM agg WHERE span_us > 0 ORDER BY user_id
    """,
    doc="Time-weighted average value per user (TimescaleDB time_weight "
    "shape, LOCF kernel): each observation holds until the next one, so "
    "the average is sum(duration x value) / total span — one lead() "
    "window per user then a per-user aggregate; exact BIGINT "
    "micros x cents arithmetic end to end",
)
def user_value_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts DIV 1000").alias("ts_us"),
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seg = e.select(
        "user_id", "cents", "ts_us", F.lead("ts_us").over(w).alias("next_us")
    ).filter(F.col("next_us").isNotNull())
    agg = seg.groupBy("user_id").agg(
        F.sum(F.expr("(next_us - ts_us) * cents")).alias("area"),
        (F.max("next_us") - F.min("ts_us")).alias("span_us"),
        F.count(F.lit(1)).alias("n_segments"),
    )
    return (
        agg.filter(F.col("span_us") > 0)
        .select(
            "user_id", "n_segments", "span_us", F.expr("area DIV span_us").alias("twa_cents")
        )
        .orderBy("user_id")
    )


@register(
    "salted_user_reach",
    oracle="""
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS reach
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Hot-key distinct count via salting: salt = hash(user_id) % 16 "
    "routes each USER (not row) to a stable salt, so per-(type, salt) "
    "distinct partials are disjoint and their SUM is the exact distinct "
    "count — the hot event type's state spreads over 16 reducers instead "
    "of flooding one. The decomposition a plain countDistinct can't get "
    "when one key dominates; results identical to the unsalted oracle",
)
def salted_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    salted = ev.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("user_id")), F.lit(16)).cast("int")
    )
    partial = salted.groupBy("event_type", "__salt").agg(
        F.countDistinct("user_id").alias("pr")
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum("pr").alias("reach"))
        .orderBy("event_type")
    )


@register(
    "meta_pruning_preview",
    oracle=oracle_query(
        """
        SELECT (hi < 1200 OR lo > 1500) AS skippable,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(hi - lo) AS BIGINT) AS total_span
        FROM file_ranges
        GROUP BY skippable ORDER BY skippable
        """,
        "file_ranges",
    ),
    tags=("maintenance",),
    doc="Data-skipping preview for a predicate interval [1200, 1500]: a "
    "file is skippable iff its min/max range misses the query interval — "
    "the planning-time estimate of how much IO zone-map pruning saves, "
    "and the metric a zorder/hilbert rewrite should improve; pure "
    "map-side flag + 2-group aggregate",
)
def meta_pruning_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = derive(spark, sf_dir, "file_ranges")
    return (
        fr.withColumn("skippable", (F.col("hi") < 1200) | (F.col("lo") > 1500))
        .groupBy("skippable")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.col("hi") - F.col("lo")).alias("total_span"),
        )
        .orderBy("skippable")
    )


@register(
    "language_id_confusion",
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
                   FROM documents),
        p AS (SELECT labeled_lang,
                CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
                     WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                     WHEN score_fr >= score_es THEN 'fr'
                     ELSE 'es' END AS pred_lang
              FROM s)
        SELECT labeled_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM p GROUP BY labeled_lang, pred_lang
        ORDER BY labeled_lang, pred_lang
    """,
    doc="Classifier-eval confusion matrix: the language-ID heuristic's "
    "predictions crossed with the labeled language, one count per "
    "(label, prediction) cell — the model-eval aggregation shape; the "
    "per-doc scoring is pure map-side expressions, the matrix is a "
    "|langs|^2-row aggregate",
)
def language_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.text import language_id

    pred = language_id(load_table(spark, sf_dir, "documents"))
    return (
        pred.groupBy("labeled_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("labeled_lang", "pred_lang")
    )


@register(
    "promo_discount_revenue",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_delta_cents
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): single-table predicate "
    "band + one global aggregate — every filter pushes to the parquet "
    "scan, the whole query is one codegen'd map-reduce with a 1-row "
    "result; the canonical data-skipping beneficiary (a year-clustered "
    "layout prunes all other files)",
)
def promo_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    return (
        li.filter(
            (d >= F.lit("1997-01-01").cast("date"))
            & (d < F.lit("1998-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("long")
            ).alias("revenue_delta_cents"),
        )
    )


@register(
    "behavior_cohorts",
    oracle="""
        WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY user_id, event_type),
        sig AS (SELECT user_id,
                  coalesce(
                    array_to_string(list_sort(list(event_type) FILTER (n >= 15)), ','),
                    '') AS signature
                FROM c GROUP BY user_id)
        SELECT signature, CAST(count(*) AS BIGINT) AS n_users
        FROM sig GROUP BY signature
        ORDER BY n_users DESC, signature
    """,
    doc="Behavioral cohorts: each user's HABITUAL event types (>= 15 "
    "occurrences) sorted and canonicalized to one signature string, users "
    "counted per signature — the segment-discovery shape; per-(user, type) "
    "counts collapse map-side first, the collected set is bounded by the "
    "type vocabulary (bytes per user), and every aggregate combines "
    "map-side",
)
def behavior_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sig = c.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_set(F.when(F.col("n") >= 15, F.col("event_type")))),
            ",",
        ).alias("signature")
    )
    return (
        sig.groupBy("signature")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "signature")
    )


_WIDEN_SQL = " OR ".join(
    f"(old_type = '{o}' AND new_type = '{n}')"
    for o, n in (
        ("int", "long"), ("int", "bigint"), ("float", "double"),
        ("decimal(9,2)", "decimal(18,2)"), ("decimal(18,2)", "decimal(38,2)"),
    )
)


@register(
    "meta_schema_compat",
    oracle=oracle_query(
        f"""
        , o AS (SELECT table_name, field_id, name AS old_name, type AS old_type, required AS old_required
                FROM meta_schema_fields WHERE schema_id = 1),
        n AS (SELECT table_name, field_id, name AS new_name, type AS new_type, required AS new_required
              FROM meta_schema_fields WHERE schema_id = 2),
        j AS (SELECT coalesce(o.table_name, n.table_name) AS table_name,
                     old_name, new_name, old_type, new_type, old_required, new_required
              FROM o FULL OUTER JOIN n ON o.table_name = n.table_name AND o.field_id = n.field_id
              WHERE old_name IS NULL OR new_name IS NULL
                 OR old_name <> new_name OR old_type <> new_type OR old_required <> new_required),
        cls AS (SELECT table_name,
                  CASE WHEN old_name IS NULL THEN 'added'
                       WHEN new_name IS NULL THEN 'removed'
                       WHEN old_type <> new_type THEN
                         CASE WHEN {_WIDEN_SQL} THEN 'widened' ELSE 'incompatible' END
                       WHEN old_required = false AND new_required = true THEN 'tightened'
                       ELSE 'renamed' END AS compat
                FROM j)
        SELECT table_name, compat, CAST(count(*) AS BIGINT) AS n_fields
        FROM cls GROUP BY table_name, compat ORDER BY table_name, compat
        """,
        "meta_schema_fields",
    ),
    doc="Schema-evolution safety classes per table: each J2 diff row "
    "classifies as widened (Iceberg's legal promotions — int->long, "
    "float->double, decimal growth: old files stay readable), renamed "
    "(safe — field IDs, not names, bind columns), tightened "
    "(optional->required: existing nulls may violate), or incompatible "
    "(rewrite required); added/removed pass through. The "
    "can-readers-upgrade check run before committing a schema change",
)
def meta_schema_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.schema_compat(derive(spark, sf_dir, "meta_schema_fields"), old_id=1, new_id=2)


@register(
    "meta_rollback_plan",
    oracle=oracle_query(
        """
        , cur AS (SELECT file_path, sum(record_count) AS rc,
                    sum(file_size_in_bytes) AS sz
                  FROM meta_files WHERE snapshot_id = 2 GROUP BY file_path),
        tgt AS (SELECT file_path, sum(record_count) AS rc,
                  sum(file_size_in_bytes) AS sz
                FROM meta_files WHERE snapshot_id = 1 GROUP BY file_path),
        d AS (SELECT CASE WHEN cur.file_path IS NULL THEN 'restore'
                          ELSE 'remove' END AS action,
                coalesce(tgt.rc, cur.rc) AS rc, coalesce(tgt.sz, cur.sz) AS sz
              FROM cur FULL JOIN tgt USING (file_path)
              WHERE cur.file_path IS NULL OR tgt.file_path IS NULL)
        SELECT action, CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(rc) AS BIGINT) AS records,
               CAST(sum(sz) AS BIGINT) AS bytes
        FROM d GROUP BY action ORDER BY action
    """,
        "meta_files",
    ),
    tags=("maintenance",),
    doc="Rollback plan to a target snapshot: the files to RESTORE (in "
    "target, not current) and REMOVE (in current, not target) with "
    "record/byte totals — J1's one-full-outer-join diff pointed backwards, "
    "summarized as the action list `rollback_to_snapshot` would execute; "
    "per-path contributions pre-aggregated so duplicate paths can't "
    "double-classify",
)
def meta_rollback_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark import api

    return api.rollback_plan(
        api.FixtureSource(spark, sf_dir), current=2, target=1
    )


@register(
    "meta_pruning_after_zorder",
    oracle=oracle_query(
        f"""
        , stats AS (SELECT min(lo) AS lo_min, max(lo) AS lo_max,
                           min(hi - lo) AS sp_min, max(hi - lo) AS sp_max
                    FROM file_ranges),
        scaled AS (SELECT file_path, lo, hi,
                          CAST((lo - lo_min) * {_Z_TOP} // greatest(lo_max - lo_min, 1) AS BIGINT) AS x,
                          CAST((hi - lo - sp_min) * {_Z_TOP} // greatest(sp_max - sp_min, 1) AS BIGINT) AS y
                   FROM file_ranges, stats),
        rewritten AS (SELECT ({{INTERLEAVE}}) >> {_Z_SHIFT} AS zbucket,
                             CAST(min(lo) AS BIGINT) AS lo, CAST(max(hi) AS BIGINT) AS hi,
                             CAST(count(*) AS BIGINT) AS n_files
                      FROM scaled GROUP BY zbucket)
        SELECT (hi < 1200 OR lo > 1500) AS skippable,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(n_files) AS BIGINT) AS n_files,
               CAST(sum(hi - lo) AS BIGINT) AS total_span
        FROM rewritten GROUP BY skippable ORDER BY skippable
        """,
        "file_ranges",
    ).replace("{INTERLEAVE}", _interleave_expr("x", "y", _Z_BITS)),
    tags=("maintenance",),
    doc="Pruning effectiveness AFTER a Z-order rewrite: each zbucket "
    "becomes one rewritten file whose zone map is the bucket-wide "
    "[min lo, max hi]; the same [1200, 1500] predicate's skippability "
    "over the rewritten layout is directly comparable to "
    "meta_pruning_preview's before-picture — the measurable WHY of the "
    "clustering planners; one bounds aggregate + map-side codes + "
    "bucket-grain aggregates",
)
def meta_pruning_after_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = derive(spark, sf_dir, "file_ranges")
    stats = fr.select(F.col("lo"), (F.col("hi") - F.col("lo")).alias("span")).agg(
        F.min("lo").alias("lo_min"),
        F.max("lo").alias("lo_max"),
        F.min("span").alias("sp_min"),
        F.max("span").alias("sp_max"),
    )
    scaled = (
        fr.crossJoin(F.broadcast(stats))
        .withColumn(
            "x",
            F.expr(f"CAST((lo - lo_min) * {_Z_TOP} DIV greatest(lo_max - lo_min, 1) AS BIGINT)"),
        )
        .withColumn(
            "y",
            F.expr(
                f"CAST((hi - lo - sp_min) * {_Z_TOP} DIV greatest(sp_max - sp_min, 1) AS BIGINT)"
            ),
        )
    )
    rewritten = (
        scaled.withColumn(
            "zbucket", F.expr(f"({_interleave_expr('x', 'y', _Z_BITS)}) >> {_Z_SHIFT}")
        )
        .groupBy("zbucket")
        .agg(
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.count(F.lit(1)).alias("n_files"),
        )
    )
    return (
        rewritten.withColumn("skippable", (F.col("hi") < 1200) | (F.col("lo") > 1500))
        .groupBy("skippable")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("n_files").alias("n_files"),
            F.sum(F.col("hi") - F.col("lo")).alias("total_span"),
        )
        .orderBy("skippable")
    )


@register(
    "meta_incremental_partition_stats",
    oracle=oracle_query(
        """
        , c1 AS (SELECT part_key, file_path, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(record_count) AS BIGINT) AS record_count,
                   CAST(sum(file_size_in_bytes) AS BIGINT) AS file_size_in_bytes
                 FROM meta_files WHERE snapshot_id = 1 GROUP BY part_key, file_path),
        c2 AS (SELECT part_key, file_path, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(record_count) AS BIGINT) AS record_count,
                 CAST(sum(file_size_in_bytes) AS BIGINT) AS file_size_in_bytes
               FROM meta_files WHERE snapshot_id = 2 GROUP BY part_key, file_path),
        d AS (SELECT part_key,
                coalesce(c2.n, 0) - coalesce(c1.n, 0) AS d_n,
                coalesce(c2.record_count, 0) - coalesce(c1.record_count, 0) AS d_record_count,
                coalesce(c2.file_size_in_bytes, 0) - coalesce(c1.file_size_in_bytes, 0) AS d_file_size_in_bytes
              FROM c2 FULL JOIN c1 USING (part_key, file_path)
              WHERE coalesce(c2.n, 0) <> coalesce(c1.n, 0)
                 OR coalesce(c2.record_count, 0) <> coalesce(c1.record_count, 0)
                 OR coalesce(c2.file_size_in_bytes, 0) <> coalesce(c1.file_size_in_bytes, 0)),
        dg AS (SELECT part_key, CAST(sum(d_n) AS BIGINT) AS d_n,
                 CAST(sum(d_record_count) AS BIGINT) AS d_record_count,
                 CAST(sum(d_file_size_in_bytes) AS BIGINT) AS d_file_size_in_bytes
               FROM d GROUP BY part_key),
        og AS (SELECT part_key, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(record_count) AS BIGINT) AS record_count,
                 CAST(sum(file_size_in_bytes) AS BIGINT) AS file_size_in_bytes
               FROM meta_files WHERE snapshot_id = 1 GROUP BY part_key)
        SELECT part_key,
               CAST(coalesce(og.n, 0) + coalesce(dg.d_n, 0) AS BIGINT) AS n_files,
               CAST(coalesce(og.record_count, 0) + coalesce(dg.d_record_count, 0) AS BIGINT) AS records,
               CAST(coalesce(og.file_size_in_bytes, 0) + coalesce(dg.d_file_size_in_bytes, 0) AS BIGINT) AS bytes,
               CAST(coalesce(dg.d_n, 0) AS BIGINT) AS d_files,
               CAST(coalesce(dg.d_record_count, 0) AS BIGINT) AS d_records,
               CAST(coalesce(dg.d_file_size_in_bytes, 0) AS BIGINT) AS d_bytes
        FROM og FULL JOIN dg USING (part_key)
        ORDER BY part_key
        """,
        "meta_files",
    ),
    tags=("maintenance",),
    doc="Incremental view maintenance of per-partition stats: the new "
    "snapshot's numbers computed as old stats + the signed delta of "
    "changed (partition, file) contributions — the refresh touches only "
    "the delta frontier (at deployment scale Iceberg hands you exactly the "
    "new snapshot's manifests), never rescans the old snapshot's wide "
    "data. SUM/COUNT aggregates only (the self-maintainable class); the "
    "d_* columns expose how much work the refresh applied. The oracle "
    "replays the identical algebra, and the unit test pins the result "
    "equal to a full recompute at the new snapshot",
)
def meta_incremental_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.incremental import incremental_group_stats

    files = derive(spark, sf_dir, "meta_files")
    old = files.filter(F.col("snapshot_id") == 1)
    new = files.filter(F.col("snapshot_id") == 2)
    out = incremental_group_stats(
        old, new, "part_key", "file_path", ("record_count", "file_size_in_bytes")
    )
    return out.select(
        "part_key",
        F.col("n").alias("n_files"),
        F.col("record_count").alias("records"),
        F.col("file_size_in_bytes").alias("bytes"),
        F.col("d_n").alias("d_files"),
        F.col("d_record_count").alias("d_records"),
        F.col("d_file_size_in_bytes").alias("d_bytes"),
    ).orderBy("part_key")


@register(
    "event_value_outliers",
    oracle="""
        WITH ev AS (SELECT event_type,
                      CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM events),
        st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(cents) AS BIGINT) AS s,
                      CAST(sum(cents * cents) AS BIGINT) AS ss
               FROM ev GROUP BY event_type),
        stats AS (SELECT event_type, n, s, ss,
                    CAST(s AS DOUBLE) / n AS mean,
                    sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n) AS std
                  FROM st)
        SELECT ev.event_type, max(n) AS n,
               CAST(sum(CASE WHEN abs(cents - mean) > 3 * std THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_outliers,
               CAST(floor(max(mean)) AS BIGINT) AS mean_cents,
               CAST(floor(max(std)) AS BIGINT) AS std_cents
        FROM ev JOIN stats USING (event_type)
        GROUP BY ev.event_type ORDER BY ev.event_type
    """,
    doc="3-sigma outlier screen per event type: one narrow per-type moment "
    "aggregate (count/sum/sum-of-squares as exact BIGINTs), broadcast back "
    "onto the events for the |x-mean| > 3*std flag, second per-type count "
    "— two passes by necessity (the threshold depends on the global "
    "moments), both shuffles are per-type partials; all float math derives "
    "from exact integers via IEEE ops so the gate stays exact",
)
def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.expr("cents * cents")).alias("ss"),
    )
    stats = st.withColumn("mean", F.expr("CAST(s AS DOUBLE) / n")).withColumn(
        "std",
        F.expr("sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.sum(
                F.when(F.expr("abs(cents - mean) > 3 * std"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.floor(F.max("mean")).cast("long").alias("mean_cents"),
            F.floor(F.max("std")).cast("long").alias("std_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "lm_familiarity",
    tags=("bench",),
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
               FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)),
        counts AS (SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
                   FROM bg GROUP BY bigram),
        prefix AS (SELECT split_part(bigram, ' ', 1) AS w1,
                     CAST(sum(cnt) AS BIGINT) AS ptot
                   FROM counts GROUP BY 1),
        capped AS (SELECT * FROM counts ORDER BY cnt DESC, bigram LIMIT 65536),
        model AS (SELECT c.bigram,
                    CAST((c.cnt * 1000000000) // p.ptot AS BIGINT) AS w, c.cnt
                  FROM capped c
                  JOIN prefix p ON split_part(c.bigram, ' ', 1) = p.w1),
        scored AS (SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_bigrams,
                     CAST(sum(COALESCE(m.w, 0)) // count(*) AS BIGINT)
                       AS mean_familiarity
                   FROM bg LEFT JOIN model m USING (bigram)
                   GROUP BY doc_id),
        exp AS (SELECT CAST(sum(cnt * w) // sum(cnt) AS BIGINT) AS expected_w
                FROM model)
        SELECT doc_id, n_bigrams, mean_familiarity,
               (mean_familiarity * 2 < expected_w) AS low_familiarity
        FROM scored, exp
    """,
    doc="CCNet-style bigram-LM perplexity filter with integer-exact "
    "conditional probabilities ((cnt(w1 w2) * 1e9) DIV cnt(w1 .)) instead "
    "of a platform log(): one tokenize+count index-build pass, capped model "
    "broadcast onto exploded bigrams, per-doc mean familiarity, "
    "low_familiarity flag vs the broadcast 1-row corpus expectation",
)
def lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.lm_familiarity_scores(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Product quantization (pipeline/pq.py): per-subspace Lloyd codebooks +
# per-vector codes, oracle-unrolled exactly like the IVF k-means above but
# over embedding slices.
# ---------------------------------------------------------------------------

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
    "corpus_splits",
    oracle="""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        keys AS (
            SELECT doc_id, md5(concat('p|', array_to_string(t[1:3], ' '))) AS fp
            FROM toks
            UNION ALL
            SELECT doc_id,
                   md5(concat('s|', array_to_string(
                        list_reverse(list_slice(list_reverse(t), 1, 3)), ' '))) AS fp
            FROM toks),
        reps AS (SELECT fp, min(doc_id) AS rep FROM keys GROUP BY fp),
        e0 AS (SELECT DISTINCT k.doc_id AS src, r.rep AS dst
               FROM keys k JOIN reps r USING (fp) WHERE k.doc_id <> r.rep),
        edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        walk (node, lab) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node),
        cc AS (SELECT node, min(lab) AS lab FROM walk GROUP BY node),
        labeled AS (SELECT d.doc_id, coalesce(cc.lab, d.doc_id) AS split_key
                    FROM documents d LEFT JOIN cc ON cc.node = d.doc_id),
        bucketed AS (SELECT doc_id, split_key,
                       substr(md5('split:' || CAST(split_key AS VARCHAR)), 1, 2) AS b
                     FROM labeled)
        SELECT doc_id, split_key,
               CASE WHEN b < '1a' THEN 'test'
                    WHEN b < '34' THEN 'validation'
                    ELSE 'train' END AS split
        FROM bucketed
    """,
    doc="Leakage-safe train/val/test splits: the split hashes the doc's "
    "duplicate-CLUSTER label (connected components over fingerprint star "
    "edges), so near-duplicates structurally cannot straddle splits — the "
    "eval-decontamination guarantee; singletons hash their own id; md5 "
    "hex-threshold bucketing at 26/256 test + 26/256 validation, no RNG",
)
def corpus_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.leakage_safe_splits(load_table(spark, sf_dir, "documents"))


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


# ---------------------------------------------------------------------------
# BPE merge training (pipeline/bpe.py): the tokenizer-building loop,
# unrolled like the Lloyd/PageRank kernels so it stays hash-gated. The
# oracle replays the greedy leftmost merge fold with list_reduce over
# singleton-wrapped elements (the accumulator must be list-typed).
# ---------------------------------------------------------------------------

from iceberg_meta_spark.pipeline import bpe  # noqa: E402


def _bpe_parts(rounds: int = 3) -> list[str]:
    parts = ["r0 AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents)"]
    for r in range(1, rounds + 1):
        prev = f"r{r-1}"
        parts.append(
            f"""p{r} AS (SELECT a[u.i] AS pa, a[u.i+1] AS pb, CAST(count(*) AS BIGINT) AS pair_count
        FROM {prev}, UNNEST(generate_series(1, len(a)-1)) AS u(i) GROUP BY 1, 2)"""
        )
        parts.append(
            f"""b{r} AS (SELECT pa, pb, pa || '+' || pb AS m, pair_count
        FROM p{r} ORDER BY pair_count DESC, pa, pb LIMIT 1)"""
        )
        parts.append(
            f"""r{r} AS (SELECT doc_id,
          list_reduce(list_transform({prev}.a, e -> [e]),
            (acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = b{r}.pa AND x[1] = b{r}.pb
                        THEN list_append(acc[1:len(acc)-1], b{r}.m)
                        ELSE list_append(acc, x[1]) END) AS a
        FROM {prev}, b{r})"""
        )
        parts.append(
            f"s{r} AS (SELECT CAST(sum(len(a)) AS BIGINT) AS symbols_after FROM r{r})"
        )
    return parts


def _bpe_oracle(rounds: int = 3) -> str:
    parts = _bpe_parts(rounds)
    selects = "\n        UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, b{r}.m AS merged_pair, "
        f"b{r}.pair_count, s{r}.symbols_after FROM b{r}, s{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n    ".join(parts) + f"\n        {selects}\n        ORDER BY merge_round"


@register(
    "bpe_merge_training",
    oracle=_bpe_oracle(rounds=3),
    doc="BPE-style merge training at token granularity (the subword-"
    "tokenizer build loop): per round, one in-row pair count + a 1-row "
    "TakeOrdered winner broadcast back + a greedy leftmost map-side merge "
    "fold over every sequence; 3 unrolled rounds, deterministic tie-break, "
    "hash-gated like the other iterative kernels",
)
def bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe.bpe_merges(load_table(spark, sf_dir, "documents"), rounds=3)


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


# ---------------------------------------------------------------------------
# Time-travel state reconstruction (operators/lineage.py::files_asof).
# ---------------------------------------------------------------------------

from iceberg_meta_spark.operators.lineage import files_asof  # noqa: E402
from iceberg_meta_spark.sources.fixtures import cte_sql, derive  # noqa: E402


@register(
    "meta_files_asof",
    oracle="WITH RECURSIVE meta_files AS ("
    + cte_sql("meta_files", "duckdb")
    + """),
        nodes AS (
            SELECT event_id AS snapshot_id,
                   CASE WHEN event_id % 64 = 0 THEN NULL
                        ELSE event_id - 1 END AS parent_id
            FROM events),
        walk AS (
            SELECT snapshot_id, snapshot_id AS cur, 0 AS depth FROM nodes
            UNION ALL
            SELECT w.snapshot_id, n.parent_id, w.depth + 1
            FROM walk w JOIN nodes n ON n.snapshot_id = w.cur
            WHERE n.parent_id IS NOT NULL),
        anc AS (SELECT w.snapshot_id, w.cur AS root_id, w.depth
                FROM walk w JOIN nodes n ON n.snapshot_id = w.cur
                WHERE n.parent_id IS NULL),
        anchor AS (SELECT root_id AS as_of_root, depth AS as_of_depth
                   FROM anc WHERE snapshot_id = 1),
        visible AS (SELECT a.snapshot_id FROM anc a, anchor
                    WHERE a.root_id = anchor.as_of_root
                      AND a.depth <= anchor.as_of_depth)
        SELECT part_key, CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(file_size_in_bytes) AS BIGINT) AS total_bytes,
               CAST(sum(record_count) AS BIGINT) AS total_records
        FROM meta_files JOIN visible USING (snapshot_id)
        GROUP BY part_key ORDER BY part_key
    """,
    doc="Time-travel state reconstruction: the per-partition file inventory "
    "visible AS OF snapshot 1 — visibility from the pointer-doubled lineage "
    "frame (ancestor iff same root and depth <= as-of depth; exact for "
    "chain forests), the file table scanned ONCE and semi-filtered by the "
    "broadcast visible-snapshot set; the oracle replays the walk with a "
    "recursive CTE",
)
def meta_files_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = derive(spark, sf_dir, "meta_files")
    nodes = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("snapshot_id"),
        F.when(F.col("event_id") % 64 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("event_id") - 1)
        .alias("parent_id"),
    )
    return files_asof(files, nodes, as_of=1)




@register(
    "bpe_encoded_lengths",
    oracle="WITH "
    + ",\n    ".join(_bpe_parts(3))
    + """
        SELECT doc_id, CAST(len(a) AS BIGINT) AS n_symbols
        FROM r3 ORDER BY doc_id""",
    doc="BPE encode step: per-doc symbol count after applying the 3 trained "
    "merges (train_merge_rules collects the 1-row winner per round "
    "driver-side, apply_merges replays them as a map-side fold chain) — "
    "the compression a tokenizer build reports per document",
)
def bpe_encoded_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rules = bpe.train_merge_rules(docs, rounds=3)
    return bpe.apply_merges(docs, rules).select(
        "doc_id", F.size("symbols").cast("long").alias("n_symbols")
    ).orderBy("doc_id")


from iceberg_meta_spark.operators.snapshots import snapshot_growth  # noqa: E402


@register(
    "meta_snapshot_growth",
    oracle="WITH meta_snapshots AS ("
    + cte_sql("meta_snapshots", "duckdb")
    + """),
        child AS (SELECT snapshot_id, parent_id, operation,
                    total_files_size AS size_now,
                    total_data_files AS files_now,
                    total_records AS records_now
                  FROM meta_snapshots),
        parent AS (SELECT snapshot_id AS parent_id,
                     total_files_size AS size_prev,
                     total_data_files AS files_prev,
                     total_records AS records_prev
                   FROM meta_snapshots)
        SELECT c.snapshot_id, c.operation,
               CAST(c.size_now - p.size_prev AS BIGINT) AS size_delta,
               CAST(c.files_now - p.files_prev AS BIGINT) AS files_delta,
               CAST(c.records_now - p.records_prev AS BIGINT) AS records_delta
        FROM child c JOIN parent p USING (parent_id)
        ORDER BY abs(c.size_now - p.size_prev) DESC, c.snapshot_id
        LIMIT 20
    """,
    doc="Per-commit storage growth: each snapshot's size/files/records "
    "delta vs its parent via ONE self-equi-join on the parent pointer — "
    "deliberately not a cumulative window (a 10^6-commit chain would "
    "funnel); top-20 largest commits by absolute size delta",
)
def meta_snapshot_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return snapshot_growth(derive(spark, sf_dir, "meta_snapshots"), k=20)


@register(
    "longest_dup_spans",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        grams AS (SELECT doc_id, u.i - 1 AS pos,
                    array_to_string(t[u.i:u.i+7], ' ') AS gram
                  FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)),
        dup AS (SELECT gram FROM grams
                GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        dp AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
        isl AS (SELECT doc_id, pos,
                  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
                FROM dp),
        runs AS (SELECT doc_id, island, CAST(count(*) AS BIGINT) AS run
                 FROM isl GROUP BY doc_id, island)
        SELECT doc_id, CAST(sum(run) AS BIGINT) AS dup_positions,
               CAST(max(run) AS BIGINT) AS longest_run,
               CAST(max(run) + 7 AS BIGINT) AS span_tokens
        FROM runs GROUP BY doc_id
        ORDER BY span_tokens DESC, doc_id LIMIT 50
    """,
    doc="Longest duplicated span per doc (the suffix-array exact-substring "
    "signal at 8-gram resolution): duplicated-position runs via gaps-and-"
    "islands, every window partitioned by doc_id — bounded by doc length; "
    "a run of L consecutive dup positions certifies L+7 duplicated tokens",
)
def longest_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.longest_dup_span(load_table(spark, sf_dir, "documents"))


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


from iceberg_meta_spark.operators.maintenance import manifest_rewrite_plan  # noqa: E402


@register(
    "meta_manifest_rewrite",
    oracle="WITH meta_manifests AS ("
    + cte_sql("meta_manifests", "duckdb")
    + """),
        small AS (SELECT * FROM meta_manifests
                  WHERE content = 0 AND manifest_length < 1048576),
        offs AS (SELECT snapshot_id, partition_spec_id, manifest_length,
                   added_files_count, existing_files_count,
                   sum(manifest_length) OVER (
                     PARTITION BY snapshot_id, partition_spec_id
                     ORDER BY manifest_path, manifest_length
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
                 FROM small),
        grouped AS (SELECT snapshot_id, partition_spec_id,
                      (end_off - manifest_length) // 8388608 AS group_id,
                      manifest_length, added_files_count, existing_files_count
                    FROM offs)
        SELECT snapshot_id, partition_spec_id, CAST(group_id AS BIGINT) AS group_id,
               CAST(count(*) AS BIGINT) AS n_manifests,
               CAST(sum(manifest_length) AS BIGINT) AS group_bytes,
               CAST(sum(added_files_count + existing_files_count) AS BIGINT) AS group_files
        FROM grouped
        GROUP BY snapshot_id, partition_spec_id, group_id
        HAVING count(*) > 1
        ORDER BY snapshot_id, partition_spec_id, group_id
    """,
    tags=("maintenance",),
    doc="Manifest rewrite planning (Iceberg rewrite_manifests): bin-pack "
    "small data manifests into ~8 MiB rewrite groups per (snapshot, spec) "
    "— greedy first-fit via one partitioned cumulative-sum window, "
    "delete manifests excluded, singleton groups dropped",
)
def meta_manifest_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return manifest_rewrite_plan(derive(spark, sf_dir, "meta_manifests"))


@register(
    "meta_spec_migration",
    oracle="WITH meta_manifests AS ("
    + cte_sql("meta_manifests", "duckdb")
    + """),
        per AS (SELECT snapshot_id, partition_spec_id,
                  CAST(count(*) AS BIGINT) AS n_manifests
                FROM meta_manifests GROUP BY 1, 2),
        tot AS (SELECT snapshot_id, CAST(sum(n_manifests) AS BIGINT) AS total
                FROM per GROUP BY 1)
        SELECT p.snapshot_id, p.partition_spec_id, p.n_manifests,
               CAST((p.n_manifests * 1000) // t.total AS BIGINT) AS share_permille
        FROM per p JOIN tot t USING (snapshot_id)
        ORDER BY snapshot_id, partition_spec_id
    """,
    doc="Partition-evolution rollout tracking: per snapshot, each partition "
    "spec's manifest count and permille share — the migration-progress "
    "view after an ALTER TABLE partition change; two shrinking aggregates "
    "plus an equi-join on the snapshot key, no window",
)
def meta_spec_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    mans = derive(spark, sf_dir, "meta_manifests")
    per = mans.groupBy("snapshot_id", "partition_spec_id").agg(
        F.count(F.lit(1)).alias("n_manifests")
    )
    tot = per.groupBy("snapshot_id").agg(F.sum("n_manifests").alias("total"))
    return (
        per.join(tot, "snapshot_id")
        .select(
            "snapshot_id",
            "partition_spec_id",
            "n_manifests",
            F.expr("CAST((n_manifests * 1000) DIV total AS BIGINT)").alias("share_permille"),
        )
        .orderBy("snapshot_id", "partition_spec_id")
    )


@register(
    "user_value_pareto",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM events GROUP BY user_id),
        tiled AS (
            SELECT user_id, total_cents,
                   ntile(10) OVER (ORDER BY total_cents, user_id) AS decile
            FROM per_user),
        per_dec AS (
            SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(total_cents) AS BIGINT) AS decile_cents
            FROM tiled GROUP BY decile),
        tot AS (SELECT CAST(sum(decile_cents) AS BIGINT) AS total FROM per_dec),
        cum AS (SELECT decile, n_users, decile_cents,
                  sum(decile_cents) OVER (ORDER BY decile DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_cents
                FROM per_dec)
        SELECT decile, n_users, decile_cents,
               CAST((decile_cents * 1000) // total AS BIGINT) AS share_permille,
               CAST((top_cents * 1000) // total AS BIGINT) AS top_share_permille
        FROM cum, tot ORDER BY decile
    """,
    doc="Revenue concentration (the 80/20 view): per exact-ntile decile, "
    "its permille share of total user value plus the cumulative share held "
    "by this-and-higher deciles. The only window beyond the decile ntile "
    "runs over the 10-row per-decile frame — bounded forever",
)
def user_value_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("total_cents")
    )
    tiled = per_user.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("total_cents", "user_id"))
    )
    per_dec = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("total_cents").alias("decile_cents"),
    )
    tot = per_dec.agg(F.sum("decile_cents").alias("total"))
    w = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_dec.withColumn("top_cents", F.sum("decile_cents").over(w))
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            "decile_cents",
            F.expr("CAST((decile_cents * 1000) DIV total AS BIGINT)").alias("share_permille"),
            F.expr("CAST((top_cents * 1000) DIV total AS BIGINT)").alias("top_share_permille"),
        )
        .orderBy("decile")
    )


@register(
    "events_hourly_anomalies",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
        trailed AS (
            SELECT event_type, window_start_us, n,
                   CAST(sum(n) OVER w AS BIGINT) AS trail_sum,
                   CAST(count(*) OVER w AS BIGINT) AS trail_n
            FROM hourly
            WINDOW w AS (PARTITION BY event_type ORDER BY window_start_us
                         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
        SELECT event_type, window_start_us, n, trail_sum,
               CAST((n * 3000) // trail_sum AS BIGINT) AS deviation_permille
        FROM trailed
        WHERE trail_n = 3 AND 2 * n > trail_sum
        ORDER BY deviation_permille DESC, event_type, window_start_us
        LIMIT 50
    """,
    doc="Hourly traffic anomaly screen: per event type, hours whose count "
    "exceeds 1.5x the trailing 3-hour average (2n > trailing sum, integer "
    "exact), deviation in permille of that average; the lag window is "
    "partitioned by type and bounded by retention hours, never data volume",
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    hour_us = 3_600_000_000
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts DIV 1000").alias("ts_us"), "event_type"
    )
    hourly = (
        ev.withColumn("window_start_us", F.expr(f"(ts_us DIV {hour_us}) * {hour_us}"))
        .groupBy("event_type", "window_start_us")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("window_start_us")
        .rowsBetween(-3, -1)
    )
    trailed = hourly.withColumn("trail_sum", F.sum("n").over(w)).withColumn(
        "trail_n", F.count(F.lit(1)).over(w)
    )
    return (
        trailed.filter((F.col("trail_n") == 3) & (2 * F.col("n") > F.col("trail_sum")))
        .select(
            "event_type",
            "window_start_us",
            "n",
            "trail_sum",
            F.expr("CAST((n * 3000) DIV trail_sum AS BIGINT)").alias("deviation_permille"),
        )
        .orderBy(F.desc("deviation_permille"), "event_type", "window_start_us")
        .limit(50)
    )


@register(
    "events_dow_profile",
    oracle="""
        WITH ev AS (SELECT epoch_us(ts) AS us FROM events),
        keyed AS (SELECT ((us // 86400000000) + 4) % 7 AS dow,
                         (us // 3600000000) % 24 AS hod
                  FROM ev),
        cnt AS (SELECT dow, hod, CAST(count(*) AS BIGINT) AS n
                FROM keyed GROUP BY dow, hod),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt)
        SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod, n,
               CAST((n * 1000000) // total AS BIGINT) AS share_ppm
        FROM cnt, tot ORDER BY dow, hod
    """,
    doc="Traffic heat profile by (day-of-week, hour-of-day) with ppm "
    "share: dow from pure integer epoch math ((days + 4) % 7 — "
    "engine-portable, unlike dayofweek() whose origin differs between "
    "Spark and DuckDB); one shrinking aggregate + a broadcast 1-row total",
)
def events_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(F.expr("ts DIV 1000").alias("us"))
    keyed = ev.select(
        F.expr("((us DIV 86400000000) + 4) % 7").alias("dow"),
        F.expr("(us DIV 3600000000) % 24").alias("hod"),
    )
    cnt = keyed.groupBy("dow", "hod").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(F.sum("n").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.col("hod").cast("long").alias("hod"),
            "n",
            F.expr("CAST((n * 1000000) DIV total AS BIGINT)").alias("share_ppm"),
        )
        .orderBy("dow", "hod")
    )


_SIZE_BUCKETS = (
    ("lt_1MiB", 0, 1 << 20),
    ("1_4MiB", 1 << 20, 4 << 20),
    ("4_16MiB", 4 << 20, 16 << 20),
    ("16_64MiB", 16 << 20, 64 << 20),
    ("64_256MiB", 64 << 20, 256 << 20),
    ("ge_256MiB", 256 << 20, 1 << 62),
)


def _bucket_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} >= {lo} AND {col} < {hi} THEN '{name}'"
        for name, lo, hi in _SIZE_BUCKETS
    )
    return f"CASE {whens} END"


@register(
    "meta_file_size_histogram",
    oracle="WITH meta_files AS ("
    + cte_sql("meta_files", "duckdb")
    + f"""),
        b AS (SELECT {_bucket_case('file_size_in_bytes')} AS bucket,
                     file_size_in_bytes FROM meta_files),
        cnt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_files,
                  CAST(sum(file_size_in_bytes) AS BIGINT) AS bucket_bytes
                FROM b GROUP BY bucket),
        tot AS (SELECT CAST(sum(n_files) AS BIGINT) AS total FROM cnt)
        SELECT bucket, n_files, bucket_bytes,
               CAST((n_files * 1000) // total AS BIGINT) AS share_permille
        FROM cnt, tot ORDER BY bucket
    """,
    doc="File-size distribution in fixed power-of-4 buckets (the files "
    "dashboard's histogram; small-file pressure at a glance): pure CASE "
    "bucketing, one shrinking aggregate, broadcast 1-row total",
)
def meta_file_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = derive(spark, sf_dir, "meta_files")
    b = files.select(
        F.expr(_bucket_case("file_size_in_bytes")).alias("bucket"),
        "file_size_in_bytes",
    )
    cnt = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("file_size_in_bytes").alias("bucket_bytes"),
    )
    tot = cnt.agg(F.sum("n_files").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_files",
            "bucket_bytes",
            F.expr("CAST((n_files * 1000) DIV total AS BIGINT)").alias("share_permille"),
        )
        .orderBy("bucket")
    )


@register(
    "meta_partition_fragmentation",
    oracle="WITH meta_files AS ("
    + cte_sql("meta_files", "duckdb")
    + """),
        per AS (SELECT part_key, CAST(count(*) AS BIGINT) AS n_files,
                  CAST(sum(file_size_in_bytes) AS BIGINT) AS total_bytes
                FROM meta_files GROUP BY part_key)
        SELECT part_key, n_files, total_bytes,
               CAST(greatest(total_bytes // 134217728, 1) AS BIGINT) AS ideal_files,
               CAST((n_files * 1000) // greatest(total_bytes // 134217728, 1) AS BIGINT)
                 AS fragmentation_permille
        FROM per ORDER BY fragmentation_permille DESC, part_key
    """,
    tags=("maintenance",),
    doc="Partition fragmentation score: actual file count vs the ideal at "
    "a 128 MiB target (1000 = perfectly sized; higher = small-file "
    "pressure, the compaction trigger metric); one shrinking aggregate",
)
def meta_partition_fragmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = derive(spark, sf_dir, "meta_files")
    per = files.groupBy("part_key").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("file_size_in_bytes").alias("total_bytes"),
    )
    return per.select(
        "part_key",
        "n_files",
        "total_bytes",
        F.expr("CAST(greatest(total_bytes DIV 134217728, 1) AS BIGINT)").alias("ideal_files"),
        F.expr(
            "CAST((n_files * 1000) DIV greatest(total_bytes DIV 134217728, 1) AS BIGINT)"
        ).alias("fragmentation_permille"),
    ).orderBy(F.desc("fragmentation_permille"), "part_key")


@register(
    "lang_share_drift",
    oracle="""
        WITH keyed AS (SELECT lang, doc_id % 2 AS cohort FROM documents),
        per AS (SELECT lang, cohort, CAST(count(*) AS BIGINT) AS n
                FROM keyed GROUP BY lang, cohort),
        tot AS (SELECT cohort, CAST(sum(n) AS BIGINT) AS total
                FROM per GROUP BY cohort),
        shares AS (SELECT p.lang, p.cohort,
                     CAST((p.n * 1000000) // t.total AS BIGINT) AS ppm
                   FROM per p JOIN tot t USING (cohort)),
        piv AS (SELECT a.lang, a.ppm AS ref_ppm, b.ppm AS cur_ppm
                FROM shares a JOIN shares b
                  ON a.lang = b.lang AND a.cohort = 0 AND b.cohort = 1)
        SELECT lang, ref_ppm, cur_ppm,
               CAST(abs(cur_ppm - ref_ppm) AS BIGINT) AS delta_ppm,
               abs(cur_ppm - ref_ppm) > 50000 AS drifted
        FROM piv ORDER BY lang
    """,
    doc="Corpus-composition drift: each language's ppm share in the "
    "reference vs current cohort (doc-id parity stands in for the two "
    "snapshots), flagged over a 5% absolute shift — the companion monitor "
    "to embedding_drift for the text side; two shrinking aggregates + "
    "tiny self-join",
)
def lang_share_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("lang", (F.col("doc_id") % 2).alias("cohort"))
    per = keyed.groupBy("lang", "cohort").agg(F.count(F.lit(1)).alias("n"))
    tot = per.groupBy("cohort").agg(F.sum("n").alias("total"))
    shares = per.join(tot, "cohort").select(
        "lang", "cohort", F.expr("CAST((n * 1000000) DIV total AS BIGINT)").alias("ppm")
    )
    a = shares.filter(F.col("cohort") == 0).select("lang", F.col("ppm").alias("ref_ppm"))
    b = shares.filter(F.col("cohort") == 1).select("lang", F.col("ppm").alias("cur_ppm"))
    return (
        a.join(b, "lang")
        .select(
            "lang",
            "ref_ppm",
            "cur_ppm",
            F.abs(F.col("cur_ppm") - F.col("ref_ppm")).alias("delta_ppm"),
            (F.abs(F.col("cur_ppm") - F.col("ref_ppm")) > 50000).alias("drifted"),
        )
        .orderBy("lang")
    )


@register(
    "meta_commit_cadence",
    oracle="WITH meta_snapshots AS ("
    + cte_sql("meta_snapshots", "duckdb")
    + """),
        keyed AS (SELECT (committed_us // 3600000000) % 24 AS hod
                  FROM meta_snapshots),
        cnt AS (SELECT hod, CAST(count(*) AS BIGINT) AS n_commits
                FROM keyed GROUP BY hod),
        tot AS (SELECT CAST(sum(n_commits) AS BIGINT) AS total FROM cnt)
        SELECT CAST(hod AS BIGINT) AS hod, n_commits,
               CAST((n_commits * 1000) // total AS BIGINT) AS share_permille
        FROM cnt, tot ORDER BY hod
    """,
    doc="Commit cadence by hour of day over the snapshot log — the ops "
    "view for scheduling maintenance into quiet windows; integer epoch "
    "math, one shrinking aggregate",
)
def meta_commit_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    snaps = derive(spark, sf_dir, "meta_snapshots")
    keyed = snaps.select(F.expr("(committed_us DIV 3600000000) % 24").alias("hod"))
    cnt = keyed.groupBy("hod").agg(F.count(F.lit(1)).alias("n_commits"))
    tot = cnt.agg(F.sum("n_commits").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            F.col("hod").cast("long").alias("hod"),
            "n_commits",
            F.expr("CAST((n_commits * 1000) DIV total AS BIGINT)").alias("share_permille"),
        )
        .orderBy("hod")
    )


@register(
    "order_value_histogram",
    oracle="""
        WITH b AS (SELECT CASE WHEN o_totalprice < 50000 THEN 'lt_50k'
                               WHEN o_totalprice < 150000 THEN '50_150k'
                               WHEN o_totalprice < 300000 THEN '150_300k'
                               ELSE 'ge_300k' END AS bucket,
                          CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                   FROM orders),
        cnt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
                  CAST(sum(cents) AS BIGINT) AS bucket_cents
                FROM b GROUP BY bucket),
        tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM cnt)
        SELECT bucket, n_orders, bucket_cents,
               CAST((n_orders * 1000) // total AS BIGINT) AS share_permille
        FROM cnt, tot ORDER BY bucket
    """,
    doc="Order-value histogram in fixed price buckets with permille "
    "shares: CASE bucketing, one shrinking aggregate, broadcast total",
)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        F.expr(
            "CASE WHEN o_totalprice < 50000 THEN 'lt_50k' "
            "WHEN o_totalprice < 150000 THEN '50_150k' "
            "WHEN o_totalprice < 300000 THEN '150_300k' "
            "ELSE 'ge_300k' END"
        ).alias("bucket"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    cnt = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("bucket_cents")
    )
    tot = cnt.agg(F.sum("n_orders").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_orders",
            "bucket_cents",
            F.expr("CAST((n_orders * 1000) DIV total AS BIGINT)").alias("share_permille"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Round-4: windowed heavy hitters (batch exact; streaming/heavy.py holds the
# space-saving sketch twin for unbounded streams).
# ---------------------------------------------------------------------------

_HH_HOUR_US = 3_600_000_000


@register(
    "events_heavy_hitters",
    tags=("bench",),
    oracle=f"""
        WITH cnt AS (SELECT (epoch_us(ts) // {_HH_HOUR_US}) * {_HH_HOUR_US} AS window_start_us,
                            user_id, CAST(count(*) AS BIGINT) AS n_events
                     FROM events GROUP BY 1, 2),
        tot AS (SELECT window_start_us, CAST(sum(n_events) AS BIGINT) AS window_events
                FROM cnt GROUP BY 1),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY window_start_us
                                                ORDER BY n_events DESC, user_id) AS rank
                   FROM cnt)
        SELECT r.window_start_us, r.rank, r.user_id, r.n_events,
               CAST((r.n_events * 1000) // t.window_events AS BIGINT) AS share_permille
        FROM ranked r JOIN tot t USING (window_start_us)
        WHERE r.rank <= 3 ORDER BY window_start_us, rank
    """,
    doc="Windowed heavy hitters: exact top-3 users per tumbling hour with "
    "permille share of window traffic. Salted two-phase top-k: per-user "
    "counts (one map-side-combined aggregate), LOCAL top-k inside each "
    "(window, user_id%32) salt slice, then a final window over only 32*k "
    "survivors per hour — no hour ever funnels its full user census through "
    "one sort partition. Streaming twin: streaming/heavy.py space-saving "
    "sketch (bounded state per window)",
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    win_start = F.expr(
        f"((ts DIV 1000) DIV {_HH_HOUR_US}) * {_HH_HOUR_US}"
    ).alias("window_start_us")
    cnt = ev.select(win_start, "user_id").groupBy("window_start_us", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    tot = cnt.groupBy("window_start_us").agg(F.sum("n_events").alias("window_events"))
    # local top-k within each salt slice: the global top-k of complete
    # per-user counts is preserved under ANY user partitioning
    salted = Window.partitionBy(
        "window_start_us", F.col("user_id") % 32
    ).orderBy(F.desc("n_events"), F.asc("user_id"))
    survivors = (
        cnt.withColumn("lr", F.row_number().over(salted)).filter(F.col("lr") <= 3).drop("lr")
    )
    final = Window.partitionBy("window_start_us").orderBy(F.desc("n_events"), F.asc("user_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= 3)
        .join(tot, "window_start_us")
        .select(
            "window_start_us",
            "rank",
            "user_id",
            "n_events",
            F.expr("CAST((n_events * 1000) DIV window_events AS BIGINT)").alias("share_permille"),
        )
        .orderBy("window_start_us", "rank")
    )


@register(
    "events_value_quantiles",
    oracle=f"""
        WITH ev AS (SELECT (epoch_us(ts) // {_HH_HOUR_US}) * {_HH_HOUR_US} AS window_start_us,
                           CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM events)
        SELECT window_start_us, CAST(count(*) AS BIGINT) AS n_events,
               quantile_cont(cents, 0.25) AS p25,
               quantile_cont(cents, 0.5) AS p50,
               quantile_cont(cents, 0.75) AS p75
        FROM ev GROUP BY 1 ORDER BY window_start_us
    """,
    doc="Per-window value quantiles: exact p25/p50/p75 of integer cents per "
    "tumbling hour. DYADIC probes only — the interpolation a+(b-a)*g lands "
    "on exact binary fractions, so Spark percentile() and DuckDB "
    "quantile_cont() are bit-identical (the adaptive-buckets trick). Exact "
    "per-group percentile is the documented sort-buffer cliff; the "
    "deployment twin is percentile_approx per window (same plan shape), "
    "and the STREAMING twin is streaming/quantiles.py's bounded histogram "
    "state",
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"((ts DIV 1000) DIV {_HH_HOUR_US}) * {_HH_HOUR_US}").alias("window_start_us"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    return (
        ev.groupBy("window_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.percentile("cents", 0.25).alias("p25"),
            F.percentile("cents", 0.5).alias("p50"),
            F.percentile("cents", 0.75).alias("p75"),
        )
        .orderBy("window_start_us")
    )


from iceberg_meta_spark.operators.bloom import bloom_semi_join  # noqa: E402


@register(
    "bloom_semi_revenue",
    tags=("bench",),
    oracle="""
        WITH hot AS (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT' AND o_totalprice >= 150000)
        SELECT l.l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem l
        WHERE l.l_orderkey IN (SELECT o_orderkey FROM hot)
        GROUP BY 1 ORDER BY l.l_returnflag
    """,
    doc="Bloom-prefiltered semi join (operators/bloom.py): urgent high-value "
    "orders are aggregated into a 4096-bit md5-positioned filter (one "
    "m/64-row aggregate), baked into the plan as a literal, and applied "
    "MAP-SIDE to lineitem before the exact left-semi backstop - only "
    "probable matches reach the shuffle, false positives never reach the "
    "result; the oracle is the plain semi join because the filter is "
    "semantically transparent",
)
def bloom_semi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hot = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") >= 150000)
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    kept = bloom_semi_join(li, hot, "l_orderkey", m_bits=65536, k=3)
    return (
        kept.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(
                "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)"
            ).alias("revenue_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "audience_overlap",
    oracle="""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        reach AS (SELECT event_type, CAST(count(*) AS BIGINT) AS reach FROM ut GROUP BY 1),
        inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                         CAST(count(*) AS BIGINT) AS both_users
                  FROM ut a JOIN ut b
                    ON a.user_id = b.user_id AND a.event_type < b.event_type
                  GROUP BY 1, 2)
        SELECT i.type_a, i.type_b, ra.reach AS reach_a, rb.reach AS reach_b,
               i.both_users,
               CAST((i.both_users * 1000) // (ra.reach + rb.reach - i.both_users) AS BIGINT)
                 AS jaccard_permille
        FROM inter i
        JOIN reach ra ON ra.event_type = i.type_a
        JOIN reach rb ON rb.event_type = i.type_b
        ORDER BY type_a, type_b
    """,
    doc="Audience-overlap matrix (exact): distinct users per event-type "
    "pair with Jaccard permille. One (user,type) distinct shuffle, then a "
    "user-keyed self-join whose fan-out is bounded by the type vocabulary "
    "(<= |types|^2 rows per user). The HLL twin (audience_overlap_hll) is "
    "the 10^9-user path: KB sketches per type, mergeable, no user-keyed "
    "join at all",
)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    reach = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("reach"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("both_users"))
    )
    ra = reach.select(F.col("event_type").alias("type_a"), F.col("reach").alias("reach_a"))
    rb = reach.select(F.col("event_type").alias("type_b"), F.col("reach").alias("reach_b"))
    return (
        inter.join(F.broadcast(ra), "type_a")
        .join(F.broadcast(rb), "type_b")
        .select(
            "type_a", "type_b", "reach_a", "reach_b", "both_users",
            F.expr(
                "CAST((both_users * 1000) DIV (reach_a + reach_b - both_users) AS BIGINT)"
            ).alias("jaccard_permille"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "audience_overlap_hll",
    doc="Audience-overlap matrix, sketched: one Datasketches HLL per event "
    "type (hll_sketch_agg - KB of mergeable state, map-side combined), "
    "pairwise hll_union + inclusion-exclusion for the intersection "
    "estimate. ZERO user-keyed joins or shuffles of user rows - the path "
    "that survives 10^9 distinct users. Approximate by construction: "
    "rows-only gate; the exact twin (audience_overlap) carries the hash "
    "oracle and the unit test pins sketch-vs-exact tolerance",
)
def audience_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("long").alias("reach_est"),
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"),
                  F.col("reach_est").alias("reach_a_est"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"),
                  F.col("reach_est").alias("reach_b_est"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("type_a") < F.col("type_b"))
    union_est = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")).cast("long")
    return pairs.select(
        "type_a", "type_b", "reach_a_est", "reach_b_est",
        union_est.alias("union_est"),
        F.greatest(
            F.lit(0).cast("long"),
            (F.col("reach_a_est") + F.col("reach_b_est") - union_est).cast("long"),
        ).alias("both_users_est"),
    ).orderBy("type_a", "type_b")


@register(
    "events_seasonal_backtest",
    oracle=f"""
        WITH hourly AS (SELECT event_type,
                               (epoch_us(ts) // {_HH_HOUR_US}) AS hr,
                               CAST(count(*) AS BIGINT) AS n
                        FROM events GROUP BY 1, 2),
        joined AS (SELECT a.event_type, a.hr, a.n AS actual,
                          s.n AS seasonal_pred, p.n AS naive_pred
                   FROM hourly a
                   JOIN hourly s ON s.event_type = a.event_type AND s.hr = a.hr - 24
                   JOIN hourly p ON p.event_type = a.event_type AND p.hr = a.hr - 1)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
               CAST(sum(abs(actual - seasonal_pred)) AS BIGINT) AS seasonal_abs_err,
               CAST(sum(abs(actual - naive_pred)) AS BIGINT) AS naive_abs_err,
               CAST((sum(abs(actual - seasonal_pred)) * 1000)
                    // greatest(sum(abs(actual - naive_pred)), 1) AS BIGINT)
                 AS mase_permille
        FROM joined GROUP BY event_type ORDER BY event_type
    """,
    doc="Forecast-baseline backtest: per event type, seasonal-naive "
    "(t-24h) vs naive (t-1h) hourly-count predictions scored by total "
    "absolute error and their permille ratio (integer MASE - under 1000 "
    "means daily seasonality is real signal, the go/no-go a forecasting "
    "pipeline checks before training anything). One hourly aggregate then "
    "two self-equi-joins on the (type, hour) key - the aggregate output "
    "is hours x types rows, bounded regardless of event count",
)
def events_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(F.expr(f"(ts DIV 1000) DIV {_HH_HOUR_US}").alias("hr"), "event_type")
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = hourly.select("event_type", "hr", F.col("n").alias("actual"))
    s = hourly.select("event_type", (F.col("hr") + 24).alias("hr"), F.col("n").alias("seasonal_pred"))
    p = hourly.select("event_type", (F.col("hr") + 1).alias("hr"), F.col("n").alias("naive_pred"))
    joined = a.join(s, ["event_type", "hr"]).join(p, ["event_type", "hr"])
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.abs(F.col("actual") - F.col("seasonal_pred"))).alias("seasonal_abs_err"),
            F.sum(F.abs(F.col("actual") - F.col("naive_pred"))).alias("naive_abs_err"),
        )
        .select(
            "event_type", "n_hours", "seasonal_abs_err", "naive_abs_err",
            F.expr(
                "CAST((seasonal_abs_err * 1000) DIV greatest(naive_abs_err, 1) AS BIGINT)"
            ).alias("mase_permille"),
        )
        .orderBy("event_type")
    )


@register(
    "user_value_ewma",
    oracle="""
        WITH ev AS (SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS cents,
                           epoch_us(ts) AS ts_us, event_id
                    FROM events),
        seqs AS (SELECT user_id,
                        array_agg(cents ORDER BY ts_us, event_id) AS vals
                 FROM ev GROUP BY user_id),
        folded AS (SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
                          list_reduce(vals,
                              (acc, v) -> (acc // 1099511627776
                                           + CASE WHEN v > 2 * (acc % 1099511627776)
                                                  THEN 1 ELSE 0 END) * 1099511627776
                                          + (v + (acc % 1099511627776) * 7) // 8
                          ) AS packed
                   FROM seqs)
        SELECT user_id, n_events,
               CAST(packed % 1099511627776 AS BIGINT) AS final_ewma_cents,
               CAST(packed // 1099511627776 AS BIGINT) AS n_spikes
        FROM folded ORDER BY user_id
    """,
    doc="Per-user EWMA of event value (alpha=1/8, integer arithmetic: "
    "ewma' = (v + 7*ewma) DIV 8) with spike counting (v > 2*ewma before "
    "update) - a RECURSIVE per-key fold carried as a full hash oracle by "
    "packing (spikes, ewma) into one BIGINT accumulator (spikes*2^40 + "
    "ewma; cents < 2^40 always). The per-key collect+sort is the "
    "documented memory cliff (exact-percentile family); the deployment "
    "path is streaming/ewma.py holding O(1) state per key",
)
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    PACK = 1_099_511_627_776  # 2^40
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        F.expr("ts DIV 1000").alias("ts_us"),
        "event_id",
    )
    seqs = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts_us", "event_id", "cents"))),
            lambda x: x["cents"],
        ).alias("vals")
    )
    # seed = first value (ewma := v1, spikes := 0) on BOTH engines:
    # DuckDB's list_reduce seeds with the list head, Spark's aggregate()
    # gets it explicitly; every step is BIGINT DIV/% arithmetic so the
    # recursive fold is bit-identical anywhere
    folded = seqs.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        F.expr(
            f"""aggregate(
                slice(vals, 2, greatest(size(vals) - 1, 0)),
                element_at(vals, 1),
                (acc, v) -> (acc DIV {PACK} + IF(v > 2 * (acc % {PACK}), 1, 0)) * {PACK}
                            + (v + (acc % {PACK}) * 7) DIV 8
            )"""
        ).alias("packed"),
    )
    return folded.select(
        "user_id", "n_events",
        F.expr(f"packed % {PACK}").alias("final_ewma_cents"),
        F.expr(f"packed DIV {PACK}").alias("n_spikes"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Round-4 additions: record linkage, skyline, Matryoshka-recall audit.
# ---------------------------------------------------------------------------


@register(
    "customer_fuzzy_matches",
    tags=("bench",),
    oracle="""
        WITH c AS (SELECT c_custkey, c_nationkey, c_name FROM customer),
        pairs AS (
          SELECT a.c_nationkey, a.c_custkey AS key_a, b.c_custkey AS key_b
          FROM c a JOIN c b
            ON a.c_custkey < b.c_custkey
           AND levenshtein(a.c_name, b.c_name) <= 1
        )
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS n_matched_pairs,
               CAST((min(struct_pack(a := key_a, b := key_b))).a AS BIGINT)
                   AS sample_key_a,
               CAST((min(struct_pack(a := key_a, b := key_b))).b AS BIGINT)
                   AS sample_key_b
        FROM pairs GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    doc="Record linkage / entity resolution: customer-name pairs within "
    "edit distance 1, found by SymSpell-style deletion-neighborhood "
    "blocking — each name emits itself plus its length single-char-deletion "
    "variants as candidate keys, candidates come from an EQUI-join on those "
    "keys (recall-complete for distance <= 1: a substitution shares the "
    "delete-at-the-differing-position variant, an insert/delete shares the "
    "shorter string itself), then exact levenshtein() verifies. The oracle "
    "is the independent O(N^2) blocked specification; the Spark side never "
    "forms the quadratic product, so the shape survives 10^9 names "
    "(candidate keys are near-unique, hot-key-free). Grouped per nation of "
    "the lower-keyed customer",
)
def customer_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.col("c_name").alias("name")
    )
    # name itself + every single-char-deletion variant = candidate keys
    keys = cust.select(
        "c_custkey",
        "c_nationkey",
        "name",
        F.explode(
            F.expr(
                "array_union(array(name), transform(sequence(1, length(name)),"
                " i -> concat(substring(name, 1, i - 1), substring(name, i + 1))))"
            )
        ).alias("k"),
    )
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_nationkey").alias("c_nationkey"),
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            F.col("a.name").alias("na"),
            F.col("b.name").alias("nb"),
        )
        .distinct()
        .where(F.levenshtein("na", "nb") <= 1)
    )
    return (
        cand.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched_pairs"),
            # lexicographic struct min, not key_a*C+key_b packing: arithmetic
            # packing overflows BIGINT once keys approach 10^9 (ADVICE r4)
            F.min(F.struct(F.col("key_a"), F.col("key_b"))).alias("_p"),
        )
        .select(
            "c_nationkey",
            "n_matched_pairs",
            F.col("_p.key_a").alias("sample_key_a"),
            F.col("_p.key_b").alias("sample_key_b"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "order_skyline",
    tags=("bench",),
    oracle="""
        WITH pts AS (
          SELECT o_orderpriority,
                 CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
                 o_orderdate AS ts,
                 CAST(min(o_orderkey) AS BIGINT) AS o_orderkey
          FROM orders GROUP BY 1, 2, 3)
        SELECT o_orderpriority, price_cents, ts AS o_orderdate, o_orderkey
        FROM pts p
        WHERE NOT EXISTS (
          SELECT 1 FROM pts q
          WHERE q.o_orderpriority = p.o_orderpriority
            AND q.price_cents >= p.price_cents AND q.ts >= p.ts
            AND (q.price_cents > p.price_cents OR q.ts > p.ts))
        ORDER BY o_orderpriority, price_cents DESC
    """,
    doc="2-D skyline (Pareto frontier) per order priority, maximizing "
    "(total price, recency): an order is on the skyline iff no other order "
    "in its priority class is >= on both dimensions and > on one. "
    "Distinct (price, date) points with the min-orderkey representative. "
    "The oracle is the independent NOT-EXISTS dominance specification; the "
    "Spark side is the O(N log N) sort-filter form - running max(date) over "
    "rows sorted by (price DESC, date DESC) - run TWICE: a local pass "
    "inside (priority, salt-of-16) partitions prunes dominated points "
    "map-side-cheap, the global pass over the tiny survivor set finishes. "
    "skyline(union of local skylines) = skyline(all), so no single "
    "partition ever sees the full group - the classic distributed-skyline "
    "decomposition",
)
def order_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    pts = (
        o.groupBy(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
            F.col("o_orderdate").alias("ts"),
        )
        .agg(F.min("o_orderkey").cast("long").alias("o_orderkey"))
    )

    def _skyline_pass(df: DataFrame, extra_key: list) -> DataFrame:
        w = (
            Window.partitionBy("o_orderpriority", *extra_key)
            .orderBy(F.desc("price_cents"), F.desc("ts"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            df.withColumn("prev_max_ts", F.max("ts").over(w))
            .where(F.col("prev_max_ts").isNull() | (F.col("prev_max_ts") < F.col("ts")))
            .drop("prev_max_ts")
        )

    local = _skyline_pass(
        pts.withColumn("salt", F.pmod(F.hash("o_orderkey"), F.lit(16))), ["salt"]
    ).drop("salt")
    sky = _skyline_pass(local, [])
    return sky.select(
        "o_orderpriority", "price_cents", F.col("ts").alias("o_orderdate"), "o_orderkey"
    ).orderBy("o_orderpriority", F.desc("price_cents"))


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


@register(
    "scd2_user_state",
    oracle="""
        WITH ch AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
                    FROM events WHERE user_id % 50 = 0),
        ordered AS (SELECT *, lag(event_type) OVER (
                        PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
                    FROM ch),
        starts AS (SELECT user_id, event_type AS state, ts_us AS valid_from_us, event_id
                   FROM ordered
                   WHERE prev_type IS NULL OR prev_type <> event_type),
        iv AS (SELECT *, lead(valid_from_us) OVER (
                   PARTITION BY user_id ORDER BY valid_from_us, event_id) AS valid_to_us
               FROM starts)
        SELECT user_id, state, valid_from_us, valid_to_us,
               (valid_to_us IS NULL) AS is_current
        FROM iv ORDER BY user_id, valid_from_us, event_id
    """,
    doc="SCD Type-2 dimension build from a change stream: collapse each "
    "user's event-type runs into validity intervals [valid_from, valid_to) "
    "with an open-ended current row - the full-history companion to "
    "cdc_latest_state's latest-only compaction. Gaps-and-islands via one "
    "lag window, interval close via one lead window, both riding the SAME "
    "hashpartitioning(user_id) exchange - per-key state only, no global "
    "window, the shape that survives 10^9 users. Deterministic 2% user "
    "sample bounds the emitted history",
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ch = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 50 == 0)
        .select(
            "user_id",
            F.expr("ts DIV 1000").alias("ts_us"),
            "event_id",
            "event_type",
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ordered = ch.withColumn("prev_type", F.lag("event_type").over(w))
    starts = ordered.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_us").alias("valid_from_us"),
        "event_id",
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    iv = starts.withColumn("valid_to_us", F.lead("valid_from_us").over(w2))
    return iv.select(
        "user_id",
        "state",
        "valid_from_us",
        "valid_to_us",
        F.col("valid_to_us").isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from_us", "event_id")


@register(
    "k_anonymity_audit",
    oracle="""
        WITH qi AS (SELECT c_nationkey, c_mktsegment,
                           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                           CAST(count(*) AS BIGINT) AS class_size
                    FROM customer
                    GROUP BY 1, 2, 3),
        tot AS (SELECT CAST(sum(class_size) AS BIGINT) AS n_rows FROM qi),
        ks AS (SELECT CAST(unnest([2, 3, 5, 10]) AS BIGINT) AS k)
        SELECT k.k,
               CAST(coalesce(sum(CASE WHEN qi.class_size < k.k THEN 1 END), 0) AS BIGINT)
                 AS n_violating_classes,
               CAST(coalesce(sum(CASE WHEN qi.class_size < k.k THEN qi.class_size END), 0) AS BIGINT)
                 AS n_rows_at_risk,
               CAST(coalesce(sum(CASE WHEN qi.class_size < k.k THEN qi.class_size END), 0)
                    * 1000 // max(t.n_rows) AS BIGINT) AS risk_permille
        FROM ks k CROSS JOIN qi, tot t
        GROUP BY k.k ORDER BY k.k
    """,
    doc="k-anonymity privacy audit over the quasi-identifier tuple "
    "(nation, market segment, account-balance band): for each re-"
    "identification threshold k in {2,3,5,10}, the number of QI "
    "equivalence classes smaller than k and the rows they expose "
    "(integer permille of the table) - the release-gate metric for "
    "sharing a derived dataset. ONE groupBy collapses the table to QI "
    "classes (map-side combine; class count is bounded by the QI "
    "domain, tiny vs rows); the k-threshold sweep and the 1-row total "
    "then ride broadcast joins over that class table, so adding "
    "thresholds costs nothing at 100 TB",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    qi = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    )
    tot = qi.agg(F.sum("class_size").cast("long").alias("n_rows"))
    ks = qi.sparkSession.createDataFrame([(2,), (3,), (5,), (10,)], "k bigint")
    sweep = (
        qi.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("class_size") < F.col("k"), 1)), F.lit(0)
            )
            .cast("long")
            .alias("n_violating_classes"),
            F.coalesce(
                F.sum(F.when(F.col("class_size") < F.col("k"), F.col("class_size"))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_rows_at_risk"),
            F.max("n_rows").alias("n_rows"),
        )
        .select(
            "k",
            "n_violating_classes",
            "n_rows_at_risk",
            F.expr("n_rows_at_risk * 1000 DIV n_rows").alias("risk_permille"),
        )
        .orderBy("k")
    )
    return sweep


# ---------------------------------------------------------------------------
# Round-5 additions: exact substring-level dedup (Lee et al. 2022 shape).
# ---------------------------------------------------------------------------

from iceberg_meta_spark.pipeline import dedup  # noqa: E402


@register(
    "substring_dedup",
    tags=("bench",),
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        w AS (SELECT doc_id, md5(array_to_string(tok[i+1:i+20], ' ')) AS h
              FROM t, UNNEST(range(0, greatest(len(tok) - 19, 0))) g(i)),
        c AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM w GROUP BY h)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_windows,
               CAST(CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                    * 1000 // count(*) AS BIGINT) AS dup_permille
        FROM w JOIN c USING (h)
        GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Exact substring-level dedup audit (the suffix-array result of Lee "
    "et al. 2022 'Deduplicating Training Data Makes Language Models "
    "Better', recast relationally): every 20-token sliding window hashed, "
    "windows present in >=2 distinct docs are duplicated spans; per-doc "
    "boilerplate coverage in permille. Window explode is linear in corpus "
    "tokens, span counting is ONE groupBy on the md5 key and the share "
    "join is the same equi-join — never a doc-pair product, so the shape "
    "holds on 10^9 docs",
)
def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.substring_dup_stats(
        load_table(spark, sf_dir, "documents"), window_tokens=20
    )


@register(
    "boilerplate_spans",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        w AS (SELECT doc_id, array_to_string(tok[i+1:i+20], ' ') AS span
              FROM t, UNNEST(range(0, greatest(len(tok) - 19, 0))) g(i)),
        c AS (SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM w GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
        r AS (SELECT *, row_number() OVER (ORDER BY n_docs DESC, span) AS rank
              FROM c)
        SELECT rank, n_docs, span FROM r WHERE rank <= 20 ORDER BY rank
    """,
    doc="Boilerplate mining: the 20 most widely repeated 20-token spans "
    "(by distinct-document count, span-text tiebreak). Same linear window "
    "explode as substring_dedup; the >=2-docs filter shrinks the frame to "
    "true boilerplate before the bounded top-k window",
)
def boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.boilerplate_spans(
        load_table(spark, sf_dir, "documents"), window_tokens=20, top_k=20
    )


# ---------------------------------------------------------------------------
# Round-5 additions: winnowing fingerprints (MOSS), linear quality
# classifier, l-diversity privacy audit.
# ---------------------------------------------------------------------------

from iceberg_meta_spark.pipeline import classifier, winnow  # noqa: E402

# Shared oracle CTE: winnowed (doc_id, fp) selection at k=8, w=4 — the
# DuckDB mirror of pipeline/winnow.py:winnowed_fingerprints.
_WINNOW_SEL = """
    t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
    g AS (SELECT doc_id, i AS pos, md5(array_to_string(tok[i+1:i+8], ' ')) AS h
          FROM t, UNNEST(range(0, greatest(len(tok) - 7, 0))) s(i)
          WHERE len(tok) >= 11),
    w AS (SELECT doc_id, pos,
                 min(h) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mn
          FROM g),
    sel AS (SELECT DISTINCT doc_id, mn AS fp FROM w WHERE pos >= 3)
"""


@register(
    "text_winnow_stats",
    tags=("bench",),
    oracle=f"""
        WITH {_WINNOW_SEL},
        cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_selected
                FROM sel GROUP BY doc_id),
        gr AS (SELECT doc_id, CAST(len(tok) - 7 AS BIGINT) AS n_grams
               FROM t WHERE len(tok) >= 11)
        SELECT doc_id, n_grams, n_selected,
               CAST(n_selected * 1000 // n_grams AS BIGINT) AS density_permille
        FROM gr JOIN cnt USING (doc_id)
        ORDER BY doc_id
    """,
    doc="Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken SIGMOD "
    "2003, the MOSS algorithm): md5-hash every 8-token gram, slide a "
    "4-gram window, record each window's minimum hash — guarantees any "
    "shared run of >= 11 tokens yields a shared fingerprint at ~2/(w+1) "
    "density. Per-doc density audit. Gram hashing is a linear map-side "
    "explode; the sliding min is ONE doc_id-partitioned window (never "
    "global); DISTINCT collapses map-side. Holds at 10^9 docs",
)
def text_winnow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow.winnow_stats(
        load_table(spark, sf_dir, "documents"), gram_tokens=8, window=4
    )


@register(
    "dedup_winnowing",
    oracle=f"""
        WITH {_WINNOW_SEL},
        rare AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) <= 16),
        k AS (SELECT doc_id, fp FROM sel JOIN rare USING (fp))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM k a JOIN k b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY doc_a, doc_b
    """,
    doc="MOSS match report: document pairs sharing >= 2 winnowed "
    "fingerprints — the robust-guarantee upgrade over plain fingerprint "
    "equality (any shared 11-token run is caught, not just whole-doc "
    "hashes). Pair generation is an equi-join on the fingerprint key "
    "with a PPJoin-style document-frequency cap (fp in > 16 docs = "
    "corpus boilerplate, dropped BEFORE the join), so candidates are "
    "bounded per fingerprint and the shape never goes quadratic",
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow.winnow_dup_pairs(
        load_table(spark, sf_dir, "documents"),
        gram_tokens=8,
        window=4,
        min_shared=2,
        df_cap=16,
    )


def _classifier_feature_sql() -> str:
    return """
        x AS (
          SELECT lang,
                 CAST(1 AS BIGINT) AS f0,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS f1,
                 CAST(len(text) AS BIGINT) AS f2,
                 CAST(len(list_filter(string_split(text, ' '),
                      t -> list_contains(['the','a','of','and','to'], t)))
                      AS BIGINT) AS f3,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS f4
          FROM documents),
        xy AS (SELECT *, CAST(CASE WHEN f3 * 16 >= f1 AND f1 >= 24
                              THEN 1 ELSE 0 END AS BIGINT) AS y FROM x)
    """


def _gram_oracle() -> str:
    cols = [f"f{i}" for i in range(classifier.N_FEATURES)] + ["y"]
    sums = ", ".join(
        f"CAST(coalesce(sum({a} * {b}), 0) AS BIGINT) AS s_{i}_{j}"
        for i, a in enumerate(cols)
        for j, b in enumerate(cols)
        if j >= i
    )
    branches = " UNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS i, CAST({j} AS INTEGER) AS j,"
        f" s_{i}_{j} AS s FROM g"
        for i in range(len(cols))
        for j in range(i, len(cols))
    )
    return f"""
        WITH {_classifier_feature_sql()},
        g AS (SELECT {sums} FROM xy)
        SELECT i, j, s FROM ({branches}) ORDER BY i, j
    """


@register(
    "quality_classifier_gram",
    oracle=_gram_oracle(),
    doc="Distributed linear-model training, sufficient-statistics form: "
    "the Gram matrix X^T X and moments X^T y of the 5-feature quality "
    "design matrix (bias, tokens, chars, stopwords, distinct tokens) "
    "against the Snorkel-style weak label, as O(d^2) BIGINT-exact sums "
    "in long format. ONE shrinking aggregate — the corpus contributes "
    "25 numbers no matter how many exabytes it is; the d x d ridge "
    "solve (api: train_quality_weights) is driver-side microseconds. "
    "The canonical shape for linear/logistic filters at 100 TB",
)
def quality_classifier_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classifier.gram_matrix(load_table(spark, sf_dir, "documents"))


def _score_sql() -> str:
    w = classifier.SCORE_WEIGHTS_MICRO
    terms = " + ".join(f"({w[i]} * f{i})" for i in range(classifier.N_FEATURES))
    return f"CAST({terms} AS BIGINT)"


@register(
    "quality_classifier_score",
    tags=("bench",),
    oracle=f"""
        WITH {_classifier_feature_sql()},
        s AS (SELECT lang, y, {_score_sql()} AS score_micro FROM xy),
        b AS (SELECT lang, y, score_micro,
                     CASE WHEN score_micro < 250000 THEN 'drop'
                          WHEN score_micro < 500000 THEN 'low'
                          WHEN score_micro < 750000 THEN 'mid'
                          ELSE 'high' END AS bucket
              FROM s)
        SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(CAST(sum(CASE WHEN (CASE WHEN score_micro >= {classifier.DECISION_MICRO}
                                        THEN 1 ELSE 0 END) = y
                             THEN 1 ELSE 0 END) AS BIGINT)
                    * 1000 // count(*) AS BIGINT) AS agreement_permille
        FROM b GROUP BY lang, bucket ORDER BY lang, bucket
    """,
    doc="Frozen linear quality filter applied corpus-wide: integer "
    "micro-scaled dot product of the committed ridge weights (trained "
    "via quality_classifier_gram) with the 5 per-doc features, bucketed "
    "into drop/low/mid/high with per-language agreement vs the weak "
    "rule. Pure whole-stage-codegen column math + one tiny-key "
    "aggregate — zero joins, zero windows, the 100 TB scoring path",
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classifier.score_histogram(load_table(spark, sf_dir, "documents"))


@register(
    "l_diversity_audit",
    oracle="""
        WITH qi AS (SELECT c_nationkey,
                           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                           CAST(count(*) AS BIGINT) AS class_size,
                           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
                    FROM customer GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(class_size) AS BIGINT) AS n_rows FROM qi),
        ls AS (SELECT CAST(unnest([2, 3, 5]) AS BIGINT) AS l)
        SELECT ls.l,
               CAST(coalesce(sum(CASE WHEN qi.n_sensitive < ls.l THEN 1 END), 0) AS BIGINT)
                 AS n_violating_classes,
               CAST(coalesce(sum(CASE WHEN qi.n_sensitive < ls.l THEN qi.class_size END), 0) AS BIGINT)
                 AS n_rows_at_risk,
               CAST(coalesce(sum(CASE WHEN qi.n_sensitive < ls.l THEN qi.class_size END), 0)
                    * 1000 // max(t.n_rows) AS BIGINT) AS risk_permille
        FROM ls CROSS JOIN qi, tot t
        GROUP BY ls.l ORDER BY ls.l
    """,
    doc="l-diversity privacy audit, the homogeneity-attack companion of "
    "k_anonymity_audit (Machanavajjhala et al. 2007): a QI class "
    "(nation, balance band) whose rows all share one sensitive value "
    "(market segment) leaks it even when k-anonymous. Per l in {2,3,5}: "
    "classes with < l distinct sensitive values and the rows they "
    "expose in permille. Same scale shape: ONE groupBy to QI classes "
    "with count_distinct, threshold sweep broadcast over the class table",
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    qi = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.count_distinct("c_mktsegment").cast("long").alias("n_sensitive"),
        )
    )
    tot = qi.agg(F.sum("class_size").cast("long").alias("n_rows"))
    ls = qi.sparkSession.createDataFrame([(2,), (3,), (5,)], "l bigint")
    return (
        qi.crossJoin(F.broadcast(ls))
        .crossJoin(F.broadcast(tot))
        .groupBy("l")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("n_sensitive") < F.col("l"), 1)), F.lit(0)
            )
            .cast("long")
            .alias("n_violating_classes"),
            F.coalesce(
                F.sum(
                    F.when(F.col("n_sensitive") < F.col("l"), F.col("class_size"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_rows_at_risk"),
            F.max("n_rows").alias("n_rows"),
        )
        .select(
            "l",
            "n_violating_classes",
            "n_rows_at_risk",
            F.expr("n_rows_at_risk * 1000 DIV n_rows").alias("risk_permille"),
        )
        .orderBy("l")
    )


from iceberg_meta_spark.operators.maintenance import equality_delete_plan  # noqa: E402

_DELETE_FIELD = 3
_DELETE_KEYS = [40, 750, 1500, 999999]  # one key beyond every bound: provably clean


@register(
    "meta_delete_plan",
    oracle=oracle_query(
        f"""
        , hits AS (
            SELECT file_path,
                   CAST(len(list_filter([{", ".join(map(str, _DELETE_KEYS))}],
                        k -> k >= lower_bound AND k <= upper_bound)) AS BIGINT)
                     AS n_candidate_keys
            FROM meta_column_stats WHERE field_id = {_DELETE_FIELD})
        SELECT h.file_path, h.n_candidate_keys,
               CAST(f.file_size_in_bytes AS BIGINT) AS rewrite_bytes,
               CAST(f.record_count AS BIGINT) AS rows_upper_bound
        FROM hits h JOIN meta_files f USING (file_path)
        WHERE h.n_candidate_keys > 0
        ORDER BY h.file_path
        """,
        "meta_files",
        "meta_column_stats",
    ),
    tags=("maintenance",),
    doc="Right-to-be-forgotten / equality-delete planning: the file set a "
    "GDPR erasure of the subject keys must rewrite, judged purely from "
    "per-file zone maps (lower/upper bounds) — files whose bounds exclude "
    "every key are provably clean and skipped, the same zone-map argument "
    "data skipping makes query-side. The deletion batch is an array "
    "literal, so containment is pure map-side array arithmetic over the "
    "stats table (no join, no shuffle); the only exchange attaches "
    "rewrite costs by file_path. One stats-table scan at any file count",
)
def meta_delete_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return equality_delete_plan(
        derive(spark, sf_dir, "meta_column_stats"),
        derive(spark, sf_dir, "meta_files"),
        field_id=_DELETE_FIELD,
        subject_keys=_DELETE_KEYS,
    )


from iceberg_meta_spark.pipeline.sampling import token_budget_mix  # noqa: E402

_MIX_BUDGET = 3000  # tokens per language
_MIX_BUCKET = 50_000  # score-bucket width in micro units


@register(
    "token_budget_mix",
    oracle=f"""
        WITH {_classifier_feature_sql()},
        s AS (SELECT lang, f1 AS n_tokens,
                     ({_score_sql()} + 10000000) // {_MIX_BUCKET} AS bucket
              FROM xy),
        hist AS (SELECT lang, bucket,
                        CAST(sum(n_tokens) AS BIGINT) AS tok,
                        CAST(count(*) AS BIGINT) AS n_docs
                 FROM s GROUP BY lang, bucket),
        cum AS (SELECT *, sum(tok) OVER (PARTITION BY lang ORDER BY bucket DESC
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum_tok
                FROM hist),
        thr AS (SELECT lang, CAST(min(bucket) AS BIGINT) AS thr_bucket
                FROM cum WHERE cum_tok - tok < {_MIX_BUDGET} GROUP BY lang),
        totals AS (SELECT lang, CAST(sum(tok) AS BIGINT) AS tokens_total
                   FROM hist GROUP BY lang),
        kept AS (SELECT h.lang, t.thr_bucket,
                        CAST(sum(h.n_docs) AS BIGINT) AS n_docs_kept,
                        CAST(sum(h.tok) AS BIGINT) AS tokens_kept
                 FROM hist h JOIN thr t ON h.lang = t.lang
                 WHERE h.bucket >= t.thr_bucket
                 GROUP BY h.lang, t.thr_bucket)
        SELECT k.lang, k.thr_bucket, k.n_docs_kept, k.tokens_kept,
               tt.tokens_total,
               CAST(k.tokens_kept * 1000 // {_MIX_BUDGET} AS BIGINT) AS fill_permille
        FROM kept k JOIN totals tt ON k.lang = tt.lang
        ORDER BY k.lang
    """,
    doc="Quality-first selection under a per-language token budget, the "
    "100 TB way: a score THRESHOLD from a (lang, score-bucket) histogram "
    "— map-side scoring, ONE shrinking aggregate to the bounded "
    "histogram, a running sum over each language's <= few-hundred "
    "buckets (a window over the HISTOGRAM, never the corpus), threshold "
    "broadcast back. The naive per-language sort-and-take-prefix is a "
    "tiny-cardinality-key global window — a funnel at corpus scale; "
    "bucket granularity bounds budget overshoot by one bucket's tokens",
)
def token_budget_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_budget_mix(
        load_table(spark, sf_dir, "documents"),
        budget_tokens=_MIX_BUDGET,
        bucket_micro=_MIX_BUCKET,
    )


@register(
    "privacy_report",
    oracle="""
        WITH qi AS (SELECT c_nationkey, c_mktsegment,
                           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                           CAST(count(*) AS BIGINT) AS class_size
                    FROM customer GROUP BY 1, 2, 3),
        tot AS (SELECT CAST(sum(class_size) AS BIGINT) AS n_rows FROM qi),
        ldiv AS (SELECT c_nationkey, bal_band,
                        CAST(sum(class_size) AS BIGINT) AS class_size,
                        CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
                 FROM qi GROUP BY 1, 2),
        ks AS (SELECT CAST(unnest([2, 3, 5, 10]) AS BIGINT) AS thr),
        ls AS (SELECT CAST(unnest([2, 3, 5]) AS BIGINT) AS thr),
        ka AS (SELECT 'k_anonymity' AS audit, k.thr,
                      CAST(coalesce(sum(CASE WHEN qi.class_size < k.thr THEN 1 END), 0) AS BIGINT)
                        AS n_violating_classes,
                      CAST(coalesce(sum(CASE WHEN qi.class_size < k.thr THEN qi.class_size END), 0) AS BIGINT)
                        AS n_rows_at_risk,
                      CAST(coalesce(sum(CASE WHEN qi.class_size < k.thr THEN qi.class_size END), 0)
                           * 1000 // max(t.n_rows) AS BIGINT) AS risk_permille
               FROM ks k CROSS JOIN qi, tot t GROUP BY k.thr),
        ld AS (SELECT 'l_diversity' AS audit, l.thr,
                      CAST(coalesce(sum(CASE WHEN d.n_sensitive < l.thr THEN 1 END), 0) AS BIGINT),
                      CAST(coalesce(sum(CASE WHEN d.n_sensitive < l.thr THEN d.class_size END), 0) AS BIGINT),
                      CAST(coalesce(sum(CASE WHEN d.n_sensitive < l.thr THEN d.class_size END), 0)
                           * 1000 // max(t.n_rows) AS BIGINT)
               FROM ls l CROSS JOIN ldiv d, tot t GROUP BY l.thr)
        SELECT * FROM ka UNION ALL SELECT * FROM ld
        ORDER BY audit, thr
    """,
    doc="Composite privacy release gate: the k-anonymity and l-diversity "
    "sweeps in one long-format result, derived from ONE scan of the "
    "table — a single groupBy to the fine QI classes (nation, segment, "
    "band) feeds the k-anonymity sweep directly and re-aggregates to "
    "the coarse (nation, band) grain for l-diversity (distinct-segment "
    "counts), with both threshold sweeps and the 1-row total riding "
    "broadcasts over the bounded class tables",
)
def privacy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    tot = qi.agg(F.sum("class_size").cast("long").alias("n_rows"))
    ldiv = qi.groupBy("c_nationkey", "bal_band").agg(
        F.sum("class_size").cast("long").alias("class_size"),
        F.count_distinct("c_mktsegment").cast("long").alias("n_sensitive"),
    )

    def sweep(classes: DataFrame, size_col: str, metric_col: str, audit: str, thresholds: list[int]) -> DataFrame:
        ts = classes.sparkSession.createDataFrame([(t,) for t in thresholds], "thr bigint")
        return (
            classes.crossJoin(F.broadcast(ts))
            .crossJoin(F.broadcast(tot))
            .groupBy("thr")
            .agg(
                F.coalesce(F.sum(F.when(F.col(metric_col) < F.col("thr"), 1)), F.lit(0))
                .cast("long")
                .alias("n_violating_classes"),
                F.coalesce(
                    F.sum(F.when(F.col(metric_col) < F.col("thr"), F.col(size_col))),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_rows_at_risk"),
                F.max("n_rows").alias("n_rows"),
            )
            .select(
                F.lit(audit).alias("audit"),
                "thr",
                "n_violating_classes",
                "n_rows_at_risk",
                F.expr("n_rows_at_risk * 1000 DIV n_rows").alias("risk_permille"),
            )
        )

    ka = sweep(qi, "class_size", "class_size", "k_anonymity", [2, 3, 5, 10])
    ld = sweep(ldiv, "class_size", "n_sensitive", "l_diversity", [2, 3, 5])
    return ka.unionByName(ld).orderBy("audit", "thr")


# ---------------------------------------------------------------------------
# Round-5: per-source quota capping and read-side scan-task planning.
# ---------------------------------------------------------------------------

_QUOTA_Q = 3  # max docs kept per source (binds at sf0.01: ~5 docs/source)
_SPLIT_TARGET = 32 * 1024 * 1024  # Iceberg read.split target-size


@register(
    "source_quota_cap",
    tags=("bench",),
    oracle=f"""
        WITH x AS (
          SELECT doc_id, source, n_chars,
                 CAST(1 AS BIGINT) AS f0,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS f1,
                 CAST(len(text) AS BIGINT) AS f2,
                 CAST(len(list_filter(string_split(text, ' '),
                      t -> list_contains(['the','a','of','and','to'], t)))
                      AS BIGINT) AS f3,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS f4
          FROM documents),
        s AS (SELECT doc_id, source, n_chars, {_score_sql()} AS score_micro FROM x),
        r AS (SELECT *, row_number() OVER (PARTITION BY source
                        ORDER BY score_micro DESC, doc_id) AS rk FROM s),
        tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs_total,
                       CAST(sum(n_chars) AS BIGINT) AS chars_total
                FROM s GROUP BY source),
        k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept,
                     CAST(sum(n_chars) AS BIGINT) AS chars_kept,
                     CAST(min(score_micro) AS BIGINT) AS min_kept_score
              FROM r WHERE rk <= {_QUOTA_Q} GROUP BY source)
        SELECT t.source, t.n_docs_total, k.n_docs_kept,
               t.n_docs_total - k.n_docs_kept AS n_docs_dropped,
               k.chars_kept, t.chars_total, k.min_kept_score
        FROM tot t JOIN k USING (source)
        ORDER BY source
    """,
    doc="Per-source document quota (the Gopher/CommonCrawl 'domain cap': "
    "no single site may dominate the corpus): keep at most Q highest-"
    "classifier-scored docs per source. Salted two-phase top-Q — LOCAL "
    "top-Q inside each (source, doc_id%32) slice, then a final window "
    "over only 32*Q survivors per source — so a hot domain holding 10% "
    "of a 100 TB crawl never funnels its full census through one sort "
    "task (same skew armor as events_heavy_hitters; top-Q of any "
    "per-doc score is preserved under doc partitioning). Totals come "
    "from one map-side-combined aggregate; the final source-grain join "
    "touches #sources rows, never docs",
)
def source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = classifier.features_frame(docs, extra_cols=("source", "n_chars")).select(
        "doc_id", "source", "n_chars", classifier.score_expr()
    )
    local = Window.partitionBy("source", F.col("doc_id") % 32).orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    survivors = (
        scored.withColumn("lr", F.row_number().over(local))
        .filter(F.col("lr") <= _QUOTA_Q)
        .drop("lr")
    )
    final = Window.partitionBy("source").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    kept = (
        survivors.withColumn("rk", F.row_number().over(final))
        .filter(F.col("rk") <= _QUOTA_Q)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
            F.min("score_micro").cast("long").alias("min_kept_score"),
        )
    )
    totals = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_total"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )
    return (
        totals.join(kept, "source")
        .select(
            "source",
            "n_docs_total",
            "n_docs_kept",
            (F.col("n_docs_total") - F.col("n_docs_kept")).alias("n_docs_dropped"),
            "chars_kept",
            "chars_total",
            "min_kept_score",
        )
        .orderBy("source")
    )


@register(
    "meta_scan_tasks",
    tags=("maintenance",),
    oracle=oracle_query(
        f"""
        , per_file AS (
            SELECT part_key, file_size_in_bytes,
                   greatest(CAST(1 AS BIGINT),
                            (file_size_in_bytes + {_SPLIT_TARGET - 1}) // {_SPLIT_TARGET})
                       AS n_splits,
                   least(file_size_in_bytes, CAST({_SPLIT_TARGET} AS BIGINT))
                       AS first_split_bytes
            FROM meta_files WHERE snapshot_id = 2),
        agg AS (
            SELECT part_key,
                   CAST(count(*) AS BIGINT) AS n_files,
                   CAST(sum(file_size_in_bytes) AS BIGINT) AS total_bytes,
                   CAST(sum(n_splits) AS BIGINT) AS n_splits,
                   CAST(max(first_split_bytes) AS BIGINT) AS max_split_bytes
            FROM per_file GROUP BY part_key)
        SELECT part_key, n_files, total_bytes, n_splits,
               CAST((total_bytes + {_SPLIT_TARGET - 1}) // {_SPLIT_TARGET} AS BIGINT)
                   AS ideal_tasks,
               CAST(n_splits - ((total_bytes + {_SPLIT_TARGET - 1}) // {_SPLIT_TARGET})
                    AS BIGINT) AS overhead_splits,
               max_split_bytes
        FROM agg ORDER BY part_key
        """,
        "meta_files",
    ),
    doc="Read-side split planning (Iceberg TableScan.planFiles semantics, "
    "read.split target-size 32 MiB): per-partition scan-task counts for "
    "the current snapshot — total splits, the ceil(bytes/target) ideal, "
    "the overhead paid to file boundaries (the read-amplification signal "
    "that feeds meta_compaction_plan), and the straggler-bounding max "
    "split. Split math is closed-form integer column arithmetic (no row "
    "explosion): one scan + one hash aggregate at any file count. The "
    "reference lists per-file sizes (formatters.py:263-281) but never "
    "plans the read",
)
def meta_scan_tasks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.scan_task_plan(
        derive(spark, sf_dir, "meta_files"),
        target_bytes=_SPLIT_TARGET,
        snapshot_id=2,
    )


@register(
    "meta_clustering_depth",
    tags=("maintenance", "bench"),
    oracle=oracle_query(
        """
        , ev AS (SELECT field_id, lower_bound AS v, CAST(1 AS BIGINT) AS delta
                 FROM meta_column_stats
                 UNION ALL
                 SELECT field_id, upper_bound, CAST(-1 AS BIGINT)
                 FROM meta_column_stats),
        d AS (SELECT field_id,
                     sum(delta) OVER (PARTITION BY field_id ORDER BY v, delta DESC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS depth
              FROM ev)
        SELECT field_id,
               CAST(count(*) // 2 AS BIGINT) AS n_files,
               CAST(max(depth) AS BIGINT) AS max_depth,
               CAST(sum(depth) * 1000 // count(*) AS BIGINT) AS avg_depth_permille
        FROM d GROUP BY field_id ORDER BY field_id
    """,
        "meta_column_stats",
    ),
    doc="Per-column clustering depth from file zone maps — the layout-"
    "quality metric behind sort/z-order decisions (Delta OPTIMIZE ZORDER "
    "reports the same number): sweep each field's [lower,upper] bounds as "
    "+1/-1 events; the running sum is how many files a point query on "
    "that value must open (max = worst case, 1 = perfectly clustered). "
    "Scale shape: bucketed two-level running SUM — local prefix sums in "
    "(field, value-bucket) window partitions plus a bucket-grain net "
    "prefix broadcast back (the overlap_sweepline trick) — so no field "
    "ever funnels its full event list through one sort task. The "
    "reference reads the same bounds (formatters.py:522-540) but never "
    "derives a layout metric",
)
def meta_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.clustering_depth(derive(spark, sf_dir, "meta_column_stats"))


@register(
    "substring_removal",
    tags=("bench",),
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        w AS (SELECT doc_id, i, md5(array_to_string(tok[i+1:i+20], ' ')) AS h
              FROM t, UNNEST(range(0, greatest(len(tok) - 19, 0))) g(i)),
        agg AS (SELECT h, count(DISTINCT doc_id) AS df,
                       min(struct_pack(d := doc_id, i := i)) AS canon
                FROM w GROUP BY h),
        cut AS (SELECT w.doc_id, w.i FROM w JOIN agg USING (h)
                WHERE agg.df >= 2
                  AND NOT (w.doc_id = (agg.canon).d AND w.i = (agg.canon).i)),
        cov AS (SELECT doc_id,
                       greatest(0, i + 20 - greatest(i,
                           coalesce(max(i + 20) OVER (PARTITION BY doc_id
                               ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0))) AS c
                FROM cut),
        rem AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_removed
                FROM cov GROUP BY doc_id),
        base AS (SELECT doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM documents)
        SELECT b.doc_id, b.n_tokens,
               CAST(coalesce(r.n_removed, 0) AS BIGINT) AS n_removed,
               CAST(coalesce(r.n_removed, 0) * 1000 // b.n_tokens AS BIGINT)
                   AS removed_permille
        FROM base b LEFT JOIN rem r USING (doc_id)
        ORDER BY b.doc_id
    """,
    doc="The REMOVAL step of exact substring dedup (Lee et al. 2022 cut "
    "the spans; substring_dedup only audits them): each duplicated "
    "20-token window keeps its FIRST corpus occurrence — min (doc_id, "
    "position), chosen inside the SAME df groupBy via a struct min, no "
    "second pass — and every other occurrence is cut; a token is removed "
    "when any cut window covers it, so per-doc removed mass is the union "
    "length of cut intervals via the standard running-max sweep in a "
    "doc-partitioned window. Linear explode + hash groupBy + equi-join + "
    "per-doc sweep: no pair product, no global funnel, holds on 10^9 docs",
)
def substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.substring_removal_stats(
        load_table(spark, sf_dir, "documents"), window_tokens=20
    )


from iceberg_meta_spark.pipeline.graph import triangle_stats  # noqa: E402


@register(
    "supplier_triangles",
    oracle="""
        WITH raw AS (SELECT DISTINCT least(l_suppkey, (l_partkey % 100) + 1) AS a,
                            greatest(l_suppkey, (l_partkey % 100) + 1) AS b
                     FROM lineitem WHERE l_suppkey <> (l_partkey % 100) + 1),
        alln AS (SELECT a AS node FROM raw UNION ALL SELECT b FROM raw),
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM alln GROUP BY node),
        wd AS (SELECT r.a, r.b, da.d AS da, db.d AS db
               FROM raw r JOIN deg da ON da.node = r.a JOIN deg db ON db.node = r.b),
        o AS (SELECT CASE WHEN da <= db THEN a ELSE b END AS u,
                     CASE WHEN da <= db THEN b ELSE a END AS v FROM wd),
        w AS (SELECT e1.u, e1.v AS v1, e2.v AS v2
              FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.v < e2.v),
        c AS (SELECT u AS v1, v AS v2 FROM o UNION ALL SELECT v, u FROM o),
        agg AS (SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
                       CAST((SELECT count(*) FROM raw) AS BIGINT) AS n_edges,
                       CAST((SELECT sum(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
                       CAST((SELECT count(*) FROM w
                             WHERE EXISTS (SELECT 1 FROM c
                                           WHERE c.v1 = w.v1 AND c.v2 = w.v2))
                            AS BIGINT) AS n_triangles)
        SELECT n_nodes, n_edges, n_wedges, n_triangles,
               CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(n_triangles * 3000 // n_wedges AS BIGINT)
               END AS closure_permille
        FROM agg
    """,
    doc="Exact triangle census + global clustering coefficient of the "
    "supplier co-supply graph (same edge set as supplier_pagerank, "
    "canonicalized undirected), by DEGREE ORIENTATION (Suri & "
    "Vassilvitskii WWW'11): orient every edge low-(degree,id) -> high, "
    "making the wedge self-join O(E^1.5) total — the naive undirected "
    "wedge join explodes as sum(deg^2) and dies on the first celebrity "
    "hub; one LeftSemi against the oriented edges closes each triangle "
    "exactly once (each triangle has exactly one apex pointing at both "
    "others)",
)
def supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dst = (F.col("l_partkey") % 100) + 1
    edges = (
        li.select(
            F.least(F.col("l_suppkey"), dst).alias("a"),
            F.greatest(F.col("l_suppkey"), dst).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return triangle_stats(edges)


from iceberg_meta_spark.pipeline.sampling import score_percentiles  # noqa: E402


@register(
    "quality_score_percentiles",
    oracle=f"""
        WITH x AS (
          SELECT doc_id, lang,
                 CAST(1 AS BIGINT) AS f0,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS f1,
                 CAST(len(text) AS BIGINT) AS f2,
                 CAST(len(list_filter(string_split(text, ' '),
                      t -> list_contains(['the','a','of','and','to'], t)))
                      AS BIGINT) AS f3,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS f4
          FROM documents),
        s AS (SELECT doc_id, lang, {_score_sql()} AS score_micro FROM x),
        b AS (SELECT doc_id, lang, score_micro,
                     (score_micro + 10000000) // {_MIX_BUCKET} AS bucket
              FROM s),
        hist AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs
                 FROM b GROUP BY bucket),
        cdf AS (SELECT bucket,
                       CAST(coalesce(sum(n_docs) OVER (ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                           AS BIGINT) AS n_below,
                       CAST(sum(n_docs) OVER () AS BIGINT) AS n_total
                FROM hist)
        SELECT b.doc_id, b.lang, b.score_micro,
               CAST(c.n_below * 1000 // c.n_total AS BIGINT) AS pct_permille
        FROM b JOIN cdf c USING (bucket)
        ORDER BY b.doc_id
    """,
    doc="Corpus-relative quality normalization: each doc's frozen-"
    "classifier score as a permille percentile of the corpus (so 'top "
    "10% quality' means the same across corpora with different raw "
    "ranges). The 100 TB shape: NO global percent_rank window — the CDF "
    "comes from the bounded score HISTOGRAM (one shrinking aggregate, a "
    "running sum over few-hundred bucket rows, broadcast back); same-"
    "bucket docs share the strictly-below mass, a deterministic "
    "granularity trade the oracle hash-gates exactly",
)
def quality_score_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return score_percentiles(
        load_table(spark, sf_dir, "documents"), bucket_micro=_MIX_BUCKET
    )


def _skew_profile_sql(table: str, key: str) -> str:
    """DuckDB mirror of one key_skew_profile row (operators/skew.py)."""
    return f"""
        SELECT '{key}' AS key_col,
               CAST((SELECT sum(cnt) FROM c_{key}) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM c_{key}) AS BIGINT) AS n_keys,
               CAST((SELECT max(cnt) FROM c_{key}) AS BIGINT) AS max_cnt,
               (SELECT k FROM c_{key} ORDER BY cnt DESC, k DESC LIMIT 1) AS top_key,
               round((SELECT max(cnt) FROM c_{key})
                     / ((SELECT sum(cnt) FROM c_{key}) / (SELECT count(*) FROM c_{key})), 4)
                   AS max_over_avg,
               round(CAST((SELECT sum(cnt) FROM c_{key}) AS DOUBLE)
                     * (SELECT sum(cnt) FROM c_{key})
                     / (SELECT sum(cnt * cnt) FROM c_{key}), 2) AS eff_keys,
               round((SELECT max(cnt) FROM c_{key})
                     / CAST((SELECT sum(cnt) FROM c_{key}) AS DOUBLE), 6) AS top_share,
               CASE WHEN CAST((SELECT max(cnt) FROM c_{key}) AS DOUBLE)
                         * (SELECT count(*) FROM c_{key})
                         > 8 * (SELECT sum(cnt) FROM c_{key}) THEN 'salt'
                    WHEN (SELECT count(*) FROM c_{key}) < 1000
                         THEN 'pre-aggregate or broadcast'
                    ELSE 'hash-partition as-is' END AS recommendation,
               CAST(CASE WHEN CAST((SELECT max(cnt) FROM c_{key}) AS DOUBLE)
                              * (SELECT count(*) FROM c_{key})
                              > 8 * (SELECT sum(cnt) FROM c_{key})
                         THEN least(64, CAST(ceil(CAST((SELECT max(cnt) FROM c_{key}) AS DOUBLE)
                              * (SELECT count(*) FROM c_{key})
                              / (SELECT sum(cnt) FROM c_{key})) AS BIGINT))
                         ELSE 0 END AS BIGINT) AS salt_n
    """


@register(
    "shuffle_key_skew_profile",
    oracle=f"""
        WITH c_user_id AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS cnt
                           FROM events GROUP BY 1),
             c_event_type AS (SELECT CAST(event_type AS VARCHAR) AS k, count(*) AS cnt
                              FROM events GROUP BY 1),
             c_l_suppkey AS (SELECT CAST(l_suppkey AS VARCHAR) AS k, count(*) AS cnt
                             FROM lineitem GROUP BY 1)
        SELECT * FROM ({_skew_profile_sql('events', 'user_id')})
        UNION ALL SELECT * FROM ({_skew_profile_sql('events', 'event_type')})
        UNION ALL SELECT * FROM ({_skew_profile_sql('lineitem', 'l_suppkey')})
        ORDER BY key_col
    """,
    tags=("bench",),
    doc="Pre-flight shuffle-key skew diagnosis (operators/skew.py:"
    "key_skew_profile): for each candidate join/groupBy key, ONE summary "
    "row — hottest-key-over-uniform-share ratio (AQE's skew signal), "
    "inverse-Herfindahl effective key count, the heavy key itself, and a "
    "salt/broadcast/as-is recommendation with the salt count sized from "
    "the measured ratio. Decide the partitioning strategy from two "
    "shrinking aggregates BEFORE shuffling 100 TB on the wrong key; no "
    "sort, no window, no collect",
)
def shuffle_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.skew import key_skew_profile

    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    prof = (
        key_skew_profile(ev, "user_id")
        .unionByName(key_skew_profile(ev, "event_type"))
        .unionByName(key_skew_profile(li, "l_suppkey"))
    )
    return prof.orderBy("key_col")


def _join_preflight_sql(key_col: str, left_sql: str, right_sql: str, cap: int) -> str:
    """DuckDB mirror of one join_cardinality_preflight row."""
    return f"""
        WITH la AS (SELECT k, count(*) AS ca FROM ({left_sql}) GROUP BY k),
             rb AS (SELECT k, count(*) AS cb FROM ({right_sql}) GROUP BY k),
             pk AS (SELECT la.k, ca * cb AS out_k FROM la JOIN rb USING (k)),
             ag AS (SELECT CAST(count(*) AS BIGINT) AS matched_keys,
                           CAST(coalesce(sum(out_k), 0) AS BIGINT) AS out_rows,
                           CAST(coalesce(max(out_k), 0) AS BIGINT) AS max_key_out
                    FROM pk),
             lt AS (SELECT CAST(count(*) AS BIGINT) AS left_rows FROM ({left_sql})),
             rt AS (SELECT CAST(count(*) AS BIGINT) AS right_rows FROM ({right_sql}))
        SELECT '{key_col}' AS key_col, left_rows, right_rows, matched_keys,
               out_rows, max_key_out,
               (SELECT k FROM pk ORDER BY out_k DESC, k DESC LIMIT 1) AS top_key,
               CASE WHEN greatest(left_rows, right_rows) > 0
                    THEN round(out_rows / CAST(greatest(left_rows, right_rows) AS DOUBLE), 4)
                    ELSE 0.0 END AS amplification,
               CASE WHEN least(left_rows, right_rows) <= {cap}
                         THEN 'broadcast smaller side'
                    WHEN matched_keys > 0
                         AND CAST(max_key_out AS DOUBLE) * matched_keys > 8 * out_rows
                         THEN 'salted sort-merge'
                    ELSE 'sort-merge as-is' END AS recommendation
        FROM ag, lt, rt
    """


@register(
    "join_cardinality_preflight",
    oracle=f"""
        SELECT * FROM ({_join_preflight_sql(
            'o_orderkey',
            "SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders",
            "SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem",
            1000)})
        UNION ALL
        SELECT * FROM ({_join_preflight_sql(
            'l_partkey',
            "SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem",
            "SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem",
            1000)})
        ORDER BY key_col
    """,
    tags=("bench",),
    doc="Exact join-output cardinality WITHOUT running the join "
    "(operators/skew.py:join_cardinality_preflight): |A JOIN B| = "
    "SUM(cntA*cntB) over the two per-key COUNT tables — O(distinct keys) "
    "through the shuffle instead of O(output). Emits the hottest output "
    "key (the reducer a skewed join would flood), the amplification vs "
    "the larger input, and a broadcast/salted/as-is strategy pick. Rows: "
    "orders-lineitem 1:N and the lineitem self-join on l_partkey "
    "(a fan-out join whose output is ~30x its input — the case where "
    "knowing out_rows BEFORE launching matters)",
)
def join_cardinality_preflight_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.skew import join_cardinality_preflight

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "join_key"
    )
    li_ok = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "join_key"
    )
    li = load_table(spark, sf_dir, "lineitem")
    a = join_cardinality_preflight(
        orders, li_ok, "join_key", broadcast_row_cap=1000
    ).withColumn("key_col", F.lit("o_orderkey"))
    b = join_cardinality_preflight(li, li, "l_partkey", broadcast_row_cap=1000)
    return a.unionByName(b).orderBy("key_col")


def _col_profile_sql(col: str, num_expr: str | None, len_expr: str | None) -> str:
    """DuckDB mirror of one column_profile row over `events`."""
    num_min = f"CAST(min({num_expr}) AS DOUBLE)" if num_expr else "CAST(NULL AS DOUBLE)"
    num_max = f"CAST(max({num_expr}) AS DOUBLE)" if num_expr else "CAST(NULL AS DOUBLE)"
    avg_len = (
        f"round(CAST(sum({len_expr}) AS DOUBLE) / (count(*) - sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)), 4)"
        if len_expr
        else "CAST(NULL AS DOUBLE)"
    )
    return f"""
        SELECT '{col}' AS "column",
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CASE WHEN count(*) = 0 THEN 0.0
                    ELSE round(CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                               / count(*), 6) END AS null_share,
               CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
               {num_min} AS min_num,
               {num_max} AS max_num,
               {avg_len} AS avg_len
        FROM events
    """


@register(
    "events_column_profile",
    oracle=f"""
        SELECT * FROM ({_col_profile_sql('event_id', 'event_id', None)})
        UNION ALL SELECT * FROM ({_col_profile_sql('ts', 'epoch_ns(ts)', None)})
        UNION ALL SELECT * FROM ({_col_profile_sql('user_id', 'user_id', None)})
        UNION ALL SELECT * FROM ({_col_profile_sql('event_type', None, 'length(event_type)')})
        UNION ALL SELECT * FROM ({_col_profile_sql('value', 'value', None)})
        UNION ALL SELECT * FROM ({_col_profile_sql('props', None, 'length(props)')})
        ORDER BY "column"
    """,
    tags=("bench",),
    doc="ANALYZE-style one-pass column profiler (operators/profile.py): "
    "every column's null share, EXACT distinct count, numeric/timestamp "
    "range, and mean string length from a single aggregate over the table "
    "— the long format comes from exploding an array-of-structs on the "
    "1-row result, so the table is scanned once, not once per column. "
    "Exact multi-column distinct plans via EXPAND (the standard ANALYZE "
    "cost); approx=True swaps HLL++ for the petabyte deployment path",
)
def events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.profile import column_profile

    ev = load_table(spark, sf_dir, "events")
    return column_profile(ev).orderBy("column")


@register(
    "doc_keywords",
    oracle="""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                     FROM documents),
        tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
               FROM tok GROUP BY doc_id, token),
        dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        scored AS (SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
                          CAST((tf.tf * (2 * (nd.n_docs - dfreq.df) + 1) * 1000)
                               // (2 * dfreq.df + 1) AS BIGINT) AS tfidf_milli
                   FROM tf JOIN dfreq USING (token) CROSS JOIN nd),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY tfidf_milli DESC, token) AS rank
                   FROM scored)
        SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tf, df, tfidf_milli
        FROM ranked WHERE rank <= 3
        ORDER BY doc_id, rank
    """,
    tags=("bench",),
    doc="Per-document top-3 keywords by tf-idf (pipeline/corpus.py:"
    "tfidf_keywords): raw-odds IDF restated over integers — "
    "(tf*(2(N-df)+1)*1000) DIV (2df+1) — so the ranking is the log-IDF "
    "ranking (log is monotone) but every tie and every hash replays "
    "exactly cross-engine. No capped-vocab broadcast: the rarest terms "
    "ARE the keywords, so df joins back by term (the shuffle carries "
    "distinct (doc,term) pairs, not token instances); the top-k window "
    "partitions by doc_id",
)
def doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.corpus import tfidf_keywords

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_keywords(docs, k=3).orderBy("doc_id", "rank")


@register(
    "lineitem_correlation_matrix",
    oracle="""
        WITH s AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
                          CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
                          CAST(round(l_tax * 100) AS BIGINT) AS tax_c
                   FROM lineitem),
        agg AS (SELECT count(*) AS n,
                       sum(qty) AS s_q, sum(qty * qty) AS ss_q,
                       sum(price_c) AS s_p, sum(price_c * price_c) AS ss_p,
                       sum(disc_c) AS s_d, sum(disc_c * disc_c) AS ss_d,
                       sum(tax_c) AS s_t, sum(tax_c * tax_c) AS ss_t,
                       sum(qty * price_c) AS s_qp, sum(qty * disc_c) AS s_qd,
                       sum(qty * tax_c) AS s_qt, sum(price_c * disc_c) AS s_pd,
                       sum(price_c * tax_c) AS s_pt, sum(disc_c * tax_c) AS s_dt
                FROM s)
        SELECT col_x, col_y, CAST(n AS BIGINT) AS n_rows,
               CASE WHEN (CAST(n AS DOUBLE) * ssx - sx * sx) > 0
                         AND (CAST(n AS DOUBLE) * ssy - sy * sy) > 0
                    THEN round((CAST(n AS DOUBLE) * sxy - sx * sy)
                         / sqrt((CAST(n AS DOUBLE) * ssx - sx * sx)
                                * (CAST(n AS DOUBLE) * ssy - sy * sy)), 6)
               END AS corr
        FROM (
            SELECT 'qty' AS col_x, 'price_c' AS col_y, n,
                   CAST(s_q AS DOUBLE) AS sx, CAST(ss_q AS DOUBLE) AS ssx,
                   CAST(s_p AS DOUBLE) AS sy, CAST(ss_p AS DOUBLE) AS ssy,
                   CAST(s_qp AS DOUBLE) AS sxy FROM agg
            UNION ALL SELECT 'qty', 'disc_c', n, CAST(s_q AS DOUBLE), CAST(ss_q AS DOUBLE),
                   CAST(s_d AS DOUBLE), CAST(ss_d AS DOUBLE), CAST(s_qd AS DOUBLE) FROM agg
            UNION ALL SELECT 'qty', 'tax_c', n, CAST(s_q AS DOUBLE), CAST(ss_q AS DOUBLE),
                   CAST(s_t AS DOUBLE), CAST(ss_t AS DOUBLE), CAST(s_qt AS DOUBLE) FROM agg
            UNION ALL SELECT 'price_c', 'disc_c', n, CAST(s_p AS DOUBLE), CAST(ss_p AS DOUBLE),
                   CAST(s_d AS DOUBLE), CAST(ss_d AS DOUBLE), CAST(s_pd AS DOUBLE) FROM agg
            UNION ALL SELECT 'price_c', 'tax_c', n, CAST(s_p AS DOUBLE), CAST(ss_p AS DOUBLE),
                   CAST(s_t AS DOUBLE), CAST(ss_t AS DOUBLE), CAST(s_pt AS DOUBLE) FROM agg
            UNION ALL SELECT 'disc_c', 'tax_c', n, CAST(s_d AS DOUBLE), CAST(ss_d AS DOUBLE),
                   CAST(s_t AS DOUBLE), CAST(ss_t AS DOUBLE), CAST(s_dt AS DOUBLE) FROM agg
        ) ORDER BY col_x, col_y
    """,
    tags=("bench",),
    doc="Pearson correlation for every pair of lineitem's fixed-point "
    "measures in ONE aggregate pass (operators/stats.py): integer-exact "
    "sufficient statistics (DECIMAL(38,0) sums — a 100 TB table cannot "
    "overflow them), k-squared correlations as scalar arithmetic on the "
    "1-row result. F.corr per pair would scan k(k-1)/2 times and float-"
    "accumulate in partition order; this is one scan and hash-gate "
    "deterministic on any partitioning",
)
def lineitem_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.stats import correlation_matrix

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_c"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_c"),
    )
    return correlation_matrix(li, ["qty", "price_c", "disc_c", "tax_c"]).orderBy(
        "col_x", "col_y"
    )


@register(
    "purchase_multi_touch",
    oracle="""
        WITH ev AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
                    FROM events),
        p AS (SELECT event_id AS purchase_id, user_id, ts_us AS p_ts,
                     CAST(floor(value * 1000000) AS BIGINT) AS value_micro
              FROM ev WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS click_id, user_id, ts_us AS click_ts
              FROM ev WHERE event_type = 'click'),
        pairs AS (SELECT p.user_id, p.purchase_id, p.value_micro, c.click_id, c.click_ts
                  FROM p JOIN c ON p.user_id = c.user_id
                              AND c.click_ts >= p.p_ts - 3600000000
                              AND c.click_ts <= p.p_ts),
        ranked AS (SELECT *,
                          CAST(row_number() OVER (PARTITION BY purchase_id
                               ORDER BY click_ts, click_id) AS BIGINT) AS position,
                          CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches
                   FROM pairs),
        wt AS (SELECT *,
                      CASE WHEN position = 1
                           THEN 1000 - (1000 // n_touches) * (n_touches - 1)
                           ELSE 1000 // n_touches END AS w_linear_milli,
                      CASE WHEN n_touches = 1 THEN 1000
                           WHEN n_touches = 2 THEN 500
                           WHEN position = 1 THEN 400
                           WHEN position = n_touches THEN 400
                           WHEN position = 2
                           THEN 200 - (200 // (n_touches - 2)) * (n_touches - 3)
                           ELSE 200 // (n_touches - 2) END AS w_ushape_milli
               FROM ranked)
        SELECT user_id, purchase_id, click_id, click_ts, position, n_touches,
               CAST(w_linear_milli AS BIGINT) AS w_linear_milli,
               CAST(w_ushape_milli AS BIGINT) AS w_ushape_milli,
               CAST((value_micro * w_linear_milli) // 1000 AS BIGINT) AS credit_linear_micro,
               CAST((value_micro * w_ushape_milli) // 1000 AS BIGINT) AS credit_ushape_micro
        FROM wt
        ORDER BY purchase_id, position
    """,
    tags=("bench",),
    doc="Multi-touch attribution (operators/attribution.py): every click in "
    "the 1h lookback shares the purchase's value under linear AND 40/20/40 "
    "U-shape position weights — integer millis summing to EXACTLY 1000 per "
    "conversion (floor remainder to the earliest touch of its tranche), "
    "credits = (value*w) DIV 1000 so per-channel rollups replay exactly. "
    "Candidates from the bucketed range equi-join (never a per-user cross "
    "product); position windows partition by purchase",
)
def purchase_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.attribution import multi_touch_attribution

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.expr("ts DIV 1000").alias("ts_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us",
        F.floor(F.col("value") * 1_000_000).cast("long").alias("value_micro"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    out = multi_touch_attribution(
        clicks, purchases, lookback=3_600_000_000,
        key="user_id", ts_col="ts_us", id_col="event_id", value_col="value_micro",
    )
    return out.orderBy("purchase_id", "position")


@register(
    "nation_revenue_trend",
    oracle="""
        WITH m AS (SELECT n.n_name,
                          CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT)
                              AS month_idx,
                          CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                              AS rev_cents
                   FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                                 JOIN nation n ON c.c_nationkey = n.n_nationkey
                   GROUP BY n.n_name, month_idx),
        agg AS (SELECT n_name, count(*) AS n, sum(month_idx) AS sx, sum(rev_cents) AS sy,
                       sum(month_idx * month_idx) AS sxx,
                       sum(rev_cents * rev_cents) AS syy,
                       sum(month_idx * rev_cents) AS sxy
                FROM m GROUP BY n_name)
        SELECT n_name, CAST(n AS BIGINT) AS n_points,
               CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) > 0
                    THEN round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
               END AS slope,
               CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) > 0
                    THEN round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy
                                 - CAST(sx AS DOUBLE) * sy)
                         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                         * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
               END AS intercept,
               CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) > 0
                         AND (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0
                    THEN round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                         * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                         / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                            * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
               END AS r2
        FROM agg ORDER BY n_name
    """,
    tags=("bench",),
    doc="Per-nation revenue trend: grouped closed-form OLS "
    "(operators/stats.py:grouped_ols) over monthly revenue-cents points — "
    "slope/intercept/r² per group from five DECIMAL(38,0) sufficient sums "
    "in ONE aggregate per group, no per-group sort, no window, no model "
    "library; dims broadcast onto the orders scan. The trend-detection "
    "shape that runs unchanged over 10^9 series",
)
def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.stats import grouped_ols

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # nation (25 rows) broadcasts; customer joins hash-partitioned — it is
    # 1:10 with orders, too big to assume broadcastable at deployment scale
    # (AQE upgrades it to broadcast at runtime when it does fit)
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("month_idx"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    return grouped_ols(monthly, ["n_name"], "month_idx", "rev_cents").orderBy("n_name")


# Benford P(d) = log10(1 + 1/d) as LITERAL decimal text: both engines parse
# the same 12-digit constant into the same double — no libm log10() at
# query time, so the hash gate holds (the corpus convention: constants may
# come from math, expressions may not).
_BENFORD_P = {
    1: "0.301029995664",
    2: "0.176091259056",
    3: "0.124938736608",
    4: "0.096910013008",
    5: "0.079181246048",
    6: "0.066946789631",
    7: "0.057991946978",
    8: "0.051152522447",
    9: "0.045757490561",
}
_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items()
) + " END"


@register(
    "orders_benford_audit",
    oracle=f"""
        WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                      AS VARCHAR), 1, 1) AS BIGINT) AS first_digit
                   FROM orders WHERE o_totalprice > 0),
        obs AS (SELECT first_digit, CAST(count(*) AS BIGINT) AS n_obs
                FROM d GROUP BY first_digit),
        tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs)
        SELECT o.first_digit, o.n_obs,
               round(CAST(o.n_obs AS DOUBLE) / t.n, 6) AS obs_share,
               round({_BENFORD_CASE}, 6) AS benford_share,
               round(
                   (CAST(o.n_obs AS DOUBLE) - t.n * ({_BENFORD_CASE}))
                   * (CAST(o.n_obs AS DOUBLE) - t.n * ({_BENFORD_CASE}))
                   / (t.n * ({_BENFORD_CASE})), 6) AS chi2_term
        FROM obs o CROSS JOIN tot t
        ORDER BY o.first_digit
    """,
    tags=("bench",),
    doc="Benford first-digit audit over order totals (the fraud / "
    "fabricated-data screen): observed leading-digit shares vs the "
    "Benford expectation with per-digit chi-square terms — digits from "
    "integer cents (no float formatting), expectations as literal "
    "constants (no query-time libm), ONE tiny groupBy + a 1-row total "
    "broadcast. Data-quality family: a synthetic-data or unit-mixup "
    "regression in a revenue column shifts these nine rows immediately",
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = orders.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("first_digit")
    )
    obs = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").alias("n"))
    p = F.expr(f"CAST(({_BENFORD_CASE}) AS DOUBLE)")
    exp_n = F.col("n") * p
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "first_digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias("obs_share"),
            F.round(p, 6).alias("benford_share"),
            F.round(
                (F.col("n_obs").cast("double") - exp_n)
                * (F.col("n_obs").cast("double") - exp_n)
                / exp_n,
                6,
            ).alias("chi2_term"),
        )
        .orderBy("first_digit")
    )


@register(
    "events_type_dow_independence",
    oracle="""
        WITH keyed AS (SELECT event_type,
                              CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS BIGINT) AS dow
                       FROM events),
        obs AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_obs
                FROM keyed GROUP BY event_type, dow),
        rt AS (SELECT event_type, CAST(sum(n_obs) AS BIGINT) AS row_tot FROM obs GROUP BY event_type),
        ct AS (SELECT dow, CAST(sum(n_obs) AS BIGINT) AS col_tot FROM obs GROUP BY dow),
        g AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs)
        SELECT o.event_type, o.dow, o.n_obs,
               round(CAST(r.row_tot AS DOUBLE) * c.col_tot / g.n, 6) AS expected,
               round((o.n_obs - CAST(r.row_tot AS DOUBLE) * c.col_tot / g.n)
                     * (o.n_obs - CAST(r.row_tot AS DOUBLE) * c.col_tot / g.n)
                     / (CAST(r.row_tot AS DOUBLE) * c.col_tot / g.n), 6) AS chi2_term
        FROM obs o JOIN rt r USING (event_type) JOIN ct c USING (dow) CROSS JOIN g
        ORDER BY o.event_type, o.dow
    """,
    tags=("bench",),
    doc="Chi-square independence audit: the event_type x day-of-week "
    "contingency table with expected counts under independence and "
    "per-cell chi-square terms — is behavior day-patterned, or is a "
    "tracking pipeline duplicating one type on one day? One shrinking "
    "groupBy; marginals are tiny keyed tables broadcast back onto the "
    "cells (A4's shape, three ways). dow from integer epoch-day math "
    "(1970-01-01 = Thursday = 4), no timezone/locale dependence",
)
def events_type_dow_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_type",
        F.expr("((ts DIV 1000) DIV 86400000000 + 4) % 7").cast("long").alias("dow"),
    )
    obs = keyed.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("n_obs"))
    rt = obs.groupBy("event_type").agg(F.sum("n_obs").alias("row_tot"))
    ct = obs.groupBy("dow").agg(F.sum("n_obs").alias("col_tot"))
    g = obs.agg(F.sum("n_obs").alias("n"))
    expected = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    return (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "dow",
            "n_obs",
            F.round(expected, 6).alias("expected"),
            F.round(
                (F.col("n_obs") - expected) * (F.col("n_obs") - expected) / expected, 6
            ).alias("chi2_term"),
        )
        .orderBy("event_type", "dow")
    )


_RET_KEEP_LAST = 5
_RET_ALL_HOURS = 24
_RET_DAILY_DAYS = 30
_RET_WEEKLY_WEEKS = 12
_DAY_US = 86_400_000_000
_WEEK_US = 7 * _DAY_US


@register(
    "meta_retention_policy",
    oracle=oracle_query(
        f"""
        , keyed AS (
            SELECT snapshot_id, committed_us,
                   committed_us // {_DAY_US} AS day_idx,
                   committed_us // {_WEEK_US} AS week_idx
            FROM meta_snapshots),
        ranked AS (
            SELECT *,
                   row_number() OVER (ORDER BY committed_us DESC, snapshot_id DESC)
                       AS recency_rank,
                   row_number() OVER (PARTITION BY day_idx
                       ORDER BY committed_us DESC, snapshot_id DESC) AS day_rank,
                   row_number() OVER (PARTITION BY week_idx
                       ORDER BY committed_us DESC, snapshot_id DESC) AS week_rank
            FROM keyed),
        flagged AS (
            SELECT snapshot_id, committed_us,
                   CAST(recency_rank AS BIGINT) AS recency_rank,
                   recency_rank <= {_RET_KEEP_LAST} AS keep_lastk,
                   committed_us >= {_EXPIRY_NOW_US - _RET_ALL_HOURS * 3_600_000_000}
                       AS keep_recent,
                   day_rank = 1 AND day_idx >= {_EXPIRY_NOW_US // _DAY_US - _RET_DAILY_DAYS}
                       AS keep_daily,
                   week_rank = 1 AND week_idx >= {_EXPIRY_NOW_US // _WEEK_US - _RET_WEEKLY_WEEKS}
                       AS keep_weekly
            FROM ranked)
        SELECT snapshot_id, committed_us, recency_rank,
               (keep_lastk OR keep_recent OR keep_daily OR keep_weekly) AS keep,
               CASE WHEN (keep_lastk OR keep_recent OR keep_daily OR keep_weekly)
                    THEN concat_ws(',',
                         CASE WHEN keep_lastk THEN 'last-k' END,
                         CASE WHEN keep_recent THEN 'recent' END,
                         CASE WHEN keep_daily THEN 'daily' END,
                         CASE WHEN keep_weekly THEN 'weekly' END)
                    ELSE 'expire' END AS reasons
        FROM flagged
        ORDER BY recency_rank
        """,
        "meta_snapshots",
    ),
    tags=("maintenance",),
    doc="GFS (grandfather-father-son) retention simulation over the "
    "snapshot log (operators/maintenance.py:retention_policy): keep the "
    "last 5, everything younger than 24h, the last snapshot of each UTC "
    "day for 30 days, and the last of each week for 12 weeks — one "
    "verdict row per snapshot with the reasons it survives. The dry-run "
    "before an irreversible expireSnapshots; generalizes "
    "meta_snapshot_expiry's keep-last-AND-max-age into tiered retention. "
    "Day/week last-of-period windows are period-partitioned; the recency "
    "rank is the same metadata-sized global window snapshot_expiry uses",
)
def meta_retention_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.maintenance import retention_policy

    return retention_policy(
        derive(spark, sf_dir, "meta_snapshots"),
        now_us=_EXPIRY_NOW_US,
        keep_last=_RET_KEEP_LAST,
        keep_all_hours=_RET_ALL_HOURS,
        daily_days=_RET_DAILY_DAYS,
        weekly_weeks=_RET_WEEKLY_WEEKS,
    ).orderBy("recency_rank")


_SYNC_DRIFT_MS = 14 * 86_400_000  # tables of one pipeline should commit within 2 weeks


@register(
    "meta_namespace_sync_drift",
    oracle=oracle_query(
        f"""
        , agg AS (
            SELECT namespace,
                   CAST(count(*) AS BIGINT) AS n_tables,
                   CAST(max(last_updated_ms) AS BIGINT) AS newest_ms,
                   CAST(min(last_updated_ms) AS BIGINT) AS oldest_ms
            FROM meta_tables GROUP BY namespace),
        lag AS (
            SELECT namespace,
                   (SELECT t.table_name FROM meta_tables t
                    WHERE t.namespace = agg.namespace
                    ORDER BY t.last_updated_ms ASC, t.table_name DESC LIMIT 1)
                       AS laggard_table
            FROM agg)
        SELECT agg.namespace, n_tables, newest_ms, oldest_ms,
               CAST(newest_ms - oldest_ms AS BIGINT) AS drift_ms,
               lag.laggard_table,
               newest_ms - oldest_ms > {_SYNC_DRIFT_MS} AS out_of_sync
        FROM agg JOIN lag USING (namespace)
        ORDER BY drift_ms DESC, namespace
        """,
        "meta_tables",
    ),
    tags=("maintenance",),
    doc="Multi-table sync-drift audit: tables written by one pipeline "
    "(sharing a namespace) should commit together — the spread between a "
    "namespace's newest and oldest last-commit, the laggard table by name, "
    "and an out-of-sync flag. The cross-table consistency check "
    "meta_stalest_tables (per-table freshness) cannot express; one tiny "
    "groupBy + a min-struct laggard pick, no window",
)
def meta_namespace_sync_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = derive(spark, sf_dir, "meta_tables")
    agg = t.groupBy("namespace").agg(
        F.count(F.lit(1)).alias("n_tables"),
        F.max("last_updated_ms").alias("newest_ms"),
        F.min("last_updated_ms").alias("oldest_ms"),
        # laggard = oldest commit; ties broken toward the GREATER name to
        # mirror ORDER BY ts ASC, name DESC (min-struct on (ts, neg-name)
        # is not expressible — use max(struct(-ts, name)) instead)
        F.max(F.struct((-F.col("last_updated_ms")).alias("neg_ts"), F.col("table_name")))
        .getField("table_name")
        .alias("laggard_table"),
    )
    return agg.select(
        "namespace",
        "n_tables",
        "newest_ms",
        "oldest_ms",
        (F.col("newest_ms") - F.col("oldest_ms")).alias("drift_ms"),
        "laggard_table",
        ((F.col("newest_ms") - F.col("oldest_ms")) > _SYNC_DRIFT_MS).alias("out_of_sync"),
    ).orderBy(F.desc("drift_ms"), "namespace")


@register(
    "doc_readability",
    oracle="""
        WITH base AS (
            SELECT doc_id, lang,
                   CAST(greatest(len(string_split(text, ' ')), 1) AS BIGINT) AS n_words,
                   CAST(greatest(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                        s -> length(trim(s)) > 0)), 1) AS BIGINT) AS n_sentences,
                   length(regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'))
                       - length(regexp_replace(regexp_replace(lower(text),
                             '[aeiouy]+', 'V', 'g'), 'V', '', 'g')) AS vgroups
            FROM documents),
        syl AS (SELECT doc_id, lang, n_words, n_sentences,
                       CAST(greatest(vgroups, n_words) AS BIGINT) AS n_syllables
                FROM base),
        scored AS (SELECT *,
                          CAST(206835000
                               - 1015 * ((n_words * 1000) // n_sentences)
                               - 84600 * ((n_syllables * 1000) // n_words)
                               AS BIGINT) AS flesch_micro
                   FROM syl)
        SELECT doc_id, lang, n_words, n_sentences, n_syllables, flesch_micro,
               CASE WHEN flesch_micro >= 60000000 THEN 'easy'
                    WHEN flesch_micro >= 30000000 THEN 'standard'
                    ELSE 'difficult' END AS band
        FROM scored ORDER BY doc_id
    """,
    tags=("bench",),
    doc="Flesch-style readability per document (pipeline/text.py:"
    "readability_scores): words / sentence-runs / vowel-group syllables "
    "as integer counts, the classic formula at micro-point scale with "
    "floored term divisions — the educational-value / complexity signal, "
    "pure expressions, zero shuffle",
)
def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.text import readability_scores

    return readability_scores(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "events_minute_interpolate",
    oracle="""
        WITH ev AS (SELECT event_type,
                           epoch_us(ts) - epoch_us(ts) % 60000000 AS bucket_us,
                           CAST(floor(value * 100) AS BIGINT) AS value_cents
                    FROM events),
        obs AS (SELECT event_type, bucket_us, CAST(sum(value_cents) AS BIGINT) AS observed
                FROM ev GROUP BY event_type, bucket_us),
        span AS (SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
                 FROM obs GROUP BY event_type),
        grid AS (SELECT s.event_type, g AS bucket_us
                 FROM span s, LATERAL (SELECT unnest(generate_series(s.lo, s.hi, 60000000)) g)),
        j AS (SELECT g.event_type, g.bucket_us, o.observed
              FROM grid g LEFT JOIN obs o
                ON o.event_type = g.event_type AND o.bucket_us = g.bucket_us),
        fenced AS (SELECT event_type, bucket_us, observed,
               last_value(observed IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
               last_value(CASE WHEN observed IS NOT NULL THEN bucket_us END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
               first_value(observed IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
               first_value(CASE WHEN observed IS NOT NULL THEN bucket_us END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
               FROM j)
        SELECT event_type, bucket_us,
               CAST(CASE WHEN observed IS NOT NULL THEN observed
                    WHEN prev_v IS NULL THEN next_v
                    WHEN next_v IS NULL THEN prev_v
                    ELSE prev_v + ((next_v - prev_v) * (bucket_us - prev_t))
                         // (next_t - prev_t) END AS BIGINT) AS filled,
               observed IS NOT NULL AS observed_flag
        FROM fenced ORDER BY event_type, bucket_us
    """,
    doc="Gap-filled minute series with LINEAR interpolation "
    "(time_bucket_gapfill + interpolate shape, beside the locf twin): "
    "each gap row carries both fence posts via two ignore-nulls windows "
    "partitioned by key, and the fill is integer "
    "prev + (next-prev)*(t-t0) DIV (t1-t0) — exact on any engine; grid "
    "edges fall back to the available post",
)
def events_minute_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.hypertable import time_interpolate

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts DIV 1000").alias("ts_us"),
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return time_interpolate(ev)


@register(
    "event_value_outliers_mad",
    oracle="""
        WITH ev AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM events),
        med AS (SELECT event_type, median(cents) AS med_cents FROM ev GROUP BY event_type),
        dev AS (SELECT ev.event_type, abs(ev.cents - m.med_cents) AS adev, ev.cents,
                       m.med_cents
                FROM ev JOIN med m USING (event_type)),
        mad AS (SELECT event_type, median(adev) AS mad_cents FROM dev GROUP BY event_type)
        SELECT d.event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(max(d.med_cents), 1) AS med_cents,
               round(max(a.mad_cents), 1) AS mad_cents,
               CAST(sum(CASE WHEN abs(d.cents - d.med_cents)
                              > 3 * 1.4826 * a.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers,
               CAST(sum(CASE WHEN abs(d.cents - d.med_cents)
                              > 3 * 1.4826 * a.mad_cents THEN 1 ELSE 0 END) * 1000
                    // count(*) AS BIGINT) AS outlier_permille
        FROM dev d JOIN mad a USING (event_type)
        GROUP BY d.event_type ORDER BY d.event_type
    """,
    doc="Robust outlier census per event type: median / MAD with the "
    "1.4826 normal-consistency constant (|x - med| > 3·1.4826·MAD) — the "
    "fat-tail detector that keeps working where event_value_outliers' "
    "3-sigma rule is dragged by the outliers it is hunting. Exact group "
    "medians (5-key grain; the per-key sort buffer is the documented A1 "
    "cliff — swap percentile_approx past ~10^8 rows/key); two shrinking "
    "aggregates with the tiny median/MAD tables joined back",
)
def event_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med_cents")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "cents", "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_cents")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    is_out = F.abs(F.col("cents") - F.col("med_cents")) > 3 * 1.4826 * F.col("mad_cents")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med_cents"), 1).alias("med_cents"),
            F.round(F.max("mad_cents"), 1).alias("mad_cents"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
            F.expr(
                "CAST(sum(CASE WHEN abs(cents - med_cents) > 3 * 1.4826 * mad_cents "
                "THEN 1 ELSE 0 END) * 1000 DIV count(1) AS BIGINT)"
            ).alias("outlier_permille"),
        )
        .orderBy("event_type")
    )


@register(
    "meta_file_median_bisect",
    oracle=oracle_query(
        """
        SELECT CAST(count(*) AS BIGINT) AS n_files,
               CAST(median(file_size_in_bytes) AS DOUBLE) AS median_size
        FROM meta_files
        """,
        "meta_files",
    ),
    doc="EXACT file-size median by histogram refinement (operators/"
    "selection.py): the third path through the A1 percentile-buffer "
    "cliff — O(log_1024(range)) column-pruned scans and O(1024) driver "
    "memory instead of buffering every value (exact twin) or giving up "
    "exactness (approx twin). Bit-equal to SQL median at any scale; the "
    "even-count contract averages the two middle order statistics",
)
def meta_file_median_bisect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.selection import exact_median

    files = derive(spark, sf_dir, "meta_files")
    n = files.filter(F.col("file_size_in_bytes").isNotNull()).count()
    med = exact_median(files, "file_size_in_bytes")
    return spark.createDataFrame(
        [(n, med)], "n_files long, median_size double"
    )


@register(
    "cohort_conversion_wilson",
    oracle="""
        WITH ranked AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                               row_number() OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS rn
                        FROM events),
        first_ev AS (SELECT user_id, event_type AS acq_type FROM ranked WHERE rn = 1),
        conv AS (SELECT user_id,
                        CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                             AS BIGINT) AS converted
                 FROM events GROUP BY user_id),
        cohort AS (SELECT f.acq_type,
                          CAST(count(*) AS BIGINT) AS n_users,
                          CAST(sum(c.converted) AS BIGINT) AS n_converted
                   FROM first_ev f JOIN conv c USING (user_id)
                   GROUP BY f.acq_type),
        scored AS (SELECT acq_type, n_users, n_converted,
                          CAST(n_converted AS DOUBLE) / n_users AS p
                   FROM cohort)
        SELECT acq_type, n_users, n_converted,
               round(p, 6) AS rate,
               round((p + 1.9208 / n_users
                      - 1.96 * sqrt(p * (1 - p) / n_users
                                    + 0.9604 / (CAST(n_users AS DOUBLE) * n_users)))
                     / (1 + 3.8416 / n_users), 6) AS wilson_lb
        FROM scored
        ORDER BY wilson_lb DESC, acq_type
    """,
    doc="Conversion ranking by the Wilson score lower bound (z=1.96, "
    "constants as literal text: z²/2=1.9208, z²/4=0.9604, z²=3.8416 — no "
    "runtime pow): cohorts keyed by each user's FIRST event (acquisition "
    "action, (ts, event_id)-deterministic), converted = ever purchased. "
    "Sorting by the LOWER BOUND instead of the raw rate is the standard "
    "fix for small-cohort rate inflation — a 2/2 cohort ranks below a "
    "180/300 one. All inputs exact integers; sqrt is correctly-rounded "
    "IEEE on both engines so the hash gate holds",
)
def cohort_conversion_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    first_ev = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("acq_type"))
    )
    conv = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("converted")
    )
    cohort = (
        first_ev.join(conv, "user_id")
        .groupBy("acq_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
    )
    p = F.col("n_converted").cast("double") / F.col("n_users")
    n = F.col("n_users")
    wilson = (
        p
        + F.lit(1.9208) / n
        - F.lit(1.96)
        * F.sqrt(p * (1 - p) / n + F.lit(0.9604) / (n.cast("double") * n))
    ) / (F.lit(1) + F.lit(3.8416) / n)
    return cohort.select(
        "acq_type",
        "n_users",
        "n_converted",
        F.round(p, 6).alias("rate"),
        F.round(wilson, 6).alias("wilson_lb"),
    ).orderBy(F.desc("wilson_lb"), "acq_type")


@register(
    "cohort_ab_ztest",
    oracle="""
        WITH ranked AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                               row_number() OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS rn
                        FROM events),
        first_ev AS (SELECT user_id, event_type AS acq_type FROM ranked WHERE rn = 1),
        conv AS (SELECT user_id,
                        CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                             AS BIGINT) AS converted
                 FROM events GROUP BY user_id),
        cohort AS (SELECT f.acq_type,
                          CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(c.converted) AS BIGINT) AS k
                   FROM first_ev f JOIN conv c USING (user_id)
                   GROUP BY f.acq_type)
        , pairs AS (
            SELECT a.acq_type AS cohort_a, b.acq_type AS cohort_b,
                   a.n AS n_a, b.n AS n_b, a.k AS k_a, b.k AS k_b,
                   CAST(a.k + b.k AS DOUBLE) / (a.n + b.n) AS pool
            FROM cohort a JOIN cohort b ON a.acq_type < b.acq_type)
        SELECT cohort_a, cohort_b, n_a, n_b,
               round(CAST(k_a AS DOUBLE) / n_a, 6) AS rate_a,
               round(CAST(k_b AS DOUBLE) / n_b, 6) AS rate_b,
               CASE WHEN pool > 0 AND pool < 1
                    THEN round((CAST(k_a AS DOUBLE) / n_a - CAST(k_b AS DOUBLE) / n_b)
                         / sqrt(pool * (1 - pool) * (1.0 / n_a + 1.0 / n_b)), 4)
               END AS z,
               coalesce(CASE WHEN pool > 0 AND pool < 1
                    THEN abs((CAST(k_a AS DOUBLE) / n_a - CAST(k_b AS DOUBLE) / n_b)
                         / sqrt(pool * (1 - pool) * (1.0 / n_a + 1.0 / n_b))) > 1.96
               END, FALSE) AS significant
        FROM pairs
        ORDER BY cohort_a, cohort_b
    """,
    doc="Two-proportion z-test between every cohort pair (pooled standard "
    "error, |z| > 1.96 at the 5% level): did acquisition channel A "
    "genuinely out-convert channel B, or is the gap noise? Completes the "
    "testing family (chi-square independence, Benford, Wilson ranking) — "
    "cohort table is tiny so the pair join is trivially bounded; exact "
    "integer inputs + IEEE sqrt keep the gate",
)
def cohort_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    first_ev = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("acq_type"))
    )
    conv = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("converted")
    )
    cohort = (
        first_ev.join(conv, "user_id")
        .groupBy("acq_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("converted").cast("long").alias("k"))
    )
    a = cohort.select(*[F.col(c).alias(f"{c}_a") for c in cohort.columns])
    b = cohort.select(*[F.col(c).alias(f"{c}_b") for c in cohort.columns])
    pairs = a.join(b, F.col("acq_type_a") < F.col("acq_type_b"))
    pa = F.col("k_a").cast("double") / F.col("n_a")
    pb = F.col("k_b").cast("double") / F.col("n_b")
    pool = (F.col("k_a") + F.col("k_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    raw_z = (pa - pb) / F.sqrt(
        pool * (1 - pool) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    # degenerate pool (everyone or no one converted): zero pooled variance,
    # the test is undefined -> NULL z, not-significant, no ANSI div-by-zero
    defined = (pool > 0) & (pool < 1)
    z = F.when(defined, raw_z)
    return pairs.select(
        F.col("acq_type_a").alias("cohort_a"),
        F.col("acq_type_b").alias("cohort_b"),
        F.col("n_a"),
        F.col("n_b"),
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 4).alias("z"),
        F.coalesce(F.abs(z) > 1.96, F.lit(False)).alias("significant"),
    ).orderBy("cohort_a", "cohort_b")
