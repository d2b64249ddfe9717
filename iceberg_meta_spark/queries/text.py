"""Corpus/text analytics: vocabulary & rarity, chunking, BPE, quality
rules, language-ID confusion, familiarity, splits, mixing/quota/budget
sampling, readability, keywords.

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
    _BM25_TERMS, _classifier_feature_sql, _score_sql,
)


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
    "doc_length_quantiles_approx",
    oracle=None,  # percentile_approx sketches are engine-specific; the exact
    # twin doc_length_quantiles carries the hash gate (tolerance_twin
    # contract) and test_doc_quantiles_approx_close_to_exact pins the two.
    tolerance_twin="doc_length_quantiles",
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

from iceberg_meta_spark.pipeline.corpus import bm25_scores  # noqa: E402

from iceberg_meta_spark.pipeline.sampling import pps_sample  # noqa: E402

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

from iceberg_meta_spark.pipeline import dedup  # noqa: E402

from iceberg_meta_spark.pipeline import classifier, winnow  # noqa: E402

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

_QUOTA_Q = 3  # max docs kept per source (binds at sf0.01: ~5 docs/source)

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
    "training_shard_balance",
    tags=("bench",),
    oracle="""
        WITH t AS (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                          md5(concat('shard:', CAST(doc_id AS VARCHAR))) AS h
                   FROM documents),
        a AS (SELECT ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                      + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) % 16
                       AS shard_id,
                     n_tok
              FROM t),
        s AS (SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_tok) AS BIGINT) AS shard_tokens
              FROM a GROUP BY shard_id),
        tot AS (SELECT CAST(sum(shard_tokens) AS BIGINT) AS total_tokens FROM s)
        SELECT shard_id, n_docs, shard_tokens,
               CAST(shard_tokens * 1000 // total_tokens AS BIGINT) AS token_share_permille,
               CAST(shard_tokens * 16 * 1000 // total_tokens AS BIGINT) AS load_permille
        FROM s, tot
        ORDER BY shard_id
    """,
    doc="Training-shard assignment audit: hash-mod docs onto 16 shards (the "
    "only coordination-free routing at 100 TB) and report per-shard token "
    "load vs the perfectly-balanced 1000 permille — map-side hash, one "
    "16-row aggregate, one broadcast total; answers whether hash-mod is "
    "balanced enough before the trainer consumes the shards",
)
def training_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.sampling import shard_balance

    return shard_balance(load_table(spark, sf_dir, "documents"), n_shards=16)


@register(
    "tokenizer_fertility",
    oracle="""
        WITH t AS (SELECT lang,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                          CAST(len(text) AS BIGINT) AS n_chars
                   FROM documents)
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(CAST(sum(n_bytes) AS BIGINT) * 1000
                    // CAST(sum(n_tok) AS BIGINT) AS BIGINT) AS bytes_per_token_milli,
               CAST(CAST(sum(n_chars) AS BIGINT) * 1000
                    // CAST(sum(n_tok) AS BIGINT) AS BIGINT) AS chars_per_token_milli
        FROM t
        GROUP BY lang
        ORDER BY lang
    """,
    doc="Tokenizer fertility per language: bytes/chars per token in integer "
    "milli units — the standard multilingual-budget planning table (a lang "
    "whose fertility is 2x pays 2x the compute per character); pure column "
    "expressions into one lang-keyed aggregate, no shuffle beyond it",
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    n_bytes = F.octet_length(F.col("text")).cast("long")
    n_chars = F.length(F.col("text")).cast("long")
    return (
        docs.select(
            "lang",
            n_tok.alias("n_tok"),
            n_bytes.alias("n_bytes"),
            n_chars.alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            "total_bytes",
            "total_chars",
            F.expr("total_bytes * 1000 DIV total_tokens").alias("bytes_per_token_milli"),
            F.expr("total_chars * 1000 DIV total_tokens").alias("chars_per_token_milli"),
        )
        .orderBy("lang")
    )


@register(
    "corpus_distinct_bigrams",
    oracle="""
        WITH toks AS (SELECT lang, string_split(text, ' ') AS t FROM documents),
        sized AS (SELECT lang, t, len(t) AS n FROM toks WHERE len(t) >= 2),
        g AS (SELECT DISTINCT lang, concat(t[i], ' ', t[i+1]) AS ngram
              FROM sized, UNNEST(range(1, n)) AS gi(i))
        SELECT lang, CAST(count(*) AS BIGINT) AS distinct_ngrams
        FROM g GROUP BY lang ORDER BY lang
    """,
    doc="Distinct bigrams per language (exact): the vocabulary-growth "
    "number a corpus report tracks across snapshots (Heaps-law monitoring); "
    "one shuffle of distinct (lang, bigram) pairs — the oracle-gated twin "
    "of corpus_distinct_bigrams_hll",
)
def corpus_distinct_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.corpus import distinct_ngrams

    return distinct_ngrams(load_table(spark, sf_dir, "documents"), n=2)


@register(
    "corpus_distinct_bigrams_hll",
    oracle=None,  # HLL++ estimates are engine-specific; gated against the
    # exact twin's oracle with a 10% tolerance (registry tolerance_twin
    # contract, tools/check_oracle.py).
    tolerance_twin="corpus_distinct_bigrams",
    doc="Distinct bigrams per language, sketched: approx_count_distinct "
    "(HLL++, KB-scale mergeable state, map-side combined) — the "
    "10^11-ngram path where the exact distinct shuffle IS the job",
)
def corpus_distinct_bigrams_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.corpus import distinct_ngrams

    return distinct_ngrams(load_table(spark, sf_dir, "documents"), n=2, approx=True)
