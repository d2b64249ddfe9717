"""Dedup extensions beyond queries/pipeline.py: cluster/survivor views,
n-gram share, winnowing, substring (Lee et al.) dedup, boilerplate
spans, and the trained quality classifier pair.

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
    _classifier_feature_sql, _score_sql,
)


from iceberg_meta_spark.pipeline import graph, quality  # noqa: E402

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

from iceberg_meta_spark.pipeline import corpus  # noqa: E402

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

from iceberg_meta_spark.pipeline import classifier, winnow  # noqa: E402

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


@register(
    "dedup_impact",
    tags=("bench",),
    oracle="""
        WITH t AS (SELECT doc_id, source,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                          md5(array_to_string((string_split(text, ' '))[1:3], ' '))
                            AS dup_key
                   FROM documents),
        keep AS (SELECT dup_key, min(doc_id) AS keep_id FROM t GROUP BY dup_key)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END) AS BIGINT)
                 AS kept_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               CAST(sum(CASE WHEN doc_id = keep_id THEN n_tok ELSE 0 END) AS BIGINT)
                 AS kept_tokens,
               CAST(sum(CASE WHEN doc_id <> keep_id THEN n_tok ELSE 0 END) AS BIGINT)
                 AS dropped_tokens,
               CAST(CAST(sum(CASE WHEN doc_id <> keep_id THEN n_tok ELSE 0 END) AS BIGINT)
                    * 1000 // CAST(sum(n_tok) AS BIGINT) AS BIGINT) AS savings_permille
        FROM t JOIN keep USING (dup_key)
        GROUP BY source
        ORDER BY source
    """,
    doc="Dedup decision support: per-source docs/tokens that exact dedup "
    "(keep-min-id, the dedup_exact policy) would drop, with integer permille "
    "savings — the report read BEFORE spending a cluster-day rewriting; one "
    "fingerprint groupBy + a key-local join back + one per-source aggregate",
)
def dedup_impact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.dedup import dedup_impact

    return dedup_impact(load_table(spark, sf_dir, "documents"), prefix_tokens=3)


@register(
    "near_dedup_impact",
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
        labeled AS (SELECT d.doc_id, d.source,
                           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
                           coalesce(cc.lab, d.doc_id) AS cluster
                    FROM documents d LEFT JOIN cc ON cc.node = d.doc_id)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN doc_id = cluster THEN 1 ELSE 0 END) AS BIGINT)
                 AS kept_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               CAST(sum(CASE WHEN doc_id = cluster THEN n_tok ELSE 0 END) AS BIGINT)
                 AS kept_tokens,
               CAST(sum(CASE WHEN doc_id <> cluster THEN n_tok ELSE 0 END) AS BIGINT)
                 AS dropped_tokens,
               CAST(CAST(sum(CASE WHEN doc_id <> cluster THEN n_tok ELSE 0 END) AS BIGINT)
                    * 1000 // CAST(sum(n_tok) AS BIGINT) AS BIGINT) AS savings_permille
        FROM labeled
        GROUP BY source
        ORDER BY source
    """,
    doc="Transitive near-dup dedup impact per source: docs/tokens dropped "
    "if only each fingerprint-cluster's min-id doc survives (the FineWeb "
    "cluster-collapse accounting, companion to exact-key dedup_impact); "
    "star edges -> min-label propagation -> one per-source aggregate — the "
    "cluster label IS the keeper id, no extra keeper join",
)
def near_dedup_impact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.graph import near_dedup_impact

    return near_dedup_impact(load_table(spark, sf_dir, "documents"), k=3)


@register(
    "dedup_cluster_sizes",
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
        sizes AS (SELECT lab, CAST(count(*) AS BIGINT) AS cluster_size
                  FROM cc GROUP BY lab),
        hist AS (SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
                 FROM sizes GROUP BY cluster_size
                 UNION ALL
                 SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT)
                 FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
                 WHERE cc.node IS NULL
                 HAVING count(*) > 0)
        SELECT cluster_size,
               CAST(sum(n_clusters) AS BIGINT) AS n_clusters,
               CAST(cluster_size * sum(n_clusters) AS BIGINT) AS n_docs
        FROM hist GROUP BY cluster_size ORDER BY cluster_size
    """,
    doc="Near-dup cluster-size distribution including singletons — the "
    "standard dedup-analysis figure (giant-cluster mass vs unique tail); "
    "min-label components roll up by label, singletons enter via one "
    "anti-join count, never per-doc materialization",
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.pipeline.graph import cluster_size_histogram

    return cluster_size_histogram(load_table(spark, sf_dir, "documents"), k=3)
