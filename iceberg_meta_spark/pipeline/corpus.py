"""Corpus-level statistics kernels: top n-grams, vocabulary profiles,
unigram-rarity document scoring (the CCNet-style "rare-token-heavy docs are
noise" filter, restated exactly), and PII detection/redaction.

Everything is expression-only or explode→partial-agg; the one broadcast is
the capped vocabulary table (top-V by count), which is how a rarity scorer
deploys at 100 TB — the vocab is MBs while the corpus is not.

Exactness: all scores are floor-scaled BIGINT arithmetic (`(cnt * SCALE) DIV
total`) so the DuckDB oracles replay bit-identically — no float-sum ordering
hazards, no platform log() divergence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

COMMONNESS_SCALE = 1_000_000_000  # token weight = (count * SCALE) DIV total


def _toks() -> Column:
    return F.split(F.col("text"), " ")


def _ngrams(toks: Column, n: int) -> Column:
    """In-row n-gram array via transform(sequence(...)) — no explode until
    the caller decides to; sequence() is guarded because Spark's
    sequence(1, x) DESCENDS when x < 1."""
    joined = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + off) for off in range(n)]
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), joined),
    ).otherwise(F.slice(toks, 1, 0))


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-wide top-``k`` ``n``-grams by occurrence count (ties broken by
    ngram text ascending — deterministic cross-engine).

    Scale: explode is unavoidable for corpus-level counting, but partial
    aggregation combines within each task before the shuffle, so the wire
    carries one row per (task, distinct-ngram) — and the final top-k is a
    TakeOrdered, never a global sort materialization.
    """
    grams = docs.select(F.explode(_ngrams(_toks(), n)).alias("ngram"))
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.col("occurrences").desc(), F.col("ngram"))
        .limit(k)
    )


def vocabulary_stats(docs: DataFrame) -> DataFrame:
    """Per-(lang, source) vocabulary profile: total tokens, vocabulary size,
    hapax count (tokens occurring exactly once in the domain), and the
    type-token ratio.

    Scale: two shuffles, both shrinking — explode→groupBy(domain, token)
    combines map-side to one row per distinct (domain, token); the second
    groupBy reduces to one row per domain.
    """
    tok = docs.select("lang", "source", F.explode(_toks()).alias("token"))
    per_token = tok.groupBy("lang", "source", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_token.groupBy("lang", "source").agg(
        F.sum("cnt").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).cast("long").alias("hapax_count"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("cnt"), 4).alias("type_token_ratio"),
    )


def token_rarity_scores(docs: DataFrame, vocab_cap: int = 65536) -> DataFrame:
    """Per-doc unigram commonness score — the CCNet-perplexity filter shape
    with integer-exact arithmetic instead of a platform-dependent log().

    Each token's weight is its floor-scaled corpus probability
    ``(count * 1e9) DIV total`` over the top-``vocab_cap`` vocabulary
    (OOV → 0). A document's ``mean_commonness`` is the integer mean of its
    token weights; ``rare_heavy`` flags docs whose mean is below half the
    corpus-wide expected weight — the docs a perplexity filter drops.

    Scale: the capped vocab (count desc, token asc) is MBs and is
    **broadcast** onto the exploded tokens; the only real shuffle is the
    per-doc re-aggregation (one row per doc after map-side combine). The
    corpus expectation is a 1-row aggregate broadcast back (A4's shape).
    """
    tok = docs.select("doc_id", F.explode(_toks()).alias("token"))
    # materialize the distinct-token count table ONCE (an index-build step:
    # it feeds the vocab cap, the corpus total, and the expected weight —
    # without this the corpus would be re-tokenized for each consumer)
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(eager=False)
    # the capped vocab is consumed TWICE (the scoring broadcast and the
    # corpus expectation) — checkpoint the <= vocab_cap rows so the
    # TakeOrdered top-k (a per-partition heap + driver merge) runs once,
    # not once per consumer
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(vocab_cap)
        .crossJoin(F.broadcast(counts.agg(F.sum("cnt").alias("total"))))
        .select(
            "token",
            F.expr(f"CAST((cnt * {COMMONNESS_SCALE}) DIV total AS BIGINT)").alias("w"),
            "cnt",
        )
        .localCheckpoint(eager=False)
    )
    scored = (
        tok.join(F.broadcast(vocab.select("token", "w")), "token", "left")
        .select("doc_id", F.coalesce(F.col("w"), F.lit(0).cast("long")).alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("CAST(sum(w) DIV count(1) AS BIGINT)").alias("mean_commonness"),
            F.min("w").alias("min_commonness"),
        )
    )
    # corpus-wide expected weight = sum(cnt * w) DIV sum(cnt) over the vocab
    expected = vocab.agg(
        F.expr("CAST(sum(cnt * w) DIV sum(cnt) AS BIGINT)").alias("expected_w")
    )
    return scored.crossJoin(F.broadcast(expected)).select(
        "doc_id",
        "n_tokens",
        "mean_commonness",
        "min_commonness",
        (F.col("mean_commonness") * 2 < F.col("expected_w")).alias("rare_heavy"),
    )


def duplicated_ngram_share(
    docs: DataFrame, n: int = 8, min_docs: int = 2, k: int = 100
) -> DataFrame:
    """Exact substring-duplication score: per document, how many of its
    ``n``-gram positions are covered by an n-gram that also occurs in at
    least ``min_docs`` distinct documents (the "Deduplicating Training Data
    Makes Language Models Better" exact-substring signal, at n-gram
    granularity instead of suffix arrays).

    Scale: one groupBy on (gram, doc_id) with map-side combine collapses
    every repeated position before the shuffle; the duplicated-gram set is a
    second, strictly shrinking aggregate, and re-attachment is an equi-join
    on the gram key (AQE broadcasts it when the dup set is small — the usual
    case). Never an all-pairs doc comparison.
    """
    toks = _toks()
    base = docs.select(
        "doc_id",
        F.greatest(F.size(toks) - (n - 1), F.lit(0)).cast("long").alias("n_grams"),
    )
    grams = docs.select("doc_id", F.explode(_ngrams(toks, n)).alias("gram"))
    per_gram_doc = grams.groupBy("gram", "doc_id").agg(
        F.count(F.lit(1)).alias("pos_cnt")
    )
    dup_grams = (
        per_gram_doc.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gram")
    )
    per_doc = (
        per_gram_doc.join(dup_grams, "gram")
        .groupBy("doc_id")
        .agg(F.sum("pos_cnt").cast("long").alias("dup_grams"))
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("dup_grams"), F.lit(0).cast("long")).alias("dup_grams"),
        )
        .withColumn(
            "dup_permille",
            F.when(
                F.col("n_grams") > 0,
                F.expr("CAST((dup_grams * 1000) DIV n_grams AS BIGINT)"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .orderBy(F.col("dup_permille").desc(), F.col("doc_id"))
        .limit(k)
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9][0-9 -]{7,}[0-9]"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Per-doc PII detection + redaction: email / IPv4 / intl-phone counts
    and the md5 of the redacted text (emails→``<EMAIL>``, IPs→``<IP>``,
    phones→``<PHONE>``, applied in that order).

    Patterns are deliberately restricted to constructs with identical
    semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
    bounded repetition, ``\\b``, a leading literal ``+`` — no backtracking-
    dependent alternation. Pure map-side; zero shuffle.
    """
    n_email = F.regexp_count(F.col("text"), F.lit(PII_EMAIL))
    n_ip = F.regexp_count(F.col("text"), F.lit(PII_IPV4))
    n_phone = F.regexp_count(F.col("text"), F.lit(PII_PHONE))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ips"),
        n_phone.cast("long").alias("n_phones"),
        (n_email + n_ip + n_phone).cast("long").alias("n_redactions"),
        F.md5(redacted).alias("redacted_md5"),
    )


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...],
    k1: str = "1.2",
    b: str = "0.75",
    topk: int = 25,
) -> DataFrame:
    """BM25 retrieval scores for a fixed query-term set, top-``topk`` docs.

    The inverted-index shape restated as three aggregates:

    - per-(doc, term) tf for the query terms only (the filter reaches the
      scan — the corpus never materializes non-query tokens);
    - per-term document frequency (≤ |terms| rows, broadcast);
    - a 1-row corpus aggregate (doc count + total tokens → avgdl),
      broadcast.

    Scoring uses the "raw odds" IDF ``(N - df + 0.5) / (df + 0.5)`` rather
    than its logarithm: log() is the one libm-dependent op that breaks
    cross-engine hash gates, and since log is monotone the per-term ranking
    is unchanged (documented deviation; rankings, not absolute scores, are
    the contract). Per-term contributions are floor-scaled to BIGINT before
    the per-doc sum, so the only float ops are per-row IEEE arithmetic on
    exact integers — bit-identical in any engine.

    ``k1``/``b`` are passed as SQL literal TEXT so Spark and the oracle
    parse the identical decimal into the identical double.
    """
    toks = docs.select(
        "doc_id",
        F.size(_toks()).cast("long").alias("dl"),
        F.explode(_toks()).alias("token"),
    )
    corpus = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_toks()).cast("long")).alias("total_tokens"),
    )
    hits = toks.filter(F.col("token").isin(*terms))
    tf = hits.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    dfreq = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "si",
            F.expr(
                f"CAST(floor(((n_docs - df + 0.5) / (df + 0.5))"
                f" * ((tf * ({k1} + 1)) / (tf + {k1} * (1 - {b} + {b} * dl / (total_tokens / n_docs))))"
                f" * 1000000) AS BIGINT)"
            ),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("si").alias("score_scaled"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
        .orderBy(F.desc("score_scaled"), "doc_id")
        .limit(topk)
    )


def lm_familiarity_scores(docs: DataFrame, vocab_cap: int = 65536) -> DataFrame:
    """Per-doc bigram language-model familiarity — the CCNet LM-perplexity
    filter restated with integer-exact arithmetic instead of a platform log().

    A tiny bigram LM is "trained" on the corpus itself: each bigram's weight
    is its floor-scaled conditional probability
    ``(cnt(w1 w2) * 1e9) DIV cnt(w1 ·)`` (how often w1 is followed by w2,
    among all bigrams starting with w1). The model keeps the top-``vocab_cap``
    bigrams (count desc, bigram asc); everything else scores 0, exactly how a
    pruned n-gram LM backs off to an OOV floor. A document's
    ``mean_familiarity`` is the integer mean of its bigram weights;
    ``low_familiarity`` flags docs below half the corpus-wide expectation —
    the docs a perplexity filter drops (boilerplate, wrong-language, garbled).

    Scale: the bigram count table is materialized once (index build), the
    capped model is MBs and **broadcast** onto the exploded bigrams; the only
    corpus-sized shuffle is the per-doc re-aggregation (one row per doc after
    map-side combine). Docs with fewer than two tokens have no bigrams and
    drop out (identically in the oracle's empty generate_series).
    """
    bg = docs.select("doc_id", F.explode(_ngrams(_toks(), 2)).alias("bigram"))
    # index-build step: one tokenize+count pass feeds prefix totals, the
    # capped model, and the corpus expectation
    counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(eager=False)
    prefix = counts.groupBy(
        F.substring_index("bigram", " ", 1).alias("w1")
    ).agg(F.sum("cnt").alias("ptot"))
    capped = (
        counts.orderBy(F.col("cnt").desc(), F.col("bigram"))
        .limit(vocab_cap)
        .withColumn("w1", F.substring_index("bigram", " ", 1))
    )
    # the capped model is consumed TWICE (the scoring broadcast and the
    # corpus expectation) — checkpoint the <= vocab_cap rows so the
    # TakeOrdered top-k (per-partition heaps + a driver merge of
    # partitions × cap rows) and the prefix-total join run once, not twice
    model = (
        prefix.join(F.broadcast(capped), "w1")
        .select(
            "bigram",
            F.expr(f"CAST((cnt * {COMMONNESS_SCALE}) DIV ptot AS BIGINT)").alias("w"),
            "cnt",
        )
        .localCheckpoint(eager=False)
    )
    scored = (
        bg.join(F.broadcast(model.select("bigram", "w")), "bigram", "left")
        .select("doc_id", F.coalesce(F.col("w"), F.lit(0).cast("long")).alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("CAST(sum(w) DIV count(1) AS BIGINT)").alias("mean_familiarity"),
        )
    )
    expected = model.agg(
        F.expr("CAST(sum(cnt * w) DIV sum(cnt) AS BIGINT)").alias("expected_w")
    )
    return scored.crossJoin(F.broadcast(expected)).select(
        "doc_id",
        "n_bigrams",
        "mean_familiarity",
        (F.col("mean_familiarity") * 2 < F.col("expected_w")).alias("low_familiarity"),
    )


def hybrid_retrieval(
    docs: DataFrame,
    emb: DataFrame,
    terms: tuple[str, ...],
    query_vec_id: int = 7,
    topk_bm25: int = 25,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid search: BM25 candidate generation → embedding-cosine rerank →
    reciprocal-rank fusion. The standard two-stage retrieval pipeline (RAG
    retrievers, candidate generation for rerankers) composed from the BM25
    and similarity kernels.

    Stage 1 narrows the corpus to ``topk_bm25`` keyword candidates (BM25's
    scale posture: query-term filter at the scan, broadcast df/corpus
    aggregates). Stage 2 touches ONLY the candidates: they broadcast into
    the embeddings scan (a 10⁹-vector table is filtered by a ≤topk hash
    join, never scanned into a shuffle), cosine against the single query
    vector, then RRF with integer arithmetic:
    ``rrf = (1e6 DIV (rrf_k + bm25_rank)) + (1e6 DIV (rrf_k + cos_rank))``
    — deterministic cross-engine, no float fusion weights.

    Candidates without an embedding row drop out (they cannot be reranked).
    All windows run over ≤ topk_bm25 rows — bounded by construction.
    """
    from pyspark.sql import Window

    from iceberg_meta_spark.pipeline.similarity import scaled_dot, with_self_norm

    cands = bm25_scores(docs, terms, topk=topk_bm25).withColumn(
        "bm25_rank",
        F.row_number().over(Window.orderBy(F.desc("score_scaled"), F.asc("doc_id"))),
    )
    base = with_self_norm(emb)
    qv = base.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb"), F.col("norm_s").alias("q_norm")
    )
    reranked = (
        base.join(F.broadcast(cands), base["vec_id"] == cands["doc_id"])
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "bm25_rank",
            "score_scaled",
            (
                scaled_dot(F.col("embedding"), F.col("q_emb")).cast("double")
                / (
                    F.sqrt(F.col("norm_s").cast("double"))
                    * F.sqrt(F.col("q_norm").cast("double"))
                )
            ).alias("cos"),
        )
        .withColumn(
            "cos_rank",
            F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("doc_id"))),
        )
    )
    scale = 1_000_000
    fused = reranked.select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        F.expr(f"CAST({scale} DIV ({rrf_k} + bm25_rank) + {scale} DIV ({rrf_k} + cos_rank) AS BIGINT)").alias(
            "rrf_scaled"
        ),
    )
    return (
        fused.orderBy(F.desc("rrf_scaled"), F.asc("doc_id"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("rrf_scaled"), F.asc("doc_id"))),
        )
        .select("rank", "doc_id", "bm25_rank", "cos_rank", "rrf_scaled")
    )


def longest_dup_span(
    docs: DataFrame, n: int = 8, min_docs: int = 2, k: int = 50
) -> DataFrame:
    """Per document, the LONGEST contiguous span of tokens covered by
    cross-document duplicated ``n``-grams — the "longest duplicate
    substring" signal (suffix-array output of the exact-substring dedup
    paper) at n-gram resolution: a run of L consecutive duplicated n-gram
    positions certifies a duplicated span of ``L + n - 1`` tokens.

    Scale: duplicated-gram detection is the shrinking two-aggregate pipeline
    of :func:`duplicated_ngram_share`; the run-length step is gaps-and-
    islands (pos - row_number) with every window PARTITIONED BY doc_id —
    bounded by document length, never a global funnel.
    """
    from pyspark.sql import Window

    toks = _toks()
    grams = docs.select(
        "doc_id", F.posexplode(_ngrams(toks, n)).alias("pos", "gram")
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gram")
    )
    dup_pos = grams.join(dup_grams, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = dup_pos.withColumn("island", F.col("pos") - F.row_number().over(w))
    runs = islands.groupBy("doc_id", "island").agg(F.count(F.lit(1)).alias("run"))
    return (
        runs.groupBy("doc_id")
        .agg(
            F.sum("run").cast("long").alias("dup_positions"),
            F.max("run").cast("long").alias("longest_run"),
        )
        .withColumn("span_tokens", (F.col("longest_run") + (n - 1)).cast("long"))
        .orderBy(F.col("span_tokens").desc(), "doc_id")
        .limit(k)
    )


def tfidf_keywords(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-doc top-``k`` keywords by tf-idf — fully integer-exact.

    IDF uses the BM25 raw-odds form ``(N - df + 0.5) / (df + 0.5)`` (see
    :func:`bm25_scores`: log() is the one libm-dependent op that breaks
    cross-engine hash gates; log is monotone so per-doc keyword RANKING is
    unchanged), restated over integers: ``score_milli =
    (tf * (2(N-df)+1) * 1000) DIV (2·df+1)`` — no float op anywhere, so
    ties and orderings replay exactly on any engine.

    Scale: tf is one shuffle on (doc, term); document frequency re-groups
    the TF TABLE (distinct pairs, far smaller than token instances), and
    the back-join re-shuffles by term (no broadcast: the rarest terms —
    exactly the keywords — would be the ones a capped-vocab broadcast
    drops). The top-k window partitions by doc_id — parallel per doc,
    never global.
    """
    tok = docs.select("doc_id", F.explode(_toks()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.expr(
                "CAST((tf * (2 * (n_docs - df) + 1) * 1000) DIV (2 * df + 1) AS BIGINT)"
            ).alias("tfidf_milli"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_milli").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "token", "tf", "df", "tfidf_milli")
    )


def distinct_ngrams(docs: DataFrame, n: int = 2, approx: bool = False) -> DataFrame:
    """Distinct n-gram count per language — the vocabulary-growth number a
    corpus report tracks across snapshots (Heaps-law monitoring).

    ``approx=False``: exact count_distinct — one shuffle of distinct
    (lang, ngram) pairs; the oracle-gated twin. ``approx=True``:
    ``approx_count_distinct`` (HLL++, mergeable KB-scale state, map-side
    combined) — the 10^11-ngram path where the exact distinct shuffle IS
    the job; gated against the exact twin's oracle via the registry
    tolerance_twin contract.
    """
    toks = F.split(F.col("text"), " ")
    base = docs.select("lang", toks.alias("t")).withColumn("sz", F.size("t"))
    base = base.filter(F.col("sz") >= n)
    idx = F.explode(F.sequence(F.lit(1), F.col("sz") - (n - 1))).alias("i")
    parts = [F.element_at("t", F.col("i") + j) for j in range(n)]
    grams = base.select("lang", "t", idx).select(
        "lang", F.concat_ws(" ", *parts).alias("ngram")
    )
    counter = (
        F.approx_count_distinct("ngram") if approx else F.countDistinct("ngram")
    )
    return (
        grams.groupBy("lang")
        .agg(counter.cast("long").alias("distinct_ngrams"))
        .orderBy("lang")
    )
