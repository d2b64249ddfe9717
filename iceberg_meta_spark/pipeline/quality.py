"""Corpus-quality kernels: rule-based filtering (Gopher/C4-style), intra-doc
repetition profiling, eval-set contamination detection, temperature-based
domain mixing.

All batch kernels are expression-only (split / array lambdas / md5) —
JVM-side whole-stage codegen, no Python workers. Per-doc work is linear in
document length (the one bounded-quadratic piece, the top-token-frequency
rule, is quadratic in DISTINCT tokens per doc — constant for bounded-length
documents), so everything here is embarrassingly parallel at 10⁹ docs.

Rule thresholds are integer-exact (``5*top_freq <= n`` instead of
``top_freq/n <= 0.2``) so the DuckDB oracles replay bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline.dedup import _word_shingles
from iceberg_meta_spark.pipeline.text import STOPWORDS


def _toks() -> Column:
    return F.split(F.col("text"), " ")


def quality_rule_summary(docs: DataFrame) -> DataFrame:
    """Per-(lang, source) pass rates for four Gopher/C4-style quality rules.

    Rules (mirroring the published Gopher heuristics — token-count window,
    mean-word-length window, stopword presence, most-common-word share —
    restated as integer comparisons):

    - ``r_len``:  20 <= n_tokens <= 400
    - ``r_word``: 2 <= mean token length <= 12  (as 2n <= chars <= 12n)
    - ``r_stop``: >= 2 distinct stopwords present
    - ``r_rep``:  most frequent token <= 20% of tokens (as 5*top <= n)

    Scale: one map-side projection + one groupBy on a tiny key space —
    partial aggregation makes the shuffle a few rows per (lang, source).
    """
    toks = _toks()
    n = F.size(toks).cast("long")
    chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("long")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr)).cast("long")
    top = F.array_max(
        F.transform(F.array_distinct(toks), lambda u: F.size(F.filter(toks, lambda v: v == u)))
    ).cast("long")
    r_len = (n >= 20) & (n <= 400)
    r_word = (chars >= 2 * n) & (chars <= 12 * n)
    r_stop = n_stop >= 2
    r_rep = top * 5 <= n
    per = docs.select(
        "lang",
        "source",
        r_len.alias("r_len"),
        r_word.alias("r_word"),
        r_stop.alias("r_stop"),
        r_rep.alias("r_rep"),
        (r_len & r_word & r_stop & r_rep).alias("r_all"),
    )
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("long")  # noqa: E731
    return per.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        cnt("r_len").alias("n_len_ok"),
        cnt("r_word").alias("n_word_ok"),
        cnt("r_stop").alias("n_stop_ok"),
        cnt("r_rep").alias("n_rep_ok"),
        cnt("r_all").alias("n_pass"),
        F.round(cnt("r_all").cast("double") / F.count(F.lit(1)), 4).alias("pass_rate"),
    )


def repetition_profile(docs: DataFrame) -> DataFrame:
    """Per-doc intra-document repetition: duplicate-token and duplicate-bigram
    ratios plus a ``repetitive`` flag (bigram distinct share < 70%).

    The standard "repetitious document" pre-training filter (Gopher's
    duplicate-line/n-gram family), restated over whitespace tokens. Pure
    map-side — bigrams are built with ``transform(sequence(...))`` inside the
    row, no explode, no shuffle at all.
    """
    toks = _toks()
    n = F.size(toks).cast("long")
    nd = F.size(F.array_distinct(toks)).cast("long")
    # slice(toks, 1, 0) = typed empty array<string>; sequence() must be
    # guarded because Spark's sequence(1, n-1) DESCENDS when n-1 < 1.
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.slice(toks, 1, 0))
    base = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        nd.alias("n_distinct_tokens"),
        F.size(bigrams).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).cast("long").alias("n_distinct_bigrams"),
    )
    dup_tok = F.round(F.lit(1.0) - F.col("n_distinct_tokens") / F.col("n_tokens"), 4)
    dup_bg = F.when(F.col("n_bigrams") == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - F.col("n_distinct_bigrams") / F.col("n_bigrams"), 4)
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        dup_tok.alias("dup_token_ratio"),
        "n_bigrams",
        "n_distinct_bigrams",
        dup_bg.alias("dup_bigram_ratio"),
        (
            (F.col("n_bigrams") > 0)
            & (F.col("n_distinct_bigrams") * 10 < F.col("n_bigrams") * 7)
        ).alias("repetitive"),
    )


EVAL_HEX = "18"  # md5 hex-prefix threshold: ~9.4% of docs become the eval set


def contamination_flags(docs: DataFrame, shingle_k: int = 3) -> DataFrame:
    """Train/eval contamination: per TRAIN doc, the share of its distinct
    ``shingle_k``-gram shingles that appear anywhere in the EVAL split.

    The eval split is the deterministic md5 hex-prefix sample
    (``md5('eval:' || doc_id) < '18'``, ~9.4%) — the same cross-engine
    sampling trick as :mod:`iceberg_meta_spark.pipeline.sampling`, so the
    oracle selects the identical split. ``contaminated`` = >= 50% overlap
    (``2*hits >= n_grams``, integer-exact).

    Scale: the eval n-gram set is a tiny fraction of the corpus — it is
    DISTINCT-ed and **broadcast**, so the train side never shuffles: scan ->
    explode shingles -> broadcast-semijoin -> partial-agg count per doc. This
    is the shape decontamination runs at 100 TB (eval benches are MBs).
    """
    is_eval = (
        F.substring(F.md5(F.concat(F.lit("eval:"), F.col("doc_id").cast("string"))), 1, 2)
        < EVAL_HEX
    )
    tag = docs.select("doc_id", is_eval.alias("__eval"))
    sh = _word_shingles(docs, shingle_k).join(tag, "doc_id")
    eval_grams = sh.filter(F.col("__eval")).select("shingle").distinct()
    train = sh.filter(~F.col("__eval")).select("doc_id", "shingle")
    sizes = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        train.join(F.broadcast(eval_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    out = sizes.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
    )
    return out.select(
        "doc_id",
        "n_grams",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_grams"), 4).alias("contamination"),
        (F.col("n_hits") * 2 >= F.col("n_grams")).alias("contaminated"),
    )


def domain_mix_temperature(docs: DataFrame, budget: int = 100_000) -> DataFrame:
    """Temperature-weighted (alpha = 0.5) domain-mixing rates per
    (lang, source): ``rate_i ∝ sqrt(n_i)`` — the standard multinomial
    temperature-sampling used to up-weight small domains when composing a
    training mix — plus the integer doc allocation out of ``budget``.

    Exactness: weights are ``floor(sqrt(n) * 1e6)`` BIGINTs (IEEE sqrt is
    correctly rounded, so floor-scaling is engine-identical) and the
    allocation is pure integer arithmetic — no float-sum ordering hazards.

    Scale: groupBy on the tiny domain key, then a broadcast of the 1-row
    total back onto the per-domain rows — same shape as partition_skew (A4);
    no window, no second shuffle.
    """
    counts = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_docs"))
    weighted = counts.withColumn(
        "w", F.floor(F.sqrt(F.col("n_docs")) * F.lit(1_000_000.0)).cast("long")
    )
    tot = weighted.agg(
        F.sum("n_docs").alias("total_docs"), F.sum("w").alias("total_w")
    )
    return weighted.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        F.round(F.col("n_docs") / F.col("total_docs"), 4).alias("raw_share"),
        F.round(F.col("w") / F.col("total_w"), 4).alias("mix_rate"),
        # integer DIV, not float /: budget*w can exceed exact-double range at
        # real corpus sizes and the oracle must replay bit-identically.
        F.expr(f"CAST(({int(budget)} * w) DIV total_w AS BIGINT)").alias("alloc_docs"),
    )


def adaptive_quality_buckets(docs: DataFrame) -> DataFrame:
    """CCNet-style head/middle/tail bucketing with CORPUS-ADAPTIVE
    per-language thresholds: instead of fixed rule constants, each
    language's quality cutoffs are its own exact p25/p75 of a quality
    score (stopword density, integer-scaled), and every document lands in
    head (>= p75), middle, or tail (< p25) — the bucketing CCNet applies
    to perplexity before keeping head+middle for training.

    Determinism across engines: the score is floor-scaled to a BIGINT
    (``floor(1e4 * stopwords / tokens)``), and the quantile probes are
    DYADIC (0.25/0.75) so the linear interpolation ``a + (b-a)*g`` is an
    exact binary fraction — Spark's percentile() and DuckDB's
    quantile_cont() produce bit-identical doubles, making the >=/<
    bucket comparisons hash-stable (thirds would differ in the last ulp).

    Scale: one scan computes scores map-side; per-language boundaries are a
    tiny aggregate broadcast back over the scored frame; the bucket CASE is
    map-side. The exact per-group percentile is the documented sort-buffer
    cliff — at >10⁸ docs/language swap in percentile_approx boundaries (the
    file-health twin pattern); bucket semantics are unchanged.
    """
    toks = _toks()
    n_tokens = F.size(toks).cast("long")
    # occurrence count (not distinct-present): same integer in any engine
    stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    score = F.when(n_tokens == 0, F.lit(0)).otherwise(
        F.floor(F.lit(10_000) * stop.cast("long") / n_tokens)
    ).cast("long")
    scored = docs.select("doc_id", "lang", score.alias("q_score"))
    bounds = scored.groupBy("lang").agg(
        F.percentile("q_score", [0.25, 0.75]).alias("qs")
    ).select(
        "lang", F.col("qs")[0].alias("p25"), F.col("qs")[1].alias("p75")
    )
    bucket = (
        F.when(F.col("q_score") >= F.col("p75"), F.lit("head"))
        .when(F.col("q_score") < F.col("p25"), F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return (
        scored.join(F.broadcast(bounds), "lang")
        .select("lang", bucket.alias("bucket"), "q_score")
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("q_score").alias("min_score"),
            F.max("q_score").alias("max_score"),
        )
        .orderBy("lang", "bucket")
    )


def embedding_drift(emb: DataFrame, threshold: float = 0.995, dims: int = 64) -> DataFrame:
    """Per-label embedding distribution-shift monitor: cosine between the
    label's centroid in two id-interleaved cohorts (vec_id parity stands in
    for the reference/current snapshot split a deployment would feed — e.g.
    last week's embeddings vs this week's).

    Training/serving skew shows up as centroid drift long before accuracy
    metrics move; this is the monitoring query a feature-store pipeline runs
    per model input. Integer-exact: centroids are per-cohort means of
    1e6-quantized components (the kmeans convention), the cosine comes from
    floor-scaled exact dots — hash-gated like every other kernel.

    Scale: one map-side-combined groupBy (2 rows per label through the
    shuffle), then a label self-join of the tiny centroid table. Returns
    (label, n_ref, n_cur, centroid_cos, drifted).
    """
    from iceberg_meta_spark.pipeline.similarity import scaled_dot

    q = F.transform(
        F.col("embedding"), lambda x: F.floor(x.cast("double") * 1_000_000).cast("long")
    )
    g = (
        emb.select("label", (F.col("vec_id") % 2).alias("cohort"), q.alias("qv"))
        .groupBy("label", "cohort")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at("qv", i + 1)).alias(f"s{i}") for i in range(dims)],
        )
        .select(
            "label",
            "cohort",
            "n",
            F.array(*[F.expr(f"CAST(s{i} DIV n AS BIGINT)") for i in range(dims)]).alias("c"),
        )
    )
    dq = lambda col: F.transform(col, lambda x: x.cast("double") / 1_000_000)  # noqa: E731
    a = g.filter(F.col("cohort") == 0).select(
        "label", F.col("n").alias("n_ref"), F.col("c").alias("c0")
    )
    b = g.filter(F.col("cohort") == 1).select(
        "label", F.col("n").alias("n_cur"), F.col("c").alias("c1")
    )
    dot = scaled_dot(dq(F.col("c0")), dq(F.col("c1"))).cast("double")
    n0 = scaled_dot(dq(F.col("c0")), dq(F.col("c0"))).cast("double")
    n1 = scaled_dot(dq(F.col("c1")), dq(F.col("c1"))).cast("double")
    cos = dot / (F.sqrt(n0) * F.sqrt(n1))
    return (
        a.join(b, "label")
        .select(
            "label",
            "n_ref",
            "n_cur",
            F.round(cos, 6).alias("centroid_cos"),
            (cos < threshold).alias("drifted"),
        )
        .orderBy("label")
    )


def weak_label_votes(docs: DataFrame) -> DataFrame:
    """Weak supervision (Snorkel shape): several cheap labeling functions
    vote per document; the aggregate emits the majority label, an integer
    confidence, and the disagreement rank an active-learning loop samples
    from. Three LFs here label "keep for training" (+1) / "drop" (-1) /
    abstain (0):

    - LF1 stopword density: >= 8% of tokens are stopwords -> keep; zero
      stopwords in a >= 5-token doc -> drop; else abstain.
    - LF2 length: >= 30 tokens -> keep; < 8 -> drop; else abstain.
    - LF3 uppercase-start share: docs where > half the tokens start
      uppercase (shouting/boilerplate) -> drop; abstains otherwise.

    Majority vote over non-abstaining LFs; ties and all-abstain ->
    'abstain'. ``n_disagree`` counts minority votes — the docs worth a
    human label first. Everything is one map-side expression pass plus one
    shrinking aggregate per (label, n_votes) for the summary-free variant;
    here we emit per-doc rows (the artifact a labeling pipeline joins on).
    """
    toks = _toks()
    n = F.size(toks).cast("long")
    stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("long")
    upper = F.size(
        F.filter(toks, lambda x: (F.length(x) > 0) & (x.substr(1, 1) == F.upper(x.substr(1, 1))) & ~x.substr(1, 1).rlike("[0-9]"))
    ).cast("long")
    lf1 = (
        F.when(n == 0, F.lit(0))
        .when(stop * 100 >= n * 8, F.lit(1))
        .when((stop == 0) & (n >= 5), F.lit(-1))
        .otherwise(F.lit(0))
    )
    lf2 = F.when(n >= 30, F.lit(1)).when(n < 8, F.lit(-1)).otherwise(F.lit(0))
    lf3 = F.when((n > 0) & (upper * 2 > n), F.lit(-1)).otherwise(F.lit(0))
    base = docs.select(
        "doc_id", "lang", lf1.alias("lf1"), lf2.alias("lf2"), lf3.alias("lf3")
    )
    total = F.col("lf1") + F.col("lf2") + F.col("lf3")
    n_votes = (
        F.abs(F.col("lf1")) + F.abs(F.col("lf2")) + F.abs(F.col("lf3"))
    ).cast("long")
    label = (
        F.when(total > 0, F.lit("keep"))
        .when(total < 0, F.lit("drop"))
        .otherwise(F.lit("abstain"))
    )
    # minority votes = votes cast against the majority sign
    n_disagree = F.when(
        total != 0, (n_votes - F.abs(total)) / 2
    ).otherwise(n_votes / 2).cast("long")
    return base.select(
        "doc_id", "lang", "lf1", "lf2", "lf3",
        label.alias("label"),
        n_votes.alias("n_votes"),
        n_disagree.alias("n_disagree"),
    ).orderBy("doc_id")
