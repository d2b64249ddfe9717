"""Deterministic sampling / data-mixing kernels for training-data pipelines.

Sampling a 100 TB corpus must be (a) reproducible run-to-run and across
engines, (b) map-side — a sample is a FILTER, never a shuffle. Both come
from hashing the stable row key instead of calling a RNG: a row is in the
sample iff the first two hex digits of ``md5(salt ':' key)`` sort below a
threshold. Hex-string comparison is identical in every engine (lowercase
hex both in Spark and DuckDB), giving 1/256 rate granularity with zero
cross-engine drift — the same trick the dedup kernels use for MinHash.

``stratified_sample`` generalizes to per-stratum rates (the data-mixing
primitive: upsample rare languages, downsample crawl dumps) via a literal
CASE on the stratum column — still a narrow transform, still no shuffle.

``with_shuffle_key`` attaches a deterministic global shuffle key
(``md5`` of the row key) — sorting by it is the reproducible
training-order shuffle; the sort is the consumer's choice, not forced here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex2(n_256: int) -> str:
    if not 0 <= n_256 <= 256:
        raise ValueError(f"rate must be in [0, 256]/256ths, got {n_256}")
    return format(n_256, "02x") if n_256 < 256 else "zz"  # 'zz' > any hex pair


def hash_bucket(key: Column, salt: str) -> Column:
    """First two hex digits of md5(salt ':' key): a uniform 1/256 bucket."""
    return F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, 2)


def hash_sample(df: DataFrame, key_col: str, rate_256: int, salt: str = "sample") -> DataFrame:
    """Uniform deterministic sample at rate_256/256 — a pure filter."""
    return df.filter(hash_bucket(F.col(key_col), salt) < F.lit(_hex2(rate_256)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates_256: dict[str, int],
    default_256: int = 0,
    salt: str = "mix",
) -> DataFrame:
    """Per-stratum deterministic sampling (the data-mixing primitive).

    ``rates_256`` maps stratum value -> rate in 256ths; strata not listed
    get ``default_256``. Compiles to one CASE expression over literals —
    map-side, no shuffle, no RNG, reproducible on any engine and any
    partitioning of the input.
    """
    thresh = F.lit(_hex2(default_256))
    for value, n in rates_256.items():
        thresh = F.when(F.col(stratum_col) == value, F.lit(_hex2(n))).otherwise(thresh)
    return df.filter(hash_bucket(F.col(key_col), salt) < thresh)


def with_shuffle_key(df: DataFrame, key_col: str, salt: str = "shuffle") -> DataFrame:
    """Deterministic training-order shuffle key (sort by it to interleave)."""
    return df.withColumn(
        "shuffle_key", F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    )


def pps_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    stratum_col: str,
    k: int,
    salt: str = "pps",
) -> DataFrame:
    """Systematic probability-proportional-to-size sample: ~``k`` rows per
    stratum, each row's inclusion probability ∝ its integer weight.

    The deterministic restatement of weighted reservoir sampling: order the
    stratum by ``md5(salt:key)`` (a reproducible uniform shuffle), take the
    running weight sum, and keep every row whose cumulative span crosses a
    multiple of ``total_weight / k`` — classic systematic PPS, but with the
    random start/ordering replaced by hashing so any engine and any
    partitioning selects the same rows.

    One window shuffle keyed by stratum computes both the running and the
    stratum-total sums; selection is then a pure filter. Integer weights
    keep every comparison exact (no float-sum ordering hazards).
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    part = Window.partitionBy(stratum_col)
    run = part.orderBy(h.asc(), F.col(key_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w = F.col(weight_col).cast("long")
    out = (
        df.withColumn("__cum", F.sum(w).over(run))
        .withColumn("__tot", F.sum(w).over(part))
        .withColumn("__step", F.greatest(F.expr(f"__tot DIV {int(k)}"), F.lit(1)))
        .filter(F.expr("(__cum - CAST(" + weight_col + " AS BIGINT)) DIV __step < __cum DIV __step"))
    )
    return out.select(
        stratum_col,
        key_col,
        w.alias("weight"),
        F.col("__cum").alias("cum_weight"),
    )


def dsir_importance(
    docs: DataFrame,
    target_lang: str = "en",
    buckets: int = 1024,
    scale: int = 1_000_000,
) -> DataFrame:
    """DSIR-shaped importance weights (Xie et al. 2023, "Data Selection via
    Importance Resampling"): score every raw document by how much its hashed
    n-gram feature distribution looks like a TARGET domain's, so the corpus
    can be resampled toward the target without training a classifier.

    Features are hashed bigrams (md5 → ``buckets`` buckets, the paper's
    hashed n-gram space); the target here is the ``target_lang`` slice of
    the corpus itself (any doc predicate works the same way).  Per bucket,
    the importance ratio is add-1-smoothed ``(target_count+1)/(raw_count+1)``
    floor-scaled to BIGINT; a document's importance is the integer mean of
    the ratio over its bigram OCCURRENCES.  The paper sums per-feature
    LOG-ratios — a platform ``log()`` would break cross-engine hash parity,
    so the scaled linear ratio stands in: per-feature monotone, same
    keep/drop ordering for the resampling step, integer-exact everywhere.

    Scale: the bucket tables are ``buckets`` rows built by one map-side-
    combined aggregate each (the raw pass also counts the target slice —
    one corpus scan total); the ratio table is KBs and **broadcast** onto
    the exploded bigram stream; the only corpus-sized shuffle is the
    per-doc mean (map-side combine, one row per doc on the wire).
    """
    toks = F.split(F.col("text"), " ")
    base = docs.select("doc_id", "lang", toks.alias("t")).filter(F.size("t") >= 2)
    idx = F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i")
    bigram = F.concat_ws(
        " ", F.element_at("t", F.col("i")), F.element_at("t", F.col("i") + 1)
    )
    bucket = (
        F.conv(F.substring(F.md5(bigram), 1, 3), 16, 10).cast("long") % buckets
    ).alias("bucket")
    # the hashed-feature stream feeds BOTH the bucket census and the
    # scoring join — lazy checkpoint so the explode+md5 pipeline runs once
    # (§3.3; same materialize-before-reuse trade as the minhash kernels)
    bk = base.select("doc_id", "lang", "t", idx).select(
        "doc_id", "lang", bucket
    ).localCheckpoint(eager=False)
    freqs = bk.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rc"),
        F.sum(F.when(F.col("lang") == target_lang, 1).otherwise(0)).alias("tc"),
    )
    ratio = freqs.select(
        "bucket", F.expr(f"CAST(((tc + 1) * {scale}) DIV (rc + 1) AS BIGINT)").alias("r")
    )
    return (
        bk.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.expr("CAST(sum(r) DIV count(1) AS BIGINT)").alias("importance"),
        )
        .orderBy("doc_id")
    )


def token_budget_mix(
    docs: DataFrame,
    budget_tokens: int,
    bucket_micro: int = 50_000,
) -> DataFrame:
    """Quality-first selection under a per-language token budget — the
    data-mixing question a training run actually asks ("give me the best
    ~B tokens per language"), answered the way it must be answered at
    100 TB: by a SCORE THRESHOLD computed from a histogram, not a global
    per-language sort.

    The naive form ranks every document per language and takes the prefix
    cumulative-sum — a per-language global window, and language cardinality
    is tiny, so at corpus scale that funnels everything through a handful
    of tasks. Instead:

    1. map-side: per-doc token count + frozen-classifier quality score,
       bucketed at ``bucket_micro`` granularity (shifted positive so both
       engines floor identically);
    2. ONE shrinking aggregate to (lang, bucket) token/doc sums — the
       histogram, bounded by langs x buckets regardless of corpus size;
    3. a descending running sum over each language's <= few-hundred
       buckets (window over the HISTOGRAM, not the corpus) finds the
       highest-quality bucket prefix fitting the budget;
    4. the per-language threshold broadcasts back; membership is a
       map-side comparison.

    Selection granularity is the bucket: the kept set can overshoot the
    budget by at most one bucket's tokens (the trade that removes the
    global sort; shrink ``bucket_micro`` to tighten). Returns per-language
    (thr_bucket, n_docs_kept, tokens_kept, tokens_total, fill_permille),
    ordered by lang.
    """
    from iceberg_meta_spark.pipeline.classifier import _feature_cols, score_expr

    scored = (
        docs.select("doc_id", "lang", *_feature_cols())
        .withColumn("score_micro", score_expr())
        .select(
            "lang",
            F.col("f1").alias("n_tokens"),
            # shift far past any reachable score so the bucket index is
            # positive in both engines (DIV vs // disagree below zero)
            F.expr(f"(score_micro + 10000000) DIV {bucket_micro}").alias("bucket"),
        )
    )
    hist = scored.groupBy("lang", "bucket").agg(
        F.sum("n_tokens").cast("long").alias("tok"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    from pyspark.sql import Window

    desc = (
        Window.partitionBy("lang")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum_tok", F.sum("tok").over(desc))
    thr = (
        cum.where(F.col("cum_tok") - F.col("tok") < budget_tokens)
        .groupBy("lang")
        .agg(F.min("bucket").alias("thr_bucket"))
    )
    totals = hist.groupBy("lang").agg(F.sum("tok").cast("long").alias("tokens_total"))
    kept = (
        hist.join(F.broadcast(thr), "lang")
        .where(F.col("bucket") >= F.col("thr_bucket"))
        .groupBy("lang", "thr_bucket")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs_kept"),
            F.sum("tok").cast("long").alias("tokens_kept"),
        )
    )
    return (
        kept.join(totals, "lang")
        .select(
            "lang",
            "thr_bucket",
            "n_docs_kept",
            "tokens_kept",
            "tokens_total",
            F.expr(f"tokens_kept * 1000 DIV {budget_tokens}").alias("fill_permille"),
        )
        .orderBy("lang")
    )


def score_percentiles(docs: DataFrame, bucket_micro: int = 50_000) -> DataFrame:
    """Corpus-relative score normalization — each document's frozen-
    classifier score as a permille percentile of the whole corpus — the
    threshold-free companion of :func:`token_budget_mix` (mix recipes and
    curricula want "top 10% quality" to mean the same thing across
    corpora whose raw score ranges differ).

    The 100 TB shape: a global ``percent_rank`` window is a single-
    partition sort of the corpus. Instead the CDF is computed on the
    BOUNDED score histogram: map-side bucketing, ONE shrinking aggregate
    to bucket counts, an ascending running sum over the few-hundred-row
    bucket table, and a broadcast join back. Documents in the same bucket
    share a percentile (the strictly-below-bucket mass) — the documented
    granularity trade, tightened by shrinking ``bucket_micro``; the
    approximation is DETERMINISTIC, so the DuckDB oracle hash-gates it
    exactly.
    """
    from pyspark.sql import Window

    from iceberg_meta_spark.pipeline.classifier import _feature_cols, score_expr

    scored = (
        docs.select("doc_id", "lang", *_feature_cols())
        .withColumn("score_micro", score_expr())
        .select(
            "doc_id",
            "lang",
            "score_micro",
            F.expr(f"(score_micro + 10000000) DIV {int(bucket_micro)}").alias(
                "bucket"
            ),
        )
    )
    hist = scored.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    asc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    cdf = hist.select(
        "bucket",
        F.coalesce(F.sum("n_docs").over(asc), F.lit(0)).alias("n_below"),
    ).crossJoin(F.broadcast(hist.agg(F.sum("n_docs").alias("n_total"))))
    return (
        scored.join(F.broadcast(cdf), "bucket")
        .select(
            "doc_id",
            "lang",
            "score_micro",
            F.expr("CAST(n_below * 1000 DIV n_total AS BIGINT)").alias(
                "pct_permille"
            ),
        )
        .orderBy("doc_id")
    )


def shard_balance(docs: DataFrame, n_shards: int = 16, salt: str = "shard") -> DataFrame:
    """Training-shard assignment audit: hash-assign every doc to one of
    ``n_shards`` output shards and report per-shard token load.

    The last mile of a curation pipeline writes N shards for the trainer;
    hash-mod assignment is the only scheme that needs NO coordination at
    100 TB (each task routes rows independently — no global sort, no greedy
    bin packing, no sequential state). This audit answers "is hash-mod
    balanced ENOUGH?": per shard, docs + tokens + integer permille of total
    + load vs the perfectly-balanced 1000 (load_permille = tokens * N *
    1000 / total). Map-side hash + ONE n_shards-row aggregate + a broadcast
    1-row total; reference has no analog (training-pipeline extension).
    """
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))), 1, 2), 16, 10)
        .cast("long") % n_shards
    )
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    per_shard = (
        docs.select(shard.alias("shard_id"), n_tok.alias("n_tok"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").alias("shard_tokens"),
        )
    )
    total = per_shard.agg(F.sum("shard_tokens").alias("total_tokens"))
    return (
        per_shard.crossJoin(F.broadcast(total))
        .select(
            "shard_id",
            "n_docs",
            "shard_tokens",
            F.expr("shard_tokens * 1000 DIV total_tokens").alias("token_share_permille"),
            F.expr(f"shard_tokens * {int(n_shards)} * 1000 DIV total_tokens").alias("load_permille"),
        )
        .orderBy("shard_id")
    )
