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
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(vocab_cap)
        .crossJoin(F.broadcast(counts.agg(F.sum("cnt").alias("total"))))
        .select(
            "token",
            F.expr(f"CAST((cnt * {COMMONNESS_SCALE}) DIV total AS BIGINT)").alias("w"),
            "cnt",
        )
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
