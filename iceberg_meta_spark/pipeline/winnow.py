"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm), recast as DataFrame expressions.

Plain k-gram sampling (``0 mod p`` selection) can miss arbitrarily long
matches; winnowing guarantees that any shared substring of at least
``w + k - 1`` tokens produces at least one shared selected fingerprint,
while keeping the selected-set density near ``2 / (w + 1)``. The selection
rule: hash every k-token gram, slide a window of ``w`` consecutive gram
hashes, and record the minimum hash of each window (deduplicated — a
minimum that persists across consecutive windows is recorded once).

Relational shape (scales to 10^9 documents):

- gram hashing is a linear per-doc array ``transform`` + ``explode`` —
  map-side, no shuffle;
- the sliding minimum is ``min(h) OVER (PARTITION BY doc_id ORDER BY pos
  ROWS w-1 PRECEDING)`` — ONE exchange on doc_id, never a global window;
- the selected set is ``DISTINCT (doc_id, min_hash)`` — partial
  aggregation collapses the (heavily duplicated) per-window minima
  map-side before the shuffle.

The gram hash is md5 over the space-joined token slice — the same
engine-portable hash the substring-dedup kernel uses (DuckDB's md5
renders identical lowercase hex, and both engines compare the hex
strings bytewise), so the whole selection is oracle-checkable.

Reference parity note: the reference engine ships rolling-hash document
fingerprinting (SURVEY §2 text-analysis family); winnowing is its
robust-guarantee upgrade, built on the same hashing primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def winnowed_fingerprints(
    docs: DataFrame, gram_tokens: int = 8, window: int = 4
) -> DataFrame:
    """Selected (doc_id, fingerprint) pairs for every document long enough
    to contain one full winnowing window (``gram_tokens + window - 1``
    tokens). Ties inside a window resolve by hash value only (both engines
    take the lexicographic min), which keeps the guarantee: SOME gram of
    every window is selected.
    """
    k, w = gram_tokens, window
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= k + w - 1
    )
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(t) - {k}),"
                f" i -> md5(concat_ws(' ', slice(t, i + 1, {k}))))"
            )
        ).alias("pos", "h"),
    )
    sliding = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    return (
        grams.select("doc_id", "pos", F.min("h").over(sliding).alias("fp"))
        # only FULL windows select (the first w-1 slides are partial)
        .where(F.col("pos") >= w - 1)
        .select("doc_id", "fp")
        .distinct()
    )


def winnow_stats(
    docs: DataFrame, gram_tokens: int = 8, window: int = 4
) -> DataFrame:
    """Per-document fingerprint density audit: (doc_id, n_grams,
    n_selected, density_permille), ordered by doc_id. Expected density is
    ~2/(w+1) of the gram count — a document whose density is far higher is
    hash-churny (noisy text); far lower means long runs of repeated grams.
    """
    k, w = gram_tokens, window
    sel = (
        winnowed_fingerprints(docs, gram_tokens=gram_tokens, window=window)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_selected"))
    )
    grams = (
        docs.select("doc_id", F.split("text", " ").alias("t"))
        .where(F.size("t") >= k + w - 1)
        .select("doc_id", (F.size("t") - F.lit(k - 1)).cast("long").alias("n_grams"))
    )
    return (
        grams.join(sel, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_selected",
            F.expr("n_selected * 1000 DIV n_grams").alias("density_permille"),
        )
        .orderBy("doc_id")
    )


def winnow_dup_pairs(
    docs: DataFrame,
    gram_tokens: int = 8,
    window: int = 4,
    min_shared: int = 2,
    df_cap: int = 16,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints —
    the MOSS match report: (doc_a, doc_b, n_shared), doc_a < doc_b.

    Scale guard: a fingerprint selected by more than ``df_cap`` documents
    is corpus boilerplate and is dropped BEFORE the pair join (the same
    PPJoin-style frequency cap the containment kernel uses), so candidate
    generation is bounded by df_cap^2 rows per fingerprint no matter how
    big the corpus — never an all-pairs product.
    """
    sel = winnowed_fingerprints(docs, gram_tokens=gram_tokens, window=window)
    rare = (
        sel.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= df_cap)
        .select("fp")
    )
    keyed = sel.join(rare, "fp")
    a = keyed.select(F.col("doc_id").alias("doc_a"), "fp")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )
