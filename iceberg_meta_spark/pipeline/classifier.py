"""Linear quality-classifier training and scoring at corpus scale.

The production shape (fastText/logistic quality filters a la GPT-3's
WebText classifier, CCNet, RefinedWeb): a tiny linear model over cheap
per-document features, trained once, then applied map-side to every
document of a 100 TB corpus. Two relational kernels:

- **Training sufficient statistics**: ridge/least-squares needs only the
  Gram matrix ``X^T X`` and moment vector ``X^T y`` — ``O(d^2)`` numbers
  regardless of corpus size. ONE shrinking aggregate computes every
  ``sum(x_i * x_j)`` pairwise product; the d x d solve happens on the
  driver (d = 5 here). This is the canonical distributed-linear-model
  shape: the data never leaves the executors, only the Gram does.
  Features and labels are integers, so the sums are BIGINT-exact and
  oracle-checkable bit-for-bit.

- **Scoring**: the learned weights (integer-scaled) are baked into a
  pure column expression — zero shuffle beyond the final histogram
  aggregate, fully whole-stage-codegen.

The weak label comes from the same rule family as ``weak_label_vote``
(Snorkel-style): stopword density and length-band heuristics supply the
supervision, the linear model smooths and generalizes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Feature vector (integer-valued, bias first). Kept deliberately tiny and
# cheap: every one is a single expression over the raw text.
#   f0 = 1                      (bias)
#   f1 = whitespace token count
#   f2 = character count
#   f3 = stopword occurrences   (the/a/of/and/to)
#   f4 = distinct token count   (vocabulary richness — low vs f1 means
#                                repetition-heavy text)
N_FEATURES = 5

_STOPWORDS = ("the", "a", "of", "and", "to")


def _feature_cols() -> list[Column]:
    toks = F.split(F.col("text"), " ")
    wl = F.array(*[F.lit(w) for w in _STOPWORDS])
    stop = F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))
    return [
        F.lit(1).cast("long").alias("f0"),
        F.size(toks).cast("long").alias("f1"),
        F.length(F.col("text")).cast("long").alias("f2"),
        stop.cast("long").alias("f3"),
        F.size(F.array_distinct(toks)).cast("long").alias("f4"),
    ]


def _weak_label() -> Column:
    """Heuristic supervision: 1 = keep. A document is "good" when it has a
    natural-language stopword density (>= 1 stopword per 16 tokens) AND a
    body-text length (>= 24 tokens). Same rule family as weak_label_vote.
    """
    return (
        ((F.col("f3") * 16 >= F.col("f1")) & (F.col("f1") >= 24))
        .cast("long")
        .alias("y")
    )


def features_frame(docs: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, lang, f0..f4, y) — the design matrix, one row per doc.

    ``extra_cols`` carries pass-through columns (e.g. source, n_chars) so
    downstream consumers never need a doc_id back-join to re-attach them.
    """
    return docs.select("doc_id", "lang", *extra_cols, *_feature_cols()).withColumn(
        "y", _weak_label()
    )


def gram_matrix(docs: DataFrame) -> DataFrame:
    """Sufficient statistics for the least-squares fit, long format:
    (i, j, s) with s = sum(f_i * f_j) over the corpus for 0 <= i <= j < d,
    plus rows (i, d, s) carrying X^T y and (d, d, sum y). One aggregate,
    O(d^2) output rows — the corpus-size-independent training payload.
    """
    x = features_frame(docs)
    cols = [f"f{i}" for i in range(N_FEATURES)] + ["y"]
    aggs = []
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            aggs.append(
                # coalesce: an EMPTY corpus yields the all-zero Gram (the
                # ridge solve then returns the zero weights), never NULLs
                F.coalesce(F.sum(F.col(cols[i]) * F.col(cols[j])), F.lit(0))
                .cast("long")
                .alias(f"s_{i}_{j}")
            )
    row = x.agg(*aggs)
    pairs = ", ".join(
        f"{i}, {j}, s_{i}_{j}"
        for i in range(len(cols))
        for j in range(i, len(cols))
    )
    n = len(cols) * (len(cols) + 1) // 2
    return row.selectExpr(f"stack({n}, {pairs}) AS (i, j, s)").selectExpr(
        "CAST(i AS INT) AS i", "CAST(j AS INT) AS j", "CAST(s AS BIGINT) AS s"
    ).orderBy("i", "j")


def train_weights(
    spark: SparkSession, docs: DataFrame, ridge: float = 1e-3
) -> list[float]:
    """Solve the ridge normal equations from the Gram statistics.

    Driver-side work is a d x d solve (d = 5) — microseconds; the corpus
    contributes only through :func:`gram_matrix`. Returns the weight
    vector w minimizing ||Xw - y||^2 + ridge * ||w||^2.
    """
    import numpy as np

    rows = gram_matrix(docs).collect()
    d = N_FEATURES
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    for r in rows:
        i, j, s = r["i"], r["j"], float(r["s"])
        if j < d:
            xtx[i, j] = s
            xtx[j, i] = s
        elif i < d:  # (i, d) rows are X^T y
            xty[i] = s
        # (d, d) = sum(y*y): not needed for the solve
    w = np.linalg.solve(xtx + ridge * np.eye(d), xty)
    return [float(v) for v in w]


# Frozen scoring weights: the ridge fit (ridge=1e-3) of the weak label on
# the sf0.01 corpus, scaled by 10^6 and truncated to integers so the score
# is BIGINT-exact in both engines. (Training lives in train_weights; these
# are its committed output, the way a production filter ships a frozen
# model.) score_micro = sum(W[i] * f_i); the regression predicts the 0/1
# label, so the keep decision threshold is 0.5 — 500000 micro.
SCORE_WEIGHTS_MICRO = (-65566, -17825, 390, 205337, 27755)
DECISION_MICRO = 500_000


def score_expr() -> Column:
    """Integer micro-scaled linear score as one column expression."""
    names = [f"f{i}" for i in range(N_FEATURES)]
    e = F.lit(0).cast("long")
    for w, name in zip(SCORE_WEIGHTS_MICRO, names):
        e = e + F.lit(w).cast("long") * F.col(name)
    return e.alias("score_micro")


def score_histogram(docs: DataFrame) -> DataFrame:
    """Per-(lang, bucket) classifier-score histogram — the corpus-level
    view of what the frozen filter would keep. Buckets are fixed
    half-open micro-score bands; agreement_permille reports how often the
    classifier (score >= 0) agrees with the weak rule it was trained on.
    Pure map-side scoring + one tiny-key aggregate.
    """
    x = features_frame(docs).withColumn("score_micro", score_expr())
    bucket = (
        F.when(F.col("score_micro") < 250000, F.lit("drop"))
        .when(F.col("score_micro") < 500000, F.lit("low"))
        .when(F.col("score_micro") < 750000, F.lit("mid"))
        .otherwise(F.lit("high"))
        .alias("bucket")
    )
    return (
        x.select("lang", bucket, "score_micro", "y")
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("score_micro") >= DECISION_MICRO).cast("long")
                    == F.col("y"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_agree"),
        )
        .select(
            "lang",
            "bucket",
            "n_docs",
            F.expr("n_agree * 1000 DIV n_docs").alias("agreement_permille"),
        )
        .orderBy("lang", "bucket")
    )
