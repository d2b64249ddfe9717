"""Tests for winnowing fingerprints (MOSS) and the linear quality
classifier — crafted inputs with hand-checkable answers plus the
algorithms' published invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline import classifier, winnow


def _docs(spark, texts, langs=None):
    rows = [
        (i, t, (langs or ["en"] * len(texts))[i], "s0", len(t))
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------


def test_winnow_identical_docs_identical_fingerprints(spark):
    same = " ".join(f"w{i % 7}x{i % 5}" for i in range(40))
    docs = _docs(spark, [same, same])
    sel = winnow.winnowed_fingerprints(docs, gram_tokens=4, window=3)
    a = {r.fp for r in sel.where("doc_id = 0").collect()}
    b = {r.fp for r in sel.where("doc_id = 1").collect()}
    assert a and a == b


def test_winnow_guarantee_shared_substring_detected(spark):
    # Schleimer et al. guarantee: any common substring of >= w + k - 1
    # tokens yields >= 1 shared fingerprint. Two docs share a 12-token run
    # (>= 3 + 4 - 1 = 6), embedded in otherwise-disjoint text.
    shared = " ".join(f"common{i}" for i in range(12))
    d0 = "alpha bravo charlie delta " + shared + " echo foxtrot"
    d1 = "zulu yankee xray whisky victor " + shared + " uniform tango sierra"
    docs = _docs(spark, [d0, d1])
    sel = winnow.winnowed_fingerprints(docs, gram_tokens=4, window=3)
    a = {r.fp for r in sel.where("doc_id = 0").collect()}
    b = {r.fp for r in sel.where("doc_id = 1").collect()}
    assert a & b, "winnowing must select a shared gram of the common run"


def test_winnow_density_bound(spark):
    # selected density can never exceed 1 per window slide and on random
    # text sits near 2/(w+1); also every doc long enough appears.
    rng = np.random.default_rng(7)
    texts = [
        " ".join(f"t{rng.integers(0, 50)}" for _ in range(60)) for _ in range(20)
    ]
    stats = winnow.winnow_stats(_docs(spark, texts), gram_tokens=8, window=4)
    rows = stats.collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 < r.n_selected <= r.n_grams
        assert r.density_permille <= 1000
    mean_density = sum(r.density_permille for r in rows) / len(rows)
    assert 200 <= mean_density <= 600  # theory: ~400 at w=4


def test_winnow_short_docs_excluded(spark):
    docs = _docs(spark, ["a b c", " ".join(f"x{i}" for i in range(30))])
    rows = winnow.winnow_stats(docs, gram_tokens=8, window=4).collect()
    assert [r.doc_id for r in rows] == [1]


def test_winnow_dup_pairs_finds_near_dup_and_caps_boilerplate(spark):
    base = " ".join(f"tok{i}" for i in range(30))
    near = base + " extra trailing words"
    other = " ".join(f"zz{i}" for i in range(30))
    docs = _docs(spark, [base, near, other])
    pairs = winnow.winnow_dup_pairs(
        docs, gram_tokens=4, window=3, min_shared=2, df_cap=16
    ).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(0, 1)]
    # df_cap=1 kills every fingerprint shared by 2+ docs -> no pairs survive
    none = winnow.winnow_dup_pairs(
        docs, gram_tokens=4, window=3, min_shared=1, df_cap=1
    ).collect()
    assert none == []


def test_winnow_no_cartesian_and_partitioned_window(spark):
    docs = _docs(spark, ["a b c d e f g h i j"] * 3)
    plan = winnow.winnow_dup_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# linear quality classifier
# ---------------------------------------------------------------------------


def test_gram_matrix_matches_numpy(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog and runs to the hills",
        "spark spark spark spark spark",
        "a view of the harbor and a boat out to sea with the tide going out",
    ]
    docs = _docs(spark, texts)
    rows = classifier.gram_matrix(docs).collect()
    pdf = classifier.features_frame(docs).toPandas()
    m = pdf[[f"f{i}" for i in range(classifier.N_FEATURES)] + ["y"]].to_numpy(
        dtype=np.int64
    )
    expect = m.T @ m
    got = {(r.i, r.j): r.s for r in rows}
    d = classifier.N_FEATURES + 1
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == expect[i, j], (i, j)


def test_train_weights_matches_direct_solve(spark):
    rng = np.random.default_rng(3)
    texts = [
        " ".join(
            rng.choice(
                ["the", "a", "of", "and", "to", "fox", "dog", "run", "sea", "hill"],
                size=rng.integers(10, 60),
            )
        )
        for _ in range(50)
    ]
    docs = _docs(spark, texts)
    w = np.array(classifier.train_weights(spark, docs, ridge=1e-3))
    pdf = classifier.features_frame(docs).toPandas()
    X = pdf[[f"f{i}" for i in range(classifier.N_FEATURES)]].to_numpy(float)
    y = pdf["y"].to_numpy(float)
    direct = np.linalg.solve(
        X.T @ X + 1e-3 * np.eye(classifier.N_FEATURES), X.T @ y
    )
    assert np.allclose(w, direct, rtol=1e-9, atol=1e-12)


def test_score_histogram_partitions_corpus(spark):
    texts = [
        "the cat and the dog ran to the barn and the yard over and over again "
        "with the wind at the door and a light in the hall to guide the way",
        "x1 x2 x3 x4",
        "spark " * 40,
    ]
    hist = classifier.score_histogram(_docs(spark, texts, langs=["en", "de", "fr"]))
    rows = hist.collect()
    assert sum(r.n_docs for r in rows) == 3
    for r in rows:
        assert 0 <= r.agreement_permille <= 1000
        assert r.bucket in {"drop", "low", "mid", "high"}


def test_score_histogram_is_shuffle_lean(spark):
    docs = _docs(spark, ["the a of and to words here"] * 4)
    plan = (
        classifier.score_histogram(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # map-side scoring: no join, no window; the only exchanges are the
    # tiny-key aggregate + final sort
    assert "Join" not in plan
    assert "Window" not in plan


def test_new_kernels_handle_empty_corpus(spark):
    """Schema-stable zero results on an empty corpus — same contract the
    maintenance kernels pin. The Gram is all-zero (so the ridge solve
    returns zero weights), never NULL."""
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    gram = classifier.gram_matrix(empty).collect()
    d = classifier.N_FEATURES + 1
    assert len(gram) == d * (d + 1) // 2
    assert all(r.s == 0 for r in gram)
    assert classifier.train_weights(spark, empty) == [0.0] * classifier.N_FEATURES
    assert classifier.score_histogram(empty).collect() == []
    assert winnow.winnow_stats(empty).collect() == []
    assert winnow.winnow_dup_pairs(empty).collect() == []
