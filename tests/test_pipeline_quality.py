"""Unit tests for the round-2 quality / graph kernels (pipeline/quality.py,
pipeline/graph.py) on handcrafted in-memory corpora with known answers.
Oracle parity at sf0.001 is covered by tests/test_oracle_parity.py; these pin
the semantics directly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline import graph, quality

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src") for i, t in enumerate(rows)], DOC_SCHEMA.replace(", n_chars long", "")
    ).withColumn("n_chars", F.length("text").cast("long"))


def test_quality_rules_known_docs(spark):
    good = " ".join(["the", "a"] + [f"w{i}" for i in range(28)])  # 30 toks, 2 stops, varied
    short = "the a"  # fails r_len (2 tokens) but keeps both stopwords
    repetitive = " ".join(["the", "a"] + ["spam"] * 28)  # top token 28/30 > 20%
    out = quality.quality_rule_summary(_docs(spark, [good, short, repetitive])).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 3
    assert r.n_len_ok == 2  # good + repetitive
    assert r.n_stop_ok == 3  # all contain 'the' and 'a'
    assert r.n_rep_ok == 1  # short: top freq 1 -> 5 > 2 fails; repetitive: 28*5 > 30
    assert r.n_pass == 1 and r.pass_rate == round(1 / 3, 4)


def test_repetition_profile(spark):
    out = {
        r.doc_id: r
        for r in quality.repetition_profile(
            _docs(spark, ["a b a b a b a b", "all words here differ fully", "solo"])
        ).collect()
    }
    rep = out[0]
    assert rep.n_tokens == 8 and rep.n_distinct_tokens == 2
    assert rep.n_bigrams == 7 and rep.n_distinct_bigrams == 2
    assert rep.repetitive is True
    uniq = out[1]
    assert uniq.dup_token_ratio == 0.0 and uniq.dup_bigram_ratio == 0.0
    assert uniq.repetitive is False
    solo = out[2]
    assert solo.n_bigrams == 0 and solo.dup_bigram_ratio == 0.0 and solo.repetitive is False


def _is_eval(doc_id: int) -> bool:
    return hashlib.md5(f"eval:{doc_id}".encode()).hexdigest()[:2] < quality.EVAL_HEX


def test_contamination_flags(spark):
    # find one eval id and two train ids deterministically
    eval_id = next(i for i in range(1000) if _is_eval(i))
    t1, t2 = [i for i in range(1000) if not _is_eval(i)][:2]
    text = "alpha beta gamma delta epsilon"
    rows = [
        (eval_id, text),  # eval doc
        (t1, text),  # exact copy -> contamination 1.0
        (t2, "zeta eta theta iota kappa"),  # disjoint -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in quality.contamination_flags(df).collect()}
    assert set(out) == {t1, t2}  # eval doc excluded from output
    assert out[t1].contamination == 1.0 and out[t1].contaminated is True
    assert out[t2].n_hits == 0 and out[t2].contaminated is False


def test_domain_mix_temperature(spark):
    rows = [(i, "x", "en", "big") for i in range(90)] + [(90 + i, "x", "en", "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r.source: r for r in quality.domain_mix_temperature(df, budget=1000).collect()}
    assert out["big"].raw_share == 0.9 and out["small"].raw_share == 0.1
    # sqrt temperature flattens: small domain gets ~25% not 10%
    assert out["small"].mix_rate > 0.2
    assert abs(out["big"].mix_rate + out["small"].mix_rate - 1.0) < 0.001
    assert out["big"].alloc_docs + out["small"].alloc_docs <= 1000


def test_connected_components_chain(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "src long, dst long")
    out = {r.node: r.label for r in graph.connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_dedup_clusters_transitive(spark):
    # doc0/doc1 share a prefix; doc1/doc2 share a suffix -> one cluster of 3
    rows = [
        (0, "p1 p2 p3 mid a end x1 x2 x3"),
        (1, "p1 p2 p3 mid b end s1 s2 s3"),
        (2, "q1 q2 q3 mid c end s1 s2 s3"),
        (3, "u1 u2 u3 unique doc v1 v2 v3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = graph.dedup_clusters(df).collect()
    assert len(out) == 1
    assert out[0].cluster_id == 0 and out[0].n_docs == 3 and out[0].max_doc_id == 2


def test_embedding_drift_detects_shifted_cohort(spark):
    """Labels whose odd-id (current) vectors rotate away from the even-id
    (reference) vectors must flag drifted; an unshifted label must not."""
    from iceberg_meta_spark.pipeline.quality import embedding_drift

    rows = []
    for i in range(40):
        # label 0: both cohorts near [1, 0] — no drift (ids 100..139, mixed parity)
        rows.append((100 + i, [1.0, 0.01 * (i % 3)], 0))
    for i in range(40):
        # label 1: even ids near [1, 0], odd ids near [0, 1] — hard drift
        vec = [1.0, 0.02] if (200 + i) % 2 == 0 else [0.02, 1.0]
        rows.append((200 + i, vec, 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in embedding_drift(emb, dims=2).collect()}
    assert not out[0].drifted and out[0].centroid_cos > 0.99
    assert out[1].drifted and out[1].centroid_cos < 0.9
    assert out[1].n_ref + out[1].n_cur == 40
