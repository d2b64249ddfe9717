"""Tests for the declarative pipeline composer (pipeline/compose.py): a
spec list compiles to ONE lazy plan equal to composing the kernels by hand,
and unknown stages fail loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline import compose as C


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 3, "en", "web"),
        (2, "the quick brown fox jumps over the lazy dog " * 3, "en", "web"),  # exact dup
        (3, "reach me at bob@example.com for details about the meeting " * 2, "en", "mail"),
        (4, "zz", "de", "web"),  # too short -> quality-dropped
        (5, "ein ganz anderer text ohne duplikate hier drin steht " * 2, "de", "web"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_compose_runs_spec_and_matches_manual(spark):
    spec = [
        {"stage": "quality_filter"},
        {"stage": "exact_dedup"},
        {"stage": "pii"},
    ]
    out = C.compose(_docs(spark), spec)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 2 not in ids          # exact dup dropped (keep-min)
    assert 4 not in ids          # quality-dropped
    assert 1 in ids and 3 in ids
    txt = out.filter("doc_id = 3").select("text").collect()[0][0]
    assert "<EMAIL>" in txt and "bob@example.com" not in txt


def test_compose_is_one_lazy_plan(spark):
    # column pruning from the FINAL projection must reach the first scan:
    # composing lazily means Catalyst sees the whole pipeline at once
    spec = [{"stage": "exact_dedup"}, {"stage": "mix", "rates_256": {"en": 256}}]
    out = C.compose(_docs(spark), spec).select("doc_id")
    assert out.count() >= 1  # executes as a single job chain, no side writes


def test_compose_split_stage_keeps_one_split(spark):
    out = C.compose(_docs(spark), [{"stage": "split", "keep": "train"}])
    splits = {r.doc_id for r in out.collect()}
    from iceberg_meta_spark.pipeline.graph import leakage_safe_splits

    expect = {
        r.doc_id
        for r in leakage_safe_splits(_docs(spark)).filter("split = 'train'").collect()
    }
    assert splits == expect


def test_compose_chunk_changes_grain(spark):
    out = C.compose(_docs(spark), [{"stage": "chunk", "chunk_tokens": 8, "overlap": 2}])
    assert "chunk_id" in out.columns
    assert out.count() > _docs(spark).count()


def test_compose_unknown_stage_raises(spark):
    with pytest.raises(ValueError, match="unknown stage"):
        C.compose(_docs(spark), [{"stage": "nope"}])


def test_compose_classifier_and_winnow_stages(spark):
    base = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (1, base, "en", "web"),
        (2, base + " extra trailing words", "en", "web"),  # winnow near-dup of 1
        (3, "completely different " + " ".join(f"zz{i}" for i in range(28)), "en", "web"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = C.compose(
        docs,
        [
            {"stage": "classifier_filter", "threshold_micro": -10**12},  # keep all
            {"stage": "winnow_dedup", "gram_tokens": 4, "window": 3},
        ],
    )
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 3}  # near-dup 2 dropped, min-id 1 kept
    assert out.columns == docs.columns  # stages preserve the doc grain/schema

    strict = C.compose(docs, [{"stage": "classifier_filter", "threshold_micro": 10**12}])
    assert strict.count() == 0  # impossible threshold drops everything


def test_compose_full_curation_run_on_real_corpus(spark):
    """End-to-end curation over the sf0.001 corpus: classifier gate ->
    exact dedup -> winnow dedup -> PII -> leakage-safe split -> chunk.
    Pins the pipeline-wide invariants a production run relies on:
    monotone doc-count reduction at each filter stage, zero surviving
    exact duplicates, zero surviving winnow matches, and grain change
    only at the chunk stage."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = docs.count()

    gated = C.compose(docs, [{"stage": "classifier_filter"}])
    n1 = gated.count()
    assert 0 < n1 < n0  # the frozen filter actually drops something

    deduped = C.compose(docs, [
        {"stage": "classifier_filter"},
        {"stage": "exact_dedup"},
        {"stage": "winnow_dedup"},
    ])
    n2 = deduped.count()
    assert 0 < n2 <= n1
    # no exact dups survive
    assert deduped.groupBy(F.md5("text")).count().filter("count > 1").count() == 0
    # no winnow matches survive among the survivors
    from iceberg_meta_spark.pipeline.winnow import winnow_dup_pairs

    assert winnow_dup_pairs(deduped).count() == 0

    final = C.compose(docs, [
        {"stage": "classifier_filter"},
        {"stage": "exact_dedup"},
        {"stage": "winnow_dedup"},
        {"stage": "pii"},
        {"stage": "split", "keep": "train"},
        {"stage": "chunk", "chunk_tokens": 32, "overlap": 8},
    ])
    rows = final.limit(5).collect()
    assert rows and "chunk_text" in final.columns  # grain changed at chunk


def test_compose_domain_cap_and_span_dedup_stages(spark):
    """The two round-5 stages: domain_cap keeps at most Q docs per source
    (the Q best-scored, verified against the standalone quota kernel) and
    span_dedup drops docs whose post-cut duplicated-span coverage exceeds
    the threshold while canonical copies survive."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    capped = C.compose(docs, [{"stage": "domain_cap", "q": 2}])
    per_source = capped.groupBy("source").count().collect()
    assert per_source and all(r["count"] <= 2 for r in per_source)
    # the kept docs are exactly the quota kernel's keep-set
    from iceberg_meta_spark.pipeline import classifier

    scored = classifier.features_frame(docs, extra_cols=("source",)).select(
        "doc_id", "source", classifier.score_expr()
    )
    by_source: dict[str, list] = {}
    for r in scored.collect():
        by_source.setdefault(r["source"], []).append(r)
    expected = set()
    for members in by_source.values():
        members.sort(key=lambda r: (-r["score_micro"], r["doc_id"]))
        expected |= {r["doc_id"] for r in members[:2]}
    assert {r.doc_id for r in capped.select("doc_id").collect()} == expected

    # span_dedup: an exact pair — the canonical (lower doc_id) survives a
    # strict threshold, the copy is fully covered and dropped
    from iceberg_meta_spark.pipeline.dedup import substring_removal_stats

    pair = docs.limit(0).unionByName(
        spark.createDataFrame(
            [
                (1, " ".join(f"t{i}" for i in range(30)), "en", "s", 30),
                (2, " ".join(f"t{i}" for i in range(30)), "en", "s", 30),
                (3, " ".join(f"u{i}" for i in range(30)), "en", "s", 30),
            ],
            docs.schema,
        )
    )
    out = C.compose(pair, [{"stage": "span_dedup", "max_removed_permille": 0}])
    assert {r.doc_id for r in out.select("doc_id").collect()} == {1, 3}
