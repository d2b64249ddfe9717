"""Cross-engine fuzz: random corpora through BOTH engines, values compared.

The oracle gate (tools/check_oracle.py, the driver) runs every query
against ONE fixed dataset per scale factor. This fuzz goes further for a
handful of arithmetic-sensitive document kernels: hypothesis generates
small random corpora — empty-ish docs, single tokens, repeated tokens,
skewed languages — writes them as parquet, and runs the registered Spark
query AND its registered DuckDB oracle on the same files, comparing
values with the harness comparator. Any counterexample is a real
cross-engine divergence (percentile interpolation, integer division,
grouping edge cases) on an input nobody hand-picked.

Queries chosen for arithmetic sensitivity: dyadic percentiles
(quality_adaptive_buckets), CASE/majority integer logic (weak_label_vote),
min/max group edges (dedup_exact).
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_meta_spark.registry import load_all
import duckdb

from tools.compare import compare_frames

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

WORDS = ["the", "a", "of", "and", "to", "cat", "sat", "mat", "spark", "query",
         "plan", "x1", "y2", "z3"]

corpora = st.lists(
    st.tuples(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),  # tokens
        st.sampled_from(["en", "de", "zh"]),
        st.sampled_from(["s0", "s1"]),
    ),
    min_size=1,
    max_size=12,
)

# winnowing exercises the sliding-min/distinct selection right at its
# 11-token doc-length boundary (corpora cap at 12 tokens); the classifier
# pair exercises BIGINT product sums and integer bucket edges on degenerate
# (empty/single-token) docs.
QUERIES = [
    "dedup_exact",
    "quality_adaptive_buckets",
    "weak_label_vote",
    "text_winnow_stats",
    "dedup_winnowing",
    "quality_classifier_gram",
    "quality_classifier_score",
    # round-5: quota ties (duplicate token lists give identical scores ->
    # the (score, doc_id) tie-break must agree across engines) and the
    # substring-removal zero/short-doc left-join path
    "source_quota_cap",
    "substring_removal",
]


def _run(spark, tmpdir: str, rows) -> None:
    docs = spark.createDataFrame(
        [(i, " ".join(toks), lang, src, len(" ".join(toks)))
         for i, (toks, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmpdir, "documents.parquet"))
    qs = load_all()
    con = duckdb.connect()
    con.execute(
        # Spark writes a directory of part files; glob inside it
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmpdir}/documents.parquet/*.parquet')"
    )
    try:
        for name in QUERIES:
            sdf = qs[name].spark_fn(spark, tmpdir).toPandas()
            ddf = con.execute(qs[name].oracle).df()
            res = compare_frames(name, sdf, ddf)
            assert res.ok, f"{name}: {res.detail} on corpus {rows!r}"
    finally:
        con.close()


@given(rows=corpora)
@SET
def test_doc_kernels_cross_engine_on_random_corpora(spark, tmp_path_factory, rows):
    from iceberg_meta_spark.sources import parquet

    prior = parquet._CACHE_ENABLED
    parquet.enable_cache(False)  # each example writes fresh files; never cache them
    try:
        _run(spark, str(tmp_path_factory.mktemp("fuzz")), rows)
    finally:
        parquet.enable_cache(prior)  # restore EXACTLY (plan tests assert raw scans)


long_corpora = st.lists(
    st.lists(st.sampled_from(WORDS[:4]), min_size=20, max_size=28),
    min_size=2,
    max_size=8,
)


@given(rows=long_corpora)
@SET
def test_substring_removal_cross_engine_on_long_corpora(spark, tmp_path_factory, rows):
    """Docs long enough to hold 20-token windows, drawn from a 4-word pool
    so cross-document window collisions actually occur: the keep-first cut
    and interval-union sweep must agree across engines, including canonical
    selection under many identical windows."""
    from iceberg_meta_spark.sources import parquet

    prior = parquet._CACHE_ENABLED
    parquet.enable_cache(False)
    tmpdir = str(tmp_path_factory.mktemp("fuzz_rm"))
    docs = spark.createDataFrame(
        [(i, " ".join(toks), "en", "s0", len(" ".join(toks)))
         for i, toks in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmpdir, "documents.parquet")
    )
    qs = load_all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmpdir}/documents.parquet/*.parquet')"
    )
    try:
        sdf = qs["substring_removal"].spark_fn(spark, tmpdir).toPandas()
        ddf = con.execute(qs["substring_removal"].oracle).df()
        res = compare_frames("substring_removal", sdf, ddf)
        assert res.ok, f"{res.detail} on corpus {rows!r}"
    finally:
        con.close()
        parquet.enable_cache(prior)
