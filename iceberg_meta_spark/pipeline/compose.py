"""Declarative curation-pipeline composer: a config list in, ONE lazy plan out.

The reference engine drives its behavior from config files (reference
catalog.py:99-142 loads YAML into typed config); the analog for a curation
pipeline is a list of stage specs that compiles into a single composed
DataFrame — no materialization between stages, so Catalyst optimizes ACROSS
stage boundaries (a later stage's column pruning reaches the first scan;
filters merge; shared subtrees dedupe). This is the property hand-written
stage-by-stage scripts with intermediate writes give up.

Stages (all built on the oracle-gated kernels):

- ``quality_filter``     — keep docs rated in ``keep`` (default good/ok)
- ``classifier_filter``  — keep docs the frozen linear classifier scores
                           >= ``threshold_micro`` (map-side, no join)
- ``exact_dedup``        — drop exact-hash duplicates, keep-min-id
- ``cluster_dedup``      — drop transitive near-dup cluster members (CC reps stay)
- ``winnow_dedup``       — drop the higher-id side of every winnowed-
                           fingerprint match (MOSS near-dup at doc grain)
- ``pii``                — redact emails/IPs/phones into ``text``
- ``mix``                — per-stratum deterministic rates in 256ths
- ``split``              — keep one leakage-safe split (e.g. train)
- ``chunk``              — context-window chunking (changes the row grain!)

``compose(docs, spec)`` returns the composed DataFrame; ``explain_spec``
pretty-prints the stage list. Specs are plain dicts so they can come from
JSON/YAML config verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quality_filter(df: DataFrame, stage: dict) -> DataFrame:
    from iceberg_meta_spark.pipeline.text import quality_scores

    keep = tuple(stage.get("keep", ("good", "ok")))
    scored = quality_scores(df).filter(F.col("quality").isin(*keep)).select("doc_id")
    return df.join(scored, "doc_id", "left_semi")


def _exact_dedup(df: DataFrame, stage: dict) -> DataFrame:
    key = F.md5(F.col("text"))
    reps = (
        df.select(F.col("doc_id"), key.alias("k"))
        .groupBy("k")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return df.join(reps, "doc_id", "left_semi")


def _cluster_dedup(df: DataFrame, stage: dict) -> DataFrame:
    from iceberg_meta_spark.pipeline.graph import connected_components, fingerprint_edges

    cc = connected_components(fingerprint_edges(df, stage.get("k", 3)))
    dropped = cc.filter(F.col("label") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    return df.join(dropped, "doc_id", "left_anti")


def _pii(df: DataFrame, stage: dict) -> DataFrame:
    from iceberg_meta_spark.pipeline.corpus import PII_EMAIL, PII_IPV4, PII_PHONE

    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return df.withColumn("text", redacted)  # in-place projection, zero shuffle


def _mix(df: DataFrame, stage: dict) -> DataFrame:
    from iceberg_meta_spark.pipeline.sampling import stratified_sample

    return stratified_sample(
        df,
        key_col=stage.get("key", "doc_id"),
        stratum_col=stage.get("stratum", "lang"),
        rates_256=stage.get("rates_256", {}),
        default_256=stage.get("default_256", 256),
        salt=stage.get("salt", "mix"),
    )


def _split(df: DataFrame, stage: dict) -> DataFrame:
    from iceberg_meta_spark.pipeline.graph import leakage_safe_splits

    splits = leakage_safe_splits(df, k=stage.get("k", 3))
    keep = stage.get("keep", "train")
    return df.join(
        splits.filter(F.col("split") == keep).select("doc_id"), "doc_id", "left_semi"
    )


def _chunk(df: DataFrame, stage: dict) -> DataFrame:
    from iceberg_meta_spark.pipeline.text import chunk_documents

    return chunk_documents(
        df,
        chunk_tokens=stage.get("chunk_tokens", 64),
        overlap=stage.get("overlap", 16),
    )


def _classifier_filter(df: DataFrame, stage: dict) -> DataFrame:
    from iceberg_meta_spark.pipeline.classifier import (
        DECISION_MICRO,
        _feature_cols,
        score_expr,
    )

    threshold = int(stage.get("threshold_micro", DECISION_MICRO))
    # pure map-side: features + frozen-weight dot computed inline, no join
    scored = df.select("*", *_feature_cols()).withColumn("score_micro", score_expr())
    return scored.filter(F.col("score_micro") >= threshold).select(*df.columns)


def _winnow_dedup(df: DataFrame, stage: dict) -> DataFrame:
    from iceberg_meta_spark.pipeline.winnow import winnow_dup_pairs

    pairs = winnow_dup_pairs(
        df,
        gram_tokens=stage.get("gram_tokens", 8),
        window=stage.get("window", 4),
        min_shared=stage.get("min_shared", 2),
        df_cap=stage.get("df_cap", 16),
    )
    # doc_a < doc_b in every pair: dropping the doc_b side keeps exactly
    # the lowest-id member of each matched group
    dups = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return df.join(dups, "doc_id", "left_anti")


def _domain_cap(df: DataFrame, stage: dict) -> DataFrame:
    """Per-source quota (the Gopher/CC domain cap): keep at most Q
    best-classifier-scored docs per source. Salted two-phase top-Q — no
    hot-domain sort funnel — then a LeftSemi on doc_id restores the full
    original rows (the rank runs over a 2-column projection)."""
    from pyspark.sql import Window

    from iceberg_meta_spark.pipeline import classifier

    q = int(stage.get("q", 1000))
    scored = classifier.features_frame(df, extra_cols=("source",)).select(
        "doc_id", "source", classifier.score_expr()
    )
    local = Window.partitionBy("source", F.col("doc_id") % 32).orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    final = Window.partitionBy("source").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    kept = (
        scored.withColumn("lr", F.row_number().over(local))
        .filter(F.col("lr") <= q)
        .withColumn("rk", F.row_number().over(final))
        .filter(F.col("rk") <= q)
        .select("doc_id")
    )
    return df.join(kept, "doc_id", "left_semi")


def _span_dedup(df: DataFrame, stage: dict) -> DataFrame:
    """Drop docs whose cross-document duplicated-span coverage (after the
    keep-first-occurrence cut) exceeds ``max_removed_permille`` — the
    document-grain consumer of substring_removal_stats; canonical
    occurrences keep their doc alive."""
    from iceberg_meta_spark.pipeline.dedup import substring_removal_stats

    limit = int(stage.get("max_removed_permille", 500))
    stats = substring_removal_stats(
        df, window_tokens=stage.get("window_tokens", 20)
    )
    keep = stats.where(F.col("removed_permille") <= limit).select("doc_id")
    return df.join(keep, "doc_id", "left_semi")


_STAGES = {
    "quality_filter": _quality_filter,
    "domain_cap": _domain_cap,
    "span_dedup": _span_dedup,
    "classifier_filter": _classifier_filter,
    "exact_dedup": _exact_dedup,
    "cluster_dedup": _cluster_dedup,
    "winnow_dedup": _winnow_dedup,
    "pii": _pii,
    "mix": _mix,
    "split": _split,
    "chunk": _chunk,
}


def compose(docs: DataFrame, spec: list[dict]) -> DataFrame:
    """Compile a stage-spec list into one lazy DataFrame plan."""
    df = docs
    for i, stage in enumerate(spec):
        kind = stage.get("stage")
        if kind not in _STAGES:
            raise ValueError(
                f"spec[{i}]: unknown stage {kind!r}; known: {sorted(_STAGES)}"
            )
        df = _STAGES[kind](df, stage)
    return df


def explain_spec(spec: list[dict]) -> str:
    return " -> ".join(s.get("stage", "?") for s in spec)
