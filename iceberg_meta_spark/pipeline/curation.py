"""End-to-end corpus curation: quality filter → exact-dedup keep-min →
stratified mix — the composed shape of a production training-data pipeline,
built entirely from the engine's own kernels.

Stage economics at 100 TB: the quality filter drops rows before anything
shuffles; dedup is ONE partitioned window over the 128-bit dup key (min
doc_id per group — no self-join, no distinct); the mix is a map-side
filter (sampling.py). Total: one shuffle for the doc_id join of quality
features, one for the dup-key window — both on well-distributed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline import sampling
from iceberg_meta_spark.pipeline.text import quality_scores


def curate_corpus(
    docs: DataFrame,
    rates_256: dict[str, int],
    default_256: int = 0,
    prefix_tokens: int = 3,
    salt: str = "mix",
) -> DataFrame:
    """Survivors of quality-filter → dedup(keep min doc_id) → per-lang mix.

    Output: (doc_id, lang, source, quality) — deterministic on any engine
    and any input partitioning.
    """
    q = quality_scores(docs).select("doc_id", "quality")
    kept = docs.join(q, "doc_id").filter(F.col("quality") != "low")
    # same dup key as dedup.exact_dup_groups: md5 of the 3-token prefix
    dup_key = F.md5(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, prefix_tokens)))
    keyed = kept.withColumn("dup_key", dup_key)
    keeper = F.min("doc_id").over(Window.partitionBy("dup_key"))
    deduped = keyed.withColumn("keeper", keeper).filter(F.col("doc_id") == F.col("keeper"))
    mixed = sampling.stratified_sample(
        deduped, key_col="doc_id", stratum_col="lang",
        rates_256=rates_256, default_256=default_256, salt=salt,
    )
    return mixed.select("doc_id", "lang", "source", "quality")
