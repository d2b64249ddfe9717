"""End-to-end training-data pipeline demo: documents in, training shards out.

    python tools/pipeline_demo.py [sf_dir] [out_dir]

Drives the LLM-pipeline surface the way a curation job would — quality
scoring, exact dedup (keep-min-id), MinHash near-dup report, PII scrub,
leakage-safe train/val/test splits, temperature mixing, context-window
chunking, PQ codebook training + ADC sanity probe, deterministic sharded
export —
each stage a pure DataFrame transform from `iceberg_meta_spark.pipeline`,
composed lazily and materialized per show(). The batch mirror of a
production curation DAG; every kernel here also has an oracle-gated
registry twin.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_meta_spark.pipeline.corpus import pii_scrub  # noqa: E402
from iceberg_meta_spark.pipeline.dedup import minhash_lsh_pairs  # noqa: E402
from iceberg_meta_spark.pipeline.graph import connected_components, fingerprint_edges  # noqa: E402
from iceberg_meta_spark.pipeline.sampling import stratified_sample  # noqa: E402
from iceberg_meta_spark.pipeline.text import chunk_documents, quality_scores  # noqa: E402
from iceberg_meta_spark.session import get_spark  # noqa: E402
from iceberg_meta_spark.sources.parquet import load_table  # noqa: E402
from iceberg_meta_spark.sources.sinks import write_training_shards  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="shards_")
    spark = get_spark("iceberg-meta-spark-pipeline-demo")

    def show(title: str, df, n: int = 5) -> None:
        print(f"\n== {title} ==")
        df.show(n, truncate=90)

    docs = load_table(spark, sf_dir, "documents")

    # 0. scale pre-flight: diagnose the shuffle keys and price the joins
    # BEFORE launching anything expensive (operators/skew.py, profile.py)
    from iceberg_meta_spark.operators.profile import column_profile
    from iceberg_meta_spark.operators.skew import key_skew_profile

    show("column profile (documents)", column_profile(docs).orderBy("column"), n=6)
    show(
        "shuffle-key skew: source / lang",
        key_skew_profile(docs, "source").unionByName(key_skew_profile(docs, "lang")),
    )

    # 1. quality gate: keep docs the composite rules rate good/ok
    scored = quality_scores(docs)
    kept = docs.join(
        scored.filter(F.col("quality").isin("good", "ok")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    show("quality-kept docs", kept.select("doc_id", "lang", "n_chars"))

    # 2. transitive dedup: connected components over fingerprint edges;
    # every clustered doc except its component's min-id rep is dropped
    cc = connected_components(fingerprint_edges(kept))
    dropped = cc.filter(F.col("label") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    survivors = kept.join(dropped, "doc_id", "left_anti")
    show(
        "near-dup candidate pairs (MinHash-LSH)",
        minhash_lsh_pairs(survivors).select("doc_a", "doc_b", "est_jaccard"),
    )

    # 2b. substring-level span removal audit (Lee et al. keep-first cut)
    from iceberg_meta_spark.pipeline.dedup import substring_removal_stats

    show(
        "substring-span removal (top removed)",
        substring_removal_stats(survivors)
        .filter(F.col("n_removed") > 0)
        .orderBy(F.desc("removed_permille")),
    )

    # 2c. domain cap: at most Q best-classifier-scored docs per source
    from iceberg_meta_spark.pipeline import compose as C

    capped = C.compose(survivors, [{"stage": "domain_cap", "q": 3}])
    show("per-source doc counts after domain cap", capped.groupBy("source").count())

    # 3. PII screen
    show("PII scan", pii_scrub(survivors).filter(F.col("n_redactions") > 0))

    # 4. leakage-safe splits: near-dup clusters never straddle train/val/test
    from iceberg_meta_spark.pipeline.graph import leakage_safe_splits

    splits = leakage_safe_splits(survivors)
    show("split sizes", splits.groupBy("split").count())

    # 4b. temperature mixing: per-language deterministic rates
    mixed = stratified_sample(
        survivors, "doc_id", "lang",
        rates_256={"en": 128, "de": 256, "fr": 256, "es": 256, "zh": 256},
    )
    show("mixed corpus by lang", mixed.groupBy("lang").count())

    # 4c. per-doc tf-idf keywords on the final mix (integer raw-odds IDF)
    from iceberg_meta_spark.pipeline.corpus import tfidf_keywords

    show("tf-idf keywords", tfidf_keywords(mixed, k=2), n=6)

    # 5. context-window chunking
    chunks = chunk_documents(mixed)
    show("chunks", chunks.select("doc_id", "chunk_id", "chunk_len"))

    # 6. embedding side: PQ codebooks + an ADC probe for the retrieval index
    from iceberg_meta_spark.pipeline.pq import adc_topk, pq_codes

    emb = load_table(spark, sf_dir, "embeddings")
    show("PQ codes", pq_codes(emb).select("vec_id", "code"))
    show("ADC top-3 for query 1", adc_topk(emb, query_ids=[1], k=3))

    # 7. deterministic sharded export (reproducible order from the salt)
    export = chunks.withColumn("key", F.concat_ws(":", "doc_id", "chunk_id"))
    write_training_shards(export, out_dir, n_shards=4)
    print(f"\n== shards written to {out_dir} ==")
    print(spark.read.parquet(out_dir).count(), "chunk rows exported")
    spark.stop()


if __name__ == "__main__":
    main()
