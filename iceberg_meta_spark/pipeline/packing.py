"""Sequence packing: assign documents to fixed token-budget training bins.

A trainer consumes fixed-length sequences; the packer walks each shard's
documents in a deterministic order and opens a new bin every time the
running token total crosses the budget. The bin id is a pure function of
the running prefix sum — ``bin = prev_tokens DIV budget`` — so a document
that straddles a boundary belongs to the bin where it starts (greedy fill
with overflow, the streaming-friendly semantics: no lookahead, no
re-sorting by length).

Scale: ONE window, partitioned by the packing domain ``(lang, source)`` —
at 100 TB the domain would carry an explicit shard key so no partition
outgrows an executor, but the shape is the same: prefix sums never cross
domain boundaries, so there is no global ordering and no single-partition
funnel. The per-bin rollup's grouping keys extend the window partition
keys, so the partial aggregation combines within the already-shuffled
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_packing(docs: DataFrame, budget: int = 256) -> DataFrame:
    """Per (lang, source, bin): document count, token total, doc-id range.

    Token count is the whitespace definition (``size(split(text, ' '))``)
    shared by the text-stats kernels, so packing totals reconcile with
    ``token_stats``.
    """
    sized = docs.select(
        "lang",
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = sized.withColumn(
        "prev_tokens", F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    ).withColumn("bin_id", F.expr(f"CAST(prev_tokens DIV {budget} AS BIGINT)"))
    return (
        binned.groupBy("lang", "source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "source", "bin_id")
    )
