"""BPE-style merge training: the tokenizer-building loop as DataFrame plans.

Byte-pair encoding trains by repeatedly (1) counting adjacent symbol pairs
across the corpus, (2) merging the most frequent pair into a new symbol
everywhere it occurs (greedy leftmost-first within each sequence). This
module runs that loop at token granularity — learning multi-word units, the
same algorithm a subword tokenizer runs over characters — entirely with
DataFrame expressions:

- pair counting: in-row adjacent pairs (``transform(sequence(...))``, the
  n-gram idiom) → explode → map-side-combined count;
- winner selection: a 1-row TakeOrdered (count desc, pair asc — the
  deterministic tie-break) broadcast back onto the corpus;
- the merge itself: a left-to-right ``aggregate`` fold that rebuilds each
  symbol array, collapsing ``[.., a] + b → [.., a+b]`` exactly when (a, b)
  is the round's winning pair — greedy leftmost semantics (``a a a`` with
  winner (a,a) becomes ``aa a``), matching reference BPE implementations.

Each round is ONE corpus scan + one shrinking pair-count shuffle + a 1-row
broadcast; the fold is pure map-side. Rounds are unrolled (like the Lloyd
and PageRank kernels) so the whole training run carries a hash-gated DuckDB
oracle — the oracle replays the fold with ``list_reduce`` over singleton-
wrapped elements (DuckDB's accumulator must be typed by the first element).

Merged symbols join with ``'+'`` (``new+york``); at character level the
separator would be empty — the algorithm is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pairs(arr: Column) -> Column:
    """In-row adjacent (pa, pb) structs; empty for arrays shorter than 2."""
    pair = lambda i: F.struct(  # noqa: E731
        F.element_at(arr, i).alias("pa"), F.element_at(arr, i + 1).alias("pb")
    )
    return F.when(
        F.size(arr) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(arr) - 1), pair),
    ).otherwise(F.expr("CAST(array() AS array<struct<pa string, pb string>>)"))


def _merge_fold(arr: Column, pa: Column, pb: Column, merged: Column) -> Column:
    """Greedy leftmost merge of adjacent (pa, pb) into ``merged``."""
    init = F.expr("CAST(array() AS array<string>)")
    step = lambda acc, x: F.when(  # noqa: E731
        (F.size(acc) > 0) & (F.element_at(acc, -1) == pa) & (x == pb),
        F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
    ).otherwise(F.concat(acc, F.array(x)))
    return F.aggregate(arr, init, step)


def bpe_merges(docs: DataFrame, rounds: int = 3, sep: str = "+") -> DataFrame:
    """Train ``rounds`` BPE merges over the corpus' token sequences.

    Returns one row per round: (merge_round, merged_pair, pair_count,
    symbols_after) — the learned merge table plus the post-merge corpus
    symbol count (the convergence metric a tokenizer build reports).
    """
    arr = docs.select(F.split(F.col("text"), " ").alias("a"))
    out_rows = []
    for r in range(1, rounds + 1):
        pairs = arr.select(F.explode(_pairs(F.col("a"))).alias("p")).select(
            F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb")
        )
        best = (
            pairs.groupBy("pa", "pb")
            .agg(F.count(F.lit(1)).alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "pa", "pb")
            .limit(1)
            .select(
                "pa",
                "pb",
                F.concat_ws(sep, "pa", "pb").alias("merged"),
                "pair_count",
            )
        )
        merged_arr = arr.crossJoin(F.broadcast(best)).select(
            _merge_fold(F.col("a"), F.col("pa"), F.col("pb"), F.col("merged")).alias("a")
        )
        stats = merged_arr.agg(F.sum(F.size("a")).alias("symbols_after"))
        out_rows.append(
            best.crossJoin(F.broadcast(stats)).select(
                F.lit(r).cast("long").alias("merge_round"),
                F.col("merged").alias("merged_pair"),
                "pair_count",
                "symbols_after",
            )
        )
        arr = merged_arr
    out = out_rows[0]
    for o in out_rows[1:]:
        out = out.unionByName(o)
    return out.orderBy("merge_round")


def apply_merges(docs: DataFrame, merges: list[tuple[str, str, str]]) -> DataFrame:
    """Apply an already-trained merge table (pa, pb, merged) in order —
    the tokenizer's ENCODE step, a pure map-side fold chain."""
    arr = F.split(F.col("text"), " ")
    for pa, pb, merged in merges:
        arr = _merge_fold(arr, F.lit(pa), F.lit(pb), F.lit(merged))
    return docs.select("doc_id", arr.alias("symbols"))


def train_merge_rules(
    docs: DataFrame, rounds: int = 3, sep: str = "+"
) -> list[tuple[str, str, str]]:
    """Collected merge table [(pa, pb, merged)] — one 1-row collect per
    round (the BPE analog of driver-side k-means centroids); feeds
    :func:`apply_merges` for the encode step."""
    arr = docs.select(F.split(F.col("text"), " ").alias("a"))
    rules: list[tuple[str, str, str]] = []
    for _ in range(rounds):
        pairs = arr.select(F.explode(_pairs(F.col("a"))).alias("p")).select(
            F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb")
        )
        rows = (
            pairs.groupBy("pa", "pb")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), "pa", "pb")
            .limit(1)
            .collect()
        )
        if not rows:
            break
        pa, pb = rows[0]["pa"], rows[0]["pb"]
        merged = f"{pa}{sep}{pb}"
        rules.append((pa, pb, merged))
        arr = arr.select(
            _merge_fold(F.col("a"), F.lit(pa), F.lit(pb), F.lit(merged)).alias("a")
        ).localCheckpoint(eager=False)
    return rules
