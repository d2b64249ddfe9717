"""Bucketed-table layout: pre-shuffle once at write time, join forever free.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides on the join key every query. Bucketing moves that shuffle to WRITE
time: `bucketBy(n, key)` hash-partitions files on disk, and Spark's scan
reports the hash distribution to Catalyst, so a join of two tables
bucketed by the same key into the same bucket count compiles with NO
Exchange on either side (asserted in `test_bucketed_join_has_no_shuffle`).
Add `sortBy(key)` and the per-bucket sort disappears too.

Pick the bucket count once per warehouse (buckets ≈ target cluster
cores × small multiple) — mismatched counts fall back to shuffling the
smaller-bucketed side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    by ``key`` — the co-located layout for shuffle-free equi-joins."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)
