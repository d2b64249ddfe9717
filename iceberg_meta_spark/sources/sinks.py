"""Output sinks (reference S9/S10).

The reference serializes collected row dicts to JSON/CSV with optional column
projection (output.py:21-60) and appends/overwrites row data through pyiceberg
(demo.py:71-74, seed.py:77-80). Here both are distributed writes: the
projection happens in the plan (column pruning reaches the scan) and the
serialization runs on executors — no driver materialization at any size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _project(df: DataFrame, columns: Sequence[str] | None) -> DataFrame:
    """S10 column projection: keep the requested columns in request order
    (unknown names raise, mirroring a KeyError in the reference's row-dict
    indexing at output.py:52-57)."""
    if not columns:
        return df
    return df.select(*columns)


def write_json(df: DataFrame, path: str, columns: Sequence[str] | None = None) -> None:
    """S10 JSON sink: one JSON object per line (the reference emits a JSON
    array; JSONL is the distributed-native equivalent of the same records)."""
    _project(df, columns).write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str, columns: Sequence[str] | None = None) -> None:
    """S10 CSV sink with header row (output.py:49-60 writes header + rows)."""
    _project(df, columns).write.mode("overwrite").option("header", "true").csv(path)


def json_lines(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """S10 console-JSON analog: (json string) rows via ``to_json(struct(*))``
    — stays a DataFrame (collect only ever happens presentation-side)."""
    from pyspark.sql import functions as F

    p = _project(df, columns)
    return p.select(F.to_json(F.struct(*[F.col(c) for c in p.columns])).alias("json"))


def append_parquet(df: DataFrame, path: str) -> None:
    """S9 write path on the parquet source: append row data.

    On an Iceberg deployment this is ``df.writeTo(table).append()`` (snapshot
    commit through the catalog); the fixture source appends parquet files —
    same executor-side write fan-out, no catalog transaction.
    """
    df.write.mode("append").parquet(path)


def overwrite_parquet(df: DataFrame, path: str) -> None:
    """S9 overwrite (reference table.overwrite -> ``writeTo(...).overwritePartitions()``)."""
    df.write.mode("overwrite").parquet(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shuffle_salt: str = "shard",
    key_col: str = "doc_id",
    max_records_per_file: int | None = None,
) -> None:
    """Training-corpus export: ``n_shards`` deterministic, balanced shards
    with a reproducible within-shard order.

    Shard assignment and ordering both derive from ``md5(salt:key)`` — a
    content-independent uniform hash, so (a) shards are balanced regardless
    of key skew, (b) the global shuffle is reproducible from the salt alone
    (re-running with the same salt yields byte-identical shards), and (c) no
    engine-specific RNG is involved. ``repartition(n, shard)`` is the ONE
    shuffle; ``sortWithinPartitions`` orders each shard without any global
    sort barrier, and ``maxRecordsPerFile`` bounds file size so downstream
    loaders stream fixed-size pieces.
    """
    from pyspark.sql import functions as F

    key = F.md5(F.concat_ws(":", F.lit(shuffle_salt), F.col(key_col).cast("string")))
    sharded = (
        df.withColumn("__shuffle_key", key)
        .withColumn(
            "__shard",
            (F.conv(F.substring("__shuffle_key", 1, 8), 16, 10).cast("long") % n_shards).cast("int"),
        )
        .repartition(n_shards, F.col("__shard"))
        .sortWithinPartitions("__shuffle_key")
    )
    writer = sharded.write.mode("overwrite").partitionBy("__shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


# ---------------------------------------------------------------------------
# S9 Iceberg write path (jar-gated). The reference appends/overwrites through
# pyiceberg table transactions (demo.py:71-74: table.append / table.overwrite);
# on Spark the same commits go through the DataFrameWriterV2 — writeTo(t)
# .append() / .overwritePartitions() — executor-parallel file writes plus one
# catalog snapshot commit. The SQL-text equivalents are pure functions so the
# statement shape is unit-testable without the runtime jar (like S2's conf).
# ---------------------------------------------------------------------------


def iceberg_write_sql(table: str, mode: str, columns: Sequence[str] | None = None) -> str:
    """SQL text equivalent of the v2 write: ``INSERT INTO`` (append) or
    ``INSERT OVERWRITE`` (dynamic partition overwrite) from a named view."""
    if mode not in ("append", "overwrite_partitions"):
        raise ValueError(f"unknown write mode: {mode}")
    cols = f" ({', '.join(columns)})" if columns else ""
    proj = ", ".join(columns) if columns else "*"
    verb = "INSERT INTO" if mode == "append" else "INSERT OVERWRITE"
    return f"{verb} {table}{cols} SELECT {proj} FROM __source__"


def append_iceberg(df: DataFrame, table: str) -> None:
    """S9 append through the catalog (one new snapshot). Jar-gated."""
    from iceberg_meta_spark.sources.iceberg import _require_runtime

    _require_runtime(df.sparkSession)
    df.writeTo(table).append()


def overwrite_partitions_iceberg(df: DataFrame, table: str) -> None:
    """S9 dynamic-partition overwrite (reference ``table.overwrite``). Jar-gated."""
    from iceberg_meta_spark.sources.iceberg import _require_runtime

    _require_runtime(df.sparkSession)
    df.writeTo(table).overwritePartitions()


def write_clustered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    bits: int = 16,
    n_files: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Z-order-clustered rewrite — the sink the layout PLANNERS
    (operators/maintenance.py zorder_layout / hilbert_layout, which only
    *score* a layout) feed: physically rewrite rows so each output file is
    range-local in BOTH (xcol, ycol), the OPTIMIZE ... ZORDER BY shape.

    Mechanics: min-max-normalize both columns to ``bits``-wide grid
    coordinates (one tiny bounds aggregate, broadcast), Morton-interleave
    them (the planner's exact ``_interleave_expr``), then
    ``repartitionByRange(n_files)`` on the z-value + sort within each
    partition before writing.  Range partitioning keeps files balanced AND
    z-contiguous — a plain ``repartition`` would hash z-locality away; a
    global ``orderBy`` would funnel everything through one sort only to
    re-split it.  Per-file min/max zone maps then prune multi-column range
    predicates (``meta_pruning_after_zorder`` measures exactly this
    payoff).

    Scale: bounds are one shrinking aggregate; the write is one range
    shuffle + local sorts — the same cost as any sorted rewrite.
    """
    from iceberg_meta_spark.operators.maintenance import _interleave_expr

    bounds = df.agg(
        F.min(xcol).alias("xlo"), F.max(xcol).alias("xhi"),
        F.min(ycol).alias("ylo"), F.max(ycol).alias("yhi"),
    )
    grid = (1 << bits) - 1
    norm = (
        lambda c, lo, hi: F.expr(
            f"CAST(CASE WHEN {hi} = {lo} THEN 0 ELSE (({c} - {lo}) * {grid}) DIV ({hi} - {lo}) END AS BIGINT)"
        )
    )
    z = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__zx", norm(xcol, "xlo", "xhi")
    ).withColumn("__zy", norm(ycol, "ylo", "yhi")).withColumn(
        "__z", F.expr(_interleave_expr("__zx", "__zy", bits))
    ).drop("xlo", "xhi", "ylo", "yhi", "__zx", "__zy")
    out = (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    w = out.write.mode("overwrite")
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Bucketed managed-table write — the storage layout that makes
    repeated large-table equi-joins shuffle-FREE.

    ``bucketBy(n, key)`` hash-partitions rows into a fixed bucket count
    recorded in the table metadata; two tables bucketed the same way on
    their join key then join with ZERO Exchange on either side (Catalyst
    proves co-partitioning from the catalog), and ``sortBy`` additionally
    pre-sorts within buckets so sort-merge join skips its sort. At 100 TB
    this converts every recurring fact-fact join from a full-corpus
    shuffle into a local zip — the single biggest repeated-query win
    bucketing buys (Iceberg expresses the same contract as a
    ``bucket(N, col)`` partition transform, reference catalog tables).

    Spark constraint: bucketed writes must go through ``saveAsTable``
    (the bucket spec lives in the metastore, not the parquet footers).
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        w = w.sortBy(list(sort_cols))
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "append",
    dynamic: bool = True,
) -> None:
    """Hive-layout partitioned parquet write with DYNAMIC partition
    overwrite — the production incremental-load semantics (the parquet
    analog of :func:`overwrite_partitions_iceberg`'s
    ``overwritePartitions``).

    With ``mode='overwrite'`` and ``dynamic=True``, only the partitions
    PRESENT in ``df`` are replaced; untouched partitions survive. Spark's
    default (``partitionOverwriteMode=static``) silently truncates the
    whole table first — the classic nightly-backfill data-loss footgun —
    so the mode is set per-write via ``option()``, never globally, and is
    scoped to this write only.
    """
    writer = df.write.mode(mode)
    if mode == "overwrite":
        writer = writer.option(
            "partitionOverwriteMode", "dynamic" if dynamic else "static"
        )
    writer.partitionBy(*partition_cols).parquet(path)


def write_orc(df: DataFrame, path: str, columns: Sequence[str] | None = None) -> None:
    """S10 columnar sink, ORC flavor (zlib, Spark's builtin writer) — for
    downstream consumers pinned to the Hive/ORC toolchain; same projection
    contract as the JSON/CSV sinks."""
    _project(df, columns).write.mode("overwrite").orc(path)
