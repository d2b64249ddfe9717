"""Structured Streaming source over native Iceberg tables
(streaming/native_source.py): replay-from-creation, checkpointed
incremental batches, replace-snapshot suppression, delete-snapshot
refusal/skip, starting_version=latest, and identity-partition injection.

Reference parity: the row-level LIVE upgrade of the reference's watch
loop (cli.py:980-1023, which stops at snapshot detection); semantics
mirror Iceberg's own Spark streaming read (append snapshots only,
replace skipped, delete/overwrite refused unless skipped)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from iceberg_meta_spark.sources.iceberg_write import (
    append_dataframe,
    create_table,
)
from iceberg_meta_spark.streaming.native_source import register_native_source

_TS = 1713139200000


def _fresh(name: str) -> str:
    base = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(base, ignore_errors=True)
    return os.path.join(base, "t")


def _append(spark, table, rows, ts_off, branch=None):
    append_dataframe(
        spark,
        spark.createDataFrame(rows, "region string, id long, val long")
        .coalesce(1),
        table, timestamp_ms=_TS + ts_off, branch=branch,
    )


def _run_to_parquet(spark, table, sink, ckpt, **opts):
    reader = spark.readStream.format("iceberg_native").option("path", table)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (reader.load().writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


@pytest.fixture()
def streamed(spark):
    register_native_source(spark)
    return spark


def test_replay_then_incremental(streamed):
    spark = streamed
    table = _fresh("ns_stream_basic")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long"),
                                (3, "val", "long")],
                 partition_fields=[("region", 1, 1000)])
    _append(spark, table, [("emea", i, i * 10) for i in range(5)], 60_000)
    _append(spark, table, [("apac", 5 + i, (5 + i) * 10) for i in range(5)],
            120_000)
    sink = os.path.join(os.path.dirname(table), "sink")
    ckpt = os.path.join(os.path.dirname(table), "ckpt")
    _run_to_parquet(spark, table, sink, ckpt)
    got = spark.read.parquet(sink)
    assert got.count() == 10
    # identity partition values injected (Hive-layout files drop the col)
    assert {r.region for r in got.select("region").distinct().collect()} \
        == {"emea", "apac"}
    assert sorted(r.id for r in got.collect()) == list(range(10))
    # incremental: only the NEW commit's rows arrive on the next run
    _append(spark, table, [("emea", 100 + i, i) for i in range(3)], 180_000)
    _run_to_parquet(spark, table, sink, ckpt)
    got2 = spark.read.parquet(sink)
    assert got2.count() == 13
    assert sorted(r.id for r in got2.where("id >= 100").collect()) \
        == [100, 101, 102]
    # no new commits -> idempotent
    _run_to_parquet(spark, table, sink, ckpt)
    assert spark.read.parquet(sink).count() == 13


def test_replace_snapshot_emits_no_rows(streamed):
    """Compaction rewrites files but adds no logical rows: the replace
    snapshot must not re-serve the rewritten data."""
    from iceberg_meta_spark.sources.iceberg_maintenance import rewrite_data_files

    spark = streamed
    table = _fresh("ns_stream_replace")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long"),
                                (3, "val", "long")])
    for b in range(3):
        _append(spark, table, [("emea", b * 4 + i, i) for i in range(4)],
                60_000 * (b + 1))
    sink = os.path.join(os.path.dirname(table), "sink")
    ckpt = os.path.join(os.path.dirname(table), "ckpt")
    _run_to_parquet(spark, table, sink, ckpt)
    assert spark.read.parquet(sink).count() == 12
    res = rewrite_data_files(spark, table, timestamp_ms=_TS + 600_000)
    assert res["rewritten_files"] >= 2
    _run_to_parquet(spark, table, sink, ckpt)
    assert spark.read.parquet(sink).count() == 12  # nothing re-served
    # and appends after the compaction still flow
    _append(spark, table, [("apac", 900, 9)], 700_000)
    _run_to_parquet(spark, table, sink, ckpt)
    assert spark.read.parquet(sink).count() == 13


def test_delete_snapshot_fails_unless_skipped(streamed):
    from pyspark.sql.streaming import StreamingQueryException

    from iceberg_meta_spark.sources.iceberg_write import delete_where

    spark = streamed
    table = _fresh("ns_stream_delete")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long"),
                                (3, "val", "long")])
    _append(spark, table, [("emea", i, i) for i in range(6)], 60_000)
    delete_where(spark, table, ("id", 2, 3), timestamp_ms=_TS + 120_000)
    sink = os.path.join(os.path.dirname(table), "sink")
    ckpt = os.path.join(os.path.dirname(table), "ckpt")
    with pytest.raises(StreamingQueryException, match="appends only"):
        _run_to_parquet(spark, table, sink, ckpt)
    # skip_deletes: the append's rows flow, the delete snapshot is skipped
    # (fresh checkpoint: the failed one may have committed a partial batch)
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(sink, ignore_errors=True)
    _run_to_parquet(spark, table, sink, ckpt, skip_deletes="true")
    assert spark.read.parquet(sink).count() == 6


def test_starting_version_latest_serves_only_new_commits(streamed):
    spark = streamed
    table = _fresh("ns_stream_latest")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long"),
                                (3, "val", "long")])
    _append(spark, table, [("emea", i, i) for i in range(4)], 60_000)
    sink = os.path.join(os.path.dirname(table), "sink")
    ckpt = os.path.join(os.path.dirname(table), "ckpt")
    _run_to_parquet(spark, table, sink, ckpt, starting_version="latest")
    # sink dir may not exist if zero rows were written
    assert not os.path.exists(os.path.join(sink, "_spark_metadata")) or \
        spark.read.parquet(sink).count() == 0
    _append(spark, table, [("apac", 100, 1)], 120_000)
    _run_to_parquet(spark, table, sink, ckpt, starting_version="latest")
    got = spark.read.parquet(sink)
    assert [r.id for r in got.collect()] == [100]


def test_schema_comes_from_table_metadata(streamed):
    spark = streamed
    table = _fresh("ns_stream_schema")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long"),
                                (3, "val", "long")])
    df = spark.readStream.format("iceberg_native").option("path", table).load()
    assert df.schema.simpleString() == \
        "struct<region:string,id:bigint,val:bigint>"


def test_empty_table_streams_zero_rows(streamed):
    spark = streamed
    table = _fresh("ns_stream_empty")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long"),
                                (3, "val", "long")])
    sink = os.path.join(os.path.dirname(table), "sink")
    ckpt = os.path.join(os.path.dirname(table), "ckpt")
    _run_to_parquet(spark, table, sink, ckpt)  # no snapshots at all
    assert not os.path.exists(os.path.join(sink, "_spark_metadata")) or \
        spark.read.parquet(sink).count() == 0


def test_batch_read_applies_position_deletes(streamed):
    from iceberg_meta_spark.sources.iceberg_scan import scan_table
    from iceberg_meta_spark.sources.iceberg_write import delete_where

    spark = streamed
    table = _fresh("ns_batch_posdel")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long"),
                                (3, "val", "long")],
                 partition_fields=[("region", 1, 1000)])
    _append(spark, table, [("emea", i, i * 10) for i in range(8)], 60_000)
    delete_where(spark, table, ("id", 2, 4), timestamp_ms=_TS + 120_000)
    got = (spark.read.format("iceberg_native").option("path", table).load()
           .orderBy("id").collect())
    assert [r.id for r in got] == [0, 1, 5, 6, 7]
    assert {r.region for r in got} == {"emea"}  # partition value injected
    # matches the merge-on-read scan exactly
    want = scan_table(spark, table).orderBy("id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # snapshot_id option time-travels to the pre-delete state
    before = (spark.read.format("iceberg_native").option("path", table)
              .option("snapshot_id", "1").load().count())
    assert before == 8


def test_batch_read_applies_equality_deletes(streamed):
    """MERGE INTO leaves an equality delete hiding the OLD row version
    (strict data_seq < delete_seq): the batch reader must serve the
    merged state — old (2, 2) hidden, upserted (2, 99) visible because
    it was committed WITH the delete at the same sequence number — and
    match scan_table row-for-row."""
    from iceberg_meta_spark.sources.iceberg_scan import scan_table
    from iceberg_meta_spark.sources.iceberg_write import merge_into

    spark = streamed
    table = _fresh("ns_batch_eqdel")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    append_dataframe(
        spark,
        spark.createDataFrame([(i, i) for i in range(4)], "id long, val long")
        .coalesce(1), table, timestamp_ms=_TS + 60_000)
    merge_into(spark,
               spark.createDataFrame([(2, 99), (10, 100)],
                                     "id long, val long").coalesce(1),
               table, key_cols=["id"], timestamp_ms=_TS + 120_000)
    got = (spark.read.format("iceberg_native").option("path", table)
           .load().orderBy("id").collect())
    assert [(r.id, r.val) for r in got] == [(0, 0), (1, 1), (2, 99),
                                            (3, 3), (10, 100)]
    want = scan_table(spark, table).orderBy("id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_batch_pushdown_prunes_files(streamed):
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
        StringStartsWith,
    )

    from iceberg_meta_spark.streaming.native_source import (
        IcebergNativeBatchReader,
    )

    spark = streamed
    table = _fresh("ns_batch_push")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long"),
                                (3, "val", "long")])
    _append(spark, table, [("emea", i, i * 10) for i in range(10)], 60_000)
    _append(spark, table, [("apac", 10 + i, (10 + i) * 10) for i in range(10)],
            120_000)
    # unit: the reader prunes partitions from pushed comparison filters
    r = IcebergNativeBatchReader({"path": table})
    residual = list(r.pushFilters([GreaterThanOrEqual(("id",), 15),
                                   LessThan(("id",), 18),
                                   StringStartsWith(("region",), "a")]))
    assert len(residual) == 3  # everything residual: Spark re-filters rows
    assert len(r.partitions()) == 1  # file [0..9] pruned by id bounds
    # equality on the string column prunes via the truncated string bounds
    r2 = IcebergNativeBatchReader({"path": table})
    r2.pushFilters([EqualTo(("region",), "emea")])
    assert len(r2.partitions()) == 1
    # e2e: the filtered read returns exactly the right rows
    got = (spark.read.format("iceberg_native").option("path", table).load()
           .where("id >= 15 AND id < 18").orderBy("id").collect())
    assert [r_.id for r_ in got] == [15, 16, 17]


def test_staged_branch_commits_stream_only_after_publish(streamed):
    """Write-audit-publish x streaming: a commit STAGED on a branch is NOT
    an ancestor of main, so the stream must not serve it until the
    fast-forward publish — then it flows in the next batch."""
    from iceberg_meta_spark.sources.iceberg_write import fast_forward

    spark = streamed
    table = _fresh("ns_stream_wap")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long"),
                                (3, "val", "long")])
    _append(spark, table, [("emea", i, i) for i in range(3)], 60_000)
    _append(spark, table, [("apac", 10 + i, i) for i in range(3)], 120_000,
            branch="audit")
    sink = os.path.join(os.path.dirname(table), "sink")
    ckpt = os.path.join(os.path.dirname(table), "ckpt")
    _run_to_parquet(spark, table, sink, ckpt)
    assert sorted(r.id for r in spark.read.parquet(sink).collect()) == [0, 1, 2]
    fast_forward(table, "main", "audit", timestamp_ms=_TS + 180_000)
    _run_to_parquet(spark, table, sink, ckpt)
    assert sorted(r.id for r in spark.read.parquet(sink).collect()) \
        == [0, 1, 2, 10, 11, 12]


def test_batch_read_honors_snapshot_id_zero(streamed):
    """ADVICE r9: a legitimate snapshot id of 0 (legal for engine-written
    tables with random 64-bit ids) must time-travel to THAT snapshot, not
    silently fall back to current via `0 or current`."""
    import json

    spark = streamed
    table = _fresh("nb_snap0")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long"),
                                (3, "val", "long")])
    _append(spark, table, [("emea", 1, 10)], 60_000)
    _append(spark, table, [("apac", 2, 20)], 120_000)
    # renumber the FIRST snapshot to id 0 (metadata-only: the batch reader
    # resolves files through the snapshot's manifest-list, and manifest
    # entries carry their own status/seq)
    meta_dir = os.path.join(table, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = int(fh.read())
    mpath = os.path.join(meta_dir, f"v{v}.metadata.json")
    with open(mpath) as fh:
        md = json.load(fh)
    first = min(s["snapshot-id"] for s in md["snapshots"])
    for s in md["snapshots"]:
        if s["snapshot-id"] == first:
            s["snapshot-id"] = 0
        if s.get("parent-snapshot-id") == first:
            s["parent-snapshot-id"] = 0
    for e in md.get("snapshot-log", []):
        if e["snapshot-id"] == first:
            e["snapshot-id"] = 0
    with open(mpath, "w") as fh:
        json.dump(md, fh)
    got = (
        spark.read.format("iceberg_native").option("path", table)
        .option("snapshot_id", "0").load()
        .select("id").collect()
    )
    assert sorted(r.id for r in got) == [1]  # first snapshot only, not both
