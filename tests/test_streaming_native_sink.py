"""Streaming SINK into native Iceberg tables (streaming/native_sink.py):
grow across micro-batches, restart from checkpoint appends only new data,
replayed epochs publish nothing (exactly-once), empty batches commit
nothing, and the streamed table reads back through scan_table and the
streaming SOURCE (full write->read streaming loop on the table format).

Reference parity: extension — the reference's watch loop is read-side
only; semantics mirror Iceberg's Spark writeStream (commit-per-epoch,
idempotent replay keyed on the epoch id in the snapshot summary)."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from iceberg_meta_spark.sources.iceberg_scan import scan_table
from iceberg_meta_spark.sources.iceberg_write import create_table
from iceberg_meta_spark.streaming.native_sink import (
    append_epoch,
    write_stream,
)

_TS = 1713139200000
_SCHEMA = "id long, val long"


def _fresh(name: str) -> str:
    base = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    return base


def _snapshots(table: str) -> list[dict]:
    meta = os.path.join(table, "metadata")
    with open(os.path.join(meta, "version-hint.text")) as fh:
        v = int(fh.read())
    with open(os.path.join(meta, f"v{v}.metadata.json")) as fh:
        return json.load(fh)["snapshots"]


def _put_ndjson(src: str, name: str, rows: list[tuple[int, int]]) -> None:
    with open(os.path.join(src, name), "w") as fh:
        for i, v in rows:
            fh.write(json.dumps({"id": i, "val": v}) + "\n")


def _run(spark, src: str, table: str, ckpt: str) -> None:
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch
        .json(src)
    )
    q = write_stream(stream, table, ckpt).trigger(availableNow=True).start()
    q.awaitTermination(120)


def test_grow_restart_and_exactly_once(spark):
    base = _fresh("native_sink_live")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    table = os.path.join(base, "t")
    os.makedirs(src)
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])

    _put_ndjson(src, "a.json", [(1, 10), (2, 20)])
    _put_ndjson(src, "b.json", [(3, 30)])
    _run(spark, src, table, ckpt)
    snaps = _snapshots(table)
    assert len(snaps) == 2  # one append snapshot per micro-batch
    assert {s["summary"]["streaming.epoch-id"] for s in snaps} == {"0", "1"}
    sink_ids = {s["summary"]["streaming.sink-id"] for s in snaps}
    assert len(sink_ids) == 1
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == [1, 2, 3]

    # restart from the SAME checkpoint with one new file: exactly one new
    # snapshot, previous epochs untouched
    _put_ndjson(src, "c.json", [(4, 40)])
    _run(spark, src, table, ckpt)
    snaps = _snapshots(table)
    assert len(snaps) == 3
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == [1, 2, 3, 4]

    # replayed epoch (crash after table commit, before checkpoint
    # advance): publishes NOTHING even with a non-empty batch
    [sink_id] = sink_ids
    df = spark.createDataFrame([(99, 990)], _SCHEMA)
    out = append_epoch(df, 0, table, sink_id)
    assert out == {"committed": False, "epoch_id": 0, "snapshot_id": None}
    assert len(_snapshots(table)) == 3
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == [1, 2, 3, 4]  # 99 never appeared

    # a NEW epoch commits once, then its own replay is a no-op
    out1 = append_epoch(df, 7, table, sink_id)
    assert out1["committed"] is True
    out2 = append_epoch(df, 7, table, sink_id)
    assert out2["committed"] is False
    assert len(_snapshots(table)) == 4

    # empty batch: no snapshot
    empty = spark.createDataFrame([], _SCHEMA)
    out3 = append_epoch(empty, 8, table, sink_id)
    assert out3["committed"] is False
    assert len(_snapshots(table)) == 4


def test_streamed_table_round_trips_through_streaming_source(spark):
    """Full streaming loop on the table format: writeStream (sink) ->
    native table -> readStream (source) -> parquet, rows preserved."""
    from iceberg_meta_spark.streaming.native_source import (
        register_native_source,
    )

    base = _fresh("native_sink_loop")
    src = os.path.join(base, "src")
    table = os.path.join(base, "t")
    os.makedirs(src)
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    _put_ndjson(src, "a.json", [(1, 10), (2, 20)])
    _put_ndjson(src, "b.json", [(3, 30)])
    _run(spark, src, table, os.path.join(base, "ckpt_w"))

    register_native_source(spark)
    sink = os.path.join(base, "out")
    q = (
        spark.readStream.format("iceberg_native").option("path", table)
        .load()
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", os.path.join(base, "ckpt_r"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted((r.id, r.val) for r in spark.read.parquet(sink).collect())
    assert got == [(1, 10), (2, 20), (3, 30)]


def test_two_sinks_one_table_serialize(spark):
    """Two sinks (distinct sink-ids) appending to ONE table: the commit
    retry loop serializes them; each sink's epochs stay independently
    idempotent."""
    base = _fresh("native_sink_two")
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    a = spark.createDataFrame([(1, 10)], _SCHEMA)
    b = spark.createDataFrame([(2, 20)], _SCHEMA)
    assert append_epoch(a, 0, table, "sink-a")["committed"] is True
    assert append_epoch(b, 0, table, "sink-b")["committed"] is True
    # same epoch id, DIFFERENT sink: not a replay
    assert len(_snapshots(table)) == 2
    assert append_epoch(a, 0, table, "sink-a")["committed"] is False
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == [1, 2]


def test_sink_into_partitioned_table(spark):
    """The sink rides append_dataframe, so an identity-partitioned table
    gets Hive-layout epoch batches with per-file partition tuples; the
    merge-on-read scan re-injects the partition column."""
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan

    base = _fresh("native_sink_part")
    src = os.path.join(base, "src")
    table = os.path.join(base, "t")
    os.makedirs(src)
    from iceberg_meta_spark.sources.iceberg_write import (
        create_table as _ct,
    )

    _ct(table, fields=[(1, "region", "string"), (2, "id", "long")],
        partition_fields=[("region", 1, 1000)])
    with open(os.path.join(src, "a.json"), "w") as fh:
        for region, i in (("emea", 1), ("apac", 2), ("emea", 3)):
            fh.write(json.dumps({"region": region, "id": i}) + "\n")
    stream = spark.readStream.schema("region string, id long").json(src)
    q = (
        write_stream(stream, table, os.path.join(base, "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    plan = plan_scan(spark, table)
    assert {json.dumps(f["part"]) for f in plan.data_files} == {
        '{"region": "apac"}', '{"region": "emea"}',
    }
    got = sorted((r.region, r.id) for r in scan_table(spark, table).collect())
    assert got == [("apac", 2), ("emea", 1), ("emea", 3)]
