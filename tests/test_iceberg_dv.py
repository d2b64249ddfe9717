"""v3 deletion vectors (sources/iceberg_dv.py + scan integration):
roaring round trips across container types and 32-bit buckets, the
run-container read path, DV blob framing (magic + big-endian length +
CRC-32), and the end-to-end v3 table: write DVs into a Puffin file,
commit them as position-delete entries with referenced_data_file/
content_offset/content_size_in_bytes (spec field-ids 143/144/145), and
scan merge-on-read with executor-side bitmap decode.

Byte formats from the public specs only: iceberg.apache.org/spec
§ Deletion Vectors, the Puffin spec (deletion-vector-v1), and the
RoaringFormatSpec."""

from __future__ import annotations

import glob
import os
import shutil
import struct
import tempfile

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_meta_spark.sources.iceberg_dv import (
    _SERIAL_COOKIE_RUN,
    commit_dv_files,
    decode_dv_blob,
    deserialize_positions,
    encode_dv_blob,
    read_dv_positions,
    serialize_positions,
    write_dv_file,
)

_TS = 1713139200000


# ------------------------------------------------------------- roaring
def test_roaring_round_trip_shapes():
    cases = [
        [],
        [0],
        [0, 1, 2, 65535, 65536, 131072],       # multiple 16-bit containers
        list(range(5000)),                      # bitmap container (>4096)
        [2**32 - 1, 2**32, 2**33 + 7],          # multiple 32-bit buckets
        [2**40, 2**40 + 1],                     # high bucket only
    ]
    for positions in cases:
        got = deserialize_positions(serialize_positions(positions))
        assert got.tolist() == sorted(set(positions)), positions


def test_roaring_bitmap_container_layout():
    """>4096 values in one 16-bit container serialize as an 8 KiB bitset
    (RoaringFormatSpec), array containers as 2-byte LE values."""
    buf = serialize_positions(range(5000))
    # portable-64 header: 1 bucket, high key 0
    assert struct.unpack_from("<Q", buf, 0)[0] == 1
    assert struct.unpack_from("<I", buf, 8)[0] == 0
    # 32-bit stream: cookie 12346, 1 container, card-1 = 4999, 8192-byte body
    cookie, n = struct.unpack_from("<II", buf, 12)
    assert (cookie, n) == (12346, 1)
    key, card_m1 = struct.unpack_from("<HH", buf, 20)
    assert (key, card_m1) == (0, 4999)
    assert len(buf) == 12 + 8 + 4 + 4 + 8192


def test_roaring_reads_run_containers():
    """The reader must accept the run-container layout other writers emit
    (cookie 12347, runFlag bitset, (start, len-1) pairs)."""
    # one container, run flag set, runs [3..6] and [10..10]
    rb32 = struct.pack("<I", _SERIAL_COOKIE_RUN | (0 << 16))  # n-1 = 0
    rb32 += bytes([0b1])                       # runFlag: container 0 is runs
    rb32 += struct.pack("<HH", 0, 4)           # key 0, cardinality-1 = 4
    # n < 4 -> no offset header
    rb32 += struct.pack("<H", 2)               # 2 runs
    rb32 += struct.pack("<HH", 3, 3)           # 3..6
    rb32 += struct.pack("<HH", 10, 0)          # 10
    buf = struct.pack("<Q", 1) + struct.pack("<I", 0) + rb32
    assert deserialize_positions(buf).tolist() == [3, 4, 5, 6, 10]


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_roaring_round_trip_property(positions):
    got = deserialize_positions(serialize_positions(positions))
    assert got.tolist() == sorted(set(positions))


# ------------------------------------------------------------- DV blob
def test_dv_blob_framing_and_crc():
    blob = encode_dv_blob([1, 5, 9])
    assert decode_dv_blob(blob).tolist() == [1, 5, 9]
    # big-endian length of (magic + vector)
    (length,) = struct.unpack_from(">I", blob, 0)
    assert length == len(blob) - 8
    assert blob[4:8] == bytes((0xD1, 0xD3, 0x39, 0x64))
    # corrupt one vector byte: CRC must catch it
    bad = bytearray(blob)
    bad[10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_dv_blob(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        decode_dv_blob(blob[:4] + b"XXXX" + blob[8:])


# ------------------------------------------------------- v3 end to end
def _v3_table(spark, name: str):
    from iceberg_meta_spark.sources.iceberg_write import (
        commit_append,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(
        table,
        fields=[(1, "id", "long"), (2, "val", "long")],
        format_version=3,
    )
    paths = []
    for b, ids in enumerate((range(0, 10), range(10, 20))):
        rows = [(i, i * 10) for i in ids]
        d = os.path.join(table, "data", f"b{b}")
        (spark.createDataFrame(rows, "id long, val long").coalesce(1)
         .write.mode("overwrite").parquet(d))
        [p] = glob.glob(os.path.join(d, "*.parquet"))
        commit_append(table, [{
            "file_path": p, "record_count": 10,
            "file_size_in_bytes": os.path.getsize(p),
            "lower_bounds": {1: min(ids)}, "upper_bounds": {1: max(ids)},
        }], timestamp_ms=_TS + 60_000 * (b + 1))
        paths.append(p)
    return table, paths


def test_v3_dv_scan_end_to_end(spark):
    from iceberg_meta_spark.sources.iceberg_scan import (
        plan_scan,
        scan_table,
    )

    table, (p1, p2) = _v3_table(spark, "dv_e2e")
    # DVs: kill positions 0 and 3 of file1 (ids 0, 3), position 5 of
    # file2 (id 15) — one Puffin file, one blob per referenced data file
    dv_path = os.path.join(table, "data", "dv-1.puffin")
    entries = write_dv_file(
        dv_path, {p1: [0, 3], p2: [5]}, snapshot_id=3, sequence_number=3
    )
    assert len(entries) == 2
    commit_dv_files(table, entries, timestamp_ms=_TS + 180_000)

    plan = plan_scan(spark, table)
    assert len(plan.deletion_vectors) == 2
    assert plan.position_deletes == []
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == sorted(set(range(20)) - {0, 3, 15})
    # time travel to the pre-DV snapshot still sees every row
    before = sorted(
        r.id for r in scan_table(spark, table, snapshot_id=2).collect()
    )
    assert before == list(range(20))
    # random-access blob read matches the scan's decode
    e1 = next(e for e in entries if e["referenced_data_file"] == p1)
    assert read_dv_positions(
        dv_path, e1["content_offset"], e1["content_size_in_bytes"]
    ).tolist() == [0, 3]


def test_v3_dv_changelog_emits_deletes(spark):
    from iceberg_meta_spark.sources.iceberg_scan import scan_changes

    table, (p1, p2) = _v3_table(spark, "dv_cdc")
    dv_path = os.path.join(table, "data", "dv-1.puffin")
    entries = write_dv_file(
        dv_path, {p1: [1, 2]}, snapshot_id=3, sequence_number=3
    )
    commit_dv_files(table, entries, timestamp_ms=_TS + 180_000)
    changes = scan_changes(spark, table, from_snapshot_id=2,
                           to_snapshot_id=3).collect()
    assert sorted((r.id, r._change_type) for r in changes) == [
        (1, "delete"), (2, "delete"),
    ]


def test_v2_table_refuses_dv_commit(spark):
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    base = os.path.join(tempfile.gettempdir(), "dv_v2_refuse")
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "t")
    create_table(table, fields=[(1, "id", "long")])
    append_dataframe(
        spark, spark.createDataFrame([(1,)], "id long").coalesce(1),
        table, timestamp_ms=_TS + 60_000,
    )
    with pytest.raises(ValueError, match="format-version 3"):
        commit_dv_files(table, [{
            "file_path": "x.puffin", "referenced_data_file": "y.parquet",
            "content_offset": 4, "content_size_in_bytes": 10,
            "record_count": 1, "file_size_in_bytes": 100,
        }], timestamp_ms=_TS + 120_000)


def test_v3_delete_where_writes_and_merges_dvs(spark):
    """DELETE WHERE on a v3 table publishes deletion vectors (not parquet
    position-delete files), and a SECOND delete touching the same data
    file MERGES the previous DV's positions and supersedes its entry —
    the plan never sees two live DVs for one file (spec invariant)."""
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table
    from iceberg_meta_spark.sources.iceberg_write import delete_where

    table, (p1, p2) = _v3_table(spark, "dv_delete_where")
    out = delete_where(spark, table, ("id", 3, 5), timestamp_ms=_TS + 180_000)
    assert out["rows_deleted"] == 3
    plan = plan_scan(spark, table)
    assert plan.position_deletes == []  # v3 wrote DVs, not parquet
    assert len(plan.deletion_vectors) == 1  # ids 3..5 live in file1 only
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == sorted(set(range(20)) - {3, 4, 5})

    # second delete overlaps file1 (merge) and reaches file2 (fresh DV)
    out = delete_where(spark, table, ("id", 8, 12), timestamp_ms=_TS + 240_000)
    assert out["rows_deleted"] == 5
    plan = plan_scan(spark, table)
    by_ref = {}
    for d in plan.deletion_vectors:
        by_ref.setdefault(d["referenced_data_file"], []).append(d)
    assert all(len(v) == 1 for v in by_ref.values()), by_ref  # one DV/file
    assert len(plan.deletion_vectors) == 2
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == sorted(set(range(20)) - {3, 4, 5, 8, 9, 10, 11, 12})
    # already-deleted rows are never re-counted
    out = delete_where(spark, table, ("id", 3, 4), timestamp_ms=_TS + 300_000)
    assert out == {"rows_deleted": 0, "snapshot_id": None}


def test_second_dv_without_supersede_raises(spark):
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan

    table, (p1, p2) = _v3_table(spark, "dv_invariant")
    dv1 = os.path.join(table, "data", "dv-a.puffin")
    commit_dv_files(table, write_dv_file(dv1, {p1: [0]}, 3, 3),
                    timestamp_ms=_TS + 180_000)
    dv2 = os.path.join(table, "data", "dv-b.puffin")
    with pytest.raises(ValueError, match="one DV per data file"):
        commit_dv_files(table, write_dv_file(dv2, {p1: [1]}, 4, 4),
                        timestamp_ms=_TS + 240_000)
    # superseding the first is the sanctioned path
    old = plan_scan(spark, table).deletion_vectors
    commit_dv_files(
        table, write_dv_file(dv2, {p1: [0, 1]}, 4, 4),
        timestamp_ms=_TS + 240_000,
        supersede={(d["path"], d["offset"]) for d in old},
    )
    assert len(plan_scan(spark, table).deletion_vectors) == 1


def test_v3_compaction_absorbs_dvs(spark):
    """rewrite_data_files on a v3 table: files referenced by a deletion
    vector are delete-affected candidates, the group read applies the DV
    (merge-on-read core), and the rewritten files serve identical rows
    with the DV'd rows physically gone."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_data_files,
    )
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table
    from iceberg_meta_spark.sources.iceberg_write import delete_where

    table, (p1, p2) = _v3_table(spark, "dv_compact")
    delete_where(spark, table, ("id", 3, 5), timestamp_ms=_TS + 180_000)
    before = sorted((r.id, r.val) for r in scan_table(spark, table).collect())
    out = rewrite_data_files(spark, table, timestamp_ms=_TS + 240_000)
    assert out["groups"] >= 1
    after = sorted((r.id, r.val) for r in scan_table(spark, table).collect())
    assert after == before  # served rows identical pre/post
    plan = plan_scan(spark, table)
    # the DV'd rows are physically absorbed: total records in live files
    # equals the served row count
    assert sum(f["record_count"] for f in plan.data_files) == len(after)


def test_v3_merge_into_upserts_with_equality_deletes(spark):
    """MERGE INTO on a v3 table: equality deletes remain legal in v3, so
    the upsert publishes normally; parquet position-delete files are
    refused with a guided error."""
    from iceberg_meta_spark.sources.iceberg_scan import scan_table
    from iceberg_meta_spark.sources.iceberg_write import (
        commit_delete_files,
        merge_into,
    )

    table, _ = _v3_table(spark, "dv_merge")
    src = spark.createDataFrame(
        [(5, 999), (100, 1000)], "id long, val long"
    ).coalesce(1)
    merge_into(spark, src, table, ["id"], timestamp_ms=_TS + 180_000)
    got = {r.id: r.val for r in scan_table(spark, table).collect()}
    assert got[5] == 999 and got[100] == 1000 and got[6] == 60
    assert len(got) == 21
    with pytest.raises(ValueError, match="forbids parquet position-delete"):
        commit_delete_files(table, [{
            "file_path": "pos.parquet", "record_count": 1,
            "file_size_in_bytes": 10,
        }], timestamp_ms=_TS + 240_000)


def test_remove_orphans_keeps_dv_puffins(spark):
    """DELETING-pass pin: a deletion vector's Puffin file is a referenced
    file (its path rides a live manifest entry) — orphan cleanup must
    never touch it, and the table reads identically afterwards."""
    from iceberg_meta_spark.sources.iceberg_maintenance import remove_orphans
    from iceberg_meta_spark.sources.iceberg_scan import scan_table
    from iceberg_meta_spark.sources.iceberg_write import delete_where

    table, _ = _v3_table(spark, "dv_orphans")
    delete_where(spark, table, ("id", 3, 5), timestamp_ms=_TS + 180_000)
    before = sorted(r.id for r in scan_table(spark, table).collect())
    puffins = glob.glob(os.path.join(table, "data", "*.puffin"))
    assert puffins
    out = remove_orphans(spark, table, older_than_ms=2**62, dry_run=False)
    assert all(os.path.exists(p) for p in puffins), out
    assert sorted(r.id for r in scan_table(spark, table).collect()) == before


def test_rewrite_deletion_vectors_drops_dangling(spark):
    """After compaction absorbs a DV'd file, the DV is dangling debris —
    rewrite_deletion_vectors drops it in one replace snapshot (planning-
    index detection, no blob reads), served rows identical, and a second
    run is a published-nothing no-op."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_data_files,
        rewrite_deletion_vectors,
    )
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table
    from iceberg_meta_spark.sources.iceberg_write import delete_where

    table, _ = _v3_table(spark, "dv_rewrite_dangling")
    delete_where(spark, table, ("id", 3, 5), timestamp_ms=_TS + 180_000)
    rewrite_data_files(spark, table, timestamp_ms=_TS + 240_000)
    plan = plan_scan(spark, table)
    assert len(plan.deletion_vectors) == 1  # dangling: its file was rewritten
    before = sorted(r.id for r in scan_table(spark, table).collect())
    out = rewrite_deletion_vectors(spark, table, timestamp_ms=_TS + 300_000)
    assert out["dropped"] == 1 and out["snapshot_id"] is not None
    plan = plan_scan(spark, table)
    assert plan.deletion_vectors == []
    assert sorted(r.id for r in scan_table(spark, table).collect()) == before
    # idempotent: nothing left to drop, nothing published
    assert rewrite_deletion_vectors(spark, table) == {
        "dropped": 0, "snapshot_id": None,
    }


def test_batch_datasource_applies_deletion_vectors(spark):
    """The Python DataSource batch face must decode v3 DVs per partition
    (random-access blob read) — before r10 it would have treated the
    Puffin entry as a parquet position-delete file."""
    from iceberg_meta_spark.streaming.native_source import (
        register_native_source,
    )

    table, (p1, p2) = _v3_table(spark, "dv_batch_ds")
    dv_path = os.path.join(table, "data", "dv-1.puffin")
    entries = write_dv_file(
        dv_path, {p1: [0, 3], p2: [5]}, snapshot_id=3, sequence_number=3
    )
    commit_dv_files(table, entries, timestamp_ms=_TS + 180_000)
    register_native_source(spark)
    got = (
        spark.read.format("iceberg_native").option("path", table)
        .load().select("id").collect()
    )
    assert sorted(r.id for r in got) == sorted(set(range(20)) - {0, 3, 15})
