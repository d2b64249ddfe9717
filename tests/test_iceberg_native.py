"""Jar-free Iceberg metadata path: Avro codec + native table reader.

The fixture writer (sources/iceberg_fixture.py) and the reader
(sources/iceberg_native.py via sources/avro_py.py) are independent
implementations of the public specs — the round-trip tests here therefore
cross-check two codepaths, and the codec is additionally pinned to the
Avro spec's own golden bytes so writer+reader can't share a mirrored bug.
"""

from __future__ import annotations

import io
import json
import struct

import pytest
from pyspark.sql import functions as F

from iceberg_meta_spark.sources.avro_py import (
    _read_long,
    _write_long,
    decode_value,
    encode_value,
    read_container,
    write_container,
)
from iceberg_meta_spark.sources.iceberg_fixture import write_fixture_table
from iceberg_meta_spark.sources.iceberg_native import (
    decode_bound,
    load_table_metadata,
    native_column_stats_frame,
    native_entries_frame,
    native_file_ranges,
    native_files_frame,
    native_manifests_frame,
    native_snapshots_frame,
)

# ---------------------------------------------------------------------------
# Avro codec (pure python, no Spark)
# ---------------------------------------------------------------------------


def test_avro_zigzag_golden_bytes():
    """The spec's own zig-zag table: value -> hex."""
    for val, enc in [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"),
    ]:
        out = bytearray()
        _write_long(out, val)
        assert bytes(out) == enc, (val, bytes(out))
        assert _read_long(io.BytesIO(enc)) == val


def test_avro_record_golden_bytes():
    """The spec's worked example: {'a': 27, 'b': 'foo'} -> 36 06 66 6f 6f."""
    sch = {
        "type": "record",
        "name": "test",
        "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}],
    }
    out = bytearray()
    encode_value(sch, {"a": 27, "b": "foo"}, out, {})
    assert bytes(out) == b"\x36\x06foo"
    assert decode_value(sch, io.BytesIO(bytes(out)), {}) == {"a": 27, "b": "foo"}


def test_avro_container_round_trip_all_types_both_codecs():
    sch = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "opt", "type": ["null", "long"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "string"}},
            {"name": "m", "type": {"type": "map", "values": "double"}},
            {"name": "fx", "type": {"type": "fixed", "name": "fx3", "size": 3}},
            {"name": "en", "type": {"type": "enum", "name": "col", "symbols": ["RED", "BLUE"]}},
            {"name": "b", "type": "boolean"},
            {"name": "by", "type": "bytes"},
            {"name": "d", "type": "double"},
        ],
    }
    recs = [
        {"opt": None, "arr": ["x", "y"], "m": {"k": 1.5}, "fx": b"abc",
         "en": "BLUE", "b": True, "by": b"\x00\x01", "d": -2.25},
        {"opt": 42, "arr": [], "m": {}, "fx": b"def",
         "en": "RED", "b": False, "by": b"", "d": 0.0},
    ]
    for codec in ("null", "deflate"):
        schema, meta, got = read_container(write_container(sch, recs, codec=codec))
        assert got == recs
        assert meta["avro.codec"] == codec.encode()
    assert read_container(write_container(sch, []))[2] == []


def test_avro_negative_block_count_decode():
    """Writers may emit a negative item count followed by the block byte
    size (spec: arrays/maps 'If a block's count is negative...'); the
    reader must honor it even though our writer never produces it."""
    sch = {"type": "array", "items": "long"}
    # block: count=-2 (zigzag 3), size=2 bytes, items 1, 2, then end block 0
    raw = b"\x03\x04\x02\x04\x00"
    assert decode_value(sch, io.BytesIO(raw), {}) == [1, 2]


def test_avro_reader_rejects_bad_magic_and_codec():
    with pytest.raises(ValueError, match="magic"):
        read_container(b"NOPE" + b"\x00" * 32)
    sch = {"type": "record", "name": "t", "fields": [{"name": "a", "type": "long"}]}
    blob = write_container(sch, [{"a": 1}])
    # corrupt the declared codec
    bad = blob.replace(b"deflate", b"snappyy", 1)
    with pytest.raises(ValueError, match="codec"):
        read_container(bad)


# ---------------------------------------------------------------------------
# Native table reader over a spec-conformant fixture tree
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def table_dir(tmp_path_factory):
    return write_fixture_table(
        str(tmp_path_factory.mktemp("iceberg")),
        n_snapshots=3,
        manifests_per_snapshot=2,
        files_per_manifest=25,
    )


def test_native_metadata_and_snapshots(spark, table_dir):
    md = load_table_metadata(spark, table_dir)
    assert md["format-version"] == 2
    assert md["current-snapshot-id"] == 3

    snaps = native_snapshots_frame(spark, table_dir).orderBy("snapshot_id").collect()
    assert [r.snapshot_id for r in snaps] == [1, 2, 3]
    assert snaps[0].parent_id is None and snaps[2].parent_id == 2
    assert all(r.operation == "append" for r in snaps)
    assert [r.total_data_files for r in snaps] == [50, 100, 150]
    # committed_us strictly increasing, micros scale
    assert snaps[0].committed_us < snaps[1].committed_us < snaps[2].committed_us
    assert snaps[0].committed_us > 1_000_000_000_000_000


def test_native_manifest_list(spark, table_dir):
    m = native_manifests_frame(spark, table_dir)  # current snapshot = 3
    rows = m.orderBy("manifest_path").collect()
    assert len(rows) == 6  # 3 snapshots x 2 manifests, cumulative list
    assert all(r.added_files_count == 25 and r.content == 0 for r in rows)
    assert sorted({r.added_snapshot_id for r in rows}) == [1, 2, 3]
    # at snapshot 1 only its own manifests are visible
    assert native_manifests_frame(spark, table_dir, snapshot_id=1).count() == 2


def test_native_files_frame_matches_closed_form(spark, table_dir):
    files = native_files_frame(spark, table_dir)
    rows = files.collect()
    assert len(rows) == 150
    assert all(r.snapshot_id == 3 and r.file_format == "PARQUET" for r in rows)
    # closed-form totals from the fixture's arithmetic:
    # record_count = 100 + (i % 7) * 50, size = (1 + i % 9) * 8MiB, i in 0..149
    exp_records = sum(100 + (i % 7) * 50 for i in range(150))
    exp_bytes = sum((1 + i % 9) * 8 * 1024 * 1024 for i in range(150))
    agg = files.agg(
        F.sum("record_count").alias("r"), F.sum("file_size_in_bytes").alias("b")
    ).collect()[0]
    assert (agg.r, agg.b) == (exp_records, exp_bytes)
    # partition rides through as canonical JSON
    assert json.loads(rows[0].part_key).keys() == {"region"}
    # snapshot pruning: snapshot 2 sees 100 files
    assert native_files_frame(spark, table_dir, snapshot_id=2).count() == 100


def test_native_files_decode_placement_is_scale_adaptive(spark, table_dir, monkeypatch):
    """r12: decode placement follows metadata size. Small local metadata
    (<= DRIVER_PLAN_BYTES) decodes driver-side into a local relation —
    zero scan jobs, free re-consumption by multi-pass operators; above
    the threshold the distributed binaryFile + mapInPandas decode (one
    task per manifest — never a driver loop) runs, pinned by forcing the
    threshold to 0. Both placements must return identical rows."""
    from iceberg_meta_spark.sources import iceberg_native

    plan_small = (
        native_files_frame(spark, table_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" not in plan_small  # local relation, no decode job
    rows_small = sorted(
        (r.file_path, r.record_count) for r in native_files_frame(spark, table_dir).collect()
    )

    monkeypatch.setattr(iceberg_native, "DRIVER_PLAN_BYTES", 0)
    plan_big = (
        native_files_frame(spark, table_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan_big
    assert "binaryFile" in plan_big or "BinaryFile" in plan_big
    rows_big = sorted(
        (r.file_path, r.record_count) for r in native_files_frame(spark, table_dir).collect()
    )
    assert rows_small == rows_big


def test_native_entries_and_statuses(spark, table_dir):
    e = native_entries_frame(spark, table_dir)
    assert e.where(F.col("status") == 1).count() == 150  # all ADDED
    assert e.groupBy("manifest_path").count().count() == 6


def test_native_column_stats_and_bounds(spark, table_dir):
    stats = native_column_stats_frame(spark, table_dir)
    # 150 files x 4 tracked fields
    assert stats.count() == 600
    f0 = stats.where(
        (F.col("file_path").endswith("f00000.parquet")) & (F.col("field_id") == 2)
    ).collect()[0]
    assert f0.value_count == 100  # i=0 -> 100 + 0*50
    assert f0.null_count == 2  # (0 + 2) % 5
    assert decode_bound(bytes(f0.lower_bound), "long") == 0
    assert decode_bound(bytes(f0.upper_bound), "long") == 2500

    ranges = native_file_ranges(spark, table_dir, field_id=2).collect()
    assert len(ranges) == 150
    by_path = {r.file_path: (r.lo, r.hi) for r in ranges}
    k = next(p for p in by_path if p.endswith("f00007.parquet"))
    assert by_path[k] == (7000, 9500)


def test_decode_bound_types():
    assert decode_bound(struct.pack("<i", -7), "int") == -7
    assert decode_bound(struct.pack("<q", 1 << 40), "long") == 1 << 40
    assert decode_bound(struct.pack("<d", 2.5), "double") == 2.5
    assert decode_bound(b"abc", "string") == "abc"
    assert decode_bound(None, "long") is None
    with pytest.raises(ValueError):
        decode_bound(b"x", "decimal(10,2)")


def test_native_frames_feed_existing_operators(spark, table_dir):
    """The point of matching sources/iceberg.py shapes: the §2 kernels run
    on a native-read REAL metadata tree unchanged."""
    from iceberg_meta_spark.operators.file_health import file_size_stats
    from iceberg_meta_spark.operators.partitions import partition_distribution

    files = native_files_frame(spark, table_dir)
    health = file_size_stats(files, threshold=32 * 1024 * 1024).collect()[0]
    assert health.file_count == 150
    # sizes are (1 + i%9) * 8MiB; small files are those < 32MiB -> i%9 in {0,1,2}
    exp_small = sum(1 for i in range(150) if (1 + i % 9) * 8 < 32)
    assert health.small_files == exp_small

    dist = partition_distribution(files).collect()
    assert {r.part_key for r in dist} == {
        json.dumps({"region": r}, sort_keys=True)
        for r in ("americas", "emea", "apac", "latam")
    }
    assert sum(r.file_count for r in dist) == 150


def test_version_hint_fallback(spark, table_dir, tmp_path):
    """Without version-hint.text the reader takes the highest metadata
    version it can list."""
    import shutil

    clone = tmp_path / "clone"
    shutil.copytree(table_dir, clone)
    (clone / "metadata" / "version-hint.text").unlink()
    md = load_table_metadata(spark, str(clone))
    assert md["current-snapshot-id"] == 3


def test_native_warehouse_walk(spark, tmp_path):
    from iceberg_meta_spark.sources.iceberg_fixture import write_fixture_table as wft
    from iceberg_meta_spark.sources.iceberg_native import native_warehouse_tables
    import shutil

    wh = tmp_path / "warehouse"
    for ns, name in (("analytics", "events"), ("analytics", "users"), ("raw", "logs")):
        t = wft(str(tmp_path / f"tmp_{ns}_{name}"), n_snapshots=2,
                manifests_per_snapshot=1, files_per_manifest=5)
        (wh / ns).mkdir(parents=True, exist_ok=True)
        shutil.move(t, wh / ns / name)

    tables = native_warehouse_tables(spark, str(wh)).orderBy("namespace", "table_name")
    rows = tables.collect()
    assert [(r.namespace, r.table_name) for r in rows] == [
        ("analytics", "events"), ("analytics", "users"), ("raw", "logs")]
    assert all(r.format_version == 2 and r.current_snapshot_id == 2
               and r.snapshot_count == 2 for r in rows)
    assert all(r.total_files == 10 for r in rows)  # 2 snapshots x 1 manifest x 5

    # the frame feeds the namespace/warehouse/alert commands directly (S1
    # catalog-rollup story jar-free)
    from iceberg_meta_spark import api

    ns = {r.namespace: r for r in api.namespace_overview(tables).collect()}
    assert ns["analytics"].table_count == 2 and ns["raw"].table_count == 1
    assert ns["analytics"].total_files == 20
    wh_rows = {r.namespace: r for r in api.warehouse_overview(tables).collect()}
    assert wh_rows["(warehouse)"].total_files == 30  # grand-total level
    flagged = api.alerts(tables)
    assert set(flagged.columns) >= {"namespace", "table_name", "is_stale"}


def test_commit_append_publishes_new_snapshot(spark, tmp_path):
    """S9 metadata side: commit_append -> new snapshot visible to the native
    reader, previous snapshot still time-travel readable, version hint
    swapped atomically (v4 metadata on disk)."""
    from iceberg_meta_spark.sources.iceberg_write import commit_append

    table = write_fixture_table(str(tmp_path), n_snapshots=3,
                                manifests_per_snapshot=2, files_per_manifest=25)
    new_files = [
        {
            "file_path": f"{table}/data/emea/new{i}.parquet",
            "partition": {"region": "emea"},
            "record_count": 10 + i,
            "file_size_in_bytes": 1024 * (i + 1),
            "value_counts": {1: 10 + i, 2: 10 + i},
            "null_value_counts": {1: 0, 2: 1},
            "column_sizes": {1: 100, 2: 200},
            "lower_bounds": {2: i * 5},
            "upper_bounds": {2: i * 5 + 100},
        }
        for i in range(10)
    ]
    md = commit_append(table, new_files, timestamp_ms=1713139200000 + 999_000)
    assert md["current-snapshot-id"] == 4
    assert md["last-sequence-number"] == 4

    files = native_files_frame(spark, table)
    assert files.count() == 160
    new = files.where(F.col("file_path").contains("new"))
    assert new.count() == 10
    assert new.agg(F.sum("record_count")).collect()[0][0] == sum(10 + i for i in range(10))
    # time travel: snapshot 3 unchanged
    assert native_files_frame(spark, table, snapshot_id=3).count() == 150
    # snapshot log + stats flow through
    snaps = native_snapshots_frame(spark, table).orderBy("snapshot_id").collect()
    assert [r.snapshot_id for r in snaps] == [1, 2, 3, 4]
    assert snaps[3].parent_id == 3 and snaps[3].total_data_files == 160
    stats = native_column_stats_frame(spark, table)
    row = stats.where(
        F.col("file_path").endswith("new0.parquet") & (F.col("field_id") == 2)
    ).collect()[0]
    assert row.value_count == 10 and row.null_count == 1
    assert decode_bound(bytes(row.lower_bound), "long") == 0
    assert decode_bound(bytes(row.upper_bound), "long") == 100


def test_commit_append_is_chainable(spark, tmp_path):
    from iceberg_meta_spark.sources.iceberg_write import commit_append

    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=3)
    for k in range(3):
        commit_append(
            table,
            [{"file_path": f"{table}/data/apac/c{k}.parquet",
              "partition": {"region": "apac"},
              "record_count": 1, "file_size_in_bytes": 1}],
        )
    assert native_files_frame(spark, table).count() == 6
    snaps = native_snapshots_frame(spark, table).orderBy("snapshot_id").collect()
    assert [r.snapshot_id for r in snaps] == [1, 2, 3, 4]
    # timestamps strictly increase even with the defaulted clock-free stamp
    assert all(a.committed_us < b.committed_us for a, b in zip(snaps, snaps[1:]))


def test_api_commands_run_on_native_source(spark, table_dir):
    """The capstone: the reference's whole command surface (api.py) runs on
    a REAL Iceberg metadata tree with no runtime jar — NativeTableSource
    satisfies the MetadataSource protocol end-to-end."""
    from iceberg_meta_spark import api

    src = api.NativeTableSource(spark, table_dir, range_field_id=2)

    s = src.snapshots()
    assert api.summary(src).count() >= 1
    assert api.health(src).count() >= 1
    fh = api.file_health(src).collect()[0]
    assert fh.file_count == 150
    assert api.partition_health(src).count() == 4
    ch = {r.field_id: r for r in api.column_health(src).collect()}
    assert set(ch) == {1, 2, 3, 4}
    assert ch[2].min_lower == 0  # decoded long bounds, not raw bytes
    assert ch[2].max_upper == 149 * 1000 + 2500
    assert ch[1].min_lower is None  # string field: bounds not integer-typed
    assert api.snapshot_detail(src, 3).count() == 1
    assert api.top_files(src, k=5).count() == 20  # top-5 per partition (W5), 4 regions
    assert api.schema_history(src).count() == 4  # one schema x 4 fields
    assert api.compaction_plan(src).count() >= 1
    assert api.diff(src, 1, 3).count() > 0
    # layout planning consumes the decoded file ranges
    assert api.zorder_plan(src).count() == 150
    _ = s.collect()


def test_native_commit_then_watch_detects_new_snapshot(spark, tmp_path):
    """End-to-end write+watch on the native path: poll_watch over a
    NativeTableSource's snapshot log detects exactly the snapshot that
    commit_append publishes between ticks (reference ST1 semantics on a
    real metadata tree, no jar)."""
    from iceberg_meta_spark import api
    from iceberg_meta_spark.sources.iceberg_write import commit_append
    from iceberg_meta_spark.streaming.watch import poll_watch

    table = write_fixture_table(str(tmp_path), n_snapshots=2,
                                manifests_per_snapshot=1, files_per_manifest=3)
    src = api.NativeTableSource(spark, table)
    detected: list[list[int]] = []
    tick = {"n": 0}

    def get_snapshots():
        # NativeTableSource caches the metadata JSON per instance; a watch
        # loop re-reads the tree each tick, so build a fresh source
        tick["n"] += 1
        if tick["n"] == 2:
            commit_append(table, [{
                "file_path": f"{table}/data/apac/w0.parquet",
                "partition": {"region": "apac"},
                "record_count": 5, "file_size_in_bytes": 64,
            }])
        return api.NativeTableSource(spark, table).snapshots()

    def on_new(df):
        detected.append(sorted(r.snapshot_id for r in df.collect()))

    poll_watch(get_snapshots, on_new, ticks=3)
    assert detected[0] == [1, 2]      # initial backlog
    assert detected[1] == [3]          # the commit made between ticks
    assert detected[2] == []           # tick 3: nothing new


# ---------------------------------------------------------------------------
# Property: arbitrary records round-trip through the container codec
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except Exception:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:
    _REC_SCHEMA = {
        "type": "record",
        "name": "prop_rec",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "opt_l", "type": ["null", "long"], "default": None},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "d", "type": "double"},
            {"name": "flag", "type": "boolean"},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
        ],
    }

    _records = st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
                "opt_l": st.none() | st.integers(min_value=-(2**40), max_value=2**40),
                "s": st.text(max_size=40),
                "by": st.binary(max_size=40),
                # doubles round-trip exactly through struct pack/unpack; NaN
                # breaks dict equality, so draw finite values only
                "d": st.floats(allow_nan=False, allow_infinity=True),
                "flag": st.booleans(),
                "arr": st.lists(st.integers(min_value=-(2**31), max_value=2**31), max_size=8),
                "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=5),
            }
        ),
        max_size=12,
    )

    @settings(max_examples=150, deadline=None)
    @given(recs=_records, codec=st.sampled_from(["null", "deflate"]))
    def test_avro_container_property_round_trip(recs, codec):
        _, _, got = read_container(write_container(_REC_SCHEMA, recs, codec=codec))
        assert got == recs


def test_native_delete_manifests(spark, tmp_path):
    """v2 row-level deletes: a delete manifest (content=1) rides the
    manifest list; data files_frame is unaffected; the delete files surface
    through native_delete_files_frame; the A2 delete-manifest predicate
    sees it."""
    from iceberg_meta_spark.sources.iceberg_native import native_delete_files_frame

    table = write_fixture_table(str(tmp_path), n_snapshots=2,
                                manifests_per_snapshot=1, files_per_manifest=10,
                                delete_files_last_snapshot=3)
    m = native_manifests_frame(spark, table)
    assert m.count() == 3  # 2 data + 1 delete
    assert m.where(F.col("content") == 1).count() == 1
    # data path excludes the delete manifest entirely
    assert native_files_frame(spark, table).count() == 20
    dels = native_delete_files_frame(spark, table).collect()
    assert len(dels) == 3
    assert all(r.content == 1 and "deletes/" in r.file_path for r in dels)
    assert sum(r.record_count for r in dels) == 10 + 20 + 30
    # earlier snapshot has no delete manifests
    assert native_delete_files_frame(spark, table, snapshot_id=1).count() == 0


def test_native_schema_evolution_diff(spark, tmp_path):
    """Evolved table metadata (schema-id 0 -> 1: drop payload, add score)
    flows through NativeTableSource.schema_fields into the J2 schema-diff
    kernel."""
    from iceberg_meta_spark import api

    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=3,
                                evolve_schema=True)
    src = api.NativeTableSource(spark, table)
    hist = src.schema_fields()
    assert hist.where(F.col("schema_id") == 0).count() == 4
    assert hist.where(F.col("schema_id") == 1).count() == 4  # -payload +score
    diff = api.schema_version_diff(src, 0, 1).collect()
    changes = {(r.change, r.old_name or r.new_name) for r in diff}
    assert ("added", "score") in changes
    assert ("removed", "payload") in changes


def test_native_reader_handles_v1_tables(spark, tmp_path):
    """Format-version 1 compatibility: v1 manifest-list field names
    (added_data_files_count...), v1 manifest entries without
    content/sequence fields, and the single-'schema' metadata form all
    decode through the same reader paths."""
    import os

    from iceberg_meta_spark.sources.avro_py import write_container

    table = str(tmp_path / "v1_table")
    meta = os.path.join(table, "metadata")
    os.makedirs(meta)

    entry_schema_v1 = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": "long"},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [
                                    {"name": "region", "type": ["null", "string"], "default": None}
                                ],
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }
    entries = [
        {"status": 1, "snapshot_id": 1,
         "data_file": {"file_path": f"{table}/data/f{i}.parquet",
                       "file_format": "parquet",
                       "partition": {"region": "emea"},
                       "record_count": 11 * (i + 1),
                       "file_size_in_bytes": 1024}}
        for i in range(4)
    ]
    mpath = os.path.join(meta, "m0.avro")
    blob = write_container(entry_schema_v1, entries)
    with open(mpath, "wb") as fh:
        fh.write(blob)

    mf_schema_v1 = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "added_snapshot_id", "type": ["null", "long"], "default": None},
            {"name": "added_data_files_count", "type": ["null", "int"], "default": None},
            {"name": "existing_data_files_count", "type": ["null", "int"], "default": None},
            {"name": "deleted_data_files_count", "type": ["null", "int"], "default": None},
        ],
    }
    mlist = os.path.join(meta, "snap-1.avro")
    with open(mlist, "wb") as fh:
        fh.write(write_container(mf_schema_v1, [{
            "manifest_path": mpath, "manifest_length": len(blob),
            "partition_spec_id": 0, "added_snapshot_id": 1,
            "added_data_files_count": 4, "existing_data_files_count": 0,
            "deleted_data_files_count": 0}]))

    md = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000001",
        "location": table,
        "last-updated-ms": 1713139200000,
        "last-column-id": 1,
        "schema": {"type": "struct", "fields": [
            {"id": 1, "name": "region", "required": True, "type": "string"}]},
        "partition-spec": [
            {"name": "region", "transform": "identity", "source-id": 1, "field-id": 1000}],
        "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1713139200000,
                       "manifest-list": mlist,
                       "summary": {"operation": "append"}}],
    }
    import json as _json

    with open(os.path.join(meta, "v1.metadata.json"), "w") as fh:
        _json.dump(md, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write("1")

    snaps = native_snapshots_frame(spark, table).collect()
    assert len(snaps) == 1 and snaps[0].operation == "append"
    m = native_manifests_frame(spark, table).collect()
    assert len(m) == 1 and m[0].added_files_count == 4 and m[0].content == 0
    files = native_files_frame(spark, table).collect()
    assert len(files) == 4
    assert sum(r.record_count for r in files) == 11 * (1 + 2 + 3 + 4)
    assert all(r.file_format == "PARQUET" for r in files)  # v1 lowercase normalized

    # v1 'schema' (singular) flows through schema_fields
    from iceberg_meta_spark import api

    assert api.NativeTableSource(spark, table).schema_fields().count() == 1


def test_commit_remove_files_publishes_delete_snapshot(spark, tmp_path):
    """S9 delete side: commit_remove_files rewrites only the touched
    manifests (removed entries status=2, survivors status=0 with original
    provenance), the live view shrinks, time travel still sees the files,
    and a later append chains cleanly on top."""
    from iceberg_meta_spark.sources.iceberg_write import commit_append, commit_remove_files

    table = write_fixture_table(str(tmp_path), n_snapshots=2,
                                manifests_per_snapshot=2, files_per_manifest=10)
    all_files = [r.file_path for r in
                 native_files_frame(spark, table).orderBy("file_path").collect()]
    assert len(all_files) == 40
    victims = set(all_files[:3] + all_files[-2:])  # spans several manifests

    md = commit_remove_files(table, victims, timestamp_ms=1713139200000 + 500_000)
    assert md["current-snapshot-id"] == 3
    assert md["snapshots"][-1]["summary"]["operation"] == "delete"

    live = native_files_frame(spark, table)
    assert live.count() == 35
    assert not set(r.file_path for r in live.collect()) & victims
    # time travel: snapshot 2 still sees all 40
    assert native_files_frame(spark, table, snapshot_id=2).count() == 40
    # the delete entries are visible with status=2 at the new snapshot
    e = native_entries_frame(spark, table)
    assert e.where(F.col("status") == 2).count() == 5
    # survivors are EXISTING (0) in rewritten manifests, ADDED (1) in untouched
    assert e.where(F.col("status") != 2).count() == 35

    # chain an append on top of the delete
    commit_append(table, [{
        "file_path": f"{table}/data/emea/post_delete.parquet",
        "partition": {"region": "emea"},
        "record_count": 7, "file_size_in_bytes": 128,
    }])
    assert native_files_frame(spark, table).count() == 36
    snaps = native_snapshots_frame(spark, table).orderBy("snapshot_id").collect()
    assert [r.operation for r in snaps] == ["append", "append", "delete", "append"]

    # removing an unknown path is loud, not silent
    with pytest.raises(KeyError):
        commit_remove_files(table, {"nope.parquet"})


def test_commit_delete_files_publishes_row_level_deletes(spark, tmp_path):
    """S9 row-level-delete side: commit_delete_files adds a DELETE manifest
    (content=1) with position + equality delete files; the data view is
    untouched, the delete view surfaces them, and the manifest list shows
    one content=1 manifest."""
    from iceberg_meta_spark.sources.iceberg_native import native_delete_files_frame
    from iceberg_meta_spark.sources.iceberg_write import commit_delete_files

    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=8)
    md = commit_delete_files(table, [
        {"file_path": f"{table}/data/del/pos0.parquet",
         "partition": {"region": "emea"}, "record_count": 12,
         "file_size_in_bytes": 2048},
        {"file_path": f"{table}/data/del/eq0.parquet",
         "partition": {"region": "apac"}, "record_count": 3,
         "file_size_in_bytes": 512, "equality_ids": [2]},
    ], timestamp_ms=1713139200000 + 700_000)
    assert md["current-snapshot-id"] == 2
    assert md["snapshots"][-1]["summary"]["operation"] == "overwrite"

    assert native_files_frame(spark, table).count() == 8  # data view untouched
    dels = {r.file_path: r for r in native_delete_files_frame(spark, table).collect()}
    assert len(dels) == 2
    assert dels[f"{table}/data/del/pos0.parquet"].content == 1
    assert dels[f"{table}/data/del/eq0.parquet"].content == 2
    m = native_manifests_frame(spark, table)
    assert m.where(F.col("content") == 1).count() == 1
    # earlier snapshot has no deletes
    assert native_delete_files_frame(spark, table, snapshot_id=1).count() == 0


def test_native_watch_stream_live_detects_commit(spark, tmp_path):
    """Live Structured Streaming over the native path: watch_stream polls a
    NativeTableSource-backed snapshot log; a commit_append published while
    the query runs is detected in a later micro-batch."""
    import time

    from iceberg_meta_spark import api
    from iceberg_meta_spark.sources.iceberg_write import commit_append
    from iceberg_meta_spark.streaming.watch import watch_stream

    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=3)
    seen: list[int] = []

    def on_new(df):
        seen.extend(r.snapshot_id for r in df.collect())

    q = watch_stream(
        spark,
        lambda: api.NativeTableSource(spark, table).snapshots(),
        on_new,
        tick_seconds=1,
    )
    try:
        deadline = time.time() + 60
        while 1 not in seen and time.time() < deadline:
            time.sleep(0.5)
        assert 1 in seen, f"initial snapshot never seen: {seen}"
        commit_append(table, [{
            "file_path": f"{table}/data/apac/live.parquet",
            "partition": {"region": "apac"},
            "record_count": 1, "file_size_in_bytes": 1,
        }])
        while 2 not in seen and time.time() < deadline:
            time.sleep(0.5)
        assert 2 in seen, f"committed snapshot never detected: {seen}"
        assert seen.count(1) == 1 and seen.count(2) == 1  # no re-reports
    finally:
        q.stop()


def test_metadata_version_time_travel(spark, tmp_path):
    """Every commit leaves vN.metadata.json behind; loading an explicit
    older version reconstructs the historical table state (current snapshot
    AND visible files) even after later appends and deletes."""
    from iceberg_meta_spark.sources.iceberg_write import commit_append, commit_remove_files

    table = write_fixture_table(str(tmp_path), n_snapshots=2,
                                manifests_per_snapshot=1, files_per_manifest=4)
    commit_append(table, [{
        "file_path": f"{table}/data/emea/x.parquet",
        "partition": {"region": "emea"},
        "record_count": 1, "file_size_in_bytes": 1}])
    victims = {r.file_path for r in
               native_files_frame(spark, table).limit(2).collect()}
    commit_remove_files(table, victims)

    # current (v4): 9 - 2 = 7 files
    assert native_files_frame(spark, table).count() == 7
    # v2 (the original 2-snapshot fixture): current snapshot 2, 8 files
    md_v2 = load_table_metadata(spark, table, version=2)
    assert md_v2["current-snapshot-id"] == 2
    assert native_files_frame(spark, table, metadata=md_v2).count() == 8
    # v3 (after the append): 9 files
    md_v3 = load_table_metadata(spark, table, version=3)
    assert native_files_frame(spark, table, metadata=md_v3).count() == 9


def test_native_refs_frame(spark, tmp_path):
    """Branches/tags (spec § Refs) surface like the jar path's .refs table;
    a refs-less v1 table yields the implicit main branch."""
    from iceberg_meta_spark.sources.iceberg_native import native_refs_frame

    table = write_fixture_table(str(tmp_path), n_snapshots=3,
                                manifests_per_snapshot=1, files_per_manifest=2)
    refs = {r.name: r for r in native_refs_frame(spark, table).collect()}
    assert set(refs) == {"main", "audit-base"}
    assert refs["main"].type == "branch" and refs["main"].snapshot_id == 3
    assert refs["audit-base"].type == "tag" and refs["audit-base"].snapshot_id == 1
    assert refs["audit-base"].max_ref_age_ms == 31536000000
    # a tag pins time travel: reading at the tag's snapshot sees 2 files
    assert native_files_frame(
        spark, table, snapshot_id=refs["audit-base"].snapshot_id
    ).count() == 2


def test_native_warehouse_walk_is_one_distributed_job(spark, tmp_path):
    """r8: the walk must be ONE binaryFile scan with the JSON parse inside
    the plan (from_json), not a per-table spark.read.text loop — the plan
    may contain exactly one scan and no Python boundary."""
    import io
    import contextlib
    import re
    import shutil

    from iceberg_meta_spark.sources.iceberg_fixture import write_fixture_table as wft
    from iceberg_meta_spark.sources.iceberg_native import native_warehouse_tables

    wh = tmp_path / "warehouse"
    t = wft(str(tmp_path / "tmp_t"), n_snapshots=1, manifests_per_snapshot=1,
            files_per_manifest=2)
    (wh / "ns").mkdir(parents=True, exist_ok=True)
    shutil.move(t, wh / "ns" / "t1")

    df = native_warehouse_tables(spark, str(wh))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Scan ", p)) == 1, p
    assert "InMemoryTableScan" not in p and "Python" not in p, p


def test_bound_bytes_widths_follow_declared_type():
    """Spec Appendix D: bound byte width follows the column's DECLARED type
    — 'int'/'date' are 4-byte LE, 'float' 4-byte, 'uuid' 16-byte BE — so
    the writer's output always round-trips through decode_bound."""
    import uuid as _uuid

    from iceberg_meta_spark.sources.iceberg_write import _bound_bytes

    assert _bound_bytes(-7, "int") == struct.pack("<i", -7)
    assert _bound_bytes(19000, "date") == struct.pack("<i", 19000)
    assert _bound_bytes(1 << 40, "long") == struct.pack("<q", 1 << 40)
    assert _bound_bytes(7) == struct.pack("<q", 7)  # untyped default: long
    assert _bound_bytes(2.5, "float") == struct.pack("<f", 2.5)
    assert _bound_bytes(2.5, "double") == struct.pack("<d", 2.5)
    u = "12345678-1234-5678-1234-567812345678"
    assert _bound_bytes(u, "uuid") == _uuid.UUID(u).bytes
    assert decode_bound(_bound_bytes(u, "uuid"), "uuid") == u
    assert decode_bound(_bound_bytes(-7, "int"), "int") == -7
    assert decode_bound(_bound_bytes(2.5, "float"), "float") == 2.5


def test_commit_append_int_bounds_readable_by_native_reader(spark, tmp_path):
    """The ADVICE r7 failure scenario: commit_append onto a table with an
    'int' column must write 4-byte bounds the native typed-stats reader can
    decode (it unpacks <i and raised struct.error on 8-byte buffers)."""
    import json as _json
    import os

    from iceberg_meta_spark.sources.iceberg_native import native_column_stats_typed
    from iceberg_meta_spark.sources.iceberg_write import commit_append

    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=2)
    # declare field 4 as 'int' (the fixture declares it 'string' and writes
    # no bounds for it, so no pre-existing 8-byte buffers conflict)
    mp = os.path.join(table, "metadata", "v1.metadata.json")
    with open(mp) as fh:
        md = _json.load(fh)
    for f in md["schemas"][0]["fields"]:
        if f["id"] == 4:
            f["type"] = "int"
    with open(mp, "w") as fh:
        _json.dump(md, fh)

    commit_append(table, [{
        "file_path": f"{table}/data/emea/i0.parquet",
        "partition": {"region": "emea"},
        "record_count": 5, "file_size_in_bytes": 512,
        "value_counts": {4: 5}, "null_value_counts": {4: 0},
        "column_sizes": {4: 64},
        "lower_bounds": {4: -42}, "upper_bounds": {4: 99},
    }], timestamp_ms=1713139261000)

    typed = native_column_stats_typed(spark, table)
    row = typed.where(
        F.col("file_path").endswith("i0.parquet") & (F.col("field_id") == 4)
    ).collect()[0]
    assert (row.lower_bound, row.upper_bound) == (-42, 99)


def test_commit_chain_carries_running_totals_and_metadata_log(spark, tmp_path):
    """ADVICE r7: the three commit paths must carry total-records /
    total-files-size forward (S1/S3 rollups surface them), and EVERY commit
    — including row-level deletes — must append a metadata-log entry."""
    from iceberg_meta_spark.sources.iceberg_write import (
        commit_append,
        commit_delete_files,
        commit_remove_files,
    )

    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=4)
    # fixture closed form: rc = 100+(i%7)*50 -> 100..250 sum 700;
    # sizes (1+i%9)*8MiB -> (1+2+3+4)*8MiB
    base_rows, base_bytes = 700, (1 + 2 + 3 + 4) * 8 * 1024 * 1024

    def totals():
        r = (native_snapshots_frame(spark, table)
             .orderBy(F.desc("snapshot_id")).limit(1).collect()[0])
        return r.total_records, r.total_files_size, r.total_data_files

    assert totals() == (base_rows, base_bytes, 4)

    commit_append(table, [{
        "file_path": f"{table}/data/emea/a.parquet",
        "partition": {"region": "emea"},
        "record_count": 5, "file_size_in_bytes": 1000,
    }], timestamp_ms=1713139261000)
    assert totals() == (base_rows + 5, base_bytes + 1000, 5)

    commit_remove_files(table, {f"{table}/data/emea/a.parquet"},
                        timestamp_ms=1713139262000)
    assert totals() == (base_rows, base_bytes, 4)

    commit_delete_files(table, [{
        "file_path": f"{table}/data/deletes/d0.parquet",
        "partition": {"region": "emea"},
        "record_count": 2, "file_size_in_bytes": 128,
    }], timestamp_ms=1713139263000)
    # row-level delete: data-file totals carried verbatim, delete tracked
    assert totals() == (base_rows, base_bytes, 4)

    md = load_table_metadata(spark, table)
    assert md["snapshots"][-1]["summary"]["total-delete-files"] == "1"
    # one metadata-log entry per commit: v1->v2 (append), v2->v3 (remove),
    # v3->v4 (row-level delete; previously missing)
    log = [e["metadata-file"] for e in md["metadata-log"]]
    assert [p.rsplit("/", 1)[-1] for p in log] == [
        "v1.metadata.json", "v2.metadata.json", "v3.metadata.json"]
