"""Maintenance EXECUTION on the native Iceberg path (r8):
expire_snapshots / orphan_files_frame / rewrite_manifests against real
spec-conformant metadata trees, verified through the native reader."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_meta_spark.sources.iceberg_fixture import write_fixture_table
from iceberg_meta_spark.sources.iceberg_maintenance import (
    expire_snapshots,
    orphan_files_frame,
    referenced_files_frame,
    remove_orphans,
    rewrite_manifests,
)
from iceberg_meta_spark.sources.iceberg_native import (
    load_table_metadata,
    native_files_frame,
    native_manifests_frame,
    native_snapshots_frame,
)

pytestmark = pytest.mark.usefixtures("spark")


def test_expire_snapshots_keeps_current_and_ref_pinned(spark, tmp_path):
    """keep_last=2 on a 4-snapshot table: current + newest retained, the
    'audit-base' TAG pins snapshot 1 (refs always win), so only snapshot 2
    expires; its manifest list is removable but its manifests are NOT
    (snapshot 3's cumulative list still references them)."""
    from iceberg_meta_spark.sources.iceberg_write import commit_append

    table = write_fixture_table(str(tmp_path), n_snapshots=3,
                                manifests_per_snapshot=2, files_per_manifest=5)
    commit_append(table, [{
        "file_path": f"{table}/data/emea/x.parquet",
        "partition": {"region": "emea"},
        "record_count": 1, "file_size_in_bytes": 10,
    }], timestamp_ms=1713139260000 + 240_000)

    md_before = load_table_metadata(spark, table)
    mlist_snap2 = next(
        s["manifest-list"] for s in md_before["snapshots"] if s["snapshot-id"] == 2
    )

    out = expire_snapshots(table, keep_last=2, timestamp_ms=1713139260000 + 300_000)
    assert out["expired_snapshot_ids"] == [2]
    assert out["removable_files"] == [mlist_snap2]

    md = load_table_metadata(spark, table)
    assert [s["snapshot-id"] for s in md["snapshots"]] == [1, 3, 4]
    assert [e["snapshot-id"] for e in md["snapshot-log"]] == [1, 3, 4]
    assert md["current-snapshot-id"] == 4
    # the shrunken log still drives the reader end to end
    snaps = native_snapshots_frame(spark, table)
    assert {r.snapshot_id for r in snaps.collect()} == {1, 3, 4}
    assert native_files_frame(spark, table).count() == 31
    # time travel to a RETAINED old snapshot still works
    assert native_files_frame(spark, table, snapshot_id=1).count() == 10


def test_expire_snapshots_noop_publishes_nothing(spark, tmp_path):
    table = write_fixture_table(str(tmp_path), n_snapshots=2,
                                manifests_per_snapshot=1, files_per_manifest=3)
    out = expire_snapshots(table, keep_last=5)
    assert out == {"expired_snapshot_ids": [], "removable_files": []}
    with open(os.path.join(table, "metadata", "version-hint.text")) as fh:
        assert fh.read().strip() == "2"  # no new version


def test_rewrite_manifests_binpacks_and_preserves_results(spark, tmp_path):
    """Six small data manifests merge into ONE group manifest; the replace
    snapshot serves the identical file set (count, rows, bytes) and the
    entries keep EXISTING status with original provenance."""
    table = write_fixture_table(str(tmp_path), n_snapshots=3,
                                manifests_per_snapshot=2, files_per_manifest=25)
    before = native_files_frame(spark, table)
    b_agg = before.agg(
        F.count(F.lit(1)), F.sum("record_count"), F.sum("file_size_in_bytes")
    ).collect()[0]

    out = rewrite_manifests(table, timestamp_ms=1713139260000 + 600_000)
    assert out["groups"] == 1 and out["rewritten"] == 6
    assert out["snapshot_id"] == 4

    md = load_table_metadata(spark, table)
    assert md["current-snapshot-id"] == 4
    new_snap = md["snapshots"][-1]
    assert new_snap["summary"]["operation"] == "replace"
    # totals carried verbatim: a rewrite moves no data
    assert new_snap["summary"]["total-data-files"] == "150"

    mans = native_manifests_frame(spark, table).collect()
    assert len(mans) == 1 and mans[0].added_snapshot_id == 4

    after = native_files_frame(spark, table)
    a_agg = after.agg(
        F.count(F.lit(1)), F.sum("record_count"), F.sum("file_size_in_bytes")
    ).collect()[0]
    assert tuple(a_agg) == tuple(b_agg)
    assert {r.file_path for r in after.collect()} == {
        r.file_path for r in before.collect()
    }
    # provenance: snapshot_id on entries is the ORIGINAL committing snapshot
    from iceberg_meta_spark.sources.iceberg_native import native_entries_frame

    entries = native_entries_frame(spark, table)
    assert entries.where(F.col("status") != 0).count() == 0  # all EXISTING
    assert {r.snapshot_id for r in entries.select("snapshot_id").distinct().collect()} == {1, 2, 3}
    # time travel: the pre-rewrite snapshot still serves the old layout
    assert native_manifests_frame(spark, table, snapshot_id=3).count() == 6


def test_rewrite_manifests_noop_when_nothing_small(spark, tmp_path):
    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=2)
    out = rewrite_manifests(table, small_threshold=1)  # nothing qualifies
    assert out == {"groups": 0, "rewritten": 0, "snapshot_id": None}
    with open(os.path.join(table, "metadata", "version-hint.text")) as fh:
        assert fh.read().strip() == "1"


def test_orphan_files_frame_flags_only_unreferenced(spark, tmp_path):
    table = write_fixture_table(str(tmp_path), n_snapshots=2,
                                manifests_per_snapshot=1, files_per_manifest=3)
    # a clean tree has zero orphans (every metadata/manifest file reachable)
    assert orphan_files_frame(spark, table).count() == 0
    # plant two strays
    os.makedirs(os.path.join(table, "data", "apac"), exist_ok=True)
    with open(os.path.join(table, "data", "apac", "stray.parquet"), "wb") as fh:
        fh.write(b"\x00" * 64)
    with open(os.path.join(table, "metadata", "stray.avro"), "wb") as fh:
        fh.write(b"\x00" * 32)
    orphans = orphan_files_frame(spark, table)
    names = {r.path.rsplit("/", 1)[-1]: r.file_size for r in orphans.collect()}
    assert names == {"stray.parquet": 64, "stray.avro": 32}


def test_expire_then_orphan_scan_flags_dropped_manifest_list(spark, tmp_path):
    """The full maintenance loop: expire -> the dropped snapshot's manifest
    list is no longer referenced -> the orphan scan flags exactly it (plus
    nothing else), matching expire's own removable_files report."""
    from iceberg_meta_spark.sources.iceberg_write import commit_append

    table = write_fixture_table(str(tmp_path), n_snapshots=3,
                                manifests_per_snapshot=1, files_per_manifest=2)
    commit_append(table, [{
        "file_path": f"{table}/data/emea/y.parquet",
        "partition": {"region": "emea"},
        "record_count": 1, "file_size_in_bytes": 10,
    }], timestamp_ms=1713139260000 + 240_000)
    out = expire_snapshots(table, keep_last=2, timestamp_ms=1713139260000 + 300_000)
    assert out["expired_snapshot_ids"] == [2]

    orphans = {r.path for r in orphan_files_frame(spark, table).collect()}
    removable = {p.replace("file:", "") for p in out["removable_files"]}
    assert orphans == removable


def test_referenced_files_include_deleted_entries_until_expiry(spark, tmp_path):
    """status=2 (DELETED) entries still reference on-disk files: the orphan
    scan must NOT flag a just-removed file's path (it only becomes
    removable once the snapshots referencing it expire)."""
    from iceberg_meta_spark.sources.iceberg_write import commit_remove_files

    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=3)
    victim = native_files_frame(spark, table).limit(1).collect()[0].file_path
    commit_remove_files(table, {victim}, timestamp_ms=1713139260000 + 120_000)
    refs = {r.path for r in referenced_files_frame(spark, table).collect()}
    assert victim.replace("file:", "") in refs


def test_update_schema_add_drop_rename(spark, tmp_path):
    """ALTER TABLE lifecycle: add gets a FRESH field id, rename keeps the
    id, drop removes from the current schema only (history retained); the
    native schema-diff operator sees exactly the three changes."""
    from iceberg_meta_spark.sources.iceberg_write import update_schema

    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=2)
    md = update_schema(
        table,
        add=[("score", "double")],
        drop=["payload"],
        rename={"value_cents": "amount_cents"},
        timestamp_ms=1713139260000 + 60_000,
    )
    assert md["current-schema-id"] == 1
    new = next(s for s in md["schemas"] if s["schema-id"] == 1)
    by_name = {f["name"]: f for f in new["fields"]}
    assert by_name["score"]["id"] == 5          # fresh id (last-column-id was 4)
    assert by_name["amount_cents"]["id"] == 3   # rename keeps the id
    assert "payload" not in by_name
    # the previous schema is still there for old-snapshot readers
    assert {s["schema-id"] for s in md["schemas"]} == {0, 1}
    assert md["last-column-id"] == 5
    # fresh-id rule: a second add after the drop must NOT reuse payload's id
    md2 = update_schema(table, add=[("extra", "long")],
                        timestamp_ms=1713139260000 + 120_000)
    extra = next(f for s in md2["schemas"] if s["schema-id"] == 2
                 for f in s["fields"] if f["name"] == "extra")
    assert extra["id"] == 6
    # reader picks the evolved schema up through the hint swap
    assert load_table_metadata(spark, table)["current-schema-id"] == 2


def test_update_schema_rejects_conflicts(spark, tmp_path):
    from iceberg_meta_spark.sources.iceberg_write import update_schema

    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=2)
    with pytest.raises(ValueError):
        update_schema(table, add=[("region", "string")])  # duplicate name
    with pytest.raises(KeyError):
        update_schema(table, drop=["nope"])
    with pytest.raises(KeyError):
        update_schema(table, rename={"nope": "x"})


def test_rollback_to_snapshot_restores_visible_state(spark, tmp_path):
    """Rollback points current (and main) back at an older snapshot WITHOUT
    rewriting history: the newer snapshot stays time-travelable, the scan
    serves the old file set, and a later expire can still drop it."""
    from iceberg_meta_spark.sources.iceberg_write import (
        commit_append,
        rollback_to_snapshot,
    )

    table = write_fixture_table(str(tmp_path), n_snapshots=2,
                                manifests_per_snapshot=1, files_per_manifest=3)
    commit_append(table, [{
        "file_path": f"{table}/data/emea/z.parquet",
        "partition": {"region": "emea"},
        "record_count": 1, "file_size_in_bytes": 10,
    }], timestamp_ms=1713139260000 + 180_000)
    assert native_files_frame(spark, table).count() == 7

    md = rollback_to_snapshot(table, 2, timestamp_ms=1713139260000 + 240_000)
    assert md["current-snapshot-id"] == 2
    assert md["refs"]["main"]["snapshot-id"] == 2
    assert native_files_frame(spark, table).count() == 6
    # the rolled-back-over snapshot still exists for time travel
    assert native_files_frame(spark, table, snapshot_id=3).count() == 7
    with pytest.raises(KeyError):
        rollback_to_snapshot(table, 99)


def test_api_lifecycle_end_to_end(spark, tmp_path):
    """The full table lifecycle through the command API: create -> append
    -> MoR scan -> alter schema -> rollback -> expire -> orphan scan ->
    rewrite. One continuous story on one table."""
    import glob

    from iceberg_meta_spark import api
    from iceberg_meta_spark.sources.iceberg_write import commit_append

    table = str(tmp_path / "lifecycle")
    api.create_table(table, fields=[(1, "id", "long"), (2, "v", "long")])

    def add_batch(name, rows):
        df = spark.createDataFrame(rows, "id long, v long")
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(table, "data", name))
        [p] = glob.glob(os.path.join(table, "data", name, "*.parquet"))
        commit_append(table, [{
            "file_path": p, "record_count": len(rows),
            "file_size_in_bytes": os.path.getsize(p),
        }], timestamp_ms=1713139260000 + len(rows))

    add_batch("b1", [(1, 10), (2, 20)])
    add_batch("b2", [(3, 30)])
    assert sorted(r.id for r in api.scan(spark, table).collect()) == [1, 2, 3]

    md = api.alter_schema(table, add=[("score", "double")])
    assert md["current-schema-id"] == 1
    # the scan picks the evolved schema up (new column NULL for old files)
    assert "score" in api.scan(spark, table).columns

    api.rollback(table, 1)
    assert sorted(r.id for r in api.scan(spark, table).collect()) == [1, 2]

    out = api.expire(table, keep_last=1)
    assert out["expired_snapshot_ids"] == [2]
    # the orphan scan finds expire's metadata-tree removables PLUS the data
    # file only the expired snapshot referenced (b2's parquet) — the DATA
    # half of cleanup that expire itself never touches
    orphans = {r.path for r in api.orphan_scan(spark, table).collect()}
    removable = {p.replace("file:", "") for p in out["removable_files"]}
    assert removable <= orphans
    extra = orphans - removable
    assert len(extra) == 1 and "/data/b2/" in next(iter(extra))

    res = api.rewrite_small_manifests(table)
    assert res["groups"] == 0  # one manifest left post-rollback: nothing to merge


def test_commit_conflict_raises_instead_of_lost_update(spark, tmp_path):
    """Optimistic concurrency on the HadoopTables protocol, r10 contract:
    if another writer already published vN+1, a commit REBASES onto it and
    claims vN+2 (the Iceberg commit retry loop) — it never overwrites the
    winner's metadata, and the winner's commit stays fully intact.
    (r8 pinned conflict->raise; r10 upgraded the loser to rebase-and-
    retry, live-raced in tests/test_iceberg_concurrency.py.)"""
    import json as _json
    import shutil as _sh

    from iceberg_meta_spark.sources.iceberg_write import commit_append

    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=2)
    # simulate the racing winner: a VALID v2 already exists (a copy of v1
    # with a marker property), hint still at 1 (winner mid-swap)
    meta = os.path.join(table, "metadata")
    with open(os.path.join(meta, "v1.metadata.json")) as fh:
        winner = _json.load(fh)
    winner.setdefault("properties", {})["winner"] = "yes"
    with open(os.path.join(meta, "v2.metadata.json"), "w") as fh:
        _json.dump(winner, fh)
    commit_append(table, [{
        "file_path": f"{table}/data/emea/c.parquet",
        "partition": {"region": "emea"},
        "record_count": 1, "file_size_in_bytes": 1,
    }], timestamp_ms=1713139260000)
    # the loser rebased ONTO the winner: v3 claimed, v2 byte-intact,
    # winner's marker carried forward
    with open(os.path.join(meta, "version-hint.text")) as fh:
        assert fh.read().strip() == "3"
    with open(os.path.join(meta, "v2.metadata.json")) as fh:
        assert _json.load(fh)["properties"]["winner"] == "yes"
    with open(os.path.join(meta, "v3.metadata.json")) as fh:
        v3 = _json.load(fh)
    assert v3["properties"]["winner"] == "yes"
    assert len(v3["snapshots"]) == 2  # fixture snapshot + the rebased append


def test_remove_orphans_respects_grace_period_and_dry_run(spark, tmp_path):
    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=2)
    from iceberg_meta_spark.sources.iceberg_maintenance import remove_orphans

    stray = os.path.join(table, "data", "stray.bin")
    os.makedirs(os.path.dirname(stray), exist_ok=True)
    with open(stray, "wb") as fh:
        fh.write(b"\x00" * 16)
    mtime_ms = int(os.path.getmtime(stray) * 1000)

    # too recent: nothing deleted, counted as skipped
    out = remove_orphans(spark, table, older_than_ms=mtime_ms - 10_000,
                         dry_run=False)
    assert out["deleted"] == [] and out["skipped_recent"] == 1
    assert os.path.exists(stray)
    # old enough but dry_run: listed, not deleted
    out = remove_orphans(spark, table, older_than_ms=mtime_ms + 10_000)
    assert len(out["deleted"]) == 1 and os.path.exists(stray)
    # old enough, for real
    out = remove_orphans(spark, table, older_than_ms=mtime_ms + 10_000,
                         dry_run=False)
    assert len(out["deleted"]) == 1 and not os.path.exists(stray)
    # the table still reads clean afterwards
    assert native_files_frame(spark, table).count() == 2
    assert orphan_files_frame(spark, table).count() == 0


def test_set_properties_versions_metadata(spark, tmp_path):
    from iceberg_meta_spark.sources.iceberg_write import set_properties

    table = write_fixture_table(str(tmp_path), n_snapshots=1,
                                manifests_per_snapshot=1, files_per_manifest=2)
    md = set_properties(table, {"commit.retry.num-retries": "7"},
                        unset=["write.format.default", "not-a-key"],
                        timestamp_ms=1713139260000)
    assert md["properties"] == {"commit.retry.num-retries": "7"}
    # published as a new version; the old one remains for history
    assert load_table_metadata(spark, table)["properties"] == md["properties"]
    assert load_table_metadata(spark, table, version=1)["properties"][
        "write.format.default"] == "parquet"


def test_rewrite_manifests_never_merges_across_partition_specs(spark, tmp_path):
    """Manifests written under different partition specs carry different
    Avro entry schemas — merging them would re-encode one spec's entries
    with the other's partition record (silent field loss). The bin-pack
    must group per spec_id (r9 ADVICE fix)."""
    from iceberg_meta_spark.sources.avro_py import read_container
    from iceberg_meta_spark.sources.iceberg_scan import scan_table
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        update_partition_spec,
    )

    table = str(tmp_path / "t")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long")])
    ins = lambda rows, ts: append_dataframe(  # noqa: E731
        spark, spark.createDataFrame(rows, "region string, id long").coalesce(1),
        table, timestamp_ms=ts)
    # two commits under spec 0 (unpartitioned), two under spec 1 (region)
    ins([("emea", 1)], 1713139260000)
    ins([("emea", 2)], 1713139260001)
    update_partition_spec(table, ["region"], timestamp_ms=1713139260002)
    ins([("apac", 3)], 1713139260003)
    ins([("apac", 4)], 1713139260004)
    before = sorted(r.id for r in scan_table(spark, table).collect())

    out = rewrite_manifests(table, timestamp_ms=1713139260005)
    assert out["groups"] == 2  # one merged manifest PER spec, never mixed
    md, _, _ = _load_md_for_test(table)
    cur = next(s for s in md["snapshots"]
               if s["snapshot-id"] == md["current-snapshot-id"])
    with open(cur["manifest-list"], "rb") as fh:
        _, _, manifests = read_container(fh.read())
    for m in manifests:
        with open(m["manifest_path"], "rb") as fh:
            _, meta, entries = read_container(fh.read())
        # every entry in a merged manifest must carry ITS spec's shape:
        # spec-1 entries keep their region partition value
        if int(m.get("partition_spec_id", 0)) == 1:
            assert all(
                (e["data_file"].get("partition") or {}).get("region")
                for e in entries
            )
    assert sorted(r.id for r in scan_table(spark, table).collect()) == before


def _load_md_for_test(table):
    from iceberg_meta_spark.sources.iceberg_maintenance import _load_md

    return _load_md(table)


def test_rewrite_manifests_materializes_inherited_sequence_numbers(spark, tmp_path):
    """Engine-written ADDED entries may carry a NULL seq (manifest
    inheritance). When a rewrite turns them EXISTING, the spec requires the
    seq be materialized from the SOURCE manifest — otherwise the reader's
    coalesce inflates data seqs past delete seqs and deleted rows
    resurrect (r9 ADVICE fix)."""
    import glob

    from iceberg_meta_spark.sources.avro_py import read_container, write_container
    from iceberg_meta_spark.sources.iceberg_scan import scan_table
    from iceberg_meta_spark.sources.iceberg_write import (
        commit_append,
        commit_delete_files,
        create_table,
    )

    table = str(tmp_path / "t")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])

    def batch(name, rows):
        df = spark.createDataFrame(rows, "id long, val long")
        df.coalesce(1).write.parquet(os.path.join(table, "data", name))
        [p] = glob.glob(os.path.join(table, "data", name, "*.parquet"))
        return p

    p1 = batch("b1", [(i, i * 10) for i in range(5)])
    commit_append(table, [{"file_path": p1, "record_count": 5,
                           "file_size_in_bytes": os.path.getsize(p1)}],
                  timestamp_ms=1713139260000)
    p2 = batch("b2", [(i, i * 10) for i in range(5, 10)])
    commit_append(table, [{"file_path": p2, "record_count": 5,
                           "file_size_in_bytes": os.path.getsize(p2)}],
                  timestamp_ms=1713139260001)

    # simulate an engine writer: null the entry seqs (inherited from the
    # manifest per spec § Sequence Number Inheritance)
    md, _, _ = _load_md_for_test(table)
    cur = next(s for s in md["snapshots"]
               if s["snapshot-id"] == md["current-snapshot-id"])
    with open(cur["manifest-list"], "rb") as fh:
        _, _, manifests = read_container(fh.read())
    for m in manifests:
        with open(m["manifest_path"], "rb") as fh:
            schema, meta, entries = read_container(fh.read())
        for e in entries:
            e["sequence_number"] = None
            e["file_sequence_number"] = None
        with open(m["manifest_path"], "wb") as fh:
            fh.write(write_container(schema, entries, metadata=dict(meta)))

    # equality delete at seq 3 hides id=7 (data seq 1/2 < 3)
    (spark.createDataFrame([(7,)], "id long").coalesce(1)
     .write.mode("overwrite").parquet(os.path.join(table, "data", "del_eq2")))
    [de2] = glob.glob(os.path.join(table, "data", "del_eq2", "*.parquet"))
    commit_delete_files(table, [{"file_path": de2, "record_count": 1,
                                 "file_size_in_bytes": os.path.getsize(de2),
                                 "equality_ids": [1]}],
                        timestamp_ms=1713139260002)
    before = sorted(r.id for r in scan_table(spark, table).collect())
    assert 7 not in before

    out = rewrite_manifests(table, timestamp_ms=1713139260003)
    assert out["groups"] == 1 and out["rewritten"] == 2
    # merged EXISTING entries must carry their ORIGINAL seqs explicitly...
    md2, _, _ = _load_md_for_test(table)
    cur2 = next(s for s in md2["snapshots"]
                if s["snapshot-id"] == md2["current-snapshot-id"])
    with open(cur2["manifest-list"], "rb") as fh:
        _, _, manifests2 = read_container(fh.read())
    merged = [m for m in manifests2 if int(m.get("content", 0)) == 0]
    assert len(merged) == 1
    with open(merged[0]["manifest_path"], "rb") as fh:
        _, _, entries2 = read_container(fh.read())
    assert sorted(e["sequence_number"] for e in entries2) == [1, 2]
    # ...so the delete still applies: id=7 must NOT resurrect
    assert sorted(r.id for r in scan_table(spark, table).collect()) == before


def test_update_schema_rejects_partition_source_drop(spark, tmp_path):
    from iceberg_meta_spark.sources.iceberg_write import (
        create_table,
        update_schema,
    )

    table = str(tmp_path / "t")
    create_table(
        table,
        fields=[(1, "region", "string"), (2, "id", "long")],
        partition_fields=[("region", 1, 1000)],
    )
    with pytest.raises(ValueError, match="partition source"):
        update_schema(table, drop=["region"])
    # non-source columns still drop fine
    md = update_schema(table, drop=["id"], timestamp_ms=1713139260001)
    cur = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    assert [f["name"] for f in cur["fields"]] == ["region"]


def _small_file_table(spark, tmp_path, with_deletes=True):
    """4 small appends (ids 0..19) + optional eq-delete on {3, 12}."""
    import glob

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        commit_delete_files,
        create_table,
    )

    table = str(tmp_path / "compact_t")
    create_table(table, fields=[(1, "id", "long"), (2, "region", "string"),
                                (3, "val", "long")])
    regions = ("americas", "emea", "apac")
    for b in range(4):
        rows = [(i, regions[i % 3], i * 10) for i in range(b * 5, b * 5 + 5)]
        append_dataframe(
            spark,
            spark.createDataFrame(rows, "id long, region string, val long")
            .coalesce(1),
            table, timestamp_ms=1713139260000 + b,
        )
    if with_deletes:
        (spark.createDataFrame([(3,), (12,)], "id long").coalesce(1)
         .write.parquet(os.path.join(table, "data", "del_eq")))
        [de] = glob.glob(os.path.join(table, "data", "del_eq", "*.parquet"))
        commit_delete_files(table, [{
            "file_path": de, "record_count": 2,
            "file_size_in_bytes": os.path.getsize(de), "equality_ids": [1],
        }], timestamp_ms=1713139260010)
    return table


def test_rewrite_data_files_compacts_and_absorbs_deletes(spark, tmp_path):
    """The capstone: 4 small files + pending equality deletes compact into
    ONE file; served rows are IDENTICAL pre/post; the absorbed deletes are
    gone from the data (new seq > delete seq); time travel still reaches
    the pre-compaction layout."""
    from iceberg_meta_spark.sources.iceberg_maintenance import rewrite_data_files
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table

    table = _small_file_table(spark, tmp_path)
    before = sorted((r.id, r.region, r.val)
                    for r in scan_table(spark, table).collect())
    assert len(before) == 18 and 3 not in {r[0] for r in before}
    pre_snap = 5  # 4 appends + 1 delete commit

    out = rewrite_data_files(spark, table, timestamp_ms=1713139260020)
    assert out["groups"] == 1
    assert out["rewritten_files"] == 4 and out["added_files"] == 1
    assert out["snapshot_id"] == 6

    after = sorted((r.id, r.region, r.val)
                   for r in scan_table(spark, table).collect())
    assert after == before  # served rows identical pre/post
    plan = plan_scan(spark, table)
    assert len(plan.data_files) == 1  # compacted to one file
    assert plan.data_files[0]["record_count"] == 18  # deletes absorbed
    # time travel: the pre-compaction snapshot still serves the old layout
    old_plan = plan_scan(spark, table, snapshot_id=pre_snap)
    assert len(old_plan.data_files) == 4
    assert sorted((r.id, r.region, r.val) for r in
                  scan_table(spark, table, snapshot_id=pre_snap).collect()) == before
    # zone-map bounds survive compaction: a prune on id still works
    assert plan_scan(spark, table, predicate=("id", 100, 200)).files_pruned == 1


def test_rewrite_data_files_noop_publishes_nothing(spark, tmp_path):
    from iceberg_meta_spark.sources.iceberg_maintenance import rewrite_data_files

    table = _small_file_table(spark, tmp_path, with_deletes=False)
    # threshold below every file size and no deletes -> nothing to do
    out = rewrite_data_files(spark, table, small_threshold=1,
                             timestamp_ms=1713139260020)
    assert out == {"groups": 0, "rewritten_files": 0, "added_files": 0,
                   "snapshot_id": None}
    md, version, _ = _load_md_for_test(table)
    assert version == 5  # 1 create + 4 appends, no new metadata version


def test_rewrite_data_files_partitioned_groups_per_partition(spark, tmp_path):
    """An identity-partitioned table compacts WITHIN each partition: one
    output file per partition tuple, values still served from metadata."""
    from iceberg_meta_spark.sources.iceberg_maintenance import rewrite_data_files
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    table = str(tmp_path / "part_t")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long")],
                 partition_fields=[("region", 1, 1000)])
    for b in range(2):  # 2 commits x 2 regions = 4 files
        rows = [("emea", b * 10 + 1), ("apac", b * 10 + 2)]
        append_dataframe(
            spark,
            spark.createDataFrame(rows, "region string, id long").coalesce(1),
            table, timestamp_ms=1713139260000 + b,
        )
    before = sorted((r.region, r.id) for r in scan_table(spark, table).collect())
    out = rewrite_data_files(spark, table, timestamp_ms=1713139260020)
    assert out["groups"] == 2  # one group per region, never mixed
    assert out["rewritten_files"] == 4 and out["added_files"] == 2
    plan = plan_scan(spark, table)
    assert sorted(f["part"]["region"] for f in plan.data_files) == ["apac", "emea"]
    assert sorted((r.region, r.id)
                  for r in scan_table(spark, table).collect()) == before
    # partition pruning still works on the compacted layout
    assert plan_scan(spark, table,
                     predicate=("region", "emea", "emea")).files_pruned == 1


def test_orphan_scan_protects_registered_statistics_files(spark, tmp_path):
    """Puffin column stats and partition-statistics parquet are metadata-
    reachable (spec § Table/Partition Statistics): the orphan scan must
    never flag them — remove_orphans would otherwise delete files the
    metadata still points at."""
    from iceberg_meta_spark.sources.iceberg_stats import (
        analyze_table,
        partition_statistics_frame,
        write_partition_statistics,
    )
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    table = str(tmp_path / "statsorph")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    append_dataframe(
        spark,
        spark.createDataFrame([(i, i) for i in range(5)], "id long, val long")
        .coalesce(1), table, timestamp_ms=1713139260000)
    analyze_table(spark, table, exact=True, timestamp_ms=1713139260001)
    write_partition_statistics(spark, table, timestamp_ms=1713139260002)
    flagged = {r.path for r in orphan_files_frame(spark, table).collect()}
    assert not any("stats" in p for p in flagged), flagged
    res = remove_orphans(spark, table, older_than_ms=1 << 60, dry_run=False)
    # stats files survived the DELETING run
    assert partition_statistics_frame(spark, table).count() == 1
    from iceberg_meta_spark.sources.iceberg_stats import statistics_frame

    assert statistics_frame(spark, table).count() == 2


def test_orphan_scan_keeps_live_files_in_escaped_partitions(spark, tmp_path):
    """Hive-escaped partition dirs ('k=a%3Db'): the listing side decodes
    the URI layer, the referenced side must NOT decode its already-on-disk
    manifest paths — a double decode would flag LIVE data files as
    orphans and remove_orphans would delete them (data loss)."""
    from iceberg_meta_spark.sources.iceberg_scan import scan_table
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    table = str(tmp_path / "escorph")
    create_table(table, fields=[(1, "k", "string"), (2, "id", "long")],
                 partition_fields=[("k", 1, 1000)])
    rows = [("a=b", 1), ("50%", 2), ("plain", 3)]
    append_dataframe(
        spark, spark.createDataFrame(rows, "k string, id long").coalesce(1),
        table, timestamp_ms=1713139260000)
    flagged = {r.path for r in orphan_files_frame(spark, table).collect()}
    assert not any(".parquet" in p for p in flagged), flagged
    # and a DELETING pass leaves every row served
    remove_orphans(spark, table, older_than_ms=1 << 60, dry_run=False)
    assert scan_table(spark, table).count() == 3
