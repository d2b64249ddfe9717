"""Merge-on-read DATA scan (r8, sources/iceberg_scan.py): plan -> read ->
delete application against real parquet + native metadata trees."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table
from iceberg_meta_spark.sources.iceberg_write import (
    commit_append,
    commit_delete_files,
    create_table,
)

pytestmark = pytest.mark.usefixtures("spark")


def _write_batch(spark, table, name, rows, schema):
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(table, "data", name))
    [p] = glob.glob(os.path.join(table, "data", name, "*.parquet"))
    return p


def _mor_table(spark, tmp_path):
    table = str(tmp_path / "t")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    p1 = _write_batch(spark, table, "b1", [(i, i * 10) for i in range(5)],
                      "id long, val long")
    commit_append(table, [{
        "file_path": p1, "record_count": 5,
        "file_size_in_bytes": os.path.getsize(p1),
        "lower_bounds": {1: 0}, "upper_bounds": {1: 4},
        "value_counts": {1: 5}, "null_value_counts": {1: 0},
        "column_sizes": {1: 1},
    }], timestamp_ms=1713139260000)
    p2 = _write_batch(spark, table, "b2", [(i, i * 10) for i in range(5, 10)],
                      "id long, val long")
    commit_append(table, [{
        "file_path": p2, "record_count": 5,
        "file_size_in_bytes": os.path.getsize(p2),
        "lower_bounds": {1: 5}, "upper_bounds": {1: 9},
        "value_counts": {1: 5}, "null_value_counts": {1: 0},
        "column_sizes": {1: 1},
    }], timestamp_ms=1713139260001)
    return table, p1, p2


def test_scan_without_deletes_reads_all_live_files(spark, tmp_path):
    table, _, _ = _mor_table(spark, tmp_path)
    assert sorted(r.id for r in scan_table(spark, table).collect()) == list(range(10))
    # snapshot time travel scans the historical file set
    assert sorted(r.id for r in scan_table(spark, table, snapshot_id=1).collect()) == [0, 1, 2, 3, 4]
    # metadata-version time travel too
    assert sorted(r.id for r in scan_table(spark, table, version=2).collect()) == [0, 1, 2, 3, 4]


def test_position_deletes_hide_exact_rows(spark, tmp_path):
    table, p1, p2 = _mor_table(spark, tmp_path)
    dp = _write_batch(spark, table, "del_pos", [(p1, 1), (p2, 0)],
                      "file_path string, pos long")
    commit_delete_files(table, [{
        "file_path": dp, "record_count": 2,
        "file_size_in_bytes": os.path.getsize(dp),
    }], timestamp_ms=1713139260002)
    # b1 pos 1 -> id 1; b2 pos 0 -> id 5
    assert sorted(r.id for r in scan_table(spark, table).collect()) == [0, 2, 3, 4, 6, 7, 8, 9]
    # the pre-delete snapshot still serves every row
    assert scan_table(spark, table, snapshot_id=2).count() == 10


def test_equality_deletes_are_sequence_strict(spark, tmp_path):
    """An equality delete hides MATCHING rows from EARLIER sequence numbers
    only: re-inserting the same key AFTER the delete must be visible —
    the upsert pattern equality deletes exist for (spec § Row-level
    deletes: data_seq < delete_seq, strict)."""
    table, _, _ = _mor_table(spark, tmp_path)
    de = _write_batch(spark, table, "del_eq", [(3,), (7,)], "id long")
    commit_delete_files(table, [{
        "file_path": de, "record_count": 2,
        "file_size_in_bytes": os.path.getsize(de),
        "equality_ids": [1],
    }], timestamp_ms=1713139260002)
    assert sorted(r.id for r in scan_table(spark, table).collect()) == [
        0, 1, 2, 4, 5, 6, 8, 9]

    # re-insert id=3 with a NEW val in a LATER commit: visible (seq 4 >= 3)
    p3 = _write_batch(spark, table, "b3", [(3, 999)], "id long, val long")
    commit_append(table, [{
        "file_path": p3, "record_count": 1,
        "file_size_in_bytes": os.path.getsize(p3),
        "lower_bounds": {1: 3}, "upper_bounds": {1: 3},
        "value_counts": {1: 1}, "null_value_counts": {1: 0},
        "column_sizes": {1: 1},
    }], timestamp_ms=1713139260003)
    rows = {r.id: r.val for r in scan_table(spark, table).collect()}
    assert rows[3] == 999  # the upserted row, not the deleted original
    assert sorted(rows) == [0, 1, 2, 3, 4, 5, 6, 8, 9]


def test_zone_map_pruning_skips_files_without_changing_results(spark, tmp_path):
    table, _, _ = _mor_table(spark, tmp_path)
    plan = plan_scan(spark, table, predicate=("id", 6, 9))
    assert (plan.files_total, plan.files_pruned) == (2, 1)  # b1 skipped
    assert sorted(r.id for r in
                  scan_table(spark, table, predicate=("id", 6, 9)).collect()) == [6, 7, 8, 9]
    # open-ended intervals prune too
    assert plan_scan(spark, table, predicate=("id", None, 4)).files_pruned == 1
    # a file without bounds for the column is conservatively kept
    p3 = _write_batch(spark, table, "b3", [(100, 1)], "id long, val long")
    commit_append(table, [{
        "file_path": p3, "record_count": 1,
        "file_size_in_bytes": os.path.getsize(p3),
    }], timestamp_ms=1713139260002)
    plan2 = plan_scan(spark, table, predicate=("id", 6, 9))
    assert plan2.files_total == 3 and plan2.files_pruned == 1
    # ...and the residual filter still excludes its out-of-range rows
    assert sorted(r.id for r in
                  scan_table(spark, table, predicate=("id", 6, 9)).collect()) == [6, 7, 8, 9]


def test_scan_empty_table_yields_schema_only(spark, tmp_path):
    table = str(tmp_path / "empty")
    create_table(table, fields=[(1, "id", "long"), (2, "name", "string")])
    df = scan_table(spark, table)
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<id:bigint,name:string>"


# --- randomized MoR semantics fuzz ------------------------------------------
# hypothesis drives a random commit history (appends, position deletes,
# equality deletes in arbitrary interleavings) against BOTH the real scan
# and a 20-line pure-Python model of the spec's visibility rules
# (pos: data_seq <= delete_seq on exact (file, pos); eq: data_seq <
# delete_seq on key match). Any divergence is a real sequencing bug.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

history = st.lists(
    st.one_of(
        st.tuples(st.just("append"),
                  st.lists(st.integers(0, 9), min_size=1, max_size=5)),
        st.tuples(st.just("posdel"),
                  st.lists(st.tuples(st.integers(0, 2), st.integers(0, 4)),
                           min_size=1, max_size=3)),
        st.tuples(st.just("eqdel"),
                  st.lists(st.integers(0, 9), min_size=1, max_size=3, unique=True)),
    ),
    min_size=2,
    max_size=5,
).filter(lambda ops: ops[0][0] == "append")


@given(ops=history)
@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_mor_scan_matches_python_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("mor_fuzz")
    table = str(tmp / "t")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])

    model = []  # (file_path, pos, id, val, data_seq), live rows appended here
    batches = []  # batch file paths in append order
    seq = 0
    for bi, (kind, payload) in enumerate(ops):
        seq += 1
        if kind == "append":
            rows = [(int(i), seq * 1000 + p) for p, i in enumerate(payload)]
            p = _write_batch(spark, table, f"b{bi}", rows, "id long, val long")
            commit_append(table, [{
                "file_path": p, "record_count": len(rows),
                "file_size_in_bytes": os.path.getsize(p),
            }], timestamp_ms=1713139260000 + seq)
            batches.append(p)
            model.extend((p, pos, i, v, seq) for pos, (i, v) in enumerate(rows))
        elif kind == "posdel":
            targets = [(batches[b % len(batches)], pos) for b, pos in payload]
            dp = _write_batch(spark, table, f"d{bi}",
                              [(f, int(pos)) for f, pos in targets],
                              "file_path string, pos long")
            commit_delete_files(table, [{
                "file_path": dp, "record_count": len(targets),
                "file_size_in_bytes": os.path.getsize(dp),
            }], timestamp_ms=1713139260000 + seq)
            tset = set(targets)
            model = [r for r in model
                     if not ((r[0], r[1]) in tset and r[4] <= seq)]
        else:  # eqdel
            de = _write_batch(spark, table, f"e{bi}",
                              [(int(i),) for i in payload], "id long")
            commit_delete_files(table, [{
                "file_path": de, "record_count": len(payload),
                "file_size_in_bytes": os.path.getsize(de),
                "equality_ids": [1],
            }], timestamp_ms=1713139260000 + seq)
            ids = set(payload)
            model = [r for r in model if not (r[2] in ids and r[4] < seq)]

    got = sorted((r.id, r.val) for r in scan_table(spark, table).collect())
    want = sorted((i, v) for _, _, i, v, _ in model)
    assert got == want, f"history {ops!r}: scan {got} != model {want}"


def test_append_dataframe_computes_stats_that_prune(spark, tmp_path):
    """INSERT INTO with auto-computed stats: append_dataframe writes the
    parquet, derives per-file record counts / sizes / int-long bounds in
    one distributed pass, and the committed bounds immediately drive
    zone-map pruning in the scan planner."""
    from iceberg_meta_spark.sources.iceberg_write import append_dataframe

    table = str(tmp_path / "ins")
    create_table(table, fields=[(1, "id", "long"), (2, "name", "string")])
    append_dataframe(
        spark,
        spark.createDataFrame([(i, f"n{i}") for i in range(10)],
                              "id long, name string").coalesce(1),
        table, timestamp_ms=1713139260000,
    )
    append_dataframe(
        spark,
        spark.createDataFrame([(i, f"n{i}") for i in range(100, 110)],
                              "id long, name string").coalesce(1),
        table, timestamp_ms=1713139260001,
    )
    assert scan_table(spark, table).count() == 20
    plan = plan_scan(spark, table, predicate=("id", 0, 50))
    assert (plan.files_total, plan.files_pruned) == (2, 1)
    assert sorted(r.id for r in
                  scan_table(spark, table, predicate=("id", 105, 200)).collect()
                  ) == [105, 106, 107, 108, 109]
    # committed metadata carries real totals (rows and bytes)
    from iceberg_meta_spark.sources.iceberg_native import load_table_metadata

    md = load_table_metadata(spark, table)
    assert md["snapshots"][-1]["summary"]["total-records"] == "20"
    assert int(md["snapshots"][-1]["summary"]["total-files-size"]) > 0


def test_partitioned_insert_prune_and_scan(spark, tmp_path):
    """Identity-partitioned table: insert lays the write out Hive-style and
    commits per-file partition tuples; the planner prunes on the partition
    VALUE straight from the manifest entry (no stats decode), and the scan
    re-injects the partition column from metadata (Hive files don't carry
    it) — including for equality deletes keyed on the partition column."""
    from iceberg_meta_spark.sources.iceberg_write import append_dataframe

    table = str(tmp_path / "pt")
    create_table(
        table,
        fields=[(1, "region", "string"), (2, "id", "long")],
        partition_fields=[("region", 1, 1000)],
    )
    rows = [("emea", 1), ("emea", 2), ("apac", 3), ("americas", 4)]
    append_dataframe(
        spark,
        spark.createDataFrame(rows, "region string, id long").repartition(1),
        table, timestamp_ms=1713139260000,
    )
    # one file per region (Hive layout), partition recorded in metadata
    plan = plan_scan(spark, table)
    assert plan.files_total == 3
    assert {f["part"]["region"] for f in plan.data_files} == {
        "emea", "apac", "americas"}

    # partition pruning: only the emea file survives the plan
    pruned = plan_scan(spark, table, predicate=("region", "emea", "emea"))
    assert (pruned.files_total, pruned.files_pruned) == (3, 2)
    got = scan_table(spark, table, predicate=("region", "emea", "emea"))
    assert sorted((r.region, r.id) for r in got.collect()) == [
        ("emea", 1), ("emea", 2)]

    # full scan serves the partition column from metadata for every row
    full = scan_table(spark, table)
    assert sorted((r.region, r.id) for r in full.collect()) == sorted(rows)

    # an equality delete keyed on the PARTITION column must still apply
    de = _write_batch(spark, table, "del_eq", [("apac",)], "region string")
    commit_delete_files(table, [{
        "file_path": de, "record_count": 1,
        "file_size_in_bytes": os.path.getsize(de),
        "equality_ids": [1],
    }], timestamp_ms=1713139260001)
    after = scan_table(spark, table)
    assert sorted(r.id for r in after.collect()) == [1, 2, 4]


def test_scan_mixed_schema_batches_keeps_new_column_values(spark, tmp_path):
    """alter-then-insert: a batch written AFTER a column was added carries
    real values for it; batches written before read NULL — the scan must
    union the file schemas (mergeSchema), not sample one file's schema and
    silently drop the newer batch's column."""
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        update_schema,
    )

    table = str(tmp_path / "ev")
    create_table(table, fields=[(1, "id", "long")])
    append_dataframe(
        spark, spark.createDataFrame([(1,), (2,)], "id long").coalesce(1),
        table, timestamp_ms=1713139260000,
    )
    update_schema(table, add=[("score", "double")],
                  timestamp_ms=1713139260001)
    append_dataframe(
        spark,
        spark.createDataFrame([(3, 0.5), (4, 0.9)], "id long, score double")
        .coalesce(1),
        table, timestamp_ms=1713139260002,
    )
    rows = {r.id: r.score for r in scan_table(spark, table).collect()}
    assert rows == {1: None, 2: None, 3: 0.5, 4: 0.9}


def test_partition_spec_evolution_old_files_survive_new_prunes(spark, tmp_path):
    """Partition evolution: after adding an identity field to the spec, old
    files keep their old partition shape (self-describing manifests), new
    commits write under the new spec; pruning on the NEW field prunes new
    files exactly and conservatively keeps old ones, and pruning on the
    ORIGINAL field prunes across both generations."""
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        update_partition_spec,
    )

    table = str(tmp_path / "pe")
    create_table(
        table,
        fields=[(1, "region", "string"), (2, "source", "string"), (3, "id", "long")],
        partition_fields=[("region", 1, 1000)],
    )
    append_dataframe(
        spark,
        spark.createDataFrame(
            [("emea", "s0", 1), ("apac", "s0", 2)],
            "region string, source string, id long").repartition(1),
        table, timestamp_ms=1713139260000,
    )
    md = update_partition_spec(table, ["source"], timestamp_ms=1713139260001)
    assert md["default-spec-id"] == 1
    assert md["partition-specs"][1]["fields"][-1]["field-id"] == 1001
    append_dataframe(
        spark,
        spark.createDataFrame(
            [("emea", "s1", 3), ("emea", "s2", 4)],
            "region string, source string, id long").repartition(1),
        table, timestamp_ms=1713139260002,
    )

    assert sorted(r.id for r in scan_table(spark, table).collect()) == [1, 2, 3, 4]
    # NEW-field prune: new-gen s2 file pruned; old-gen files (no 'source'
    # in their partition tuple) conservatively survive
    plan = plan_scan(spark, table, predicate=("source", "s1", "s1"))
    kept = {f["part"].get("source") for f in plan.data_files}
    assert "s2" not in kept and plan.files_pruned >= 1
    got = scan_table(spark, table, predicate=("source", "s1", "s1"))
    assert sorted(r.id for r in got.collect()) == [3]
    # ORIGINAL-field prune spans both generations
    plan_r = plan_scan(spark, table, predicate=("region", "emea", "emea"))
    assert plan_r.files_pruned >= 1  # the apac old-gen file
    got_r = scan_table(spark, table, predicate=("region", "emea", "emea"))
    assert sorted(r.id for r in got_r.collect()) == [1, 3, 4]


def test_refs_ddl_and_scan_by_ref(spark, tmp_path):
    """Branch/tag DDL + name-addressed time travel: tag the first commit,
    keep appending, scan the tag -> the historical state; the tag gates
    expiry (pinned snapshot survives keep_last=1); dropping it releases
    the pin."""
    from iceberg_meta_spark.sources.iceberg_maintenance import expire_snapshots
    from iceberg_meta_spark.sources.iceberg_write import append_dataframe, manage_ref

    table = str(tmp_path / "refs")
    create_table(table, fields=[(1, "id", "long")])
    append_dataframe(spark, spark.createDataFrame([(1,), (2,)], "id long")
                     .coalesce(1), table, timestamp_ms=1713139260000)
    manage_ref(table, "v1-audit", ref_type="tag", timestamp_ms=1713139260001)
    append_dataframe(spark, spark.createDataFrame([(3,)], "id long")
                     .coalesce(1), table, timestamp_ms=1713139260002)

    assert sorted(r.id for r in scan_table(spark, table).collect()) == [1, 2, 3]
    assert sorted(r.id for r in
                  scan_table(spark, table, ref="v1-audit").collect()) == [1, 2]
    with pytest.raises(KeyError):
        scan_table(spark, table, ref="nope")

    # the tag pins snapshot 1 through expiry
    out = expire_snapshots(table, keep_last=1, timestamp_ms=1713139260003)
    assert out["expired_snapshot_ids"] == []
    # drop the tag -> snapshot 1 becomes expirable
    manage_ref(table, "v1-audit", drop=True, timestamp_ms=1713139260004)
    out = expire_snapshots(table, keep_last=1, timestamp_ms=1713139260005)
    assert out["expired_snapshot_ids"] == [1]
    with pytest.raises(ValueError):
        manage_ref(table, "main", drop=True)


def test_norm_path_collapses_scheme_and_slashes():
    """file:///x, file:/x, ///x and /x all -> /x — the exact form the
    Spark-side regexp_replace produces, so __file equi-joins match
    engine-written file:// URIs (r9 ADVICE fix)."""
    from iceberg_meta_spark.sources.iceberg_scan import _norm_path

    assert _norm_path("file:///a/b.parquet") == "/a/b.parquet"
    assert _norm_path("file:/a/b.parquet") == "/a/b.parquet"
    assert _norm_path("///a/b.parquet") == "/a/b.parquet"
    assert _norm_path("/a/b.parquet") == "/a/b.parquet"


def test_scan_serves_rows_for_file_uri_metadata(spark, tmp_path):
    """Engine-written metadata may store file:// URIs in file_path; the
    seq-map join must still match (previously file:///x normalized to
    ///x and the scan silently returned empty)."""
    table = str(tmp_path / "t")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    p1 = _write_batch(spark, table, "b1", [(i, i * 10) for i in range(5)],
                      "id long, val long")
    commit_append(table, [{
        "file_path": "file://" + p1, "record_count": 5,
        "file_size_in_bytes": os.path.getsize(p1),
        "lower_bounds": {1: 0}, "upper_bounds": {1: 4},
        "value_counts": {1: 5}, "null_value_counts": {1: 0},
        "column_sizes": {1: 1},
    }], timestamp_ms=1713139260000)
    assert sorted(r.id for r in scan_table(spark, table).collect()) == [0, 1, 2, 3, 4]


def test_equality_delete_null_matches_null_rows(spark, tmp_path):
    """Iceberg equality deletes are null-safe: a delete row with NULL in an
    equality column deletes rows whose column IS NULL (plain == would never
    match; r9 ADVICE fix)."""
    table = str(tmp_path / "t")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    p1 = _write_batch(spark, table, "b1", [(1, 10), (None, 20), (3, 30)],
                      "id long, val long")
    commit_append(table, [{
        "file_path": p1, "record_count": 3,
        "file_size_in_bytes": os.path.getsize(p1),
    }], timestamp_ms=1713139260000)
    de = _write_batch(spark, table, "del_eq", [(None,)], "id long")
    commit_delete_files(table, [{
        "file_path": de, "record_count": 1,
        "file_size_in_bytes": os.path.getsize(de),
        "equality_ids": [1],
    }], timestamp_ms=1713139260001)
    got = sorted((r.id, r.val) for r in scan_table(spark, table).collect())
    assert got == [(1, 10), (3, 30)]  # the NULL-id row is deleted


def test_plan_decode_emits_only_surviving_entries(spark, tmp_path):
    """The distributed decode prunes EXECUTOR-side (r9): feeding the plan
    map-fn a manifest batch directly must yield only surviving entries —
    the driver never sees the pre-prune file list."""
    import pandas as pd

    from iceberg_meta_spark.sources.iceberg_native import (
        _read_avro_file,
        load_table_metadata,
    )
    from iceberg_meta_spark.sources.iceberg_scan import _make_plan_entries_fn

    table, p1, p2 = _mor_table(spark, tmp_path)
    md = load_table_metadata(spark, table)
    snap = next(s for s in md["snapshots"]
                if s["snapshot-id"] == md["current-snapshot-id"])
    mlist = _read_avro_file(spark, snap["manifest-list"])
    batches = []
    for m in mlist:
        with open(m["manifest_path"], "rb") as fh:
            batches.append((m["manifest_path"], fh.read()))
    pdf = pd.DataFrame(batches, columns=["path", "content"])
    # zone-map prune on id in [6, 9]: b1 (id 0..4) must never be emitted
    fn = _make_plan_entries_fn(
        {m["manifest_path"]: m.get("sequence_number") for m in mlist},
        bounds_preds=[(1, "long", 6, 9)], part_preds=[],
    )
    out = pd.concat(list(fn(iter([pdf]))))
    assert list(out["file_path"]) == [p2]  # b1 pruned inside the decode
    # plan_scan reports the prune without ever collecting b1's entry
    plan = plan_scan(spark, table, predicate=("id", 6, 9))
    assert {f["path"] for f in plan.data_files} == {p2}
    assert (plan.files_total, plan.files_pruned) == (2, 1)


def _changelog_history(spark, tmp_path):
    """create(v1) -> append 0..4(v2) -> append 5..9(v3) -> pos+eq delete
    {1, 7}(v4) -> remove the b1 FILE (v5) -> append 10..12(v6)."""
    from iceberg_meta_spark.sources.iceberg_write import commit_remove_files

    table = str(tmp_path / "cdc")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    p1 = _write_batch(spark, table, "b1", [(i, i * 10) for i in range(5)],
                      "id long, val long")
    commit_append(table, [{"file_path": p1, "record_count": 5,
                           "file_size_in_bytes": os.path.getsize(p1)}],
                  timestamp_ms=1713139260000)
    p2 = _write_batch(spark, table, "b2", [(i, i * 10) for i in range(5, 10)],
                      "id long, val long")
    commit_append(table, [{"file_path": p2, "record_count": 5,
                           "file_size_in_bytes": os.path.getsize(p2)}],
                  timestamp_ms=1713139260001)
    dp = _write_batch(spark, table, "del_pos", [(p1, 1)],
                      "file_path string, pos long")
    de = _write_batch(spark, table, "del_eq", [(7,)], "id long")
    commit_delete_files(table, [
        {"file_path": dp, "record_count": 1,
         "file_size_in_bytes": os.path.getsize(dp)},
        {"file_path": de, "record_count": 1,
         "file_size_in_bytes": os.path.getsize(de), "equality_ids": [1]},
    ], timestamp_ms=1713139260002)
    commit_remove_files(table, {p1}, timestamp_ms=1713139260003)
    p3 = _write_batch(spark, table, "b3", [(i, i * 10) for i in range(10, 13)],
                      "id long, val long")
    commit_append(table, [{"file_path": p3, "record_count": 3,
                           "file_size_in_bytes": os.path.getsize(p3)}],
                  timestamp_ms=1713139260004)
    return table


def test_scan_changes_all_three_shapes(spark, tmp_path):
    """Added files -> inserts; NEW delete files -> deletes of the killed
    rows (as visible at FROM); removed files -> deletes of their
    FROM-visible rows (already-deleted rows excluded)."""
    from iceberg_meta_spark.sources.iceberg_scan import scan_changes

    table = _changelog_history(spark, tmp_path)
    # v3 -> v4: only the delete commit — deletes {1 (pos), 7 (eq)}
    ch = scan_changes(spark, table, from_version=3, to_version=4).collect()
    assert sorted((r._change_type, r.id) for r in ch) == [
        ("delete", 1), ("delete", 7)]
    # v4 -> v5: b1 removed — its FROM-visible rows {0, 2, 3, 4} (1 was
    # already deleted at v4, so it must NOT reappear as a change)
    ch = scan_changes(spark, table, from_version=4, to_version=5).collect()
    assert sorted((r._change_type, r.id) for r in ch) == [
        ("delete", 0), ("delete", 2), ("delete", 3), ("delete", 4)]
    # v5 -> v6: appends only
    ch = scan_changes(spark, table, from_version=5, to_version=6).collect()
    assert sorted((r._change_type, r.id) for r in ch) == [
        ("insert", 10), ("insert", 11), ("insert", 12)]
    # from == to: no changes, schema intact
    ch = scan_changes(spark, table, from_version=4, to_version=4)
    assert ch.count() == 0
    assert ch.columns == ["id", "val", "_change_type"]
    # from table creation: everything visible NOW is an insert (b1 was
    # removed at v5 so its rows are in neither side — net zero)
    ch = scan_changes(spark, table, from_version=1).collect()
    assert sorted(r.id for r in ch) == [5, 6, 8, 9, 10, 11, 12]
    assert {r._change_type for r in ch} == {"insert"}


def test_scan_changes_replay_reconstructs_every_state(spark, tmp_path):
    """The CDC consumer contract: folding scan_changes over consecutive
    versions reconstructs scan_table's state at every version — and the
    streaming latest-state kernel (streaming/cdc.py) consumes the same
    rows to the same end state."""
    from iceberg_meta_spark.sources.iceberg_scan import scan_changes, scan_table
    from iceberg_meta_spark.streaming.cdc import latest_state_stream

    table = _changelog_history(spark, tmp_path)
    state: dict = {}
    events = []
    for v in range(2, 7):
        for r in scan_changes(spark, table,
                              from_version=v - 1, to_version=v).collect():
            if r._change_type == "insert":
                state[r.id] = (r.id, r.val)
            else:
                state.pop(r.id)  # KeyError = changelog emitted a bogus delete
            events.append((r.id, v, r._change_type, r.val))
        expect = sorted((r.id, r.val)
                        for r in scan_table(spark, table, version=v).collect())
        assert sorted(state.values()) == expect, f"diverged at version {v}"

    # live twin: the streaming CDC kernel's struct-max over the SAME events
    changes = spark.createDataFrame(
        events, "id long, ts long, _change_type string, val long")
    latest = latest_state_stream(changes, key_col="id", ts_col="ts",
                                 payload_cols=("_change_type", "val"))
    final = {(r.id, r.last_val) for r in latest.collect()
             if r.last__change_type == "insert"}
    assert final == set(state.values())


def test_merge_into_upserts_in_one_snapshot(spark, tmp_path):
    """MERGE INTO: matched keys update, new keys insert, untouched keys
    stay — ONE snapshot, one metadata version; time travel reaches the
    pre-merge state; a second merge layers correctly; compaction then
    absorbs the logically-replaced rows."""
    from iceberg_meta_spark.sources.iceberg_maintenance import rewrite_data_files
    from iceberg_meta_spark.sources.iceberg_native import load_table_metadata
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        merge_into,
    )

    table = str(tmp_path / "m")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    append_dataframe(spark,
                     spark.createDataFrame([(i, i * 10) for i in range(5)],
                                           "id long, val long").coalesce(1),
                     table, timestamp_ms=1713139260000)

    merge_into(spark,
               spark.createDataFrame([(3, 999), (4, 888), (5, 555), (6, 666)],
                                     "id long, val long").coalesce(1),
               table, key_cols=["id"], timestamp_ms=1713139260001)
    got = {r.id: r.val for r in scan_table(spark, table).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 999, 4: 888, 5: 555, 6: 666}
    md = load_table_metadata(spark, table)
    assert len(md["snapshots"]) == 2  # append + ONE merge snapshot
    assert md["snapshots"][-1]["summary"]["operation"] == "overwrite"
    # pre-merge time travel
    pre = {r.id: r.val for r in scan_table(spark, table, snapshot_id=1).collect()}
    assert pre == {0: 0, 1: 10, 2: 20, 3: 30, 4: 40}
    # a second merge over the first (re-upsert id 5, insert id 7)
    merge_into(spark,
               spark.createDataFrame([(5, 5555), (7, 777)], "id long, val long")
               .coalesce(1),
               table, key_cols=["id"], timestamp_ms=1713139260002)
    got = {r.id: r.val for r in scan_table(spark, table).collect()}
    assert got[5] == 5555 and got[7] == 777 and got[3] == 999
    # compaction absorbs every replaced row; served state unchanged
    out = rewrite_data_files(spark, table, timestamp_ms=1713139260003)
    assert out["groups"] >= 1
    assert {r.id: r.val for r in scan_table(spark, table).collect()} == got

    with pytest.raises(KeyError, match="merge keys"):
        merge_into(spark, spark.createDataFrame([(1, 1)], "id long, val long"),
                   table, key_cols=["nope"])


def test_delete_where_publishes_position_deletes(spark, tmp_path):
    """DELETE FROM t WHERE id BETWEEN 3 AND 6: the matching rows resolve
    to physical (file, pos) through the scan (rows already hidden are not
    re-deleted), publish as ONE position-delete commit, and the table
    serves the remainder; a no-match delete publishes nothing."""
    from iceberg_meta_spark.sources.iceberg_native import load_table_metadata
    from iceberg_meta_spark.sources.iceberg_write import delete_where

    table, _, _ = _mor_table(spark, tmp_path)
    out = delete_where(spark, table, ("id", 3, 6),
                       timestamp_ms=1713139260002)
    assert out["rows_deleted"] == 4 and out["snapshot_id"] == 3
    assert sorted(r.id for r in scan_table(spark, table).collect()) == [
        0, 1, 2, 7, 8, 9]
    # pre-delete snapshot unaffected
    assert scan_table(spark, table, snapshot_id=2).count() == 10
    # deleting the same interval again: nothing left to match -> no-op
    out2 = delete_where(spark, table, ("id", 3, 6),
                        timestamp_ms=1713139260003)
    assert out2 == {"rows_deleted": 0, "snapshot_id": None}
    assert len(load_table_metadata(spark, table)["snapshots"]) == 3
    # open-ended predicate
    out3 = delete_where(spark, table, ("id", 8, None),
                        timestamp_ms=1713139260004)
    assert out3["rows_deleted"] == 2
    assert sorted(r.id for r in scan_table(spark, table).collect()) == [
        0, 1, 2, 7]


def test_sort_compaction_tightens_zone_maps(spark, tmp_path):
    """SORT-strategy compaction: interleaved ids across small files
    rewrite range-partitioned on id, so each output file covers a tight
    range and a point-ish predicate prunes most files — same served rows."""
    from iceberg_meta_spark.sources.iceberg_maintenance import rewrite_data_files
    from iceberg_meta_spark.sources.iceberg_write import append_dataframe

    table = str(tmp_path / "s")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    # 3 appends with INTERLEAVED ids: every file spans [b, 27+b] so no
    # pre-compaction prune is possible for a mid-range predicate
    for b in range(3):
        rows = [(i * 3 + b, (i * 3 + b) * 10) for i in range(10)]
        append_dataframe(spark,
                         spark.createDataFrame(rows, "id long, val long")
                         .coalesce(1),
                         table, timestamp_ms=1713139260000 + b)
    before = sorted((r.id, r.val) for r in scan_table(spark, table).collect())
    pre = plan_scan(spark, table, predicate=("id", 25, 29))
    assert pre.files_pruned == 0  # interleaving defeats zone maps

    file_bytes = plan_scan(spark, table).data_files[0]["size"]
    out = rewrite_data_files(spark, table, sort_by="id",
                             target_bytes=file_bytes,  # force a multi-file split
                             timestamp_ms=1713139260010)
    assert out["groups"] == 1 and out["added_files"] >= 2
    after = sorted((r.id, r.val) for r in scan_table(spark, table).collect())
    assert after == before
    post = plan_scan(spark, table, predicate=("id", 25, 29))
    assert post.files_pruned >= 1  # ranges are tight now
    assert sorted(r.id for r in
                  scan_table(spark, table, predicate=("id", 25, 29)).collect()
                  ) == [25, 26, 27, 28, 29]


def test_rewrite_position_deletes_drops_dangling(spark, tmp_path):
    """After the b1 FILE is removed, the position-delete file that ONLY
    targeted b1 is dangling and gets dropped; a partially-dangling delete
    file (targets b1 AND b2) shrinks to its live rows — served rows
    identical pre/post, delete-file count falls."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_position_deletes,
    )
    from iceberg_meta_spark.sources.iceberg_write import commit_remove_files

    table, p1, p2 = _mor_table(spark, tmp_path)
    # delete file A: targets b1 only (pos 0 -> id 0)
    dpa = _write_batch(spark, table, "del_a", [(p1, 0)],
                       "file_path string, pos long")
    commit_delete_files(table, [{"file_path": dpa, "record_count": 1,
                                 "file_size_in_bytes": os.path.getsize(dpa)}],
                        timestamp_ms=1713139260002)
    # delete file B: targets b1 (pos 2 -> id 2) AND b2 (pos 1 -> id 6)
    dpb = _write_batch(spark, table, "del_b", [(p1, 2), (p2, 1)],
                       "file_path string, pos long")
    commit_delete_files(table, [{"file_path": dpb, "record_count": 2,
                                 "file_size_in_bytes": os.path.getsize(dpb)}],
                        timestamp_ms=1713139260003)
    assert sorted(r.id for r in scan_table(spark, table).collect()) == [
        1, 3, 4, 5, 7, 8, 9]

    # drop the b1 FILE: A becomes fully dangling, B partially (its b2
    # row stays live)
    commit_remove_files(table, {p1}, timestamp_ms=1713139260004)
    served = sorted(r.id for r in scan_table(spark, table).collect())
    assert served == [5, 7, 8, 9]

    res = rewrite_position_deletes(spark, table, timestamp_ms=1713139260005)
    assert res["dropped"] == 1 and res["rewritten"] == 1
    assert sorted(r.id for r in scan_table(spark, table).collect()) == served
    plan = plan_scan(spark, table)
    # A and B replaced by ONE shrunk delete file with only the live row
    assert len(plan.position_deletes) == 1
    # running it again: nothing dangling -> no-op
    res2 = rewrite_position_deletes(spark, table, timestamp_ms=1713139260006)
    assert res2 == {"dropped": 0, "rewritten": 0, "snapshot_id": None}


def test_multi_predicate_conjunction_prunes_and_filters(spark, tmp_path):
    """predicate= accepts a LIST of (col, lo, hi) tuples ANDed together:
    each conjunct prunes files independently and the residual filter
    applies all of them."""
    from iceberg_meta_spark.sources.iceberg_write import append_dataframe

    table = str(tmp_path / "multi")
    create_table(table, fields=[(1, "id", "long"), (2, "grp", "string"),
                                (3, "val", "long")])
    # file A: ids 0..9 grp a..b; file B: ids 10..19 grp c..d
    for b, grps in ((0, ("a", "b")), (1, ("c", "d"))):
        rows = [(b * 10 + i, grps[i % 2], i) for i in range(10)]
        append_dataframe(spark,
                         spark.createDataFrame(rows, "id long, grp string, val long")
                         .coalesce(1),
                         table, timestamp_ms=1713139260000 + b)
    preds = [("id", 12, 18), ("grp", "c", "c")]
    plan = plan_scan(spark, table, predicate=preds)
    assert plan.files_total == 2 and plan.files_pruned == 1  # file A out
    got = scan_table(spark, table, predicate=preds).orderBy("id").collect()
    assert [r.id for r in got] == [12, 14, 16, 18]
    assert {r.grp for r in got} == {"c"}
    # a contradiction prunes everything
    plan2 = plan_scan(spark, table,
                      predicate=[("id", 5, 8), ("grp", "c", "c")])
    assert len(plan2.data_files) == 0


def test_inherited_sequence_numbers_resolve_via_manifest(spark, tmp_path):
    """Engine-written tables store ADDED entries with NULL sequence_number
    (spec § Sequence Number Inheritance: the reader takes the MANIFEST's
    seq). Nulling every entry seq in an upsert history must not change the
    scan: the re-inserted key stays visible (its manifest seq 3 > delete
    seq 2) and the originally deleted keys stay hidden. Regression for the
    mseq path-normalization bug (binaryFile URIs vs raw manifest-list
    paths) that silently collapsed inherited seqs to 0."""
    from iceberg_meta_spark.sources.avro_py import read_container, write_container
    from iceberg_meta_spark.sources.iceberg_native import load_table_metadata
    from iceberg_meta_spark.sources.iceberg_write import commit_append

    table, _, _ = _mor_table(spark, tmp_path)
    de = _write_batch(spark, table, "del_eq", [(3,), (7,)], "id long")
    commit_delete_files(table, [{
        "file_path": de, "record_count": 2,
        "file_size_in_bytes": os.path.getsize(de),
        "equality_ids": [1],
    }], timestamp_ms=1713139260002)
    p3 = _write_batch(spark, table, "b3", [(3, 999)], "id long, val long")
    commit_append(table, [{
        "file_path": p3, "record_count": 1,
        "file_size_in_bytes": os.path.getsize(p3),
    }], timestamp_ms=1713139260003)
    want = sorted((r.id, r.val) for r in scan_table(spark, table).collect())
    assert (3, 999) in want  # sanity: the upsert is visible pre-rewrite

    # engine-style rewrite: NULL every entry's (file_)sequence_number so
    # the reader must inherit from the manifest list
    md = load_table_metadata(spark, table)
    snap = next(s for s in md["snapshots"]
                if s["snapshot-id"] == md["current-snapshot-id"])
    with open(snap["manifest-list"], "rb") as fh:
        _, _, mlist = read_container(fh.read())
    for m in mlist:
        with open(m["manifest_path"], "rb") as fh:
            schema, meta, entries = read_container(fh.read())
        for e in entries:
            e["sequence_number"] = None
            e["file_sequence_number"] = None
        with open(m["manifest_path"], "wb") as fh:
            fh.write(write_container(schema, entries, metadata=meta))

    got = sorted((r.id, r.val) for r in scan_table(spark, table).collect())
    assert got == want  # inheritance reconstructs every seq exactly


def test_numeric_looking_string_partition_values_stay_exact(spark, tmp_path):
    """Identity partitioning on a string column whose values LOOK numeric
    ('00123'): the manifest tuple and the re-injected scan column must
    carry the exact string — Hive partition-discovery type inference
    would coerce it to 123 and corrupt both. Regression for the
    path-parsed partition values in write_dataframe_files."""
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    table = str(tmp_path / "numstr")
    create_table(table, fields=[(1, "key", "string"), (2, "id", "long")],
                 partition_fields=[("key", 1, 1000)])
    rows = [("00123", 1), ("00123", 2), ("7", 3)]
    append_dataframe(
        spark, spark.createDataFrame(rows, "key string, id long").coalesce(1),
        table, timestamp_ms=1713139260000)
    plan = plan_scan(spark, table)
    assert sorted(f["part"]["key"] for f in plan.data_files) == ["00123", "7"]
    got = sorted((r.key, r.id) for r in scan_table(spark, table).collect())
    assert got == [("00123", 1), ("00123", 2), ("7", 3)]
    # partition pruning on the exact string value
    p = plan_scan(spark, table, predicate=("key", "00123", "00123"))
    assert p.files_pruned == 1


def test_register_table_enables_spark_sql(spark, tmp_path):
    """api.register_table makes a native table queryable with plain SQL,
    deletes applied; a ref-pinned view serves the branch state."""
    from iceberg_meta_spark import api
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        delete_where,
    )

    table = str(tmp_path / "sqlreg")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    append_dataframe(
        spark,
        spark.createDataFrame([(i, i * 10) for i in range(6)],
                              "id long, val long").coalesce(1),
        table, timestamp_ms=1713139260000)
    delete_where(spark, table, ("id", 2, 3), timestamp_ms=1713139260001)
    api.register_table(spark, table, "native_sql_t")
    got = spark.sql(
        "SELECT count(*) AS n, sum(val) AS s FROM native_sql_t"
    ).collect()[0]
    assert (got.n, got.s) == (4, (0 + 1 + 4 + 5) * 10)
    # time-travel view: pre-delete snapshot
    api.register_table(spark, table, "native_sql_t_v1", snapshot_id=1)
    assert spark.sql("SELECT count(*) n FROM native_sql_t_v1").collect()[0].n == 6


def test_hive_special_chars_in_partition_values_round_trip(spark, tmp_path):
    """'a=b' and '50%' survive the Hive-escape + URI-encode double layer:
    the manifest tuple carries the exact original string and the scan
    re-injects it (probe: dir 'k=a%3Db', file_path 'k=a%253Db')."""
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    table = str(tmp_path / "hivesc")
    create_table(table, fields=[(1, "k", "string"), (2, "id", "long")],
                 partition_fields=[("k", 1, 1000)])
    rows = [("a=b", 1), ("50%", 2), ("plain", 3)]
    append_dataframe(
        spark, spark.createDataFrame(rows, "k string, id long").coalesce(1),
        table, timestamp_ms=1713139260000)
    plan = plan_scan(spark, table)
    assert sorted(f["part"]["k"] for f in plan.data_files) \
        == ["50%", "a=b", "plain"]
    # byte sizes resolved through the binaryFile map for escaped dirs too
    assert all(f["size"] > 0 for f in plan.data_files)
    got = sorted((r.k, r.id) for r in scan_table(spark, table).collect())
    assert got == [("50%", 2), ("a=b", 1), ("plain", 3)]


def test_hive_special_partition_with_position_deletes(spark, tmp_path):
    """The full MoR chain over a Hive-escaped partition ('a=b'): the data
    file lives in 'k=a%3Db/', the position delete stores the on-disk
    path, and the (file, pos) anti-join must kill exactly the targeted
    row — pins the one-decode-per-layer path canonicalization (a second
    url-decode on the delete side would break the join)."""
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        delete_where,
    )

    table = str(tmp_path / "hivedel")
    create_table(table, fields=[(1, "k", "string"), (2, "id", "long")],
                 partition_fields=[("k", 1, 1000)])
    rows = [("a=b", i) for i in range(4)] + [("50%", 10)]
    append_dataframe(
        spark, spark.createDataFrame(rows, "k string, id long").coalesce(1),
        table, timestamp_ms=1713139260000)
    delete_where(spark, table, ("id", 1, 2), timestamp_ms=1713139260001)
    got = sorted((r.k, r.id) for r in scan_table(spark, table).collect())
    assert got == [("50%", 10), ("a=b", 0), ("a=b", 3)]


def test_changelog_update_pairs_and_carryover_elimination(spark, tmp_path):
    """scan_changes(key_cols=...) — Iceberg's compute-updates mode: an
    upserted key pairs into update_before/update_after, fresh keys stay
    inserts, and a compaction interval nets to ZERO changes (identical
    delete+insert carry-over rows cancel pairwise)."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_data_files,
    )
    from iceberg_meta_spark.sources.iceberg_scan import scan_changes
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
        merge_into,
    )

    ts = 1713139200000
    table = str(tmp_path / "cdc_upd")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    append_dataframe(
        spark,
        spark.createDataFrame([(i, i * 10) for i in range(5)],
                              "id long, val long").coalesce(1),
        table, timestamp_ms=ts + 60_000)
    merge_into(spark,
               spark.createDataFrame([(2, 999), (9, 90)], "id long, val long")
               .coalesce(1),
               table, ["id"], timestamp_ms=ts + 120_000)
    ch = scan_changes(spark, table, from_snapshot_id=1, key_cols=["id"])
    got = sorted((r._change_type, r.id, r.val) for r in ch.collect())
    assert got == [("insert", 9, 90), ("update_after", 2, 999),
                   ("update_before", 2, 20)]
    # without keys: the same interval shows the raw delete+insert stream
    raw = scan_changes(spark, table, from_snapshot_id=1)
    assert sorted(r._change_type for r in raw.collect()) == [
        "delete", "insert", "insert"]

    # compaction interval: carry-over rows cancel to zero under keys
    rewrite_data_files(spark, table, timestamp_ms=ts + 180_000)
    assert scan_changes(spark, table, from_snapshot_id=2,
                        key_cols=["id"]).count() == 0
    assert scan_changes(spark, table, from_snapshot_id=2).count() > 0

    with pytest.raises(KeyError, match="key_cols"):
        scan_changes(spark, table, from_snapshot_id=1, key_cols=["nope"])


def test_changelog_multi_change_per_key_raises(spark, tmp_path):
    """r12 guard: a key changing MORE THAN ONCE inside the interval makes
    update_before/update_after pairing ambiguous — scan_changes(key_cols=)
    raises a guided error instead of silently mispairing; per-snapshot
    intervals (one change per key) still work."""
    from iceberg_meta_spark.sources.iceberg_scan import scan_changes
    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        create_table,
    )

    ts = 1713139200000
    table = str(tmp_path / "cdc_dup")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    append_dataframe(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "id long, val long")
        .coalesce(1), table, timestamp_ms=ts + 60_000)
    # two further appends BOTH carrying id=2: surviving inserts duplicate
    # the key over the 1->3 interval
    append_dataframe(
        spark, spark.createDataFrame([(2, 100)], "id long, val long")
        .coalesce(1), table, timestamp_ms=ts + 120_000)
    append_dataframe(
        spark, spark.createDataFrame([(2, 200)], "id long, val long")
        .coalesce(1), table, timestamp_ms=ts + 180_000)
    with pytest.raises(ValueError, match="more than once"):
        scan_changes(spark, table, from_snapshot_id=1, key_cols=["id"])
    # the per-snapshot sub-intervals each satisfy one-change-per-key
    assert scan_changes(spark, table, from_snapshot_id=1, to_snapshot_id=2,
                        key_cols=["id"]).count() == 1
    assert scan_changes(spark, table, from_snapshot_id=2, to_snapshot_id=3,
                        key_cols=["id"]).count() == 1
