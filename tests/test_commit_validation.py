"""Commit-time validation against concurrent row-level deletes (r11,
closing the r10 ADVICE findings):

- ``commit_rewrite_files(validate_from_seq=...)`` refuses to publish a
  compaction when a delete (position delete, equality delete, or v3
  deletion vector) newer than the plan-time sequence number applies to a
  file being removed — Java RewriteFiles' validateNoNewDeletesForDataFiles.
  Without the guard the DELETE is silently lost: the replacement files
  were materialized without it.
- ``commit_dv_files`` refuses a deletion vector whose referenced data
  file is no longer live in the (rebased) snapshot — Java's
  validateDataFilesExist. Without it a DV lands referencing a dead file
  and the deleted rows live on in the compacted replacement.
- DV supersede commits report only NET-NEW deleted-records (the merged
  bitmap's cardinality double-counts rows the superseded entry already
  reported).
- v3 commits stamp "format-version": "3" in manifest-list Avro metadata.
- The streaming sink's exactly-once marker survives expire_snapshots via
  the table-property high-water epoch.

Reference parity: the reference delegates all commits to engines that
enforce these via the public Iceberg validation APIs; semantics here come
from iceberg.apache.org/spec § Row-level deletes + the documented
RewriteFiles validation contract.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_meta_spark.sources.avro_py import read_container
from iceberg_meta_spark.sources.iceberg_dv import (
    commit_dv_files,
    write_dv_file,
)
from iceberg_meta_spark.sources.iceberg_write import (
    CommitConflictError,
    _latest_version,
    commit_append,
    commit_delete_files,
    commit_rewrite_files,
    create_table,
)

_TS = 1713139200000


def _fresh(name: str) -> str:
    base = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(base, ignore_errors=True)
    return os.path.join(base, "t")


def _md(table: str) -> dict:
    meta = os.path.join(table, "metadata")
    v = _latest_version(meta)
    with open(os.path.join(meta, f"v{v}.metadata.json")) as fh:
        return json.load(fh)


def _one_file(spark, table: str, name: str, ids) -> dict:
    rows = [(i, i * 10) for i in ids]
    d = os.path.join(table, "data", name)
    (spark.createDataFrame(rows, "id long, val long").coalesce(1)
     .write.mode("overwrite").parquet(d))
    [p] = glob.glob(os.path.join(d, "*.parquet"))
    return {
        "file_path": p, "record_count": len(rows),
        "file_size_in_bytes": os.path.getsize(p),
        "lower_bounds": {1: min(ids)}, "upper_bounds": {1: max(ids)},
    }


def _table(spark, name: str, format_version: int = 2):
    table = _fresh(name)
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")],
                 format_version=format_version)
    f1 = _one_file(spark, table, "b0", range(0, 10))
    commit_append(table, [f1], timestamp_ms=_TS + 60_000)
    f2 = _one_file(spark, table, "b1", range(10, 20))
    commit_append(table, [f2], timestamp_ms=_TS + 120_000)
    return table, f1, f2


def _pos_delete_file(table: str, name: str, target_path: str, positions) -> dict:
    """A real position-delete parquet (spec: file_path string, pos long) —
    the validation reads its file_path column."""
    path = os.path.join(table, "data", name)
    pq.write_table(
        pa.table({
            "file_path": pa.array([target_path] * len(positions), pa.string()),
            "pos": pa.array([int(p) for p in positions], pa.int64()),
        }),
        path,
    )
    return {
        "file_path": path,
        "record_count": len(positions),
        "file_size_in_bytes": os.path.getsize(path),
    }


# -------------------------------------------- rewrite vs concurrent deletes
def test_rewrite_conflicts_with_concurrent_position_delete(spark):
    """A position delete committed AFTER the rewrite's plan (seq 3 > plan
    seq 2) that references a file being removed must fail the commit."""
    table, f1, _ = _table(spark, "val_rw_posdel")
    plan_seq = int(_md(table)["last-sequence-number"])  # 2
    commit_delete_files(
        table, [_pos_delete_file(table, "pd0.parquet", f1["file_path"], [0, 1])],
        timestamp_ms=_TS + 180_000,
    )
    replacement = _one_file(spark, table, "rw0", range(0, 10))
    with pytest.raises(CommitConflictError, match="position-delete"):
        commit_rewrite_files(table, [f1["file_path"]], [replacement],
                             timestamp_ms=_TS + 240_000,
                             validate_from_seq=plan_seq)
    # the table is untouched: still the delete commit's snapshot
    assert _md(table)["snapshots"][-1]["summary"]["operation"] == "overwrite"


def test_rewrite_ignores_unrelated_position_delete(spark):
    """A new position delete on a DIFFERENT file must not block the
    rewrite — the guard reads the delete file's file_path column."""
    table, f1, f2 = _table(spark, "val_rw_unrelated")
    plan_seq = int(_md(table)["last-sequence-number"])
    commit_delete_files(
        table, [_pos_delete_file(table, "pd0.parquet", f2["file_path"], [0])],
        timestamp_ms=_TS + 180_000,
    )
    replacement = _one_file(spark, table, "rw0", range(0, 10))
    md = commit_rewrite_files(table, [f1["file_path"]], [replacement],
                              timestamp_ms=_TS + 240_000,
                              validate_from_seq=plan_seq)
    assert md["snapshots"][-1]["summary"]["operation"] == "replace"


def test_rewrite_conflicts_with_concurrent_equality_delete(spark):
    """Equality deletes apply by sequence ordering to every older file in
    scope: any one newer than the plan conflicts (conservative, like Java
    without a filter narrowing)."""
    table, f1, _ = _table(spark, "val_rw_eqdel")
    plan_seq = int(_md(table)["last-sequence-number"])
    eq = _pos_delete_file(table, "eq0.parquet", f1["file_path"], [0])
    eq["equality_ids"] = [1]
    commit_delete_files(table, [eq], timestamp_ms=_TS + 180_000)
    replacement = _one_file(spark, table, "rw0", range(0, 10))
    with pytest.raises(CommitConflictError, match="equality-delete"):
        commit_rewrite_files(table, [f1["file_path"]], [replacement],
                             timestamp_ms=_TS + 240_000,
                             validate_from_seq=plan_seq)


def test_rewrite_conflicts_with_concurrent_dv(spark):
    """v3: a deletion vector committed after the plan names its file —
    exact-match conflict when that file is being removed, clean commit
    when it references another file."""
    table, f1, f2 = _table(spark, "val_rw_dv", format_version=3)
    plan_seq = int(_md(table)["last-sequence-number"])
    dv_path = os.path.join(table, "data", "dv-c1.puffin")
    commit_dv_files(
        table, write_dv_file(dv_path, {f1["file_path"]: [0, 3]}, 3, 3),
        timestamp_ms=_TS + 180_000,
    )
    replacement = _one_file(spark, table, "rw0", range(0, 10))
    with pytest.raises(CommitConflictError, match="deletion vector"):
        commit_rewrite_files(table, [f1["file_path"]], [replacement],
                             timestamp_ms=_TS + 240_000,
                             validate_from_seq=plan_seq)
    # removing the OTHER file is fine — the DV names f1, not f2
    replacement2 = _one_file(spark, table, "rw1", range(10, 20))
    md = commit_rewrite_files(table, [f2["file_path"]], [replacement2],
                              timestamp_ms=_TS + 300_000,
                              validate_from_seq=plan_seq)
    assert md["snapshots"][-1]["summary"]["operation"] == "replace"


def test_rewrite_without_validate_seq_keeps_legacy_behavior(spark):
    """Callers that manage their own validation (validate_from_seq=None)
    still commit — the guard is opt-in per plan."""
    table, f1, _ = _table(spark, "val_rw_legacy")
    commit_delete_files(
        table, [_pos_delete_file(table, "pd0.parquet", f1["file_path"], [0])],
        timestamp_ms=_TS + 180_000,
    )
    replacement = _one_file(spark, table, "rw0", range(0, 10))
    md = commit_rewrite_files(table, [f1["file_path"]], [replacement],
                              timestamp_ms=_TS + 240_000)
    assert md["snapshots"][-1]["summary"]["operation"] == "replace"


# ------------------------------------------------- DV referenced-file check
def test_dv_commit_against_removed_file_conflicts(spark):
    """A DV whose referenced data file was concurrently rewritten away
    must raise (the DELETE would be silently lost otherwise)."""
    table, f1, _ = _table(spark, "val_dv_dead", format_version=3)
    entries = write_dv_file(
        os.path.join(table, "data", "dv-dead.puffin"),
        {f1["file_path"]: [0, 1]}, 3, 3,
    )
    # a concurrent compaction removes f1 before the DV commit lands
    replacement = _one_file(spark, table, "rw0", range(0, 10))
    commit_rewrite_files(table, [f1["file_path"]], [replacement],
                         timestamp_ms=_TS + 180_000)
    with pytest.raises(CommitConflictError, match="no longer live"):
        commit_dv_files(table, entries, timestamp_ms=_TS + 240_000)


def test_dv_supersede_reports_net_new_deleted_records(spark):
    """Repeated DELETEs on the same file: the superseding DV's merged
    cardinality must not re-count rows the superseded entry already
    reported. First delete 3 rows, then 5 more (2 on the same file, 3 on
    another): the second snapshot reports 5, not 8."""
    from iceberg_meta_spark.sources.iceberg_write import delete_where

    table, f1, f2 = _table(spark, "val_dv_netnew", format_version=3)
    out1 = delete_where(spark, table, ("id", 3, 5), timestamp_ms=_TS + 180_000)
    assert out1["rows_deleted"] == 3
    md = _md(table)
    assert md["snapshots"][-1]["summary"]["deleted-records"] == "3"
    out2 = delete_where(spark, table, ("id", 8, 12), timestamp_ms=_TS + 240_000)
    assert out2["rows_deleted"] == 5
    md = _md(table)
    # net-new only: f1's DV merged 3 old + 2 new (card 5, superseded card
    # 3), f2's DV is new with 3 — reported 5, never (5 + 3)
    assert md["snapshots"][-1]["summary"]["deleted-records"] == "5"


# ----------------------------------------------------- format-version stamp
def test_v3_commits_stamp_format_version_3(spark):
    """Manifest and manifest-list Avro metadata must carry the table's
    ACTUAL format-version — external engines key parsing off the label."""
    table, _, _ = _table(spark, "val_fv3", format_version=3)
    md = _md(table)
    snap = md["snapshots"][-1]
    with open(snap["manifest-list"], "rb") as fh:
        _, meta, manifests = read_container(fh.read())
    assert meta.get("format-version") in (b"3", "3")
    with open(manifests[-1]["manifest_path"], "rb") as fh:
        _, mmeta, _ = read_container(fh.read())
    assert mmeta.get("format-version") in (b"3", "3")


def test_v2_commits_still_stamp_format_version_2(spark):
    table, _, _ = _table(spark, "val_fv2", format_version=2)
    snap = _md(table)["snapshots"][-1]
    with open(snap["manifest-list"], "rb") as fh:
        _, meta, _ = read_container(fh.read())
    assert meta.get("format-version") in (b"2", "2")


# ------------------------------------------------ sink epoch survives expiry
def test_sink_epoch_survives_snapshot_expiry(spark):
    """The (sink-id, epoch-id) summary markers vanish with expired
    snapshots; the table-property high-water mark must still block a
    checkpoint-lagged replay from double-committing."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        expire_snapshots,
    )
    from iceberg_meta_spark.sources.iceberg_scan import scan_table
    from iceberg_meta_spark.streaming.native_sink import append_epoch

    table = _fresh("val_sink_expiry")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    sid = "sink-a"
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "id long, val long")
    b1 = spark.createDataFrame([(3, 30)], "id long, val long")
    assert append_epoch(b0, 0, table, sid, timestamp_ms=_TS + 60_000)["committed"]
    assert append_epoch(b1, 1, table, sid, timestamp_ms=_TS + 120_000)["committed"]
    # expire everything but the newest snapshot: epoch 0's summary is gone
    out = expire_snapshots(table, keep_last=1, timestamp_ms=_TS + 180_000)
    assert out["expired_snapshot_ids"]
    md = _md(table)
    summaries = [s.get("summary") or {} for s in md["snapshots"]]
    assert not any(s.get("streaming.epoch-id") == "0" for s in summaries)
    assert md["properties"]["streaming.sink.sink-a.max-epoch"] == "1"
    # a lagged replay of epoch 0 must be a no-op, not a double commit
    replay = append_epoch(b0, 0, table, sid, timestamp_ms=_TS + 240_000)
    assert replay["committed"] is False
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == [1, 2, 3]
