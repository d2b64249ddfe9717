"""Property-driven retention (iceberg_maintenance.py: expire_by_policy /
expire_metadata_versions): max-snapshot-age + min-snapshots-to-keep,
per-ref and table-wide max-ref-age, and metadata-file cleanup gated by
write.metadata properties.

Reference parity: the reference only REPORTS stale tables; retention
semantics come from the engine's expire_snapshots defaults (5-day
max age, keep 1) and table-properties docs."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from iceberg_meta_spark.sources.iceberg_maintenance import (
    expire_by_policy,
    expire_metadata_versions,
)
from iceberg_meta_spark.sources.iceberg_scan import scan_table
from iceberg_meta_spark.sources.iceberg_write import (
    append_dataframe,
    create_table,
    manage_ref,
    set_properties,
)

_TS = 1713139200000
_DAY = 24 * 3600 * 1000


def _fresh(name: str) -> str:
    base = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(base, ignore_errors=True)
    return os.path.join(base, "t")


def _append(spark, table, ids, ts):
    append_dataframe(
        spark,
        spark.createDataFrame([(i, i) for i in ids], "id long, val long")
        .coalesce(1),
        table, timestamp_ms=ts,
    )


def _md(table):
    with open(os.path.join(table, "metadata", "version-hint.text")) as fh:
        v = int(fh.read())
    return json.load(open(os.path.join(table, "metadata",
                                       f"v{v}.metadata.json")))


def test_policy_expiry_age_and_min_keep(spark):
    table = _fresh("ret_policy")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    for b in range(4):  # snapshots at day 0, 1, 2, 3
        _append(spark, table, range(b * 2, b * 2 + 2), _TS + b * _DAY)
    set_properties(table,
                   {"history.expire.max-snapshot-age-ms": str(2 * _DAY),
                    "history.expire.min-snapshots-to-keep": "2"},
                   timestamp_ms=_TS + 4 * _DAY)
    res = expire_by_policy(table, now_ms=_TS + 4 * _DAY,
                           timestamp_ms=_TS + 4 * _DAY + 1)
    # day-0 and day-1 snapshots are older than 2 days; day-2/day-3 kept
    # (min-keep 2 == the survivors, so age drives here)
    assert res["expired_snapshot_ids"] == [1, 2]
    assert res["policy"]["max-snapshot-age-ms"] == 2 * _DAY
    # served rows unchanged (expiry drops history, not current data)
    assert scan_table(spark, table).count() == 8


def test_policy_min_keep_overrides_age(spark):
    table = _fresh("ret_minkeep")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    for b in range(3):
        _append(spark, table, range(b * 2, b * 2 + 2), _TS + b * _DAY)
    set_properties(table,
                   {"history.expire.max-snapshot-age-ms": "1",
                    "history.expire.min-snapshots-to-keep": "3"},
                   timestamp_ms=_TS + 10 * _DAY)
    res = expire_by_policy(table, now_ms=_TS + 10 * _DAY,
                           timestamp_ms=_TS + 10 * _DAY + 1)
    assert res["expired_snapshot_ids"] == []  # min-keep retains all 3


def test_ref_age_drops_stale_refs_but_never_main(spark):
    table = _fresh("ret_refs")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    _append(spark, table, range(0, 2), _TS)                 # snap 1 (old)
    manage_ref(table, "old-tag", snapshot_id=1, ref_type="tag",
               timestamp_ms=_TS + 1)
    _append(spark, table, range(2, 4), _TS + 9 * _DAY)      # snap 2 (new)
    set_properties(table,
                   {"history.expire.max-ref-age-ms": str(2 * _DAY),
                    "history.expire.max-snapshot-age-ms": str(2 * _DAY)},
                   timestamp_ms=_TS + 10 * _DAY)
    res = expire_by_policy(table, now_ms=_TS + 10 * _DAY,
                           timestamp_ms=_TS + 10 * _DAY + 1)
    # the stale tag dropped FIRST, releasing its pin -> snap 1 expires
    assert res["dropped_refs"] == ["old-tag"]
    assert res["expired_snapshot_ids"] == [1]
    assert "main" not in res["dropped_refs"]
    md = _md(table)
    assert "old-tag" not in (md.get("refs") or {})


def test_metadata_cleanup_honors_properties(spark):
    table = _fresh("ret_meta")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    for b in range(5):  # v2..v6
        _append(spark, table, range(b * 2, b * 2 + 2), _TS + b * 60_000)
    # disabled: no-op
    res = expire_metadata_versions(table, timestamp_ms=_TS + 400_000)
    assert res["deleted"] == []
    set_properties(table,
                   {"write.metadata.delete-after-commit.enabled": "true",
                    "write.metadata.previous-versions-max": "2"},
                   timestamp_ms=_TS + 500_000)
    res2 = expire_metadata_versions(table, timestamp_ms=_TS + 600_000)
    assert len(res2["deleted"]) >= 4  # v1..v4 gone, newest 2 log entries kept
    for p in res2["deleted"]:
        assert not os.path.exists(p)
    # the table stays fully readable; the trimmed log is published
    assert scan_table(spark, table).count() == 10
    assert len(_md(table)["metadata-log"]) <= 3  # 2 kept + the new publish
    # re-run: nothing further beyond the window... (new publish added one)
    res3 = expire_metadata_versions(table, timestamp_ms=_TS + 700_000)
    assert len(res3["deleted"]) <= 2


def test_metadata_cleanup_force_keep_zero_deletes_all_previous(spark):
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        expire_metadata_versions,
    )

    table = _fresh("ret_keep0")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    for b in range(3):
        _append(spark, table, range(b, b + 1), _TS + b * 60_000)
    res = expire_metadata_versions(table, timestamp_ms=_TS + 400_000,
                                   force_keep=0)
    assert len(res["deleted"]) == 3  # v1..v3 all gone (v4 was current)
    assert scan_table(spark, table).count() == 3  # table fully readable


def test_schema_resolution_survives_expiry(spark):
    """r12 (advisor r11 #2): the scan resolves each file's WRITE-TIME
    schema (renames, v3 default-absence) via its adding snapshot; expiry
    drops that snapshot, so apply_snapshot_removal preserves the
    (sequence -> schema-id) edge in the schema-seq-log property and
    plan_scan consults it — pre-rename files keep serving their values
    under the new name, and defaulted columns keep serving the default,
    AFTER the adding snapshots are expired."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        expire_snapshots,
    )
    from iceberg_meta_spark.sources.iceberg_scan import SCHEMA_SEQ_LOG_PROP
    from iceberg_meta_spark.sources.iceberg_write import update_schema

    table = _fresh("ret_schema_log")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")],
                 format_version=3)
    _append(spark, table, [1, 2], _TS + 1 * _DAY)
    # rename + v3 default AFTER the first batch: batch-1 files store the
    # OLD column name and predate the defaulted column
    update_schema(table, rename={"val": "amount"},
                  add=[("region", "string", "emea")])
    spark_df = spark.createDataFrame([(3, 3, "apac")],
                                     "id long, amount long, region string")
    append_dataframe(spark, spark_df.coalesce(1), table,
                     timestamp_ms=_TS + 2 * _DAY)

    # sanity before expiry
    rows = {r.id: (r.amount, r.region)
            for r in scan_table(spark, table).collect()}
    assert rows == {1: (1, "emea"), 2: (2, "emea"), 3: (3, "apac")}

    # expire the ADDING snapshot of batch 1
    res = expire_snapshots(table, keep_last=1, timestamp_ms=_TS + 3 * _DAY)
    assert res["expired_snapshot_ids"] == [1]
    md = _md(table)
    log = json.loads(md["properties"][SCHEMA_SEQ_LOG_PROP])
    assert log == {"1": 0}  # seq 1 wrote under schema 0

    # the resolution still holds: old file serves values under the NEW
    # name and the defaulted column — not NULL
    rows = {r.id: (r.amount, r.region)
            for r in scan_table(spark, table).collect()}
    assert rows == {1: (1, "emea"), 2: (2, "emea"), 3: (3, "apac")}
