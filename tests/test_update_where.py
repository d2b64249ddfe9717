"""UPDATE ... SET ... WHERE (iceberg_write.py:update_where + the api.sql
UPDATE verb): matched rows rewritten with SQL expressions, old versions
hidden, ONE atomic snapshot — position deletes + data on v2 tables,
deletion vectors + data on v3 (commit_dv_files(add_data_files=...))."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from iceberg_meta_spark.sources.iceberg_scan import scan_table
from iceberg_meta_spark.sources.iceberg_write import (
    _latest_version,
    append_dataframe,
    create_table,
    update_where,
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


def _table(spark, name: str, format_version: int = 2) -> str:
    table = _fresh(name)
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long"),
                                (3, "tag", "string")],
                 format_version=format_version)
    for bi, ids in enumerate((range(0, 5), range(5, 10))):
        append_dataframe(
            spark,
            spark.createDataFrame([(i, i * 10, "a") for i in ids],
                                  "id long, val long, tag string").coalesce(1),
            table, timestamp_ms=_TS + 60_000 * (bi + 1))
    return table


@pytest.mark.parametrize("fv", [2, 3])
def test_update_where_rewrites_matched_rows(spark, fv):
    table = _table(spark, f"upd_v{fv}", format_version=fv)
    n_before = len(_md(table)["snapshots"])
    out = update_where(spark, table,
                       {"val": "val + 1000", "tag": "'hot'"},
                       ("id", 3, 6), timestamp_ms=_TS + 180_000)
    assert out["rows_updated"] == 4
    md = _md(table)
    assert len(md["snapshots"]) == n_before + 1  # ONE atomic snapshot
    assert md["snapshots"][-1]["summary"]["operation"] == "overwrite"
    rows = scan_table(spark, table).orderBy("id").collect()
    assert [(r.id, r.val, r.tag) for r in rows] == [
        (i, i * 10 + (1000 if 3 <= i <= 6 else 0),
         "hot" if 3 <= i <= 6 else "a")
        for i in range(10)
    ]
    # time travel still sees the pre-update values
    before = scan_table(
        spark, table, snapshot_id=md["snapshots"][-2]["snapshot-id"]
    ).orderBy("id").collect()
    assert [r.val for r in before] == [i * 10 for i in range(10)]


def test_update_where_no_match_is_noop(spark):
    table = _table(spark, "upd_noop")
    n_versions = _latest_version(os.path.join(table, "metadata"))
    out = update_where(spark, table, {"val": "0"}, ("id", 100, 200),
                       timestamp_ms=_TS + 180_000)
    assert out == {"rows_updated": 0, "snapshot_id": None}
    assert _latest_version(os.path.join(table, "metadata")) == n_versions


def test_update_where_strict_bounds_and_conjunction(spark):
    table = _table(spark, "upd_strict")
    out = update_where(
        spark, table, {"val": "-1"},
        [("id", 3, None, True, False), ("id", None, 7, False, True)],
        timestamp_ms=_TS + 180_000)  # 3 < id < 7
    assert out["rows_updated"] == 3
    rows = scan_table(spark, table).orderBy("id").collect()
    assert [r.id for r in rows if r.val == -1] == [4, 5, 6]


def test_update_where_unknown_column_raises(spark):
    table = _table(spark, "upd_unknown")
    with pytest.raises(KeyError, match="SET columns"):
        update_where(spark, table, {"nope": "1"}, ("id", 0, 1))


def test_v3_update_then_delete_composes(spark):
    """After an UPDATE, a DELETE on the updated values works — the new
    data files are live, the old versions stay hidden by their DVs."""
    from iceberg_meta_spark.sources.iceberg_write import delete_where

    table = _table(spark, "upd_compose", format_version=3)
    update_where(spark, table, {"val": "val + 1000"}, ("id", 0, 4),
                 timestamp_ms=_TS + 180_000)
    out = delete_where(spark, table, ("val", 1000, 1020),
                       timestamp_ms=_TS + 240_000)
    assert out["rows_deleted"] == 3  # vals 1000, 1010, 1020
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == [3, 4, 5, 6, 7, 8, 9]


def test_sql_update_round_trip(spark):
    from iceberg_meta_spark import api

    table = _table(spark, "upd_sql")
    api.register_table(spark, table, "squ")
    out = api.sql(
        spark, "UPDATE squ SET val = val * 2, tag = 'even' "
               "WHERE id >= 2 AND id < 5").collect()[0]
    assert out.operation == "update" and out.rows_updated == "3"
    got = spark.sql("SELECT id, val, tag FROM squ ORDER BY id").collect()
    assert [(r.id, r.val, r.tag) for r in got] == [
        (i, i * 10 * (2 if 2 <= i < 5 else 1),
         "even" if 2 <= i < 5 else "a")
        for i in range(10)
    ]
