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


def test_predicate_plan_extraction_unit():
    """r12 WHERE dialect: interval conjunctions take the fast path;
    arbitrary expressions keep extractable conjuncts for FILE pruning and
    run the whole expression as the residual; a top-level OR extracts
    nothing (no conjunct is implied by the disjunction)."""
    from iceberg_meta_spark.sources.iceberg_write import _predicate_plan

    preds, residual = _predicate_plan("id BETWEEN 3 AND 5 AND tag = 'a'")
    assert residual is None
    assert preds == [("id", 3, 5, False, False), ("tag", "a", "a", False, False)]

    preds, residual = _predicate_plan("id IN (1, 2) AND val > 5")
    assert residual == "id IN (1, 2) AND val > 5"
    assert preds == [("val", 5, None, True, False)]  # pruning still applies

    preds, residual = _predicate_plan("id = 1 OR tag = 'x AND y'")
    assert residual and preds == []  # OR: nothing implied, prune nothing

    preds, residual = _predicate_plan("id >= 3 AND (val = 1 OR val = 2)")
    assert preds == [("id", 3, None, False, False)]
    assert residual == "id >= 3 AND (val = 1 OR val = 2)"


@pytest.mark.parametrize("fv", [2, 3])
def test_delete_where_arbitrary_expression(spark, fv):
    """DELETE with OR / IN / != / cross-column predicates — file pruning
    degrades conservatively, the residual row filter decides, and the
    commit shape (pos-deletes on v2, DVs on v3) is unchanged."""
    from iceberg_meta_spark.sources.iceberg_write import delete_where

    table = _table(spark, f"del_expr_v{fv}", format_version=fv)
    out = delete_where(spark, table, "id < 2 OR id >= 8",
                       timestamp_ms=_TS + 300_000)
    assert out["rows_deleted"] == 4
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == [2, 3, 4, 5, 6, 7]

    out = delete_where(spark, table, "id IN (3, 5) AND tag != 'z'",
                       timestamp_ms=_TS + 360_000)
    assert out["rows_deleted"] == 2
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == [2, 4, 6, 7]

    # cross-column predicate
    out = delete_where(spark, table, "val = id * 10 AND id % 2 = 0",
                       timestamp_ms=_TS + 420_000)
    assert out["rows_deleted"] == 3
    got = sorted(r.id for r in scan_table(spark, table).collect())
    assert got == [7]


def test_update_where_in_list_and_sql_face(spark):
    """UPDATE ... WHERE col IN (...) both programmatically and through
    api.sql — the r11 guided error is retired; the arbitrary expression
    reaches the engine as the residual filter."""
    from iceberg_meta_spark import api

    table = _table(spark, "upd_expr_sql")
    out = update_where(spark, table, {"val": "val + 1000"},
                       "id IN (1, 8)", timestamp_ms=_TS + 300_000)
    assert out["rows_updated"] == 2

    api.register_table(spark, table, "upd_expr")
    res = api.sql(
        spark,
        "UPDATE upd_expr SET tag = 'hot' WHERE val >= 1000 OR id = 0",
    ).collect()[0]
    assert res.rows_updated == "3"
    rows = {r.id: (r.val, r.tag)
            for r in spark.sql("SELECT * FROM upd_expr").collect()}
    assert rows[1] == (1010, "hot") and rows[8] == (1080, "hot")
    assert rows[0] == (0, "hot") and rows[2] == (20, "a")

    res = api.sql(spark,
                  "DELETE FROM upd_expr WHERE tag = 'hot'").collect()[0]
    assert res.rows_deleted == "3"
    assert spark.sql("SELECT count(*) AS n FROM upd_expr").collect()[0].n == 7
