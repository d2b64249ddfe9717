"""Type promotion (spec § Schema Evolution: int -> long, float ->
double): update_schema(widen=...) changes the type in place (same field
id); the scan reads mixed-width files through an explicit promoted
schema (mergeSchema refuses int32-vs-int64 unions), and zone-map bound
decoding is buffer-width-aware (pre-widen bounds are 4 bytes under an
8-byte declared type). SQL face: ALTER TABLE t ALTER COLUMN c TYPE
long/bigint/double."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table
from iceberg_meta_spark.sources.iceberg_write import (
    append_dataframe,
    create_table,
    update_schema,
)

_TS = 1713139200000


def _fresh(name: str) -> str:
    base = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(base, ignore_errors=True)
    return os.path.join(base, "t")


def _widened(spark, name: str) -> str:
    table = _fresh(name)
    create_table(table, fields=[(1, "id", "long"), (2, "qty", "int"),
                                (3, "ratio", "float")])
    append_dataframe(
        spark,
        spark.createDataFrame([(1, 5, 1.5), (2, 6, 2.5)],
                              "id long, qty int, ratio float").coalesce(1),
        table, timestamp_ms=_TS + 60_000)
    update_schema(table, widen={"qty": "long", "ratio": "double"},
                  timestamp_ms=_TS + 90_000)
    append_dataframe(
        spark,
        spark.createDataFrame([(3, 7_000_000_000, 3.25)],
                              "id long, qty long, ratio double").coalesce(1),
        table, timestamp_ms=_TS + 120_000)
    return table


def test_widened_table_reads_mixed_width_files(spark):
    table = _widened(spark, "widen_read")
    out = scan_table(spark, table).orderBy("id")
    assert out.schema.simpleString() == (
        "struct<id:bigint,qty:bigint,ratio:double>")
    assert [(r.id, r.qty, r.ratio) for r in out.collect()] == [
        (1, 5, 1.5), (2, 6, 2.5), (3, 7_000_000_000, 3.25)]


def test_widened_bounds_prune_and_filter(spark):
    """Pre-widen bounds are 4-byte; the planner must decode them under
    the 8-byte declared type (buffer-width-aware Appendix-D decode) and
    prune correctly."""
    table = _widened(spark, "widen_prune")
    plan = plan_scan(spark, table, predicate=("qty", 100, None))
    assert len(plan.data_files) == 1  # the narrow file pruned by bounds
    rows = scan_table(spark, table, predicate=("qty", 100, None)).collect()
    assert [r.id for r in rows] == [3]
    # the narrow side still serves filtered reads
    rows = scan_table(spark, table, predicate=("qty", None, 5)).collect()
    assert [r.id for r in rows] == [1]


def test_illegal_promotions_refused(spark):
    table = _fresh("widen_illegal")
    create_table(table, fields=[(1, "id", "long"), (2, "name", "string")])
    with pytest.raises(ValueError, match="illegal type promotion"):
        update_schema(table, widen={"id": "int"})  # narrowing
    with pytest.raises(ValueError, match="illegal type promotion"):
        update_schema(table, widen={"name": "long"})  # cross-kind
    with pytest.raises(KeyError, match="no column"):
        update_schema(table, widen={"nope": "long"})


def test_widen_composes_with_rename_and_defaults(spark):
    """All three per-file resolutions together: widen + rename + a v3
    defaulted column over the same schema history."""
    table = _fresh("widen_compose")
    create_table(table, fields=[(1, "id", "long"), (2, "qty", "int")],
                 format_version=3)
    append_dataframe(
        spark, spark.createDataFrame([(1, 5)], "id long, qty int")
        .coalesce(1), table, timestamp_ms=_TS + 60_000)
    update_schema(table, widen={"qty": "long"}, rename={"qty": "amount"},
                  add=[("grade", "string", "B")], timestamp_ms=_TS + 90_000)
    append_dataframe(
        spark,
        spark.createDataFrame([(2, 9_000_000_000, "A")],
                              "id long, amount long, grade string")
        .coalesce(1), table, timestamp_ms=_TS + 120_000)
    rows = scan_table(spark, table).orderBy("id").collect()
    assert [(r.id, r.amount, r.grade) for r in rows] == [
        (1, 5, "B"), (2, 9_000_000_000, "A")]


def test_sql_alter_column_type(spark):
    from iceberg_meta_spark import api

    table = _fresh("widen_sql")
    create_table(table, fields=[(1, "id", "long"), (2, "qty", "int")])
    api.register_table(spark, table, "sqlw")
    api.sql(spark, "INSERT INTO sqlw VALUES (1, 5)")
    out = api.sql(
        spark, "ALTER TABLE sqlw ALTER COLUMN qty TYPE bigint").collect()[0]
    assert out.operation == "widen_column" and out.type == "long"
    api.sql(spark, "INSERT INTO sqlw VALUES (2, 8000000000)")
    got = spark.sql("SELECT id, qty FROM sqlw ORDER BY id").collect()
    assert [(r.id, r.qty) for r in got] == [(1, 5), (2, 8_000_000_000)]


def test_name_reuse_across_fields_falls_back_loudly(spark):
    """r12 (advisor r11 #3): a NAME ever claimed by two different fields
    (rename away, then re-add under the old name) makes the widened
    table's explicit read schema ambiguous — an old file's column could
    be declared at the wrong field's type. The plan detects the
    collision, drops the explicit schema, and the mergeSchema path
    refuses the int32-vs-int64 union LOUDLY instead of decoding
    garbage."""
    table = _widened(spark, "widen_name_reuse")
    # rename qty away, then RE-ADD a new (string) column under the old
    # name: 'qty' now maps to two different field ids across history
    update_schema(table, rename={"qty": "quantity"},
                  timestamp_ms=_TS + 150_000)
    update_schema(table, add=[("qty", "string")],
                  timestamp_ms=_TS + 180_000)
    append_dataframe(
        spark,
        spark.createDataFrame(
            [(4, 8, 4.5, "eight")],
            "id long, quantity long, ratio double, qty string").coalesce(1),
        table, timestamp_ms=_TS + 210_000)

    plan = plan_scan(spark, table)
    assert plan.read_schema is None  # ambiguity detected -> no explicit schema
    # ... and the mixed-width read fails LOUDLY (mergeSchema refuses the
    # int32/int64 union) instead of silently mis-typing the old column
    with pytest.raises(Exception, match="merge|Merge|FAILED_READ"):
        scan_table(spark, table).collect()
