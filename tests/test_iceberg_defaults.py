"""v3 default-value columns (spec § Default values): update_schema(add=
[(name, type, default)]) stores initial-default/write-default on the
field; scans serve the default for rows of files written BEFORE the
column existed (per-file resolution through the adding snapshot's
schema-id) while explicitly-written NULLs in newer files stay NULL.
Write side iceberg_write.py:update_schema, read side
iceberg_scan.py:_merged_rows (broadcast per-file flag join)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from iceberg_meta_spark.sources.iceberg_scan import scan_table
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


def test_initial_default_served_for_pre_column_files(spark):
    table = _fresh("dflt_basic")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")],
                 format_version=3)
    append_dataframe(
        spark, spark.createDataFrame([(1, 10), (2, 20)], "id long, val long")
        .coalesce(1), table, timestamp_ms=_TS + 60_000)
    update_schema(table, add=[("region", "string", "unknown"),
                              ("score", "long", 0)],
                  timestamp_ms=_TS + 90_000)
    append_dataframe(
        spark,
        spark.createDataFrame([(3, 30, "eu", 7), (4, 40, None, None)],
                              "id long, val long, region string, score long")
        .coalesce(1), table, timestamp_ms=_TS + 120_000)
    rows = scan_table(spark, table).orderBy("id").collect()
    # pre-column files serve the default; the post-column explicit NULL
    # stays NULL (the spec's distinction initial-default exists to make)
    assert [(r.id, r.region, r.score) for r in rows] == [
        (1, "unknown", 0), (2, "unknown", 0), (3, "eu", 7), (4, None, None)]


def test_default_survives_predicate_and_time_travel(spark):
    table = _fresh("dflt_tt")
    create_table(table, fields=[(1, "id", "long")], format_version=3)
    append_dataframe(
        spark, spark.createDataFrame([(1,), (2,)], "id long").coalesce(1),
        table, timestamp_ms=_TS + 60_000)
    update_schema(table, add=[("flag", "long", 9)], timestamp_ms=_TS + 90_000)
    rows = scan_table(spark, table, predicate=("id", 2, None)).collect()
    assert [(r.id, r.flag) for r in rows] == [(2, 9)]
    # time travel to the pre-evolution snapshot uses that snapshot's
    # CURRENT metadata schema (our scan always serves the latest schema,
    # like SELECT * after evolution) — the default still applies
    rows = scan_table(spark, table).orderBy("id").collect()
    assert [r.flag for r in rows] == [9, 9]


def test_added_column_without_default_stays_null(spark):
    table = _fresh("dflt_none")
    create_table(table, fields=[(1, "id", "long")], format_version=3)
    append_dataframe(
        spark, spark.createDataFrame([(1,)], "id long").coalesce(1),
        table, timestamp_ms=_TS + 60_000)
    update_schema(table, add=[("extra", "string")], timestamp_ms=_TS + 90_000)
    rows = scan_table(spark, table).collect()
    assert [(r.id, r.extra) for r in rows] == [(1, None)]


def test_v2_table_refuses_column_default(spark):
    table = _fresh("dflt_v2")
    create_table(table, fields=[(1, "id", "long")])
    with pytest.raises(ValueError, match="format-version 3"):
        update_schema(table, add=[("x", "long", 5)])


def test_compaction_materializes_defaults(spark):
    """rewrite_data_files reads through the merge-on-read core, so the
    rewritten files carry the default PHYSICALLY — served values are
    identical pre/post (the compaction contract extends to defaults)."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_data_files,
    )

    table = _fresh("dflt_compact")
    create_table(table, fields=[(1, "id", "long")], format_version=3)
    for bi, ids in enumerate(((1, 2), (3, 4))):
        append_dataframe(
            spark,
            spark.createDataFrame([(i,) for i in ids], "id long").coalesce(1),
            table, timestamp_ms=_TS + 60_000 * (bi + 1))
    update_schema(table, add=[("grade", "string", "B")],
                  timestamp_ms=_TS + 150_000)
    out = rewrite_data_files(spark, table, timestamp_ms=_TS + 240_000)
    assert out["groups"] >= 1
    rows = scan_table(spark, table).orderBy("id").collect()
    assert [(r.id, r.grade) for r in rows] == [
        (1, "B"), (2, "B"), (3, "B"), (4, "B")]
