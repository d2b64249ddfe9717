"""Sort-order DDL (iceberg_write.py: update_sort_order /
default_sort_columns, api.set_sort_order): metadata publish, write-path
ordering, and SORT-strategy compaction by default on ordered tables.

Reference parity: none to mirror (the reference has no write path);
semantics from spec § Sort Orders and the engine's WRITE ORDERED BY."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from iceberg_meta_spark.sources.iceberg_scan import plan_scan, scan_table
from iceberg_meta_spark.sources.iceberg_write import (
    append_dataframe,
    create_table,
    default_sort_columns,
    update_sort_order,
)

_TS = 1713139200000


def _fresh(name: str) -> str:
    base = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(base, ignore_errors=True)
    return os.path.join(base, "t")


def _md(table):
    with open(os.path.join(table, "metadata", "version-hint.text")) as fh:
        v = int(fh.read())
    return json.load(open(os.path.join(table, "metadata",
                                       f"v{v}.metadata.json")))


def test_ddl_publishes_order_and_validates(spark):
    table = _fresh("so_ddl")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    update_sort_order(table, ["id", ("val", "desc")],
                      timestamp_ms=_TS + 60_000)
    md = _md(table)
    assert md["default-sort-order-id"] == 1
    order = next(o for o in md["sort-orders"] if o["order-id"] == 1)
    assert order["fields"] == [
        {"transform": "identity", "source-id": 1, "direction": "asc",
         "null-order": "nulls-first"},
        {"transform": "identity", "source-id": 2, "direction": "desc",
         "null-order": "nulls-last"},
    ]
    assert default_sort_columns(md) == [("id", "asc"), ("val", "desc")]
    # order 0 (unsorted) stays listed; ids never reused
    assert [o["order-id"] for o in md["sort-orders"]] == [0, 1]
    with pytest.raises(KeyError, match="no column"):
        update_sort_order(table, ["nope"], timestamp_ms=_TS + 120_000)
    with pytest.raises(ValueError, match="direction"):
        update_sort_order(table, [("id", "sideways")],
                          timestamp_ms=_TS + 120_000)


def test_writes_honor_declared_order(spark):
    table = _fresh("so_write")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    update_sort_order(table, ["id"], timestamp_ms=_TS + 60_000)
    rows = [(i, i * 10) for i in (7, 1, 9, 3, 5, 0, 8, 2, 6, 4)]
    append_dataframe(
        spark, spark.createDataFrame(rows, "id long, val long").coalesce(1),
        table, timestamp_ms=_TS + 120_000)
    [f] = plan_scan(spark, table).data_files
    got = [r.id for r in spark.read.parquet(f["path"]).collect()]
    assert got == sorted(got)  # file is internally ordered


def test_compaction_defaults_to_table_sort_order(spark):
    """An ordered table compacts with the SORT strategy even without
    sort_by=: interleaved small files rewrite range-split on the leading
    sort column, so zone maps tighten (same assertion as the explicit
    sort_by test, now driven by the DDL)."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_data_files,
    )

    table = _fresh("so_compact")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    for b in range(3):
        rows = [(i * 3 + b, (i * 3 + b) * 10) for i in range(10)]
        append_dataframe(
            spark, spark.createDataFrame(rows, "id long, val long")
            .coalesce(1), table, timestamp_ms=_TS + 60_000 * (b + 1))
    update_sort_order(table, ["id"], timestamp_ms=_TS + 240_000)
    before = sorted((r.id, r.val) for r in scan_table(spark, table).collect())
    assert plan_scan(spark, table, predicate=("id", 25, 29)).files_pruned == 0
    file_bytes = plan_scan(spark, table).data_files[0]["size"]
    out = rewrite_data_files(spark, table, target_bytes=file_bytes,
                             timestamp_ms=_TS + 300_000)  # no sort_by=
    assert out["added_files"] >= 2
    after = sorted((r.id, r.val) for r in scan_table(spark, table).collect())
    assert after == before
    assert plan_scan(spark, table, predicate=("id", 25, 29)).files_pruned >= 1


def test_entries_record_sort_order_id(spark):
    """ADVICE r9: files written sorted under the table's default order must
    carry its sort-order id in their manifest entries (spec: sort_order_id
    names the order the file satisfies); unsorted writes stay 0."""
    from iceberg_meta_spark.sources.avro_py import read_container

    def entry_order_ids(table):
        md = _md(table)
        snap = md["snapshots"][-1]
        with open(snap["manifest-list"], "rb") as fh:
            _, _, manifests = read_container(fh.read())
        out = []
        for m in manifests:
            # the LAST commit's own manifest only: carried-forward
            # manifests ride verbatim with their original entries
            if m["added_snapshot_id"] != snap["snapshot-id"]:
                continue
            with open(m["manifest_path"], "rb") as fh:
                _, _, entries = read_container(fh.read())
            out += [e["data_file"]["sort_order_id"] for e in entries
                    if e["status"] == 1]
        return out

    table = _fresh("so_entry_id")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    df = spark.createDataFrame([(2, 20), (1, 10)], "id long, val long")
    append_dataframe(spark, df.coalesce(1), table, timestamp_ms=_TS + 60_000)
    assert entry_order_ids(table) == [0]  # unsorted table: order 0
    update_sort_order(table, ["id"], timestamp_ms=_TS + 120_000)
    append_dataframe(spark, df.coalesce(1), table, timestamp_ms=_TS + 180_000)
    assert entry_order_ids(table) == [1]  # sorted write: the default order
