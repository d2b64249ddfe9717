"""v3 row lineage (spec § Row Lineage): commits assign ``first_row_id``
(manifest field 142) to added data files starting at the table's
``next-row-id``; snapshots record their ``first-row-id``; the scan derives
``_row_id`` (file first_row_id + position) and
``_last_updated_sequence_number`` on demand. Write side in
iceberg_write.py (_added_data_entries / build_append_snapshot), read side
in iceberg_scan.py (scan_table(lineage=True)). The reference has no v3
story; semantics come exclusively from the public spec."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from iceberg_meta_spark.sources.iceberg_scan import scan_table
from iceberg_meta_spark.sources.iceberg_write import (
    _latest_version,
    append_dataframe,
    create_table,
    delete_where,
    merge_into,
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


def _v3(spark, name: str) -> str:
    table = _fresh(name)
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")],
                 format_version=3)
    for bi, ids in enumerate((range(0, 5), range(5, 10))):
        append_dataframe(
            spark,
            spark.createDataFrame([(i, i * 10) for i in ids],
                                  "id long, val long").coalesce(1),
            table, timestamp_ms=_TS + 60_000 * (bi + 1),
        )
    return table


def test_row_ids_assigned_and_monotonic(spark):
    table = _v3(spark, "lin_basic")
    md = _md(table)
    assert md["next-row-id"] == 10
    assert [s.get("first-row-id") for s in md["snapshots"]] == [0, 5]
    rows = scan_table(spark, table, lineage=True).orderBy("id").collect()
    assert [(r.id, r._row_id) for r in rows] == [(i, i) for i in range(10)]
    # _last_updated_sequence_number = the carrying file's data sequence
    assert [r._last_updated_sequence_number for r in rows] == [1] * 5 + [2] * 5


def test_row_ids_stable_under_dv_delete(spark):
    """MoR deletes remove rows; survivors keep their _row_id (positions in
    the surviving file are unchanged) — the property lineage exists for."""
    table = _v3(spark, "lin_dv")
    delete_where(spark, table, ("id", 2, 6), timestamp_ms=_TS + 180_000)
    rows = scan_table(spark, table, lineage=True).orderBy("id").collect()
    assert [(r.id, r._row_id) for r in rows] == [
        (i, i) for i in range(10) if not 2 <= i <= 6]
    # the DV snapshot added no data rows: next-row-id unchanged
    assert _md(table)["next-row-id"] == 10


def test_merge_assigns_fresh_row_ids(spark):
    """A MERGE's inserted rows get new row ids past the high-water mark;
    replaced keys' rows are NEW rows (the old version is hidden by the
    equality delete) and carry new ids + the merge's sequence number."""
    table = _v3(spark, "lin_merge")
    merge_into(
        spark,
        spark.createDataFrame([(3, 999), (42, 420)], "id long, val long")
        .coalesce(1),
        table, ["id"], timestamp_ms=_TS + 180_000,
    )
    md = _md(table)
    assert md["next-row-id"] == 12
    assert md["snapshots"][-1]["first-row-id"] == 10
    rows = {r.id: (r._row_id, r._last_updated_sequence_number)
            for r in scan_table(spark, table, lineage=True).collect()}
    assert rows[3] == (10, 3) or rows[3] == (11, 3)   # new version, new id
    assert rows[42][0] in (10, 11) and rows[42][1] == 3
    assert rows[0] == (0, 1)                          # untouched row stable


def test_v2_table_reads_null_lineage(spark):
    """Files without lineage (v2 manifests) surface NULL _row_id — the
    spec's inheritance default, never a fabricated id."""
    table = _fresh("lin_v2")
    create_table(table, fields=[(1, "id", "long"), (2, "val", "long")])
    append_dataframe(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "id long, val long")
        .coalesce(1),
        table, timestamp_ms=_TS + 60_000,
    )
    rows = scan_table(spark, table, lineage=True).orderBy("id").collect()
    assert [r._row_id for r in rows] == [None, None]
    assert [r._last_updated_sequence_number for r in rows] == [1, 1]
    assert "next-row-id" not in _md(table)


def test_compaction_reassigns_row_ids_fresh(spark):
    """rewrite_data_files on v3: replacement files get FRESH ids (the
    spec default when the writer does not materialize _row_id columns) —
    pinned so the behavior is a stated contract, not an accident."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_data_files,
    )

    table = _v3(spark, "lin_compact")
    out = rewrite_data_files(spark, table, timestamp_ms=_TS + 240_000)
    assert out["groups"] >= 1
    md = _md(table)
    assert md["snapshots"][-1]["first-row-id"] == 10
    assert md["next-row-id"] == 20
    rows = scan_table(spark, table, lineage=True).orderBy("id").collect()
    assert sorted(r._row_id for r in rows) == list(range(10, 20))
    # row VALUES identical pre/post (the compaction contract)
    assert [(r.id, r.val) for r in rows] == [(i, i * 10) for i in range(10)]
