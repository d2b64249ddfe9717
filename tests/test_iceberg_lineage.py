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


def test_compaction_preserves_row_ids(spark):
    """r12 (advisor r11 #1): rewrite_data_files on v3 MATERIALIZES
    _row_id and _last_updated_sequence_number into the replacement
    parquet, so row identity and last-update provenance SURVIVE
    compaction (spec § Row Lineage: a writer moving existing rows must
    preserve their lineage; readers prefer materialized values over
    first-row-id derivation)."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_data_files,
    )

    table = _v3(spark, "lin_compact")
    out = rewrite_data_files(spark, table, timestamp_ms=_TS + 240_000)
    assert out["groups"] >= 1
    md = _md(table)
    # the manifest still assigns fresh first-row-id to the new file (the
    # inheritance base for any NULL materialized ids); the MATERIALIZED
    # column wins for the carried rows
    assert md["snapshots"][-1]["first-row-id"] == 10
    rows = scan_table(spark, table, lineage=True).orderBy("id").collect()
    assert [(r.id, r._row_id) for r in rows] == [(i, i) for i in range(10)]
    # last-updated provenance also carries: the rows were WRITTEN at
    # seqs 1 and 2, and compaction did not modify them
    assert [r._last_updated_sequence_number for r in rows] == [1] * 5 + [2] * 5
    # row VALUES identical pre/post (the compaction contract)
    assert [(r.id, r.val) for r in rows] == [(i, i * 10) for i in range(10)]


def test_update_preserves_row_ids_and_stamps_new_seq(spark):
    """r12: UPDATE ... WHERE on v3 rewrites matched rows with their
    _row_id MATERIALIZED (identity survives the update) while
    _last_updated_sequence_number derives from the NEW file's sequence —
    exactly the spec's semantics for a modified row."""
    from iceberg_meta_spark.sources.iceberg_write import update_where

    table = _v3(spark, "lin_update")
    out = update_where(spark, table, {"val": "val + 1"}, ("id", 3, 6),
                       timestamp_ms=_TS + 240_000)
    assert out["rows_updated"] == 4
    rows = {r.id: (r._row_id, r._last_updated_sequence_number, r.val)
            for r in scan_table(spark, table, lineage=True).collect()}
    # updated rows keep their identity, carry the update's seq (3)
    for i in (3, 4, 5, 6):
        assert rows[i] == (i, 3, i * 10 + 1)
    # untouched rows keep identity AND their original write seq
    assert rows[0] == (0, 1, 0) and rows[9] == (9, 2, 90)

    # a compaction AFTER the update still preserves everything
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_data_files,
    )

    rewrite_data_files(spark, table, timestamp_ms=_TS + 300_000)
    rows2 = {r.id: (r._row_id, r._last_updated_sequence_number, r.val)
             for r in scan_table(spark, table, lineage=True).collect()}
    assert rows2 == rows
