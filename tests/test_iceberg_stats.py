"""Puffin statistics + ANALYZE TABLE (sources/iceberg_puffin.py,
sources/iceberg_stats.py): binary round trip with pinned magic layout,
merge-on-read-correct NDV, approx/exact twins, per-snapshot entry
replacement, and the metadata 'statistics' publish.

Reference parity: none to mirror — the reference has no statistics
surface (pyiceberg delegates planning to the engine); format semantics
come from the public Puffin spec and spec § Table Statistics."""

from __future__ import annotations

import os
import shutil
import struct
import tempfile

import pytest

from iceberg_meta_spark.sources.iceberg_puffin import (
    MAGIC,
    read_puffin,
    write_puffin,
)
from iceberg_meta_spark.sources.iceberg_stats import (
    analyze_table,
    statistics_frame,
)
from iceberg_meta_spark.sources.iceberg_write import (
    append_dataframe,
    create_table,
    delete_where,
)

_TS = 1713139200000


def _fresh(name: str) -> str:
    base = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(base, ignore_errors=True)
    return os.path.join(base, "t")


# ------------------------------------------------------------- puffin file
def test_puffin_round_trip(tmp_path):
    path = str(tmp_path / "s.puffin")
    info = write_puffin(path, [
        {"type": "ndv-long-v1", "fields": [1], "snapshot_id": 7,
         "sequence_number": 3, "payload": struct.pack("<q", 42),
         "properties": {"ndv": "42"}},
        {"type": "custom-blob", "fields": [2, 3], "snapshot_id": 7,
         "sequence_number": 3, "payload": b"\x01\x02\x03"},
    ], file_properties={"created-by": "iceberg_meta_spark"})
    raw = open(path, "rb").read()
    # pinned layout: magic at start, bracketing the footer, 4-byte LE
    # payload size at -12, zero flags at -8
    assert raw[:4] == MAGIC and raw[-4:] == MAGIC
    assert raw[-8:-4] == b"\x00\x00\x00\x00"
    assert info["file_size_in_bytes"] == len(raw)
    got = read_puffin(path)
    assert got["properties"] == {"created-by": "iceberg_meta_spark"}
    b1, b2 = got["blobs"]
    assert b1["type"] == "ndv-long-v1" and b1["fields"] == [1]
    assert struct.unpack("<q", b1["payload"])[0] == 42
    assert b1["properties"]["ndv"] == "42"
    assert b2["payload"] == b"\x01\x02\x03" and b2["fields"] == [2, 3]
    # first blob starts right after the head magic
    assert b1["offset"] == 4 and b1["length"] == 8


def test_puffin_rejects_bad_magic(tmp_path):
    p = str(tmp_path / "bad.puffin")
    with open(p, "wb") as fh:
        fh.write(b"NOPE" + b"x" * 40)
    with pytest.raises(ValueError, match="bad magic"):
        read_puffin(p)


def test_puffin_rejects_compressed_footer(tmp_path):
    p = str(tmp_path / "c.puffin")
    write_puffin(p, [])
    raw = bytearray(open(p, "rb").read())
    raw[-8] |= 1  # set the lz4 flag bit
    with open(p, "wb") as fh:
        fh.write(bytes(raw))
    with pytest.raises(ValueError, match="compressed"):
        read_puffin(p)


# ------------------------------------------------------------- ANALYZE
def test_analyze_is_merge_on_read_correct(spark):
    table = _fresh("stats_mor")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long"),
                                (3, "val", "long")])
    rows = [(("a", "b", "c")[i % 3], i, i * 100) for i in range(1, 10)]
    append_dataframe(
        spark, spark.createDataFrame(rows, "region string, id long, val long")
        .coalesce(1), table, timestamp_ms=_TS + 60_000)
    delete_where(spark, table, ("id", 4, 5), timestamp_ms=_TS + 120_000)
    res = analyze_table(spark, table, exact=True, timestamp_ms=_TS + 180_000)
    # deletes APPLIED: 7 served ids, not 9
    assert res["ndv"] == {"region": 3, "id": 7, "val": 7}
    got = {r.column_name: (r.ndv, r.snapshot_id)
           for r in statistics_frame(spark, table).collect()}
    assert got == {"region": (3, 2), "id": (7, 2), "val": (7, 2)}


def test_reanalyze_replaces_snapshot_entry(spark):
    import json

    table = _fresh("stats_replace")
    create_table(table, fields=[(1, "id", "long")])
    append_dataframe(
        spark, spark.createDataFrame([(i,) for i in range(5)], "id long")
        .coalesce(1), table, timestamp_ms=_TS + 60_000)
    analyze_table(spark, table, exact=True, timestamp_ms=_TS + 120_000)
    analyze_table(spark, table, exact=True, timestamp_ms=_TS + 180_000)
    with open(os.path.join(table, "metadata", "version-hint.text")) as fh:
        v = int(fh.read())
    md = json.load(open(os.path.join(table, "metadata",
                                     f"v{v}.metadata.json")))
    assert len(md["statistics"]) == 1  # one entry per snapshot, replaced
    assert statistics_frame(spark, table).count() == 1


def test_stats_per_snapshot_history(spark):
    table = _fresh("stats_history")
    create_table(table, fields=[(1, "id", "long")])
    append_dataframe(
        spark, spark.createDataFrame([(i,) for i in range(3)], "id long")
        .coalesce(1), table, timestamp_ms=_TS + 60_000)
    analyze_table(spark, table, exact=True, timestamp_ms=_TS + 120_000)
    append_dataframe(
        spark, spark.createDataFrame([(i,) for i in range(3, 10)], "id long")
        .coalesce(1), table, timestamp_ms=_TS + 180_000)
    analyze_table(spark, table, exact=True, timestamp_ms=_TS + 240_000)
    # current snapshot's stats
    assert statistics_frame(spark, table).collect()[0].ndv == 10
    # time-travel read of snapshot 1's stats
    assert statistics_frame(spark, table, snapshot_id=1).collect()[0].ndv == 3


def test_analyze_approx_within_tolerance(spark):
    table = _fresh("stats_approx")
    create_table(table, fields=[(1, "id", "long")])
    append_dataframe(
        spark, spark.createDataFrame([(i,) for i in range(2000)], "id long")
        .coalesce(1), table, timestamp_ms=_TS + 60_000)
    res = analyze_table(spark, table, timestamp_ms=_TS + 120_000)  # approx
    assert abs(res["ndv"]["id"] - 2000) / 2000 < 0.1  # HLL++ default rsd 5%


def test_analyze_validates_inputs(spark):
    table = _fresh("stats_invalid")
    create_table(table, fields=[(1, "id", "long")])
    with pytest.raises(ValueError, match="no snapshots"):
        analyze_table(spark, table, timestamp_ms=_TS + 60_000)
    append_dataframe(
        spark, spark.createDataFrame([(1,)], "id long").coalesce(1),
        table, timestamp_ms=_TS + 60_000)
    with pytest.raises(KeyError, match="no such columns"):
        analyze_table(spark, table, columns=["nope"],
                      timestamp_ms=_TS + 120_000)


def test_partition_statistics_round_trip(spark):
    import json as _json

    from iceberg_meta_spark.sources.iceberg_stats import (
        partition_statistics_frame,
        write_partition_statistics,
    )

    table = _fresh("pstats_rt")
    create_table(table, fields=[(1, "region", "string"), (2, "id", "long")],
                 partition_fields=[("region", 1, 1000)])
    rows = [(("a", "b")[i % 2], i) for i in range(6)]
    append_dataframe(
        spark, spark.createDataFrame(rows, "region string, id long")
        .coalesce(1), table, timestamp_ms=_TS + 60_000)
    res = write_partition_statistics(spark, table, timestamp_ms=_TS + 120_000)
    assert res["partitions"] == 2
    got = {r.partition: (r.data_record_count, r.data_file_count)
           for r in partition_statistics_frame(spark, table).collect()}
    assert got == {'{"region": "a"}': (3, 1), '{"region": "b"}': (3, 1)}
    # re-run replaces the snapshot's entry instead of stacking
    write_partition_statistics(spark, table, timestamp_ms=_TS + 180_000)
    with open(os.path.join(table, "metadata", "version-hint.text")) as fh:
        v = int(fh.read())
    md = _json.load(open(os.path.join(table, "metadata",
                                      f"v{v}.metadata.json")))
    assert len(md["partition-statistics"]) == 1


def test_partition_statistics_validations(spark):
    import pytest as _pytest

    from iceberg_meta_spark.sources.iceberg_stats import (
        partition_statistics_frame,
        write_partition_statistics,
    )

    table = _fresh("pstats_bad")
    create_table(table, fields=[(1, "id", "long")])
    with _pytest.raises(ValueError, match="no snapshots"):
        write_partition_statistics(spark, table, timestamp_ms=_TS + 60_000)
    append_dataframe(
        spark, spark.createDataFrame([(1,)], "id long").coalesce(1),
        table, timestamp_ms=_TS + 60_000)
    with _pytest.raises(KeyError, match="no partition statistics"):
        partition_statistics_frame(spark, table)
