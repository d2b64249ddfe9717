"""ANALYZE TABLE for native Iceberg tables: compute per-column NDV over
the CURRENT snapshot (merge-on-read correct — deletes applied), write a
Puffin statistics file (sources/iceberg_puffin.py), and publish it in the
table metadata's ``statistics`` list (spec § Table Statistics) as a new
metadata version — the round trip an engine's ANALYZE + cost-based
planner performs. The reference has no statistics story at all (pyiceberg
delegates planning); this is table-format completeness beyond it.

Scale posture: NDV computation is ONE distributed aggregate over the
scanned table — ``approx_count_distinct`` (HyperLogLog++, the default) is
the 100-TB path (constant memory per column, one pass, no shuffle of
distinct values); ``exact=True`` uses ``count(distinct ...)`` for
closed-form gates and small tables. Everything else (Puffin write,
metadata publish) is planning-index driver work.
"""

from __future__ import annotations

import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.sources.iceberg_puffin import read_puffin, write_puffin

NDV_BLOB_TYPE = "ndv-long-v1"  # payload: 8-byte LE count; 'ndv' property


def _publish_metadata(table_dir: str, md: dict, version: int,
                      timestamp_ms: int | None) -> dict:
    """New metadata version + atomic hint swap (the HadoopTables commit
    pattern shared by every metadata-only DDL in iceberg_write.py)."""
    meta_dir = os.path.join(table_dir, "metadata")
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    md["metadata-log"] = md.get("metadata-log", []) + [
        {"metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
         "timestamp-ms": int(md["last-updated-ms"])}
    ]
    md["last-updated-ms"] = ts
    with open(os.path.join(meta_dir, f"v{version + 1}.metadata.json"), "x") as fh:
        json.dump(md, fh, indent=1)
    tmp = os.path.join(meta_dir, ".version-hint.text.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version + 1))
    os.replace(tmp, os.path.join(meta_dir, "version-hint.text"))
    return md


def analyze_table(
    spark: SparkSession,
    table_dir: str,
    columns: list[str] | None = None,
    exact: bool = False,
    timestamp_ms: int | None = None,
) -> dict:
    """ANALYZE: per-column NDV of the current snapshot -> Puffin file ->
    ``statistics`` entry in a new metadata version. Re-analyzing the same
    snapshot REPLACES its entry (one statistics file per snapshot, per
    spec). Returns {snapshot_id, statistics_path, ndv: {column: value}}.
    """
    from iceberg_meta_spark.sources.iceberg_scan import scan_table
    from iceberg_meta_spark.sources.iceberg_write import _local_path

    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        version = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as fh:
        md = json.load(fh)
    if md.get("current-snapshot-id") is None:
        raise ValueError("cannot ANALYZE a table with no snapshots")
    snap = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    snap_id = int(snap["snapshot-id"])
    seq = int(snap.get("sequence-number", 0))
    schema = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    fid_by_name = {f["name"]: int(f["id"]) for f in schema["fields"]}
    cols = columns or [f["name"] for f in schema["fields"]]
    unknown = [c for c in cols if c not in fid_by_name]
    if unknown:
        raise KeyError(f"no such columns: {unknown}")

    agg = F.count_distinct if exact else F.approx_count_distinct
    row = (
        scan_table(spark, table_dir)
        .agg(*[agg(F.col(c)).alias(c) for c in cols])
        .collect()[0]
    )
    ndv = {c: int(row[c]) for c in cols}

    blobs = [
        {
            "type": NDV_BLOB_TYPE,
            "fields": [fid_by_name[c]],
            "snapshot_id": snap_id,
            "sequence_number": seq,
            "payload": struct.pack("<q", ndv[c]),
            "properties": {"ndv": str(ndv[c])},
        }
        for c in cols
    ]
    stats_path = os.path.join(meta_dir, f"{snap_id}-stats.puffin")
    info = write_puffin(stats_path, blobs)
    entry = {
        "snapshot-id": snap_id,
        "statistics-path": stats_path,
        "file-size-in-bytes": info["file_size_in_bytes"],
        "file-footer-size-in-bytes": info["file_footer_size_in_bytes"],
        "blob-metadata": info["blob_metadata"],
    }
    md["statistics"] = [
        e for e in md.get("statistics", []) if int(e["snapshot-id"]) != snap_id
    ] + [entry]
    _publish_metadata(table_dir, md, version, timestamp_ms)
    return {"snapshot_id": snap_id, "statistics_path": stats_path, "ndv": ndv}


_STATS_SCHEMA = (
    "column_name string, field_id int, ndv long, snapshot_id long, "
    "blob_type string"
)


def statistics_frame(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Published statistics as a DataFrame (one row per column blob) —
    what a cost model consumes. Defaults to the current snapshot's entry;
    the NDV comes from the blob's ``ndv`` property (the engine-readable
    surface), falling back to the ndv-long-v1 payload."""
    from iceberg_meta_spark.sources.iceberg_native import load_table_metadata

    md = load_table_metadata(spark, table_dir)
    if snapshot_id is None:
        snapshot_id = md.get("current-snapshot-id")
    schema = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    name_by_fid = {int(f["id"]): f["name"] for f in schema["fields"]}
    rows = []
    for e in md.get("statistics", []):
        if snapshot_id is not None and int(e["snapshot-id"]) != int(snapshot_id):
            continue
        puffin = read_puffin(e["statistics-path"])
        for b in puffin["blobs"]:
            props = b.get("properties") or {}
            if "ndv" in props:
                ndv = int(props["ndv"])
            elif b["type"] == NDV_BLOB_TYPE and len(b["payload"]) == 8:
                ndv = struct.unpack("<q", b["payload"])[0]
            else:
                ndv = None
            fid = int(b["fields"][0]) if b.get("fields") else None
            rows.append((
                name_by_fid.get(fid), fid, ndv, int(b["snapshot-id"]),
                b["type"],
            ))
    return spark.createDataFrame(rows, _STATS_SCHEMA)


def write_partition_statistics(
    spark: SparkSession,
    table_dir: str,
    timestamp_ms: int | None = None,
) -> dict:
    """Partition statistics file (spec § Partition Statistics): per-
    partition-tuple rollups of the CURRENT snapshot's live data files —
    data_record_count / data_file_count / total_data_file_size_in_bytes —
    written as ONE parquet file under ``metadata/`` and registered in the
    table metadata's ``partition-statistics`` list (one entry per
    snapshot, re-run replaces). The partition tuple is stored as its
    canonical JSON encoding (one string column) so files written under
    EVOLVED specs coexist in one stats file; engines that want the
    struct shape project it from the JSON. Rollup input is the plan's
    post-decode index (planning-index scale), the groupBy is one small
    Spark aggregate."""
    from pyspark.sql import functions as F

    from iceberg_meta_spark.sources.iceberg_scan import plan_scan
    from iceberg_meta_spark.sources.iceberg_write import _local_path

    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        version = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as fh:
        md = json.load(fh)
    if md.get("current-snapshot-id") is None:
        raise ValueError("cannot write partition statistics: no snapshots")
    snap_id = int(md["current-snapshot-id"])
    plan = plan_scan(spark, table_dir)
    rows = [
        (json.dumps(f["part"], sort_keys=True, default=str),
         int(f["record_count"]), int(f["size"]))
        for f in plan.data_files
    ]
    agg = (
        spark.createDataFrame(
            rows, "partition string, record_count long, size long")
        .groupBy("partition")
        .agg(
            F.sum("record_count").alias("data_record_count"),
            F.count(F.lit(1)).alias("data_file_count"),
            F.sum("size").alias("total_data_file_size_in_bytes"),
        )
        .withColumn("spec_id", F.lit(int(md["default-spec-id"])))
    )
    out_dir = os.path.join(meta_dir, f"partition-stats-{snap_id}")
    agg.coalesce(1).write.mode("overwrite").parquet(out_dir)
    import glob as _glob

    [stats_path] = _glob.glob(os.path.join(out_dir, "*.parquet"))
    entry = {
        "snapshot-id": snap_id,
        "statistics-path": stats_path,
        "file-size-in-bytes": os.path.getsize(stats_path),
    }
    md["partition-statistics"] = [
        e for e in md.get("partition-statistics", [])
        if int(e["snapshot-id"]) != snap_id
    ] + [entry]
    _publish_metadata(table_dir, md, version, timestamp_ms)
    return {"snapshot_id": snap_id, "statistics_path": stats_path,
            # count derives from the already-local planning rows: no
            # second Spark job re-running the rollup pipeline
            "partitions": len({k for k, _, _ in rows})}


def partition_statistics_frame(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read back the registered partition statistics file for a snapshot
    (default: current) — the planner-facing rollup surface."""
    from iceberg_meta_spark.sources.iceberg_native import load_table_metadata

    md = load_table_metadata(spark, table_dir)
    if snapshot_id is None:
        snapshot_id = md.get("current-snapshot-id")
    if snapshot_id is None:
        raise ValueError("table has no snapshots (and none was requested)")
    entry = next(
        (e for e in md.get("partition-statistics", [])
         if int(e["snapshot-id"]) == int(snapshot_id)),
        None,
    )
    if entry is None:
        raise KeyError(f"no partition statistics for snapshot {snapshot_id}")
    return spark.read.parquet(entry["statistics-path"])
