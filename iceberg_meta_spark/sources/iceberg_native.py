"""Jar-free Iceberg table reader: metadata JSON + Avro manifests, from spec.

Closes the S1/S2 gap (reference catalog.py:145-189 loads tables through
pyiceberg) WITHOUT the Iceberg Spark runtime jar or pyiceberg, neither of
which exists in this container: everything here is derived from the public
Apache Iceberg table spec (iceberg.apache.org/spec — table metadata §
"Table Metadata", manifest lists § "Manifest Lists", manifests §
"Manifests", single-value bounds § "Appendix D: Single-value
serialization") plus the public Avro container spec implemented in
``sources/avro_py.py``.

Scale shape: the metadata tree fans out as
``1 metadata.json → 1 manifest list/snapshot → N manifests → M file
entries``. The first two levels are planning-index-sized (KBs; decoded
driver-side, same as every engine's planner). The manifest level is
unbounded — a 100 TB table carries thousands of manifests with millions of
entries — so manifests decode DISTRIBUTED: ``spark.read.format
("binaryFile")`` ships each manifest's bytes to an executor and an
Arrow-batched ``mapInPandas`` runs the pure-Python Avro decoder there, one
output row per manifest entry. No driver loop ever touches a file entry.

Output frames match the jar-gated readers in ``sources/iceberg.py``
(``files_frame`` / ``snapshots_frame`` / ``manifests_frame`` /
``column_stats_frame`` shapes), so every metadata operator in
``operators/`` consumes a native-read table unchanged.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.sources.avro_py import read_container
from iceberg_meta_spark.sources.localrel import local_frame


def _as_local(path: str) -> str | None:
    """Filesystem path when ``path`` addresses the LOCAL filesystem
    (bare path or ``file:`` URI), else None (s3://, hdfs://, ...).

    Planning-index files (metadata JSON, version hint, manifest lists)
    are KB-scale; reading them through a Spark job costs a full
    scheduler round trip (~100 ms each) per file — a real engine's
    planner reads them directly (Iceberg's TableMetadataParser does).
    Remote schemes keep the Spark read path, which carries the session's
    filesystem credentials."""
    p = str(path)
    if p.startswith("file://"):
        rest = p[len("file://"):]
        return rest if rest.startswith("/") else None
    if p.startswith("file:"):
        return p[len("file:"):]
    if "://" in p:
        return None
    return p


# Manifest bytes at or below this total decode DRIVER-side / read locally
# (zero Spark jobs); above it, the distributed binaryFile + mapInPandas
# decode runs unchanged. The manifest list carries every manifest's byte
# length, so the decision costs nothing. At 100 TB (GBs of manifests) the
# distributed path always fires; parameterized so deployments can tune it.
DRIVER_PLAN_BYTES = int(
    os.environ.get("SPARK_GRAFT_DRIVER_PLAN_BYTES", str(32 * 1024 * 1024))
)


def _read_small_text(spark: SparkSession, path: str) -> str:
    """One small text file, driver-side when local (no Spark job)."""
    lp = _as_local(path)
    if lp is not None:
        with open(lp, encoding="utf-8") as fh:
            return fh.read()
    return "\n".join(r.value for r in spark.read.text(path).collect())


def _read_small_bytes(spark: SparkSession, path: str) -> bytes:
    """One small binary file, driver-side when local (no Spark job)."""
    lp = _as_local(path)
    if lp is not None:
        with open(lp, "rb") as fh:
            return fh.read()
    row = spark.read.format("binaryFile").load(path).select("content").head()
    if row is None:
        raise FileNotFoundError(path)
    return bytes(row.content)


# ---------------------------------------------------------------------------
# Table metadata JSON (driver-side: one small file per table)
# ---------------------------------------------------------------------------


def current_metadata_path(spark: SparkSession, table_dir: str) -> str:
    """Resolve the current metadata file of ``table_dir``.

    Spec resolution order: ``metadata/version-hint.text`` (the
    HadoopTables/file-system layout) names version N -> ``vN.metadata.json``;
    without a hint, take the highest-versioned ``*.metadata.json`` (both
    ``vN.metadata.json`` and the core ``NNNNN-<uuid>.metadata.json`` naming
    sort correctly by their numeric prefix)."""
    table_dir = table_dir.rstrip("/")
    try:
        hint = _read_small_text(spark, f"{table_dir}/metadata/version-hint.text").strip()
        if hint:
            return f"{table_dir}/metadata/v{int(hint)}.metadata.json"
    except Exception:
        pass  # no hint file -> list and take the newest

    def version_of(path: str) -> int:
        stem = path.rsplit("/", 1)[-1].split(".metadata.json")[0]
        digits = stem.lstrip("v").split("-")[0]
        return int(digits) if digits.isdigit() else -1

    local_dir = _as_local(f"{table_dir}/metadata")
    if local_dir is not None:
        names = [n for n in os.listdir(local_dir) if n.endswith(".metadata.json")]
        if not names:
            raise FileNotFoundError(f"no *.metadata.json under {table_dir}/metadata")
        return f"{table_dir}/metadata/{max(names, key=version_of)}"
    listed = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.metadata.json")
        .load(f"{table_dir}/metadata")
        .select("path")
        .collect()
    )
    if not listed:
        raise FileNotFoundError(f"no *.metadata.json under {table_dir}/metadata")
    return max((r.path for r in listed), key=version_of)


def load_table_metadata(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> dict:
    """Parse the table-metadata JSON of ``table_dir`` — the current one, or
    (metadata-version time travel) an explicit older ``vN.metadata.json``:
    every commit leaves its predecessor in place (the metadata-log), so any
    historical table state reconstructs from its version file."""
    if version is not None:
        path = f"{table_dir.rstrip('/')}/metadata/v{int(version)}.metadata.json"
    else:
        path = current_metadata_path(spark, table_dir)
    return json.loads(_read_small_text(spark, path))


def _snapshot(metadata: dict, snapshot_id: int | None) -> dict:
    snaps = metadata.get("snapshots", [])
    if snapshot_id is None:
        snapshot_id = metadata.get("current-snapshot-id")
    for s in snaps:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise KeyError(f"snapshot {snapshot_id} not in table metadata")


# ---------------------------------------------------------------------------
# Snapshots frame (shape of sources/iceberg.py::snapshots_frame)
# ---------------------------------------------------------------------------

_SNAP_SCHEMA = (
    "snapshot_id long, parent_id long, committed_us long, operation string, "
    "added_records long, deleted_records long, total_data_files long, "
    "total_records long, total_files_size long"
)


def native_snapshots_frame(
    spark: SparkSession, table_dir: str, metadata: dict | None = None
) -> DataFrame:
    """Snapshot log from table metadata — the S3/S8/A11/A12 input shape.
    Summary keys per spec § Snapshots (operation + the core metrics)."""
    md = metadata or load_table_metadata(spark, table_dir)

    def prop(summary: dict, key: str):
        v = summary.get(key)
        return int(v) if v is not None else None

    rows = [
        (
            int(s["snapshot-id"]),
            int(s["parent-snapshot-id"]) if s.get("parent-snapshot-id") is not None else None,
            int(s["timestamp-ms"]) * 1000,
            (s.get("summary") or {}).get("operation"),
            prop(s.get("summary") or {}, "added-records"),
            prop(s.get("summary") or {}, "deleted-records"),
            prop(s.get("summary") or {}, "total-data-files"),
            prop(s.get("summary") or {}, "total-records"),
            prop(s.get("summary") or {}, "total-files-size"),
        )
        for s in md.get("snapshots", [])
    ]
    return local_frame(spark, rows, _SNAP_SCHEMA)


# ---------------------------------------------------------------------------
# Manifest list (planning index: KBs per snapshot -> driver decode)
# ---------------------------------------------------------------------------


def _read_avro_file(spark: SparkSession, path: str) -> list:
    _, _, records = read_container(_read_small_bytes(spark, path))
    return records


def _mf_int(rec: dict, v2_name: str, v1_name: str) -> int | None:
    """Manifest-file field with v2 name, falling back to the v1 name
    (spec renamed added_data_files_count -> added_files_count etc.)."""
    v = rec.get(v2_name)
    if v is None:
        v = rec.get(v1_name)
    return int(v) if v is not None else None


_MANIFESTS_SCHEMA = (
    "manifest_path string, manifest_length long, partition_spec_id int, "
    "content int, added_files_count int, existing_files_count int, "
    "deleted_files_count int, added_snapshot_id long, sequence_number long"
)


def native_manifests_frame(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    metadata: dict | None = None,
) -> DataFrame:
    """One row per manifest of a snapshot — the A2/S4 input shape
    (superset of sources/iceberg.py::manifests_frame: + added_snapshot_id)."""
    md = metadata or load_table_metadata(spark, table_dir)
    snap = _snapshot(md, snapshot_id)
    records = _read_avro_file(spark, snap["manifest-list"])
    rows = [
        (
            r["manifest_path"],
            int(r["manifest_length"]),
            int(r.get("partition_spec_id", 0)),
            int(r.get("content", 0)),
            _mf_int(r, "added_files_count", "added_data_files_count"),
            _mf_int(r, "existing_files_count", "existing_data_files_count"),
            _mf_int(r, "deleted_files_count", "deleted_data_files_count"),
            int(r["added_snapshot_id"]) if r.get("added_snapshot_id") is not None else None,
            int(r["sequence_number"]) if r.get("sequence_number") is not None else None,
        )
        for r in records
    ]
    return local_frame(spark, rows, _MANIFESTS_SCHEMA)


# ---------------------------------------------------------------------------
# Manifest entries (unbounded -> distributed binaryFile + mapInPandas)
# ---------------------------------------------------------------------------

_ENTRY_COLS = (
    "manifest_path string, status int, snapshot_id long, content int, "
    "file_path string, file_format string, part_key string, "
    "record_count long, file_size_in_bytes long, sequence_number long, "
    "equality_ids array<int>"
)

_STATS_COLS = (
    "file_path string, field_id int, value_count long, null_count long, "
    "column_size long, lower_bound binary, upper_bound binary"
)


def _kv_map(value) -> dict[int, object]:
    """Iceberg encodes map<int, V> in Avro as array<record{key, value}>
    (spec: Avro does not support non-string map keys). Accept both that and
    a plain Avro map with stringified keys."""
    if value is None:
        return {}
    if isinstance(value, dict):
        return {int(k): v for k, v in value.items()}
    return {int(kv["key"]): kv["value"] for kv in value}


def _decode_manifest_entries(content: bytes, path: str) -> Iterator[dict]:
    _, _, records = read_container(content)
    for rec in records:
        df = rec["data_file"]
        yield {
            "manifest_path": path,
            "status": int(rec.get("status", 0)),
            "snapshot_id": rec.get("snapshot_id"),
            "entry": rec,
            "data_file": df,
        }


def _entry_dicts(content: bytes, path: str) -> list[dict]:
    """Decode ONE manifest's bytes into S7-shaped entry dicts — the pure
    per-manifest kernel shared by the distributed Arrow decode
    (:func:`_entries_map_fn`) and the driver-side small-metadata path
    (:func:`native_entries_frame`), so the two cannot drift."""
    out = []
    for e in _decode_manifest_entries(bytes(content), path):
        df = e["data_file"]
        part = df.get("partition") or {}
        seq = e["entry"].get("sequence_number")
        eq = df.get("equality_ids")
        out.append(
            {
                "manifest_path": e["manifest_path"],
                "status": e["status"],
                "snapshot_id": e["snapshot_id"],
                "content": int(df.get("content", 0)),
                "file_path": df["file_path"],
                "file_format": str(df.get("file_format", "")).upper(),
                "part_key": json.dumps(part, sort_keys=True, default=str),
                "record_count": int(df["record_count"]),
                "file_size_in_bytes": int(df["file_size_in_bytes"]),
                # null = inherited from the manifest (spec § Manifest
                # Entry Fields): the scan planner coalesces with the
                # manifest's own sequence_number
                "sequence_number": int(seq) if seq is not None else None,
                "equality_ids": [int(i) for i in eq] if eq else None,
            }
        )
    return out


def _entries_map_fn(pdf_iter):
    import pandas as pd

    for pdf in pdf_iter:
        out = []
        for path, content in zip(pdf["path"], pdf["content"]):
            out.extend(_entry_dicts(bytes(content), path))
        yield pd.DataFrame(
            out,
            columns=[c.split()[0] for c in _ENTRY_COLS.split(", ")],
        )


def _stat_dicts(content: bytes, path: str) -> list[dict]:
    """Per-(file, field) stats dicts of ONE manifest — shared kernel of the
    distributed and driver-side paths (same rationale as _entry_dicts)."""
    out = []
    for e in _decode_manifest_entries(bytes(content), path):
        if e["status"] == 2:  # DELETED entries carry no live stats
            continue
        df = e["data_file"]
        vc = _kv_map(df.get("value_counts"))
        nc = _kv_map(df.get("null_value_counts"))
        cs = _kv_map(df.get("column_sizes"))
        lb = _kv_map(df.get("lower_bounds"))
        ub = _kv_map(df.get("upper_bounds"))
        # bounds-only stats are legal (a writer may track min/max
        # without value counts) — include every field ANY map names
        for fid in sorted(set(vc) | set(nc) | set(cs) | set(lb) | set(ub)):
            out.append(
                {
                    "file_path": df["file_path"],
                    "field_id": fid,
                    "value_count": vc.get(fid),
                    "null_count": nc.get(fid),
                    "column_size": cs.get(fid),
                    "lower_bound": bytes(lb[fid]) if fid in lb else None,
                    "upper_bound": bytes(ub[fid]) if fid in ub else None,
                }
            )
    return out


def _stats_map_fn(pdf_iter):
    import pandas as pd

    for pdf in pdf_iter:
        out = []
        for path, content in zip(pdf["path"], pdf["content"]):
            out.extend(_stat_dicts(bytes(content), path))
        yield pd.DataFrame(
            out,
            columns=[c.split()[0] for c in _STATS_COLS.split(", ")],
        )


def _manifest_bytes_source(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None,
    metadata: dict | None,
    content: int | None = 0,
) -> tuple[list[tuple[str, bytes]] | None, DataFrame | None]:
    """Scale-adaptive manifest byte sourcing: ``(local_list, None)`` when
    every manifest of the requested content kind is LOCAL and their total
    length (free from the manifest list) is at most DRIVER_PLAN_BYTES —
    decode callers build a local relation of DECODED rows from the list
    (zero Spark jobs; re-consumption by multi-pass operators is free).
    Otherwise ``(None, binaryFile DataFrame)`` for the distributed decode.
    ONE metadata load + ONE manifest-list read serve both outcomes (the
    r12 split-function shape re-read both on exactly the big-metadata
    fallback path — ADVICE r12)."""
    md = metadata or load_table_metadata(spark, table_dir)
    snap = _snapshot(md, snapshot_id)
    mlist = _read_avro_file(spark, snap["manifest-list"])
    mine = [
        r for r in mlist
        if content is None or int(r.get("content", 0)) == content
    ]
    local = [_as_local(r["manifest_path"]) for r in mine]
    total = sum(int(r.get("manifest_length") or 0) for r in mine)
    # module attribute (not the import-time constant) so tests can
    # monkeypatch the threshold to pin either decode placement
    import iceberg_meta_spark.sources.iceberg_native as _self

    if all(lp is not None for lp in local) and total <= _self.DRIVER_PLAN_BYTES:
        out = []
        for r, lp in zip(mine, local):
            with open(lp, "rb") as fh:
                out.append((r["manifest_path"], fh.read()))
        return out, None
    paths = [r["manifest_path"] for r in mine]
    if not paths:
        return None, spark.createDataFrame([], "path string, content binary")
    return None, spark.read.format("binaryFile").load(paths).select("path", "content")


def native_entries_frame(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    metadata: dict | None = None,
) -> DataFrame:
    """Every manifest entry of a snapshot (S7 shape: status included), one
    row per (manifest, data file) — decoded executor-side, or driver-side
    into a local relation when the metadata is small (see
    :func:`_local_manifest_bytes`; multi-pass consumers then re-read a
    plain in-memory relation instead of re-running the decode)."""
    small, bin_df = _manifest_bytes_source(spark, table_dir, snapshot_id, metadata)
    if small is not None:
        cols = [c.split()[0] for c in _ENTRY_COLS.split(", ")]
        rows = [
            tuple(d[c] for c in cols)
            for p, b in small
            for d in _entry_dicts(b, p)
        ]
        return local_frame(spark, rows, _ENTRY_COLS)
    return bin_df.mapInPandas(_entries_map_fn, _ENTRY_COLS)


def native_files_frame(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    metadata: dict | None = None,
) -> DataFrame:
    """Live data files of a snapshot — the A1/A3/A4/J1 input shape
    (matches sources/iceberg.py::files_frame column-for-column)."""
    md = metadata or load_table_metadata(spark, table_dir)
    snap = _snapshot(md, snapshot_id)
    entries = native_entries_frame(spark, table_dir, snap["snapshot-id"], md)
    return (
        entries.where(F.col("status") != 2)  # 2 = DELETED (spec: entry status)
        .select(
            F.lit(int(snap["snapshot-id"])).alias("snapshot_id"),
            "file_path",
            "file_format",
            "part_key",
            "record_count",
            "file_size_in_bytes",
        )
    )


def native_column_stats_frame(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    metadata: dict | None = None,
) -> DataFrame:
    """Per-(file, field) stats — the A5/A6 input shape of
    sources/iceberg.py::column_stats_frame, + raw bound bytes for A7.
    Driver-decoded into a local relation for small metadata (same
    adaptive rule as :func:`native_entries_frame`)."""
    small, bin_df = _manifest_bytes_source(spark, table_dir, snapshot_id, metadata)
    if small is not None:
        cols = [c.split()[0] for c in _STATS_COLS.split(", ")]
        rows = [
            tuple(d[c] for c in cols)
            for p, b in small
            for d in _stat_dicts(b, p)
        ]
        return local_frame(spark, rows, _STATS_COLS)
    return bin_df.mapInPandas(_stats_map_fn, _STATS_COLS)


# ---------------------------------------------------------------------------
# Bound decoding (spec Appendix D: single-value serialization)
# ---------------------------------------------------------------------------


def decode_bound(raw: bytes | None, type_name: str):
    """Decode one lower/upper bound value: little-endian fixed width for
    numerics, UTF-8 for strings (spec Appendix D)."""
    if raw is None:
        return None
    t = type_name.lower()
    # numerics decode by BUFFER width, not declared width: after type
    # widening (int -> long, float -> double; spec § Schema Evolution) the
    # declared type is the WIDE one while bounds committed before the
    # widen stay 4 bytes — readers must promote (spec Appendix D)
    if t in ("int", "long"):
        return struct.unpack("<i" if len(raw) == 4 else "<q", raw)[0]
    if t in ("float", "double"):
        return struct.unpack("<f" if len(raw) == 4 else "<d", raw)[0]
    if t == "string":
        return raw.decode("utf-8")
    if t == "uuid":
        # spec Appendix D: uuid serializes as 16-byte big-endian, NOT UTF-8
        import uuid as _uuid

        return str(_uuid.UUID(bytes=raw))
    if t == "boolean":
        return raw[0] != 0
    raise ValueError(f"unsupported bound type {type_name!r}")


def native_file_ranges(
    spark: SparkSession,
    table_dir: str,
    field_id: int,
    type_name: str = "long",
    snapshot_id: int | None = None,
) -> DataFrame:
    """(file_path, lo, hi) for one field — the J3/W6 overlap-kernel input
    (jar-path equivalent: normalize_file_ranges over readable_metrics).
    The bound bytes unpack in the same distributed Arrow pass that decoded
    the manifests — byte-order arithmetic has no clean builtin-SQL form and
    the rows are manifest-entry-scale, so this stays executor-side Python."""
    stats = native_column_stats_frame(spark, table_dir, snapshot_id)
    stats = stats.where(F.col("field_id") == field_id)
    if type_name.lower() not in ("int", "long"):
        raise ValueError("native_file_ranges supports int/long bounds")
    width = 4 if type_name.lower() == "int" else 8

    def unpack_fn(pdf_iter):
        import pandas as pd
        import struct as _s

        fmt = "<i" if width == 4 else "<q"
        for pdf in pdf_iter:
            lo = [
                _s.unpack(fmt, v)[0] if v is not None else None
                for v in pdf["lower_bound"]
            ]
            hi = [
                _s.unpack(fmt, v)[0] if v is not None else None
                for v in pdf["upper_bound"]
            ]
            yield pd.DataFrame(
                {"file_path": pdf["file_path"], "lo": lo, "hi": hi}
            )

    return stats.select("file_path", "lower_bound", "upper_bound").mapInPandas(
        unpack_fn, "file_path string, lo long, hi long"
    )


# ---------------------------------------------------------------------------
# Warehouse walk (S1 analog: recursive catalog scan without a catalog)
# ---------------------------------------------------------------------------


def native_warehouse_tables(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    """Walk a filesystem warehouse (``<warehouse>/<namespace>/<table>``
    layout) and return one row per table: (namespace, table_name, table_dir,
    format_version, current_snapshot_id, last_updated_ms, snapshot_count,
    total_files, total_records, total_size) — the totals come from each
    table's current-snapshot summary (the metadata-only fast path), so the
    frame feeds api.namespace_overview / warehouse_overview / alerts
    directly: the full S1 catalog-rollup story, jar-free.

    The jar path walks SHOW NAMESPACES/SHOW TABLES (reference
    catalog.py:164-189); this native path is ONE distributed job end to
    end: a single recursive ``binaryFile`` scan of every
    ``*.metadata.json`` (a thousand-table warehouse is one Spark job, not
    a thousand), newest-version-per-table selection as an aggregate, and
    the JSON parse via ``from_json`` — all JVM-side, no Python boundary,
    no driver loop. (r7 parsed each table's JSON via a separate
    ``spark.read.text().collect()`` inside a Python loop — O(tables) tiny
    jobs, the exact shape the manifest level already fixed one level
    down.)"""
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.metadata.json")
        .load(warehouse_dir.rstrip("/"))
        .where(F.col("path").contains("/metadata/"))
        .select(
            F.regexp_extract("path", r"^(.*)/metadata/[^/]+$", 1).alias("table_dir"),
            # version stem: 'v3' (HadoopTables) or '00003-uuid' (catalogs);
            # non-numeric stems sort below every real version (-1)
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        F.element_at(F.split("path", "/"), -1), r"^v?(\d+)", 1
                    ),
                    F.lit(""),
                ).cast("int"),
                F.lit(-1),
            ).alias("version"),
            F.col("path"),
            F.col("content").cast("string").alias("text"),
        )
    )
    # deterministic newest-per-table: lexicographic struct max on
    # (version, path) carries the winning text along — one shuffle on
    # table_dir, the only shuffle of the walk
    newest = raw.groupBy("table_dir").agg(
        F.max(F.struct("version", "path", "text")).alias("w")
    )
    md_schema = (
        "`format-version` INT, `current-snapshot-id` LONG, "
        "`last-updated-ms` LONG, "
        "snapshots ARRAY<STRUCT<`snapshot-id`: LONG, summary: MAP<STRING, STRING>>>"
    )
    parsed = newest.select(
        "table_dir", F.from_json(F.col("w.text"), md_schema).alias("md")
    )
    cur = F.col("md.`current-snapshot-id`")
    cur_summary = F.element_at(
        F.filter("md.snapshots", lambda s: s["snapshot-id"] == cur), 1
    )["summary"]

    def tot(key: str):
        return F.element_at(cur_summary, key).cast("long")

    segs = F.split(F.regexp_replace("table_dir", r"/+$", ""), "/")
    return parsed.select(
        F.when(F.size(segs) >= 2, F.element_at(segs, -2))
        .otherwise(F.lit(""))
        .alias("namespace"),
        F.element_at(segs, -1).alias("table_name"),
        "table_dir",
        F.coalesce(F.col("md.`format-version`"), F.lit(1)).alias("format_version"),
        cur.alias("current_snapshot_id"),
        F.col("md.`last-updated-ms`").alias("last_updated_ms"),
        F.coalesce(F.size("md.snapshots"), F.lit(0)).cast("int").alias("snapshot_count"),
        tot("total-data-files").alias("total_files"),
        tot("total-records").alias("total_records"),
        tot("total-files-size").alias("total_size"),
    )


_STATS_TYPED_COLS = (
    "file_path string, field_id int, value_count long, null_count long, "
    "column_size long, lower_bound long, upper_bound long"
)


def native_column_stats_typed(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    metadata: dict | None = None,
) -> DataFrame:
    """Column stats with BOUNDS DECODED to long per the table schema's field
    types (spec Appendix D: int/long bounds are fixed-width little-endian;
    non-integer fields yield NULL bounds) — the exact input shape of the
    A5-A7 column-health kernel and the fixture's meta_column_stats. Decoding
    happens inside the same distributed Arrow pass that parses the
    manifests."""
    md = metadata or load_table_metadata(spark, table_dir)
    schema = next(
        (s for s in md.get("schemas", []) if s.get("schema-id") == md.get("current-schema-id")),
        {"fields": []},
    )
    int_fields = {
        int(f["id"]): ("<i" if f["type"] == "int" else "<q")
        for f in schema["fields"]
        if f.get("type") in ("int", "long")
    }
    small, bin_df = _manifest_bytes_source(spark, table_dir, snapshot_id, md)
    if small is not None:
        import struct as _s

        cols = [c.split()[0] for c in _STATS_TYPED_COLS.split(", ")]

        def _dec1(fid, raw):
            if raw is None or fid not in int_fields:
                return None
            return _s.unpack(int_fields[fid], raw)[0]

        rows = []
        for p, b in small:
            for d in _stat_dicts(b, p):
                d["lower_bound"] = _dec1(d["field_id"], d["lower_bound"])
                d["upper_bound"] = _dec1(d["field_id"], d["upper_bound"])
                rows.append(tuple(d[c] for c in cols))
        return local_frame(spark, rows, _STATS_TYPED_COLS)

    def typed_fn(pdf_iter):
        import pandas as pd
        import struct as _s

        for pdf in _stats_map_fn(pdf_iter):
            def dec(col):
                return [
                    _s.unpack(int_fields[fid], raw)[0]
                    if raw is not None and fid in int_fields
                    else None
                    for fid, raw in zip(pdf2["field_id"], pdf2[col])
                ]

            pdf2 = pdf
            pdf2 = pdf2.assign(lower_bound=dec("lower_bound"), upper_bound=dec("upper_bound"))
            yield pdf2

    return bin_df.mapInPandas(typed_fn, _STATS_TYPED_COLS)


def native_delete_files_frame(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    metadata: dict | None = None,
) -> DataFrame:
    """Delete files (position/equality, data_file.content 1/2) of a
    snapshot, from the snapshot's DELETE manifests (manifest content=1) —
    the v2 row-level-delete audit input (A2/P5's file-level view). Same
    adaptive decode placement as the data path."""
    small, bin_df = _manifest_bytes_source(
        spark, table_dir, snapshot_id, metadata, content=1
    )
    if small is not None:
        cols = [c.split()[0] for c in _ENTRY_COLS.split(", ")]
        rows = [
            tuple(d[c] for c in cols)
            for p, b in small
            for d in _entry_dicts(b, p)
        ]
        return local_frame(spark, rows, _ENTRY_COLS).where(F.col("status") != 2)
    return bin_df.mapInPandas(_entries_map_fn, _ENTRY_COLS).where(F.col("status") != 2)


def native_refs_frame(
    spark: SparkSession, table_dir: str, metadata: dict | None = None
) -> DataFrame:
    """Branches and tags from table metadata (spec § Refs; the ``.refs``
    metadata table of the jar path): one row per ref with its pinned
    snapshot and retention knobs. Tables without a refs map (or v1) yield
    the implicit ``main`` branch at the current snapshot, matching engine
    behavior."""
    md = metadata or load_table_metadata(spark, table_dir)
    refs = md.get("refs") or {}
    if not refs and md.get("current-snapshot-id") is not None:
        refs = {"main": {"snapshot-id": md["current-snapshot-id"], "type": "branch"}}
    rows = [
        (
            name,
            r.get("type", "branch"),
            int(r["snapshot-id"]),
            r.get("max-ref-age-ms"),
            r.get("max-snapshot-age-ms"),
            r.get("min-snapshots-to-keep"),
        )
        for name, r in sorted(refs.items())
    ]
    return spark.createDataFrame(
        rows,
        "name string, type string, snapshot_id long, max_ref_age_ms long, "
        "max_snapshot_age_ms long, min_snapshots_to_keep int",
    )


# ---------------------------------------------------------------------------
# History + refs metadata tables (engine `t.history` / `t.refs` parity)
# ---------------------------------------------------------------------------

_HISTORY_SCHEMA = (
    "made_current_at_ms long, snapshot_id long, parent_id long, "
    "is_current_ancestor boolean"
)


def native_history_frame(
    spark: SparkSession, table_dir: str, metadata: dict | None = None
) -> DataFrame:
    """The engine's ``history`` metadata table: one row per snapshot-log
    entry (every time a snapshot became current, INCLUDING rollbacks
    re-logging an old snapshot), with ``is_current_ancestor`` marking
    whether that snapshot is on the CURRENT snapshot's parent chain —
    false rows are abandoned lines left behind by a rollback. Log length
    is planning-index scale; the ancestor walk is a driver set-build."""
    md = metadata or load_table_metadata(spark, table_dir)
    by_id = {int(s["snapshot-id"]): s for s in md.get("snapshots", [])}
    ancestors: set[int] = set()
    cur = md.get("current-snapshot-id")
    while cur is not None and int(cur) in by_id and int(cur) not in ancestors:
        ancestors.add(int(cur))
        cur = by_id[int(cur)].get("parent-snapshot-id")
    rows = []
    for e in md.get("snapshot-log", []):
        sid = int(e["snapshot-id"])
        snap = by_id.get(sid)
        parent = snap.get("parent-snapshot-id") if snap else None
        rows.append((
            int(e["timestamp-ms"]), sid,
            int(parent) if parent is not None else None,
            sid in ancestors,
        ))
    return local_frame(spark, rows, _HISTORY_SCHEMA)


def native_partitions_frame(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """The engine's ``partitions`` metadata table: per-partition-tuple
    file/row/byte rollups of the LIVE data files at one snapshot — the
    native-table twin of A3's fixture-side partition distribution. The
    tuple rides each manifest entry, so this is one distributed decode +
    one groupBy; no data file opens."""
    from iceberg_meta_spark.sources.iceberg_scan import plan_scan

    plan = plan_scan(spark, table_dir, snapshot_id=snapshot_id)
    rows = [
        (json.dumps(f["part"], sort_keys=True, default=str),
         int(f["record_count"]), int(f["size"]))
        for f in plan.data_files
    ]
    df = spark.createDataFrame(
        rows, "partition string, record_count long, file_size_in_bytes long"
    )
    from pyspark.sql import functions as F

    return df.groupBy("partition").agg(
        F.count(F.lit(1)).alias("file_count"),
        F.sum("record_count").alias("row_count"),
        F.sum("file_size_in_bytes").alias("total_size"),
    )
