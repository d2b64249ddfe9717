"""Jar-free merge-on-read DATA scan for native Iceberg tables.

Every other native query consumes the METADATA tree; this module closes the
loop and reads the table's DATA the way an engine does (spec § Scan
Planning, § Row-level deletes):

1. **Plan** (:func:`plan_scan`): resolve the snapshot (current, snapshot-id
   or metadata-version time travel), list its live data files with their
   data sequence numbers (entry value, manifest-inherited when null), and
   zone-map-prune on an optional ``(column, lo, hi)`` interval using the
   Appendix-D-decoded per-file bounds — files whose [min, max] cannot
   intersect the interval are never opened. The plan is a driver-side file
   index, exactly what Spark's own ``InMemoryFileIndex`` is: O(files)
   planning metadata, not data.
2. **Read**: one ``spark.read.parquet`` over the surviving files.
3. **Apply deletes** (:func:`scan_table`), both v2 row-level shapes:
   - position deletes — anti-join on (normalized file path, row position)
     via Spark's ``_metadata.file_path`` / ``_metadata.row_index`` hidden
     columns, applied when ``data_seq <= delete_seq``;
   - equality deletes — anti-join on the delete file's ``equality_ids``
     columns, applied when ``data_seq < delete_seq`` (strict, per spec:
     an equality delete never hides rows committed with it or later).

Delete-file COUNT is planning-index scale (they ride the same manifest
lists); their row sets join distributed. The residual predicate is pushed
into the parquet scan, so pruning is an IO optimization layered UNDER an
unchanged result — the hash gate pins that (the pruned scan must equal the
oracle's full-scan filter).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.sources.iceberg_native import (
    _manifest_bytes_df,
    _entries_map_fn,
    _ENTRY_COLS,
    decode_bound,
    load_table_metadata,
    _snapshot,
    _read_avro_file,
)

_ICEBERG_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "date": "date",
    "binary": "binary",
}


def _norm_path(p: str) -> str:
    while p.startswith("file:"):
        p = p[len("file:"):]
    return p if p.startswith("/") else "/" + p


@dataclass
class ScanPlan:
    """Driver-side file index for one snapshot scan."""

    data_files: list[dict]          # path, seq, record_count, size, part
    position_deletes: list[dict]    # path, seq
    equality_deletes: list[dict]    # path, seq, equality_ids
    files_total: int = 0            # live data files before pruning
    files_pruned: int = 0           # skipped by partition + zone-map pruning
    schema_fields: list[tuple[int, str, str]] = field(default_factory=list)
    partition_cols: list[str] = field(default_factory=list)


def _entries_rows(spark: SparkSession, table_dir: str, snap: dict, md: dict, content: int):
    """Decoded manifest entries (list of Rows) for one manifest content
    kind, with null entry sequence numbers inherited from the manifest."""
    # manifest-level sequence numbers (planning index, driver-side)
    mlist = _read_avro_file(spark, snap["manifest-list"])
    mseq = {
        r["manifest_path"]: r.get("sequence_number")
        for r in mlist
        if (int(r.get("content", 0)) == content)
    }
    bin_df = _manifest_bytes_df(
        spark, table_dir, snap["snapshot-id"], md, content=content
    )
    rows = (
        bin_df.mapInPandas(_entries_map_fn, _ENTRY_COLS)
        .where(F.col("status") != 2)
        .collect()
    )
    out = []
    for r in rows:
        seq = r.sequence_number
        if seq is None:
            seq = mseq.get(r.manifest_path)
        out.append((r, int(seq) if seq is not None else 0))
    return out


def plan_scan(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    version: int | None = None,
    predicate: tuple[str, object, object] | None = None,
    ref: str | None = None,
) -> ScanPlan:
    """Build the file index for a snapshot scan; see module docstring.

    ``predicate=(column, lo, hi)`` prunes data files by their decoded
    min/max bounds for that column (closed interval; ``None`` for an open
    end). Files without bounds for the column are conservatively kept.
    Identity-partition columns prune on the partition VALUE from the
    manifest entry instead (cheaper: no stats decode). Partition-column
    names resolve against the DEFAULT spec; entries written under an
    older spec (partition evolution) keep their own part_key shape and
    are conservatively kept by the value prune (absent key -> survive).
    """
    md = load_table_metadata(spark, table_dir, version=version)
    if ref is not None:
        # time travel by NAME (spec § Refs): branch/tag -> pinned snapshot
        refs = md.get("refs") or {}
        if ref not in refs:
            raise KeyError(f"no ref {ref!r} on table")
        if snapshot_id is not None:
            raise ValueError("pass ref= or snapshot_id=, not both")
        snapshot_id = int(refs[ref]["snapshot-id"])
    schema = next(
        s for s in md.get("schemas", []) if s.get("schema-id") == md.get("current-schema-id")
    )
    fields = [(int(f["id"]), f["name"], f["type"]) for f in schema["fields"]]
    if snapshot_id is None and md.get("current-snapshot-id") is None:
        # freshly created table: nothing committed yet, schema-only plan
        return ScanPlan(
            data_files=[], position_deletes=[], equality_deletes=[],
            schema_fields=fields,
        )
    snap = _snapshot(md, snapshot_id)
    # identity-partition column names (source-id -> schema name)
    id_to_name = {fid: name for fid, name, _ in fields}
    spec = next(
        (s for s in md.get("partition-specs", [])
         if s.get("spec-id") == md.get("default-spec-id")),
        {"fields": []},
    )
    partition_cols = [
        id_to_name[int(f["source-id"])]
        for f in spec.get("fields", [])
        if f.get("transform") == "identity" and int(f["source-id"]) in id_to_name
    ]

    data = _entries_rows(spark, table_dir, snap, md, content=0)
    files_total = len(data)
    files_pruned = 0
    if predicate is not None and data and predicate[0] in partition_cols:
        # PARTITION pruning: the value rides the manifest entry itself
        # (canonical-JSON part_key) — no stats decode needed, the cheapest
        # prune an identity-partitioned table offers
        col, lo, hi = predicate

        def p_survives(part_key: str) -> bool:
            v = (json.loads(part_key) or {}).get(col)
            if v is None:
                return True  # unknown partition value: keep
            if lo is not None and v < lo:
                return False
            if hi is not None and v > hi:
                return False
            return True

        kept = [(r, seq) for r, seq in data if p_survives(r.part_key)]
        files_pruned = files_total - len(kept)
        data = kept
    elif predicate is not None and data:
        col, lo, hi = predicate
        fid, ftype = next(
            (fid, t) for fid, name, t in fields if name == col
        )
        # per-file typed bounds for the predicate column, decoded from the
        # same distributed stats pass the column-health kernel uses
        from iceberg_meta_spark.sources.iceberg_native import (
            _stats_map_fn,
            _STATS_COLS,
        )

        bin_df = _manifest_bytes_df(spark, table_dir, snap["snapshot-id"], md)
        stats = (
            bin_df.mapInPandas(_stats_map_fn, _STATS_COLS)
            .where(F.col("field_id") == fid)
            .select("file_path", "lower_bound", "upper_bound")
            .collect()
        )
        bounds = {
            r.file_path: (
                decode_bound(bytes(r.lower_bound) if r.lower_bound is not None else None, ftype),
                decode_bound(bytes(r.upper_bound) if r.upper_bound is not None else None, ftype),
            )
            for r in stats
        }

        def survives(path: str) -> bool:
            b = bounds.get(path)
            if b is None or b[0] is None or b[1] is None:
                return True  # no bounds -> cannot prune safely
            fmin, fmax = b
            if lo is not None and fmax < lo:
                return False
            if hi is not None and fmin > hi:
                return False
            return True

        kept = [(r, seq) for r, seq in data if survives(r.file_path)]
        files_pruned = files_total - len(kept)
        data = kept

    deletes = _entries_rows(spark, table_dir, snap, md, content=1)
    pos, eq = [], []
    for r, seq in deletes:
        d = {"path": r.file_path, "seq": seq}
        if r.equality_ids:
            d["equality_ids"] = list(r.equality_ids)
            eq.append(d)
        else:
            pos.append(d)
    return ScanPlan(
        data_files=[
            {
                "path": r.file_path,
                "seq": seq,
                "record_count": r.record_count,
                "size": r.file_size_in_bytes,
                "part": json.loads(r.part_key) if r.part_key else {},
            }
            for r, seq in data
        ],
        position_deletes=pos,
        equality_deletes=eq,
        files_total=files_total,
        files_pruned=files_pruned,
        schema_fields=fields,
        partition_cols=partition_cols,
    )


def scan_table(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    version: int | None = None,
    predicate: tuple[str, object, object] | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Merge-on-read scan: plan -> read surviving parquet -> apply position
    and equality deletes -> (residual) filter. Returns the table's columns
    only; helper columns never escape. ``ref=`` addresses a branch/tag."""
    plan = plan_scan(spark, table_dir, snapshot_id, version, predicate, ref)
    ddl = ", ".join(
        f"`{name}` {_ICEBERG_TO_SPARK.get(t, 'string')}"
        for _, name, t in plan.schema_fields
    )
    if not plan.data_files:
        return spark.createDataFrame([], ddl)

    paths = [_norm_path(f["path"]) for f in plan.data_files]
    # mergeSchema: batches written before a column was added lack it; the
    # union schema keeps post-evolution batches' VALUES while older files
    # read NULL — without it Spark samples one file's schema and could
    # silently drop a newer batch's added column
    df = spark.read.option("mergeSchema", "true").parquet(*paths).select(
        "*",
        F.regexp_replace(F.col("_metadata.file_path"), r"^file:/*", "/").alias("__file"),
        F.col("_metadata.row_index").alias("__pos"),
    )
    # per-file data sequence number: tiny planning-index map, broadcast
    seq_df = spark.createDataFrame(
        [(_norm_path(f["path"]), f["seq"]) for f in plan.data_files],
        "__file string, __dseq long",
    )
    df = df.join(F.broadcast(seq_df), "__file")

    # identity-partition columns absent from the parquet itself (Hive-layout
    # writes keep them in the directory, engines keep them in METADATA):
    # inject each file's partition value from the plan — this is how real
    # scans serve partition columns, and it must happen BEFORE delete
    # application (an equality delete may key on a partition column)
    types_by_name = {name: t for _, name, t in plan.schema_fields}
    if plan.partition_cols:
        # per-FILE resolution: after partition evolution a column can be
        # physical in old files and Hive-virtual (directory-only) in new
        # ones, so coalesce the data column with the metadata value
        ddl_parts = ", ".join(
            f"`__part_{c}` "
            f"{_ICEBERG_TO_SPARK.get(types_by_name.get(c, 'string'), 'string')}"
            for c in plan.partition_cols
        )
        part_df = spark.createDataFrame(
            [
                tuple(
                    [_norm_path(f["path"])]
                    + [f["part"].get(c) for c in plan.partition_cols]
                )
                for f in plan.data_files
            ],
            f"__file string, {ddl_parts}",
        )
        df = df.join(F.broadcast(part_df), "__file")
        for c in plan.partition_cols:
            src = (
                F.coalesce(F.col(c), F.col(f"__part_{c}"))
                if c in df.columns
                else F.col(f"__part_{c}")
            )
            df = df.withColumn(c, src)

    if plan.position_deletes:
        pd_paths = [_norm_path(d["path"]) for d in plan.position_deletes]
        pd_seq = spark.createDataFrame(
            [(_norm_path(d["path"]), d["seq"]) for d in plan.position_deletes],
            "__dfile string, __delseq long",
        )
        pos = (
            spark.read.parquet(*pd_paths)
            .select(
                F.regexp_replace("file_path", r"^file:/*", "/").alias("__file"),
                F.col("pos").alias("__pos"),
                F.regexp_replace(F.col("_metadata.file_path"), r"^file:/*", "/").alias("__dfile"),
            )
            .join(F.broadcast(pd_seq), "__dfile")
            .select("__file", "__pos", "__delseq")
        )
        # spec: a position delete applies to data files with seq <= its own
        df = df.join(
            pos,
            (df["__file"] == pos["__file"])
            & (df["__pos"] == pos["__pos"])
            & (df["__dseq"] <= pos["__delseq"]),
            "left_anti",
        )

    # equality deletes, grouped by their equality_ids column set
    by_ids: dict[tuple[int, ...], list[dict]] = {}
    for d in plan.equality_deletes:
        by_ids.setdefault(tuple(sorted(d["equality_ids"])), []).append(d)
    id_to_name = {fid: name for fid, name, _ in plan.schema_fields}
    for ids, dels in sorted(by_ids.items()):
        cols = [id_to_name[i] for i in ids]
        e_paths = [_norm_path(d["path"]) for d in dels]
        e_seq = spark.createDataFrame(
            [(_norm_path(d["path"]), d["seq"]) for d in dels],
            "__dfile string, __delseq long",
        )
        eq = (
            spark.read.parquet(*e_paths)
            .select(
                *[F.col(c).alias(f"__eq_{c}") for c in cols],
                F.regexp_replace(F.col("_metadata.file_path"), r"^file:/*", "/").alias("__dfile"),
            )
            .join(F.broadcast(e_seq), "__dfile")
        )
        cond = df["__dseq"] < eq["__delseq"]  # strict, per spec
        for c in cols:
            cond = cond & (df[c] == eq[f"__eq_{c}"])
        df = df.join(eq, cond, "left_anti")

    # schema evolution on read: a column ADDED after a file was written is
    # absent from that parquet — surface it as NULL of the declared type
    # (name-based resolution: these files carry no parquet field-id
    # metadata, the id-based variant of the same rule)
    present = set(df.columns)
    out = df.select(
        *[
            F.col(name)
            if name in present
            else F.lit(None).cast(_ICEBERG_TO_SPARK.get(t, "string")).alias(name)
            for _, name, t in plan.schema_fields
        ]
    )
    if predicate is not None:
        col, lo, hi = predicate  # residual filter on top of file pruning
        if lo is not None:
            out = out.where(F.col(col) >= F.lit(lo))
        if hi is not None:
            out = out.where(F.col(col) <= F.lit(hi))
    return out
