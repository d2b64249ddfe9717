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
from collections import namedtuple
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.sources.iceberg_native import (
    _entries_map_fn,
    _ENTRY_COLS,
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


# table property carrying expired snapshots' sequence -> schema-id pairs
# (engine-internal durability extension; see plan_scan and
# iceberg_maintenance.apply_snapshot_removal)
SCHEMA_SEQ_LOG_PROP = "iceberg-meta.schema-seq-log"


def _norm_path(p: str) -> str:
    """file:///x, file:/x, ///x and /x all normalize to /x — the SAME form
    the Spark-side :func:`_norm_path_col` produces, so the ``__file``
    equi-joins match engine-written ``file://`` URIs too."""
    while p.startswith("file:"):
        p = p[len("file:"):]
    return "/" + p.lstrip("/")


def _norm_path_col(col):
    """Spark-side path canonicalization for ``_metadata.file_path`` and
    delete-file ``file_path`` columns: strip the ``file:`` scheme AND
    url-decode one layer — ``_metadata.file_path`` is URI-encoded on top
    of the on-disk name (a Hive-escaped dir ``k=a%3Db`` reads back as
    ``k=a%253Db``), while manifests store the on-disk path, which is the
    form ``spark.read.parquet`` can actually open. Literal ``+`` is
    protected before ``url_decode`` (which is x-www-form-urlencoded and
    would turn it into a space)."""
    c = F.regexp_replace(col, r"^file:/*", "/")
    c = F.regexp_replace(c, r"\+", "%2B")
    return F.url_decode(c)


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
    # v3 deletion vectors: puffin path, seq, referenced data file,
    # content_offset, content_size (one per referenced file — planning scale)
    deletion_vectors: list[dict] = field(default_factory=list)
    # v3 default-value columns (spec § Default values): fields of the
    # CURRENT schema carrying initial-default — {name, type, default};
    # each data_files dict lists in "default_absent" which of these were
    # not yet in the schema when the file was written (resolved via the
    # adding snapshot's schema-id), so the scan serves the default for
    # exactly those files' rows
    field_defaults: list[dict] = field(default_factory=list)
    # explicit promoted read-schema DDL when a column's type was WIDENED
    # (int->long / float->double); None = the usual mergeSchema union
    read_schema: str | None = None


_PLAN_COLS = (
    "file_path string, seq long, record_count long, "
    "file_size_in_bytes long, part_key string, equality_ids array<int>, "
    "file_format string, referenced_data_file string, "
    "content_offset long, content_size long, first_row_id long"
)

# Driver-side plan-entry record (attribute access like the collected Rows
# of the distributed path; field set = _PLAN_COLS).
_PlanEntry = namedtuple("_PlanEntry", [c.split()[0] for c in _PLAN_COLS.split(", ")])

# Manifest bytes at or below iceberg_native.DRIVER_PLAN_BYTES decode
# DRIVER-side (zero Spark jobs); above it, the distributed binaryFile +
# mapInPandas decode runs. Read dynamically from the native module so one
# knob (monkeypatch-able in tests) governs both decode layers.
from iceberg_meta_spark.sources import iceberg_native as _native  # noqa: E402
from iceberg_meta_spark.sources.localrel import local_frame  # noqa: E402


def _decode_plan_entries(
    content: bytes,
    path: str,
    mseq: dict,
    bounds_preds: list[tuple],
    part_preds: list[tuple],
) -> tuple[list[dict], int]:
    """Decode ONE manifest's bytes into (surviving plan-entry dicts,
    live-entry count before pruning) — the pure per-manifest kernel shared
    by the distributed Arrow decode (:func:`_make_plan_entries_fn`) and
    the driver-side small-metadata fast path (:func:`_plan_entries`), so
    the two paths cannot drift. Prunes in the same pass: only live entries
    that survive EVERY partition-value prune (``part_preds`` = [(col, lo,
    hi)] against the entry's own partition tuple) and EVERY zone-map prune
    (``bounds_preds`` = [(field_id, type, lo, hi)] against the entry's
    Appendix-D bounds) are emitted. Predicates AND together (a conjunction
    prunes a file when ANY conjunct excludes it). Sequence-number
    inheritance (null entry seq -> manifest seq) happens here too, via the
    tiny manifest_path -> seq map."""
    from iceberg_meta_spark.sources.iceberg_native import (
        _decode_manifest_entries,
        _kv_map,
        decode_bound,
    )

    def pruned(dfile: dict, part: dict) -> bool:
        for col, lo, hi in part_preds:
            v = part.get(col)
            # unknown/absent value (older spec, null): keep
            if v is not None:
                if lo is not None and v < lo:
                    return True
                if hi is not None and v > hi:
                    return True
        if bounds_preds:
            lb = _kv_map(dfile.get("lower_bounds"))
            ub = _kv_map(dfile.get("upper_bounds"))
            for fid, ftype, lo, hi in bounds_preds:
                fmin = decode_bound(
                    bytes(lb[fid]) if fid in lb else None, ftype
                )
                fmax = decode_bound(
                    bytes(ub[fid]) if fid in ub else None, ftype
                )
                # files without bounds cannot be pruned safely
                if fmin is None or fmax is None:
                    continue
                if lo is not None and fmax < lo:
                    return True
                if hi is not None and fmin > hi:
                    return True
        return False

    out, n_live = [], 0
    for e in _decode_manifest_entries(bytes(content), path):
        if e["status"] == 2:
            continue  # DELETED entries are not live
        n_live += 1
        dfile = e["data_file"]
        part = dfile.get("partition") or {}
        if pruned(dfile, part):
            continue
        seq = e["entry"].get("sequence_number")
        if seq is None:
            # inheritance: manifest seq, looked up by NORMALIZED
            # path — `path` here is the binaryFile URI
            # ('file:/x') while mseq keys come from the raw
            # manifest-list strings, so both sides normalize
            seq = mseq.get(_norm_path(path))
        eq = dfile.get("equality_ids")
        rdf = dfile.get("referenced_data_file")
        off = dfile.get("content_offset")
        csz = dfile.get("content_size_in_bytes")
        out.append(
            {
                "file_path": dfile["file_path"],
                "seq": int(seq) if seq is not None else 0,
                "record_count": int(dfile["record_count"]),
                "file_size_in_bytes": int(dfile["file_size_in_bytes"]),
                "part_key": json.dumps(part, sort_keys=True, default=str),
                "equality_ids": [int(i) for i in eq] if eq else None,
                "file_format": str(
                    dfile.get("file_format", "")
                ).upper(),
                "referenced_data_file": rdf,
                "content_offset": int(off) if off is not None else None,
                "content_size": int(csz) if csz is not None else None,
                # v3 row lineage (field-id 142); None for files
                # written before lineage (or v2 manifests)
                "first_row_id": (
                    int(dfile["first_row_id"])
                    if dfile.get("first_row_id") is not None
                    else None
                ),
            }
        )
    return out, n_live


def _make_plan_entries_fn(
    mseq: dict,
    bounds_preds: list[tuple],
    part_preds: list[tuple],
):
    """Arrow-batched wrapper over :func:`_decode_plan_entries` for the
    DISTRIBUTED manifest decode: the driver collects a post-prune planning
    index, never the full file list — at 10^8 manifest entries the
    pre-prune list never materializes anywhere."""

    def fn(pdf_iter):
        import pandas as pd

        cols = [c.split()[0] for c in _PLAN_COLS.split(", ")]
        for pdf in pdf_iter:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows, _ = _decode_plan_entries(
                    bytes(content), path, mseq, bounds_preds, part_preds
                )
                out.extend(rows)
            yield pd.DataFrame(out, columns=cols)

    return fn


def _plan_entries(
    spark: SparkSession,
    table_dir: str,
    snap: dict,
    md: dict,
    content: int,
    bounds_preds: list[tuple] = (),
    part_preds: list[tuple] = (),
):
    """(surviving live entries, live-entry total) for one manifest content
    kind. The total comes from the manifest LIST's required added/existing
    counts (planning index, no decode); decode + prune + seq inheritance
    all run inside one Arrow pass, so the driver only ever holds
    post-prune entries.

    Scale-adaptive decode placement: the manifest list carries every
    manifest's byte length, so the TOTAL decode size is known before any
    work. Small metadata (<= $SPARK_GRAFT_DRIVER_PLAN_BYTES, default
    32 MB — KBs for typical tables) decodes DRIVER-side with the same
    per-manifest kernel, zero Spark jobs; past the threshold (a 100 TB
    table's thousands of manifests) the distributed binaryFile +
    mapInPandas path runs unchanged. This is Iceberg's own planning
    posture (driver plans by default, distributed planning for huge
    metadata), parameterized instead of hard-coded."""
    from iceberg_meta_spark.sources.iceberg_native import (
        _as_local,
        _mf_int,
    )

    mlist = _read_avro_file(spark, snap["manifest-list"])
    mine = [r for r in mlist if int(r.get("content", 0)) == content]
    mseq = {_norm_path(r["manifest_path"]): r.get("sequence_number")
            for r in mine}
    live_total: int | None = 0
    for r in mine:
        a = _mf_int(r, "added_files_count", "added_data_files_count")
        x = _mf_int(r, "existing_files_count", "existing_data_files_count")
        if a is None or x is None:
            live_total = None  # pre-v2 writer without counts: fall back
            break
        live_total += a + x

    if not mine:
        return [], 0
    paths = [r["manifest_path"] for r in mine]
    local = [_as_local(p) for p in paths]
    total_bytes = sum(int(r.get("manifest_length") or 0) for r in mine)
    if all(lp is not None for lp in local) and total_bytes <= _native.DRIVER_PLAN_BYTES:
        rows_d: list[dict] = []
        n_live = 0
        for p, lp in zip(paths, local):
            with open(lp, "rb") as fh:
                decoded, live = _decode_plan_entries(
                    fh.read(), p, mseq, list(bounds_preds), list(part_preds)
                )
            rows_d.extend(decoded)
            n_live += live
        if live_total is None:
            live_total = n_live
        return [_PlanEntry(**d) for d in rows_d], live_total

    # paths are already in hand from the manifest list above — read them
    # directly instead of re-loading metadata + manifest list (ADVICE r12)
    bin_df = (
        spark.read.format("binaryFile").load(paths).select("path", "content")
    )
    fn = _make_plan_entries_fn(mseq, list(bounds_preds), list(part_preds))
    rows = bin_df.mapInPandas(fn, _PLAN_COLS).collect()
    if live_total is None:
        if not bounds_preds and not part_preds:
            live_total = len(rows)
        else:  # rare: counts absent AND pruning on — one distributed count
            live_total = (
                bin_df.mapInPandas(_entries_map_fn, _ENTRY_COLS)
                .where(F.col("status") != 2)
                .count()
            )
    return rows, live_total


def plan_scan(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    version: int | None = None,
    predicate: tuple[str, object, object] | list[tuple] | None = None,
    ref: str | None = None,
) -> ScanPlan:
    """Build the file index for a snapshot scan; see module docstring.

    ``predicate=(column, lo, hi)`` — or a LIST of such tuples, ANDed —
    prunes data files by their decoded min/max bounds per column (closed
    intervals; ``None`` for an open end); a conjunction prunes a file
    when ANY conjunct excludes it. Files without bounds are
    conservatively kept.
    Identity-partition columns prune on the partition VALUE from the
    manifest entry instead (cheaper: no stats decode). Partition-column
    names resolve against the DEFAULT spec; entries written under an
    older spec (partition evolution) keep their own part_key shape and
    are conservatively kept by the value prune (absent key -> survive).

    Pruning runs INSIDE the distributed manifest decode (r9): the driver
    collects only the SURVIVING entries — at 10^8 manifest entries the
    pre-prune list never materializes anywhere; ``files_total`` comes from
    the manifest list's required added/existing counts instead.
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
    # default-spec partition fields: (field name, transform, source name,
    # source type); identity sources double as the scan's injection list
    id_to_name = {fid: name for fid, name, _ in fields}
    type_by_name = {name: t for _, name, t in fields}
    spec = next(
        (s for s in md.get("partition-specs", [])
         if s.get("spec-id") == md.get("default-spec-id")),
        {"fields": []},
    )
    spec_fields = [
        (f["name"], f.get("transform", "identity"),
         id_to_name[int(f["source-id"])],
         type_by_name[id_to_name[int(f["source-id"])]])
        for f in spec.get("fields", [])
        if int(f["source-id"]) in id_to_name
    ]
    partition_cols = [
        src for _, transform, src, _ in spec_fields if transform == "identity"
    ]
    # identity sources of OLDER specs too (partition evolution, incl. DROP
    # PARTITION FIELD): a file written under an old identity spec carries
    # that column's values ONLY in its manifest partition tuple — the
    # injection must cover it even after the field left the default spec.
    # Files whose own tuple lacks the key inject None and coalesce with
    # the data column, so newer (post-drop) files are untouched.
    for old_spec in md.get("partition-specs", []):
        if old_spec.get("spec-id") == md.get("default-spec-id"):
            continue
        for f in old_spec.get("fields", []):
            src = id_to_name.get(int(f["source-id"]))
            if (f.get("transform", "identity") == "identity"
                    and src is not None and src not in partition_cols):
                partition_cols.append(src)

    # a single (col, lo, hi) or a LIST of them (conjunction: AND)
    predicates = (
        [] if predicate is None
        else [predicate] if isinstance(predicate, tuple)
        else list(predicate)
    )
    part_preds, bounds_preds = [], []
    if predicates:
        from iceberg_meta_spark.sources.iceberg_transforms import project_range

    for col, lo, hi in predicates:
        # PARTITION pruning first (cheapest: the value rides the manifest
        # entry, no stats decode). For a transformed field the predicate is
        # PROJECTED through the transform (spec § scan planning: monotonic
        # transforms map interval endpoints; bucket projects equality only)
        part_pred = None
        for fname, transform, src, styp in spec_fields:
            if src != col:
                continue
            proj = project_range(transform, lo, hi, styp)
            if proj is not None:
                part_pred = (fname, proj[0], proj[1])
                part_preds.append(part_pred)
                break
        identity_part = part_pred is not None and part_pred[0] == col and any(
            t == "identity" and s == col for _, t, s, _ in spec_fields
        )
        if not identity_part:
            # zone-map prune on the source column's decoded bounds — layered
            # UNDER the (coarser) transformed-partition prune when both
            # apply; identity partitions skip it (value == partition value)
            fid, ftype = next((fid, t) for fid, name, t in fields if name == col)
            if ftype in ("int", "long", "float", "double", "string", "boolean"):
                bounds_preds.append((fid, ftype, lo, hi))

    data, live_total = _plan_entries(
        spark, table_dir, snap, md, content=0,
        bounds_preds=bounds_preds, part_preds=part_preds,
    )
    if not predicates:
        files_total, files_pruned = len(data), 0
    else:
        files_total = live_total
        files_pruned = files_total - len(data)

    deletes, _ = _plan_entries(spark, table_dir, snap, md, content=1)
    pos, eq, dvs = [], [], []
    for r in deletes:
        d = {"path": r.file_path, "seq": r.seq}
        if r.equality_ids:
            d["equality_ids"] = list(r.equality_ids)
            eq.append(d)
        elif r.file_format == "PUFFIN":
            # v3 deletion vector: one roaring bitmap of positions per
            # referenced data file, random-access inside the Puffin file
            d["referenced_data_file"] = r.referenced_data_file
            d["offset"] = r.content_offset
            d["length"] = r.content_size
            dvs.append(d)
        else:
            pos.append(d)
    # v3 default-value columns: which CURRENT-schema defaulted fields were
    # absent when each file was written — per-file resolution through the
    # adding snapshot's schema-id (file seq -> snapshot -> schema), the
    # id-based presence rule the spec prescribes. Unknown seq (expired
    # history) is conservative: field treated as present, NULLs stay NULL.
    field_defaults = [
        {"name": f["name"], "type": f["type"], "default": f["initial-default"],
         "id": int(f["id"])}
        for f in schema["fields"]
        if f.get("initial-default") is not None
    ]
    # renamed columns: a rename keeps the FIELD ID (spec § Schema
    # Evolution) but our parquet files resolve by NAME, so a file written
    # under the old schema stores the old column name — map each current
    # field id to the name it had in the file's write-time schema, and let
    # the scan read the old name per file (the id-based resolution rule,
    # reconstructed through the schema history).
    current_names = {int(f["id"]): f["name"] for f in schema["fields"]}
    current_types = {int(f["id"]): f["type"] for f in schema["fields"]}
    multi_schema = len(md.get("schemas", [])) > 1
    absent_by_seq: dict[int, list[str]] = {}
    renames_by_seq: dict[int, dict[str, str]] = {}
    widened = False
    hist_names: dict[str, str] = {}  # every name a current field ever had
    # name -> owning field id across the schema history; a NAME ever
    # claimed by two different current fields (drop-then-re-add, swapped
    # renames) makes the widened-table explicit read schema ambiguous —
    # an old file's column could be declared at the WRONG field's type.
    # Ambiguity falls back to the mergeSchema path, whose int32-vs-int64
    # union refuses LOUDLY instead of decoding garbage.
    name_owner: dict[str, int] = {}
    ambiguous_names = False
    if field_defaults or multi_schema:
        schemas_by_id = {s["schema-id"]: s for s in md.get("schemas", [])}
        for ws in md.get("schemas", []):
            for fl in ws["fields"]:
                fid = int(fl["id"])
                if fid in current_types:
                    if name_owner.setdefault(fl["name"], fid) != fid:
                        ambiguous_names = True
                    hist_names[fl["name"]] = current_types[fid]
                    if (fl["type"] != current_types[fid]
                            and isinstance(fl["type"], str)
                            and isinstance(current_types[fid], str)):
                        # a historical schema carries this field NARROWER:
                        # the type was widened (int->long / float->double)
                        widened = True
        def note(seq_key: int, ws: dict) -> None:
            write_names = {int(fl["id"]): fl["name"] for fl in ws["fields"]}
            if field_defaults:
                absent_by_seq[seq_key] = [
                    d["name"] for d in field_defaults
                    if d["id"] not in write_names
                ]
            ren = {
                cur: write_names[fid]
                for fid, cur in current_names.items()
                if fid in write_names and write_names[fid] != cur
            }
            if ren:
                renames_by_seq[seq_key] = ren

        for s in md.get("snapshots", []):
            ws = schemas_by_id.get(s.get("schema-id"))
            if ws is None:
                continue
            note(int(s.get("sequence-number", 0)), ws)
        # DURABLE seq -> write-schema resolution (r12, advisor r11 #2):
        # expire_snapshots records each dropped snapshot's (sequence ->
        # schema-id) pair in the schema-seq-log table property, so files
        # whose ADDING snapshot was expired still resolve their
        # write-time renames and default-absence — without it, a rename +
        # expiry would silently read pre-rename files as NULL. Retained
        # snapshots win over the log (they are the live source of truth).
        log = (md.get("properties") or {}).get(SCHEMA_SEQ_LOG_PROP)
        if log:
            seen_seqs = set(absent_by_seq) | set(renames_by_seq)
            for seq_s, sid in json.loads(log).items():
                ws = schemas_by_id.get(int(sid))
                if ws is not None and int(seq_s) not in seen_seqs:
                    note(int(seq_s), ws)
    # Explicit read schema whenever the declared schema is all-primitive
    # and name-unambiguous: the planner already KNOWS the schema, so
    # handing it to the reader skips the per-query footer
    # inference/merge pass (mergeSchema launches a distributed
    # footer-read job per scan). Semantics are unchanged: columns a file
    # lacks read NULL (name-based resolution), WIDENED tables read
    # narrow files through the vectorized reader's legal upcast
    # (mergeSchema would refuse that int32-vs-int64 union), and every
    # name a current field ever had (renames) is included so per-file
    # old-name resolution still sees the old columns. Ambiguous name
    # reuse or non-primitive columns keep the mergeSchema path — a
    # widened table there would fail the merge loudly, never silently.
    read_schema = None
    if not ambiguous_names and all(
        isinstance(t, str) and t in _ICEBERG_TO_SPARK
        for t in current_types.values()
    ):
        # hist_names covers every (historical) name of a current field;
        # it is only built for multi-schema/defaults tables — a
        # single-schema table reads with its current fields directly
        names = (
            dict(sorted(hist_names.items()))
            if hist_names
            else {name: t for _, name, t in fields}
        )
        if all(
            isinstance(t, str) and t in _ICEBERG_TO_SPARK
            for t in names.values()
        ):
            read_schema = ", ".join(
                f"`{n}` {_ICEBERG_TO_SPARK[t]}" for n, t in names.items()
            )

    return ScanPlan(
        data_files=[
            {
                "path": r.file_path,
                "seq": r.seq,
                "record_count": r.record_count,
                "size": r.file_size_in_bytes,
                "part": json.loads(r.part_key) if r.part_key else {},
                "first_row_id": r.first_row_id,
                "default_absent": absent_by_seq.get(int(r.seq), []),
                "renamed": renames_by_seq.get(int(r.seq), {}),
            }
            for r in data
        ],
        position_deletes=pos,
        equality_deletes=eq,
        files_total=files_total,
        files_pruned=files_pruned,
        schema_fields=fields,
        partition_cols=partition_cols,
        deletion_vectors=dvs,
        field_defaults=field_defaults,
        read_schema=read_schema,
    )


def _pos_delete_frame(spark: SparkSession, deletes: list[dict]) -> DataFrame:
    """(__file, __pos, __delseq) rows of the given position-delete files —
    ONE canonical builder shared by :func:`_merged_rows` and
    :func:`scan_changes` so the path normalization cannot drift: the
    stored ``file_path`` VALUES are the canonical on-disk form
    (scheme-strip only; url-decoding again would corrupt Hive-escaped
    names), while ``_metadata.file_path`` is URI-encoded and decodes one
    layer (:func:`_norm_path_col`) to match the broadcast seq map."""
    pd_seq = local_frame(
        spark,
        [(_norm_path(d["path"]), d["seq"]) for d in deletes],
        "__dfile string, __delseq long",
    )
    # explicit schema: a position-delete file's layout is fixed by the spec
    # (file_path string, pos long — the optional `row` payload is never
    # consumed), so schema inference's footer read is pure overhead
    return (
        spark.read.schema("file_path string, pos long")
        .parquet(*[_norm_path(d["path"]) for d in deletes])
        .select(
            F.regexp_replace("file_path", r"^file:/*", "/").alias("__file"),
            F.col("pos").alias("__pos"),
            _norm_path_col(F.col("_metadata.file_path")).alias("__dfile"),
        )
        .join(F.broadcast(pd_seq), "__dfile")
        .select("__file", "__pos", "__delseq")
    )


def _dv_delete_frame(spark: SparkSession, dvs: list[dict]) -> DataFrame:
    """(__file, __pos, __delseq) rows decoded from v3 deletion vectors —
    the DV sibling of :func:`_pos_delete_frame`. The DESCRIPTORS (one per
    referenced data file) are planning-index scale and parallelize over
    executors; the POSITIONS (up to millions per file at 100 TB) decode
    inside an Arrow-batched mapInPandas via random-access reads of each
    blob's [content_offset, content_offset+content_size) byte range, so
    they never materialize on the driver."""
    desc = local_frame(
        spark,
        [
            (
                _norm_path(d["path"]),
                _norm_path(d["referenced_data_file"]),
                int(d["offset"]),
                int(d["length"]),
                int(d["seq"]),
            )
            for d in dvs
        ],
        "puffin string, __file string, off long, len long, __delseq long",
    )

    def decode(pdf_iter):
        import pandas as pd

        from iceberg_meta_spark.sources.iceberg_dv import read_dv_positions

        for pdf in pdf_iter:
            for puffin, file_, off, ln, seq in zip(
                pdf["puffin"], pdf["__file"], pdf["off"], pdf["len"],
                pdf["__delseq"],
            ):
                positions = read_dv_positions(puffin, int(off), int(ln))
                yield pd.DataFrame({
                    "__file": file_,
                    "__pos": positions,
                    "__delseq": int(seq),
                })

    # spread descriptors so decodes parallelize (len(dvs) is already
    # driver-side — it built the frame)
    return desc.repartition(max(len(dvs) // 4, 1)).mapInPandas(
        decode, "__file string, __pos long, __delseq long"
    )


def _eq_delete_frames(
    spark: SparkSession, deletes: list[dict], id_to_name: dict
):
    """Yield (key columns, rows-with-``__delseq`` frame) per equality-id
    set — the eq-delete sibling of :func:`_pos_delete_frame`, same
    sharing rationale and path rules."""
    by_ids: dict[tuple[int, ...], list[dict]] = {}
    for d in deletes:
        by_ids.setdefault(tuple(sorted(d["equality_ids"])), []).append(d)
    for ids, dels in sorted(by_ids.items()):
        cols = [id_to_name[i] for i in ids]
        e_seq = local_frame(
            spark,
            [(_norm_path(d["path"]), d["seq"]) for d in dels],
            "__dfile string, __delseq long",
        )
        eq = (
            spark.read.parquet(*[_norm_path(d["path"]) for d in dels])
            .select(
                *[F.col(c).alias(f"__eq_{c}") for c in cols],
                _norm_path_col(F.col("_metadata.file_path")).alias("__dfile"),
            )
            .join(F.broadcast(e_seq), "__dfile")
        )
        yield cols, eq


def _merged_rows(
    spark: SparkSession,
    plan: ScanPlan,
    data_files: list[dict],
    keep_helpers: bool = False,
    keep_lineage_cols: bool = False,
) -> DataFrame | None:
    """Read ``data_files`` (a subset of ``plan.data_files``) and apply the
    plan's position + equality deletes — the merge-on-read core shared by
    :func:`scan_table`, the compaction rewrite (which reads each small-file
    group through this so pending deletes are ABSORBED), and the changelog
    scan. Returns None when ``data_files`` is empty. With ``keep_helpers``
    the ``__file``/``__pos``/``__dseq`` columns survive (the changelog scan
    joins new delete files against them); otherwise the projection keeps
    the table's declared columns only. ``keep_lineage_cols`` additionally
    carries MATERIALIZED ``_row_id`` / ``_last_updated_sequence_number``
    parquet columns (written by lineage-preserving rewrites) through the
    projection as ``__mat_row_id`` / ``__mat_lus`` — NULL for files that
    carry none, so :func:`_with_lineage_columns` can apply the spec's
    materialized-over-derived precedence."""
    if not data_files:
        return None
    paths = [_norm_path(f["path"]) for f in data_files]
    # mergeSchema: batches written before a column was added lack it; the
    # union schema keeps post-evolution batches' VALUES while older files
    # read NULL — without it Spark samples one file's schema and could
    # silently drop a newer batch's added column. A WIDENED table instead
    # reads with the plan's explicit promoted schema (mergeSchema refuses
    # int32-vs-int64 unions; the explicit wide schema legally upcasts —
    # extended with the lineage columns when requested, since an explicit
    # schema would otherwise drop them).
    read_schema = getattr(plan, "read_schema", None)
    if read_schema and keep_lineage_cols:
        read_schema += (", `_row_id` bigint, "
                        "`_last_updated_sequence_number` bigint")
    reader = (
        spark.read.schema(read_schema)
        if read_schema
        else spark.read.option("mergeSchema", "true")
    )
    df = reader.parquet(*paths).select(
        "*",
        _norm_path_col(F.col("_metadata.file_path")).alias("__file"),
        F.col("_metadata.row_index").alias("__pos"),
    )
    # ONE combined per-file planning-index map, broadcast-joined once: the
    # data sequence number, identity-partition values, rename sources, and
    # default-absence flags all key on __file, so carrying them in a single
    # broadcast join replaces what used to be up to four separate joins
    # (each a broadcast-build job + an extra plan node). The map is one row
    # per surviving file — planning-index scale at any table size. The
    # column LOGIC below stays in its original order (partition injection
    # before delete application; rename/default resolution after), which
    # joins of per-file constants commute with.
    types_by_name = {name: t for _, name, t in plan.schema_fields}
    rename_files = [f for f in data_files if f.get("renamed")]
    renamed_cols = sorted({c for f in rename_files for c in f["renamed"]})
    with_defaults = plan.field_defaults and any(
        f.get("default_absent") for f in data_files
    )
    map_ddl = ["__file string", "__dseq long"]
    map_ddl += [
        f"`__part_{c}` "
        f"{_ICEBERG_TO_SPARK.get(types_by_name.get(c, 'string'), 'string')}"
        for c in plan.partition_cols
    ]
    map_ddl += [f"`__src_{c}` string" for c in renamed_cols]
    if with_defaults:
        map_ddl += [f"`__dfl_{d['name']}` boolean" for d in plan.field_defaults]
    map_rows = []
    for f in data_files:
        row = [_norm_path(f["path"]), f["seq"]]
        row += [f["part"].get(c) for c in plan.partition_cols]
        row += [(f.get("renamed") or {}).get(c) for c in renamed_cols]
        if with_defaults:
            absent = set(f.get("default_absent") or [])
            row += [d["name"] in absent for d in plan.field_defaults]
        map_rows.append(tuple(row))
    file_map = local_frame(spark, map_rows, ", ".join(map_ddl))
    df = df.join(F.broadcast(file_map), "__file")

    # identity-partition columns absent from the parquet itself (Hive-layout
    # writes keep them in the directory, engines keep them in METADATA):
    # inject each file's partition value from the plan — this is how real
    # scans serve partition columns, and it must happen BEFORE delete
    # application (an equality delete may key on a partition column).
    # Per-FILE resolution: after partition evolution a column can be
    # physical in old files and Hive-virtual (directory-only) in new
    # ones, so coalesce the data column with the metadata value.
    for c in plan.partition_cols:
        src = (
            F.coalesce(F.col(c), F.col(f"__part_{c}"))
            if c in df.columns
            else F.col(f"__part_{c}")
        )
        df = df.withColumn(c, src)

    if plan.position_deletes:
        pos = _pos_delete_frame(spark, plan.position_deletes)
        # spec: a position delete applies to data files with seq <= its own
        df = df.join(
            pos,
            (df["__file"] == pos["__file"])
            & (df["__pos"] == pos["__pos"])
            & (df["__dseq"] <= pos["__delseq"]),
            "left_anti",
        )

    if plan.deletion_vectors:
        # v3 DVs carry the same position-delete visibility rule
        dv = _dv_delete_frame(spark, plan.deletion_vectors)
        df = df.join(
            dv,
            (df["__file"] == dv["__file"])
            & (df["__pos"] == dv["__pos"])
            & (df["__dseq"] <= dv["__delseq"]),
            "left_anti",
        )

    id_to_name = {fid: name for fid, name, _ in plan.schema_fields}
    for cols, eq in _eq_delete_frames(spark, plan.equality_deletes, id_to_name):
        cond = df["__dseq"] < eq["__delseq"]  # strict, per spec
        for c in cols:
            # null-safe: an equality delete with NULL in a column deletes
            # rows whose column IS NULL (spec: "equality delete files ...
            # null values match"), which plain == would never match
            cond = cond & df[c].eqNullSafe(eq[f"__eq_{c}"])
        df = df.join(eq, cond, "left_anti")

    # renamed columns: a file written before RENAME COLUMN stores the OLD
    # name (name-based parquet, no field ids), so each current column
    # whose name changed reads from its file's write-time name — the
    # per-file source names ride the combined file_map join above, one
    # CASE per renamed column (the id-based resolution every engine does,
    # reconstructed through the schema history; old names per field are
    # bounded by the schema log, driver-side planning data).
    if rename_files:
        for c in renamed_cols:
            expr = F.col(c) if c in df.columns else F.lit(None)
            for old in sorted({f["renamed"][c] for f in rename_files
                               if c in f["renamed"]}):
                old_col = F.col(old) if old in df.columns else F.lit(None)
                expr = F.when(F.col(f"__src_{c}") == old, old_col) \
                    .otherwise(expr)
            df = df.withColumn(c, expr)

    # v3 default-value columns: rows of files written BEFORE a defaulted
    # column existed serve its initial-default; newer files' explicit
    # NULLs stay NULL. Per-file flags ride the combined file_map join
    # above (the partition-injection idiom) — zero extra scan passes.
    if with_defaults:
        for d in plan.field_defaults:
            spark_t = _ICEBERG_TO_SPARK.get(d["type"], "string")
            cur = (F.col(d["name"]) if d["name"] in df.columns
                   else F.lit(None).cast(spark_t))
            df = df.withColumn(
                d["name"],
                F.when(F.col(f"__dfl_{d['name']}"),
                       F.lit(d["default"]).cast(spark_t)).otherwise(cur),
            )

    # schema evolution on read: a column ADDED after a file was written is
    # absent from that parquet — surface it as NULL of the declared type
    # (name-based resolution: these files carry no parquet field-id
    # metadata, the id-based variant of the same rule)
    present = set(df.columns)
    cols = [
        F.col(name)
        if name in present
        else F.lit(None).cast(_ICEBERG_TO_SPARK.get(t, "string")).alias(name)
        for _, name, t in plan.schema_fields
    ]
    if keep_helpers:
        cols += [F.col("__file"), F.col("__pos"), F.col("__dseq")]
    if keep_lineage_cols:
        # materialized lineage (spec § Row Lineage: readers use a file's
        # written _row_id/_last_updated_sequence_number when present,
        # deriving only for nulls) — absent from every file reads NULL
        cols += [
            (F.col("_row_id") if "_row_id" in present
             else F.lit(None).cast("long")).alias("__mat_row_id"),
            (F.col("_last_updated_sequence_number")
             if "_last_updated_sequence_number" in present
             else F.lit(None).cast("long")).alias("__mat_lus"),
        ]
    return df.select(*cols)


def _with_lineage_columns(
    spark: SparkSession,
    out: DataFrame,
    data_files: list[dict],
    keep_helpers: bool = False,
) -> DataFrame:
    """Append the v3 lineage metadata columns to a helper-carrying frame
    (from ``_merged_rows(keep_helpers=True, keep_lineage_cols=True)``):
    ``_row_id`` = the file's materialized value when written, else
    committed ``first_row_id`` + position; ``_last_updated_sequence_
    number`` = materialized value else the carrying file's data sequence.
    One broadcast map join on ``__file`` — zero extra scan passes. Shared
    by the lineage scan and the lineage-preserving compaction rewrite."""
    frid_df = local_frame(
        spark,
        [(_norm_path(f["path"]),
          int(f["first_row_id"]) if f.get("first_row_id") is not None
          else None)
         for f in data_files],
        "__file string, __frid long",
    )
    out = out.join(F.broadcast(frid_df), "__file")
    rid = F.col("__frid") + F.col("__pos")
    lus = F.col("__dseq")
    if "__mat_row_id" in out.columns:
        rid = F.coalesce(F.col("__mat_row_id"), rid)
    if "__mat_lus" in out.columns:
        lus = F.coalesce(F.col("__mat_lus"), lus)
    out = (out.withColumn("_row_id", rid)
           .withColumn("_last_updated_sequence_number", lus))
    drop = ["__frid", "__mat_row_id", "__mat_lus"]
    if not keep_helpers:
        drop += ["__file", "__pos", "__dseq"]
    return out.drop(*[c for c in drop if c in out.columns])


def scan_table(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    version: int | None = None,
    predicate: tuple[str, object, object] | list[tuple] | None = None,
    ref: str | None = None,
    lineage: bool = False,
) -> DataFrame:
    """Merge-on-read scan: plan -> read surviving parquet -> apply position
    and equality deletes -> (residual) filter. Returns the table's columns
    only; helper columns never escape. ``ref=`` addresses a branch/tag.

    ``lineage=True`` (v3 row lineage, spec § Row Lineage) appends the two
    metadata columns engines derive on demand:

    - ``_row_id`` — the row's stable identifier: the file's committed
      ``first_row_id`` (manifest field 142) + the row's position. NULL for
      files written before lineage (v2 manifests / pre-upgrade files),
      exactly the spec's inheritance default.
    - ``_last_updated_sequence_number`` — the sequence number that last
      wrote the row; with copy-on-write rewrites and MoR deletes (rows are
      removed, never updated in place) that is the carrying file's data
      sequence number.

    Both derive from the per-file planning index (a broadcast map join on
    ``__file``) + the parquet row position — zero extra scan passes."""
    plan = plan_scan(spark, table_dir, snapshot_id, version, predicate, ref)
    out = _merged_rows(spark, plan, plan.data_files,
                       keep_helpers=bool(lineage),
                       keep_lineage_cols=bool(lineage))
    if out is None:
        ddl = ", ".join(
            f"`{name}` {_ICEBERG_TO_SPARK.get(t, 'string')}"
            for _, name, t in plan.schema_fields
        )
        if lineage:
            ddl += ", `_row_id` bigint, `_last_updated_sequence_number` bigint"
        return spark.createDataFrame([], ddl)
    if lineage:
        out = _with_lineage_columns(spark, out, plan.data_files)
    predicates = (
        [] if predicate is None
        else [predicate] if isinstance(predicate, tuple)
        else list(predicate)
    )
    for col, lo, hi in predicates:  # residual filters on top of pruning
        if lo is not None:
            out = out.where(F.col(col) >= F.lit(lo))
        if hi is not None:
            out = out.where(F.col(col) <= F.lit(hi))
    return out


def scan_changes(
    spark: SparkSession,
    table_dir: str,
    from_snapshot_id: int | None = None,
    to_snapshot_id: int | None = None,
    from_version: int | None = None,
    to_version: int | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Native changelog read (CDC): row-level changes between two snapshots
    of a native table — the table-format sibling of J1's FILE diff
    (operators/diff.py) and the row-level upgrade of the reference's watch
    loop (cli.py:980-1023, which stops at snapshot detection). Returns the
    TO side's columns plus ``_change_type`` ('insert' | 'delete'):

    - rows of data files ADDED in the interval, as visible at the TO
      snapshot (its deletes applied)            -> insert
    - rows of data files REMOVED in the interval, as visible at the FROM
      snapshot                                  -> delete
    - rows of files present in BOTH killed by position/equality delete
      files COMMITTED in the interval (semi-join of the FROM-visible rows
      against only the NEW delete files, same seq rules as the scan)
                                                -> delete

    Everything is distributed: file-set diffs are planning-index work, row
    reads ride :func:`_merged_rows`, and the new-delete application is the
    scan's own join shapes with ``left_semi`` instead of ``left_anti``.

    ``key_cols`` (Iceberg's identifier fields, the create_changelog_view
    ``compute updates`` mode) upgrades the raw insert/delete stream:

    - CARRY-OVER rows — a delete and an insert identical on EVERY column
      (what compaction/rewrite emits) — are eliminated pairwise
      (multiset semantics, ``exceptAll``/``intersectAll``), so a replace
      snapshot in the interval nets to zero changes;
    - a remaining delete whose KEY also appears among the remaining
      inserts becomes ``update_before``, its insert ``update_after``;
      unmatched rows keep plain ``insert`` / ``delete``.

    One extra shuffle on the key (the same cost engines pay). Like
    Iceberg's ComputeUpdateIterator, pairing assumes ONE change per key in
    the interval — and that assumption is ENFORCED: a key appearing more
    than once among the surviving deletes, or more than once among the
    surviving inserts, raises a guided ValueError (narrow the snapshot
    interval until each key changes at most once) instead of silently
    mispairing update_before/update_after rows. The guard is one
    aggregate job over the interval's own changes (not the table).

    Caveat, stated plainly: like a raw file-based changelog, a ``replace``
    snapshot (compaction/manifest rewrite) in the interval surfaces its
    rewritten rows as delete+insert pairs of identical rows (net zero)
    WITHOUT ``key_cols``; pass keys (or compose with snapshot-summary
    filtering) when that matters.
    """
    plan1 = plan_scan(spark, table_dir, snapshot_id=from_snapshot_id,
                      version=from_version)
    plan2 = plan_scan(spark, table_dir, snapshot_id=to_snapshot_id,
                      version=to_version)
    names = [n for _, n, _ in plan2.schema_fields]
    ddl = ", ".join(
        f"`{n}` {_ICEBERG_TO_SPARK.get(t, 'string')}"
        for _, n, t in plan2.schema_fields
    ) + ", `_change_type` string"

    p1 = {f["path"] for f in plan1.data_files}
    p2 = {f["path"] for f in plan2.data_files}
    added = [f for f in plan2.data_files if f["path"] not in p1]
    removed = [f for f in plan1.data_files if f["path"] not in p2]
    common = [f for f in plan1.data_files if f["path"] in p2]

    parts: list[DataFrame] = []
    ins = _merged_rows(spark, plan2, added)
    if ins is not None:
        parts.append(ins.withColumn("_change_type", F.lit("insert")))
    rem = _merged_rows(spark, plan1, removed)
    if rem is not None:
        parts.append(rem.withColumn("_change_type", F.lit("delete")))

    pos_seen = {d["path"] for d in plan1.position_deletes}
    eq_seen = {d["path"] for d in plan1.equality_deletes}
    dv_seen = {(d["path"], d["offset"]) for d in plan1.deletion_vectors}
    new_pos = [d for d in plan2.position_deletes if d["path"] not in pos_seen]
    new_eq = [d for d in plan2.equality_deletes if d["path"] not in eq_seen]
    new_dv = [d for d in plan2.deletion_vectors
              if (d["path"], d["offset"]) not in dv_seen]
    if common and (new_pos or new_eq or new_dv):
        base = _merged_rows(spark, plan1, common, keep_helpers=True)
        killed: list[DataFrame] = []
        if new_pos:
            pos = _pos_delete_frame(spark, new_pos)
            killed.append(base.join(
                pos,
                (base["__file"] == pos["__file"])
                & (base["__pos"] == pos["__pos"])
                & (base["__dseq"] <= pos["__delseq"]),
                "left_semi",
            ))
        if new_dv:
            dv = _dv_delete_frame(spark, new_dv)
            killed.append(base.join(
                dv,
                (base["__file"] == dv["__file"])
                & (base["__pos"] == dv["__pos"])
                & (base["__dseq"] <= dv["__delseq"]),
                "left_semi",
            ))
        id_to_name = {fid: n for fid, n, _ in plan2.schema_fields}
        for cols, eq in _eq_delete_frames(spark, new_eq, id_to_name):
            cond = base["__dseq"] < eq["__delseq"]
            for c in cols:
                cond = cond & base[c].eqNullSafe(eq[f"__eq_{c}"])
            killed.append(base.join(eq, cond, "left_semi"))
        k = killed[0]
        for other in killed[1:]:
            k = k.unionByName(other)
        # (__file, __pos) uniquely identifies a physical row: a row matched
        # by BOTH a position and an equality delete is one change, not two
        k = k.dropDuplicates(["__file", "__pos"])
        parts.append(
            k.drop("__file", "__pos", "__dseq")
            .withColumn("_change_type", F.lit("delete"))
        )

    if not parts:
        return spark.createDataFrame([], ddl)
    out = parts[0]
    for p in parts[1:]:
        # schema evolution across the interval: FROM-side rows may lack a
        # column added later — surface it as NULL, like the scan does
        out = out.unionByName(p, allowMissingColumns=True)
    out = out.select(*names, "_change_type")
    if key_cols:
        missing = [c for c in key_cols if c not in names]
        if missing:
            raise KeyError(f"key_cols not in table schema: {missing}")
        dels = out.where(F.col("_change_type") == "delete").drop("_change_type")
        inss = out.where(F.col("_change_type") == "insert").drop("_change_type")
        # carry-over elimination (multiset): each identical delete+insert
        # pair cancels — intersectAll keeps per-row multiplicity, so two
        # copies cancel two copies, never more
        carry = dels.intersectAll(inss)
        dels = dels.exceptAll(carry)
        inss = inss.exceptAll(carry)
        # one-change-per-key guard: duplicate keys WITHIN either side make
        # before/after pairing ambiguous — refuse loudly rather than pair
        # arbitrarily (Iceberg's iterator quietly assumes sorted 1:1 input)
        dup = (
            dels.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1).select(*key_cols)
            .unionByName(
                inss.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1).select(*key_cols))
            .limit(1).count()
        )
        if dup:
            raise ValueError(
                "scan_changes(key_cols=...): a key changed more than once "
                "inside the snapshot interval, so update_before/update_after "
                "pairing would be ambiguous — narrow the interval (per-"
                "snapshot steps always satisfy one-change-per-key) or drop "
                "key_cols for the raw insert/delete stream"
            )
        upd_keys = (dels.select(*key_cols)
                    .intersect(inss.select(*key_cols)))
        out = (
            dels.join(upd_keys, key_cols, "left_anti")
            .withColumn("_change_type", F.lit("delete"))
            .unionByName(
                inss.join(upd_keys, key_cols, "left_anti")
                .withColumn("_change_type", F.lit("insert")))
            .unionByName(
                dels.join(upd_keys, key_cols, "left_semi")
                .withColumn("_change_type", F.lit("update_before")))
            .unionByName(
                inss.join(upd_keys, key_cols, "left_semi")
                .withColumn("_change_type", F.lit("update_after")))
            .select(*names, "_change_type")
        )
    return out
