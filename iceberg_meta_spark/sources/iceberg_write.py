"""Jar-free Iceberg append commit (S9's metadata side, from the spec).

``commit_append`` publishes a new snapshot onto a filesystem-layout Iceberg
v2 table: write one new manifest for the added files, a new manifest list
(previous snapshot's manifests + the new one), a new ``v(N+1).metadata.json``
with the appended snapshot entry, then atomically swap
``metadata/version-hint.text`` — the HadoopTables commit protocol
(iceberg.apache.org/spec § File System Tables: "an atomic rename of the
version hint makes the new metadata current"). ``os.replace`` IS that
atomic rename on POSIX.

Scope, stated plainly: this writes the METADATA tree (what every analytics
query here consumes); data files are expected to exist already (e.g.
written by ``df.write.parquet`` to the table's data dir). Against a real
catalog (REST/Hive/Glue) commits are a CAS on the catalog pointer — that
path needs the runtime jar and stays gated in ``sources/iceberg.py``. Local
paths only (the reference's demo writes the same way, demo.py:154-181);
concurrent writers on the same table dir race on the hint swap exactly as
HadoopTables document.
"""

from __future__ import annotations

import json
import os
import re
import struct
import uuid

from iceberg_meta_spark.sources.avro_py import write_container
from iceberg_meta_spark.sources.iceberg_schemas import (
    MANIFEST_FILE_SCHEMA,
    manifest_entry_schema,
)


def _bound_bytes(value, type_name: str | None = None) -> bytes:
    """Single-value serialization for bounds (spec Appendix D), sized by
    the column's DECLARED type: 'int'/'date' bounds are 4-byte LE, not
    8-byte — the native reader's ``decode_bound(raw, 'int')`` unpacks
    ``<i`` and raises struct.error on an 8-byte buffer, so width must
    follow the schema, not the Python value's width."""
    t = (type_name or "").lower()
    if isinstance(value, bool):
        return b"\x01" if value else b"\x00"
    if isinstance(value, int):
        return struct.pack("<i" if t in ("int", "date") else "<q", value)
    if isinstance(value, float):
        return struct.pack("<f" if t == "float" else "<d", value)
    if isinstance(value, str):
        if t == "uuid":
            return uuid.UUID(value).bytes  # 16-byte big-endian per spec
        return value.encode("utf-8")
    if isinstance(value, bytes):
        return value
    raise ValueError(f"unsupported bound value type: {type(value).__name__}")


def _local_path(p: str) -> str:
    """Strip a ``file:`` scheme for local IO; absolute paths collapse
    repeated leading slashes (``file:///x`` -> ``/x``, matching the scan
    side's ``_norm_path``) so paths stored in metadata join cleanly."""
    if not p.startswith("file:"):
        return p
    p = p[len("file:"):]
    return "/" + p.lstrip("/") if p.startswith("/") else p


class CommitConflictError(RuntimeError):
    """A concurrent writer kept winning the metadata-version race (or the
    rebased commit no longer validates). The table is untouched; retry the
    whole operation against fresh state."""


_COMMIT_RETRIES = 10
_RETRY_BACKOFF_S = 0.02


def _latest_version(meta_dir: str) -> int:
    """Current metadata version: the version-hint, upgraded by a directory
    scan for any HIGHER v{N}.metadata.json. HadoopTables semantics
    (Iceberg's HadoopTableOperations.findVersion): the exclusively-created
    metadata FILE is the commit; the hint is an optimization that can lag
    by a crash or an in-flight swap, so a committing writer must not trust
    it alone — basing a retry on a stale hint would spin forever against
    an already-claimed version."""
    import re

    with open(os.path.join(meta_dir, "version-hint.text")) as hint_fh:
        version = int(hint_fh.read().strip())
    for f in os.listdir(meta_dir):
        m = re.fullmatch(r"v(\d+)\.metadata\.json", f)
        if m:
            version = max(version, int(m.group(1)))
    return version


def _read_meta(meta_dir: str) -> tuple[int, dict]:
    version = _latest_version(meta_dir)
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as fh:
        return version, json.load(fh)


def _write_new_file(path: str, blob: bytes) -> str:
    """Exclusive-create write for manifest / manifest-list files, returning
    the path actually used. Two concurrent attempts based on the same
    metadata version compute the same snapshot id and therefore the same
    DETERMINISTIC file name — a plain "wb" would let the losing attempt
    TRUNCATE the file the winner already published (seen as avro
    'truncated varint' corruption under the commit race). The exclusive
    create keeps the single-writer name byte-stable while a racer falls
    back to ``-rK`` suffixes; its orphans are swept by remove_orphans."""
    base, ext = os.path.splitext(path)
    d, k = path, 0
    while True:
        try:
            with open(d, "xb") as fh:
                fh.write(blob)
            return d
        except FileExistsError:
            k += 1
            d = f"{base}-r{k}{ext}"


def _publish(meta_dir: str, version: int, md: dict) -> None:
    """Two-phase publish: exclusive-create v(N+1).metadata.json (the
    commit's atomic claim — a concurrent writer's create of the same
    version raises FileExistsError), then atomically swap the hint."""
    with open(os.path.join(meta_dir, f"v{version + 1}.metadata.json"), "x") as fh:
        json.dump(md, fh, indent=1)
    tmp_hint = os.path.join(meta_dir, ".version-hint.text.tmp")
    with open(tmp_hint, "w") as fh:
        fh.write(str(version + 1))
    os.replace(tmp_hint, os.path.join(meta_dir, "version-hint.text"))


def _retrying_commit(meta_dir: str, attempt, retries: int = _COMMIT_RETRIES):
    """The Iceberg optimistic-concurrency commit loop: read the CURRENT
    metadata, build the commit against it, try to claim the next version;
    on losing the exclusive-create race, re-read and REBASE (the attempt
    re-derives everything — snapshot id, sequence number, parent, carried
    manifests — from the fresh metadata, and re-runs its own validation,
    so a genuinely conflicting commit, e.g. deleting a file another writer
    already removed, surfaces as the attempt's own KeyError/ValueError
    rather than being blindly re-applied). Files written by a losing
    attempt (manifests, manifest lists) become unreferenced and are swept
    by remove_orphans, matching engine behavior."""
    import time

    for i in range(retries + 1):
        version, md = _read_meta(meta_dir)
        try:
            return attempt(version, md)
        except FileExistsError:
            if i == retries:
                raise CommitConflictError(
                    f"lost the commit race {retries + 1} times under "
                    f"{meta_dir}; giving up"
                ) from None
            time.sleep(_RETRY_BACKOFF_S * (i + 1))


def _apply_snapshot(md: dict, snapshot: dict, meta_dir: str, version: int) -> None:
    """The shared commit tail, applied IN PLACE to table metadata: append
    the built snapshot, advance main / snapshot-log / metadata-log /
    last-sequence-number / last-updated-ms, and (v3 row lineage) push
    next-row-id past the snapshot's first-row-id + added-records. The
    filesystem face runs this client-side before the version claim; the
    REST face ships the same snapshot as an ``add-snapshot`` +
    ``set-snapshot-ref`` update and the SERVER applies the equivalent
    tail (iceberg_rest_mock.py does exactly this) — one snapshot builder,
    two catalogs. Branch (non-main) commits keep their custom tail in
    :func:`_commit_append_once`."""
    snap_id = int(snapshot["snapshot-id"])
    seq = int(snapshot["sequence-number"])
    ts = int(snapshot["timestamp-ms"])
    if "first-row-id" in snapshot:
        md["next-row-id"] = int(snapshot["first-row-id"]) + int(
            (snapshot.get("summary") or {}).get("added-records", 0)
        )
    md["snapshots"] = md.get("snapshots", []) + [snapshot]
    md["metadata-log"] = md.get("metadata-log", []) + [
        {"metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
         "timestamp-ms": int(md["last-updated-ms"])}
    ]
    md["snapshot-log"] = md.get("snapshot-log", []) + [
        {"snapshot-id": snap_id, "timestamp-ms": ts}
    ]
    md["current-snapshot-id"] = snap_id
    md["last-sequence-number"] = seq
    md["last-updated-ms"] = ts
    if "main" in (md.get("refs") or {}):
        md["refs"]["main"]["snapshot-id"] = snap_id


class FilesystemCommitter:
    """The filesystem (HadoopTables-style) commit face: publish a built
    snapshot by claiming the next metadata version under the optimistic
    retry loop. ``sources/iceberg_rest.py:RestCommitter`` exposes the SAME
    ``commit_snapshot(build)`` contract over the REST catalog's
    updateTable CAS, so every snapshot-producing verb — DELETE WHERE,
    UPDATE, MERGE, DV commits, compaction, delete-file rewrites — routes
    through EITHER catalog unchanged: pass ``committer=`` to the verb.

    ``build(table_dir, meta_dir, md) -> snapshot`` must be pure against
    ``md`` (it writes manifest/manifest-list files, never mutates
    metadata) and re-derives everything from the metadata it is given, so
    a rebase after a lost race re-runs its own conflict validation."""

    def __init__(self, table_dir: str):
        self.table_dir = _local_path(table_dir.rstrip("/"))
        self.meta_dir = os.path.join(self.table_dir, "metadata")
        self.ref = "main"

    def commit_snapshot(self, build, extra_properties=None) -> dict:
        def attempt(version: int, md: dict) -> dict:
            snapshot = build(self.table_dir, self.meta_dir, md)
            if extra_properties:
                md["properties"] = {
                    **(md.get("properties") or {}),
                    **{str(k): str(v) for k, v in extra_properties.items()},
                }
            _apply_snapshot(md, snapshot, self.meta_dir, version)
            _publish(self.meta_dir, version, md)
            return md

        return _retrying_commit(self.meta_dir, attempt)


def _fv_bytes(md: dict) -> bytes:
    """The table's actual format-version for manifest / manifest-list Avro
    metadata. v3 tables must stamp "3": external engines key manifest
    parsing off this label (spec § Manifests, "format-version" property),
    so a v3 commit labeled "2" would be mis-classified."""
    return str(int(md.get("format-version", 2))).encode()


_AVRO_T = {"string": "string", "long": "long", "int": "int",
           "double": "double", "boolean": "boolean"}

_BOUND_TRUNC = 16  # write.metadata.metrics default-column-metrics length


def truncate_lower_bound(s: str, width: int = _BOUND_TRUNC) -> str:
    """Spec Appendix D metrics truncation, lower side: a prefix is always
    <= the full value, so plain truncation stays a valid lower bound."""
    return s[:width]


def truncate_upper_bound(s: str, width: int = _BOUND_TRUNC) -> str | None:
    """Upper side: truncation alone could UNDERSTATE the max (pruning
    would drop matching files), so the last truncated codepoint is
    incremented — the result is > every string sharing the prefix. Falls
    back to None (bound omitted; readers keep the file) when every
    codepoint is already U+10FFFF."""
    if len(s) <= width:
        return s
    chars = list(s[:width])
    for i in reversed(range(len(chars))):
        cp = ord(chars[i])
        if cp < 0x10FFFF:
            nxt = cp + 1
            if 0xD800 <= nxt <= 0xDFFF:
                # incrementing into the surrogate block yields codepoints
                # Python cannot UTF-8-encode; skip past it (still greater,
                # still a valid upper bound) — Iceberg's UnicodeUtil does
                # the same
                nxt = 0xE000
            chars[i] = chr(nxt)
            return "".join(chars[:i + 1])
    return None


def _check_partition_names(
    additions: list[tuple[str, str, str]],
    column_names: set[str],
    taken_names: set[str] = frozenset(),
) -> None:
    """Iceberg's partition-field name-conflict validation, enforced at DDL
    time: a partition field name must not collide with a schema column
    (``write_dataframe_files``'s withColumn(fname, ...) would silently
    REPLACE the same-named data column and partitionBy would drop its real
    values from the data files) nor with another partition field. The one
    legal overlap is an identity transform named after its own source
    column — that IS how identity specs are spelled. ``additions`` =
    (field name, transform, source column)."""
    seen = set(taken_names)
    for fname, transform, src in additions:
        if fname in seen:
            raise ValueError(
                f"partition field name {fname!r} conflicts with another "
                "partition field"
            )
        if fname in column_names and not (transform == "identity" and fname == src):
            raise ValueError(
                f"partition field name {fname!r} conflicts with schema "
                f"column {fname!r}; pick a distinct name (e.g. "
                f"{fname}_{transform.split('[')[0]})"
            )
        seen.add(fname)


def _partition_fields_from_spec(md: dict, types: dict) -> list[dict]:
    """Avro partition-record fields for the DEFAULT spec — every spec
    transform (identity, bucket[N], truncate[W], year/month/day/hour,
    void) maps to its result's Avro primitive per the spec's transform
    result types (iceberg_transforms.result_avro_type)."""
    from iceberg_meta_spark.sources.iceberg_transforms import result_avro_type

    spec = next(
        s for s in md["partition-specs"] if s["spec-id"] == md["default-spec-id"]
    )
    return [
        {
            "name": f["name"],
            "type": ["null", result_avro_type(f["transform"], types[f["source-id"]])],
            "default": None,
            "field-id": f["field-id"],
        }
        for f in spec["fields"]
    ]


def _added_data_entries(
    files: list[dict],
    snap_id: int,
    seq: int,
    types: dict,
    partition_fields: list[dict],
    first_row_id_base: int | None = None,
) -> list[dict]:
    """ADDED (status 1) manifest entries for new DATA files — shared by
    append, merge, and the compaction rewrite commit.

    ``first_row_id_base`` (v3 row lineage, spec § Row Lineage): assign each
    added file an explicit ``first_row_id`` (field-id 142) — the base plus
    the running record counts of the files before it, so a file's row at
    position p carries ``_row_id = first_row_id + p``. v2 passes None (the
    field is absent from v2 manifests)."""

    def kv_long(d: dict | None):
        return [{"key": int(k), "value": int(v)} for k, v in sorted((d or {}).items())] or None

    def kv_bytes(d: dict | None):
        return [
            {"key": int(k), "value": _bound_bytes(v, types.get(int(k)))}
            for k, v in sorted((d or {}).items())
        ] or None

    frids: list[int | None] = []
    run = first_row_id_base
    for f in files:
        frids.append(run)
        if run is not None:
            run += int(f["record_count"])

    return [
        {
            "status": 1,  # ADDED
            "snapshot_id": snap_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0,
                "file_path": f["file_path"],
                "file_format": str(f.get("file_format", "PARQUET")).upper(),
                "partition": f.get("partition") or {
                    pf["name"]: None for pf in partition_fields
                },
                "record_count": int(f["record_count"]),
                "file_size_in_bytes": int(f["file_size_in_bytes"]),
                "column_sizes": kv_long(f.get("column_sizes")),
                "value_counts": kv_long(f.get("value_counts")),
                "null_value_counts": kv_long(f.get("null_value_counts")),
                "lower_bounds": kv_bytes(f.get("lower_bounds")),
                "upper_bounds": kv_bytes(f.get("upper_bounds")),
                "split_offsets": None,
                # per-file: write_dataframe_files stamps the table's default
                # order id on files it actually sorted; everything else is
                # unsorted (0) per spec
                "sort_order_id": int(f.get("sort_order_id", 0)),
                **({"first_row_id": frid} if first_row_id_base is not None
                   else {}),
            },
        }
        for f, frid in zip(files, frids)
    ]


def commit_append(
    table_dir: str,
    files: list[dict],
    partition_fields: list[dict] | None = None,
    timestamp_ms: int | None = None,
    branch: str | None = None,
    extra_summary: dict[str, str] | None = None,
    extra_properties: dict[str, str] | None = None,
    committer=None,
) -> dict:
    """Append ``files`` as one new snapshot; returns the new table metadata.

    Each file dict: ``file_path`` (str), ``record_count`` (int),
    ``file_size_in_bytes`` (int), optional ``partition`` (dict),
    ``value_counts``/``null_value_counts``/``column_sizes`` (dict
    field_id->long), ``lower_bounds``/``upper_bounds`` (dict field_id->
    int/float/str, serialized per spec Appendix D).

    ``branch`` (spec § Refs; the write-audit-publish workflow): commit
    onto a named branch instead of main — the snapshot's parent is the
    BRANCH head (forking from the current snapshot when the branch is
    new), only the branch ref advances, and the table's current snapshot
    stays untouched until :func:`fast_forward` publishes the branch.
    Readers see the staged rows only via ``ref=branch`` time travel.

    ``timestamp_ms`` is required metadata on the snapshot; pass a pinned
    value in tests for deterministic output (defaults to last-updated-ms+1
    so the fixture stays wall-clock-free).

    ``extra_summary`` adds string properties to the snapshot summary (e.g.
    the streaming sink's exactly-once epoch markers). ``extra_properties``
    merges into the TABLE properties in the same atomic commit — unlike
    summary markers, properties survive ``expire_snapshots`` (the
    streaming sink persists its high-water epoch there).

    Concurrency (r10): the commit runs the optimistic retry loop
    (:func:`_retrying_commit`) — two interleaved appends BOTH succeed,
    serialized; the loser rebases onto the winner's snapshot and re-claims
    the next metadata version. Appends never conflict semantically (their
    file sets are disjoint), so the rebase is unconditional.

    ``committer`` routes the append through another catalog face
    (``RestCommitter``). Branch (write-audit-publish) appends require the
    committer's ``ref`` to name the same branch — the CAS assertion and
    the built snapshot's parent must agree on which ref moves; a
    mismatch raises before any IO. ``extra_properties`` ride the SAME
    commit as a set-properties update (REST) / property merge
    (filesystem)."""
    if committer is not None:
        want = branch if branch is not None else "main"
        have = getattr(committer, "ref", "main")
        if have != want:
            raise ValueError(
                f"committer targets ref {have!r} but the append names "
                f"branch {want!r}; construct the committer with ref="
                f"{want!r} so the CAS assertion moves the right ref"
            )

        def build(td, mdir, md):
            if want != "main":
                ref = (md.get("refs") or {}).get(want)
                if ref is not None and ref.get("type") != "branch":
                    raise ValueError(f"ref {want!r} is a tag, not a branch")
                parent = (int(ref["snapshot-id"]) if ref is not None
                          else md.get("current-snapshot-id"))
            else:
                parent = md.get("current-snapshot-id")
            return build_append_snapshot(
                td, mdir, md, files, parent,
                timestamp_ms=timestamp_ms, partition_fields=partition_fields,
                extra_summary=extra_summary,
            )

        return committer.commit_snapshot(
            build, extra_properties=extra_properties)
    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")

    def attempt(version: int, md: dict) -> dict:
        return _commit_append_once(
            table_dir, meta_dir, version, md, files, partition_fields,
            timestamp_ms, branch, extra_summary, extra_properties,
        )

    return _retrying_commit(meta_dir, attempt)


def build_append_snapshot(
    table_dir: str,
    meta_dir: str,
    md: dict,
    files: list[dict],
    parent: int | None,
    timestamp_ms: int | None = None,
    partition_fields: list[dict] | None = None,
    extra_summary: dict[str, str] | None = None,
) -> dict:
    """The PUBLISH-FREE half of an append commit: write the new manifest
    and manifest list into ``meta_dir`` and return the snapshot entry —
    metadata is NOT mutated and no version is claimed. Shared by the
    filesystem commit (:func:`_commit_append_once` mutates + publishes)
    and the REST-catalog commit (``sources/iceberg_rest.py`` ships the
    snapshot as an ``add-snapshot`` update; the server owns the pointer
    swap). Files written by an attempt that loses its commit race become
    unreferenced and are swept by remove_orphans, as in every engine."""
    if int(md.get("format-version", 1)) not in (2, 3):
        raise ValueError("append commits write format-version 2/3 tables only")

    # field-id -> declared type, for type-correct bound widths (Appendix D)
    schema = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    types = {f["id"]: f["type"] for f in schema["fields"]}
    if partition_fields is None:
        partition_fields = _partition_fields_from_spec(md, types)

    snap_id = max((s["snapshot-id"] for s in md.get("snapshots", [])), default=0) + 1
    seq = int(md.get("last-sequence-number", 0)) + 1
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1

    # v3 row lineage: added files get explicit first_row_id values starting
    # at the table's next-row-id; the snapshot records its first-row-id and
    # the publishing caller advances next-row-id by the rows added
    lineage = int(md.get("format-version", 1)) >= 3
    frid_base = int(md.get("next-row-id", 0)) if lineage else None
    entries = _added_data_entries(files, snap_id, seq, types, partition_fields,
                                  first_row_id_base=frid_base)
    commit_uuid = uuid.uuid5(uuid.NAMESPACE_URL, f"{table_dir}/{snap_id}")
    blob = write_container(
        manifest_entry_schema(partition_fields, with_first_row_id=lineage),
        entries,
        metadata={
            "format-version": _fv_bytes(md),
            "content": b"data",
            "partition-spec-id": str(md["default-spec-id"]).encode(),
        },
    )
    manifest_path = _write_new_file(
        os.path.join(meta_dir, f"{commit_uuid}-m0.avro"), blob
    )

    added_rows = sum(int(f["record_count"]) for f in files)
    new_manifest = {
        "manifest_path": manifest_path,
        "manifest_length": len(blob),
        "partition_spec_id": int(md["default-spec-id"]),
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": len(files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": added_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": None,
    }

    # previous snapshot's manifests carry over (append = no replacement)
    prev_manifests: list[dict] = []
    if parent is not None:
        from iceberg_meta_spark.sources.avro_py import read_container

        prev = next(s for s in md["snapshots"] if s["snapshot-id"] == parent)
        with open(_local_path(prev["manifest-list"]), "rb") as fh:
            _, _, prev_manifests = read_container(fh.read())
        for m in prev_manifests:  # normalize optional fields for re-encode
            m.setdefault("partitions", None)

    mlist_path = _write_new_file(
        os.path.join(meta_dir, f"snap-{snap_id}-{commit_uuid}.avro"),
        write_container(
            MANIFEST_FILE_SCHEMA,
            prev_manifests + [new_manifest],
            metadata={"format-version": _fv_bytes(md)},
        ),
    )

    # carry EVERY running total forward from the parent summary, not just
    # total-data-files — native_snapshots_frame / native_warehouse_tables
    # surface these as real rollups, so a hardwired "0" would make any
    # natively-committed table report zero records/bytes in S1/S3 views
    prev_summary = (
        next((s for s in md.get("snapshots", []) if s["snapshot-id"] == parent), {})
        .get("summary", {})
        or {}
    )
    added_bytes = sum(int(f["file_size_in_bytes"]) for f in files)
    return {
        "snapshot-id": snap_id,
        **({"parent-snapshot-id": parent} if parent is not None else {}),
        "sequence-number": seq,
        "timestamp-ms": ts,
        **({"first-row-id": frid_base} if lineage else {}),
        "manifest-list": mlist_path,
        "schema-id": md["current-schema-id"],
        "summary": {
            "operation": "append",
            "added-records": str(added_rows),
            "deleted-records": "0",
            "added-data-files": str(len(files)),
            "added-files-size": str(added_bytes),
            "total-data-files": str(
                int(prev_summary.get("total-data-files", 0)) + len(files)
            ),
            "total-records": str(
                int(prev_summary.get("total-records", 0)) + added_rows
            ),
            "total-files-size": str(
                int(prev_summary.get("total-files-size", 0)) + added_bytes
            ),
            **{str(k): str(v) for k, v in (extra_summary or {}).items()},
        },
    }


def _commit_append_once(
    table_dir: str,
    meta_dir: str,
    version: int,
    md: dict,
    files: list[dict],
    partition_fields: list[dict] | None,
    timestamp_ms: int | None,
    branch: str | None,
    extra_summary: dict[str, str] | None,
    extra_properties: dict[str, str] | None = None,
) -> dict:
    """One append attempt against the given metadata; raises
    FileExistsError when another writer claims v(version+1) first (the
    retry loop rebases and re-enters)."""
    if branch is not None and branch != "main":
        ref = (md.get("refs") or {}).get(branch)
        if ref is not None and ref.get("type") != "branch":
            raise ValueError(f"ref {branch!r} is a tag, not a branch")
        # branch head if it exists, else fork from the current snapshot
        parent = (
            int(ref["snapshot-id"]) if ref is not None
            else md.get("current-snapshot-id")
        )
    else:
        parent = md.get("current-snapshot-id")

    snapshot = build_append_snapshot(
        table_dir, meta_dir, md, files, parent,
        timestamp_ms=timestamp_ms, partition_fields=partition_fields,
        extra_summary=extra_summary,
    )
    snap_id, seq, ts = (snapshot["snapshot-id"], snapshot["sequence-number"],
                        snapshot["timestamp-ms"])
    if "first-row-id" in snapshot:  # v3 row lineage: advance the counter
        md["next-row-id"] = int(snapshot["first-row-id"]) + sum(
            int(f["record_count"]) for f in files
        )
    if extra_properties:
        md["properties"] = {
            **(md.get("properties") or {}),
            **{str(k): str(v) for k, v in extra_properties.items()},
        }
    md["snapshots"] = md.get("snapshots", []) + [snapshot]
    md["metadata-log"] = md.get("metadata-log", []) + [
        {
            "metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
            "timestamp-ms": int(md["last-updated-ms"]),
        }
    ]
    md["last-sequence-number"] = seq
    md["last-updated-ms"] = ts
    if branch is not None and branch != "main":
        # staged commit: only the branch ref moves; main readers are
        # untouched until fast_forward publishes
        refs = dict(md.get("refs") or {})
        refs[branch] = {"snapshot-id": snap_id, "type": "branch"}
        md["refs"] = refs
    else:
        md["snapshot-log"] = md.get("snapshot-log", []) + [
            {"snapshot-id": snap_id, "timestamp-ms": ts}
        ]
        md["current-snapshot-id"] = snap_id
        if "main" in (md.get("refs") or {}):
            md["refs"]["main"]["snapshot-id"] = snap_id  # commit lands on main

    # two-phase publish: everything above is invisible until the hint swap
    _publish(meta_dir, version, md)
    return md


def _mark_removed_in_manifests(
    prev_manifests: list[dict],
    targets: set[str],
    meta_dir: str,
    commit_uuid,
) -> tuple[list[dict], int, int, int]:
    """Rewrite every manifest carrying a ``targets`` path: hit entries get
    status 2 (DELETED), survivors status 0 (EXISTING) with their original
    snapshot/sequence numbers — materialized from the manifest when null,
    since inheritance is ADDED-only per spec. Untouched manifests ride
    through verbatim. Returns (new_manifests, removed_files, removed_rows,
    removed_bytes). Shared by DELETE (:func:`commit_remove_files`) and the
    compaction rewrite (:func:`commit_rewrite_files`)."""
    from iceberg_meta_spark.sources.avro_py import read_container

    new_manifests: list[dict] = []
    removed = 0
    removed_rows = 0
    removed_bytes = 0
    for mi, m in enumerate(prev_manifests):
        m.setdefault("partitions", None)
        mpath = _local_path(m["manifest_path"])
        with open(mpath, "rb") as fh:
            entry_schema, mmeta, entries = read_container(fh.read())
        hit = [e for e in entries if e["data_file"]["file_path"] in targets
               and e.get("status", 0) != 2]
        if not hit:
            new_manifests.append(m)  # untouched manifest rides along
            continue
        rewritten = []
        kept = deleted = 0
        kept_rows = deleted_rows = 0
        for e in entries:
            if e.get("status", 0) == 2:
                continue  # already-deleted entries don't carry forward
            e = dict(e)
            if e.get("sequence_number") is None:
                e["sequence_number"] = m.get("sequence_number")
            if e.get("file_sequence_number") is None:
                e["file_sequence_number"] = m.get("sequence_number")
            if e["data_file"]["file_path"] in targets:
                e["status"] = 2  # DELETED
                deleted += 1
                deleted_rows += int(e["data_file"]["record_count"])
                removed_bytes += int(e["data_file"]["file_size_in_bytes"])
            else:
                e["status"] = 0  # EXISTING, provenance preserved
                kept += 1
                kept_rows += int(e["data_file"]["record_count"])
            rewritten.append(e)
        removed += deleted
        removed_rows += deleted_rows
        blob = write_container(entry_schema, rewritten, metadata=dict(mmeta))
        rpath = _write_new_file(
            os.path.join(meta_dir, f"{commit_uuid}-m{mi}.avro"), blob
        )
        new_manifests.append(
            {
                **m,
                "manifest_path": rpath,
                "manifest_length": len(blob),
                "added_files_count": 0,
                "existing_files_count": kept,
                "deleted_files_count": deleted,
                "added_rows_count": 0,
                "existing_rows_count": kept_rows,
                "deleted_rows_count": deleted_rows,
            }
        )
    return new_manifests, removed, removed_rows, removed_bytes


def commit_remove_files(
    table_dir: str,
    file_paths: set[str] | list[str],
    timestamp_ms: int | None = None,
    committer=None,
) -> dict:
    """Publish a delete snapshot that removes ``file_paths`` from the table.

    Spec § Manifests: a data file is removed by rewriting the manifests
    that carry it — removed entries get status=2 (DELETED), survivors get
    status=0 (EXISTING) with their original snapshot/sequence numbers
    preserved; untouched manifests ride into the new manifest list as-is.
    Readers that filter status != 2 (ours, and every engine's live scan)
    stop seeing the files; previous snapshots still time-travel to them.

    Concurrency: runs the optimistic retry loop; a rebase RE-RESOLVES the
    targets against the winner's snapshot, so deleting a file another
    writer already removed raises this function's own KeyError (a genuine
    conflict), never a silent double-delete.

    ``committer`` routes the publish through another catalog face (e.g.
    ``RestCommitter`` — the REST updateTable CAS); default filesystem.
    """
    committer = committer or FilesystemCommitter(table_dir)
    targets = set(file_paths)
    return committer.commit_snapshot(
        lambda td, mdir, md: build_remove_snapshot(
            td, mdir, md, targets, timestamp_ms
        )
    )


def build_remove_snapshot(
    table_dir: str,
    meta_dir: str,
    md: dict,
    targets: set[str],
    timestamp_ms: int | None,
) -> dict:
    """The publish-free half of :func:`commit_remove_files`: rewrite the
    carrying manifests, write the new manifest list, return the delete
    snapshot. Pure against ``md``."""
    if int(md.get("format-version", 1)) != 2:
        raise ValueError("commit_remove_files writes format-version 2 tables only")
    parent = md.get("current-snapshot-id")
    if parent is None:
        raise ValueError("table has no current snapshot to delete from")

    from iceberg_meta_spark.sources.avro_py import read_container

    prev = next(s for s in md["snapshots"] if s["snapshot-id"] == parent)
    with open(_local_path(prev["manifest-list"]), "rb") as fh:
        _, _, prev_manifests = read_container(fh.read())

    snap_id = max(s["snapshot-id"] for s in md["snapshots"]) + 1
    seq = int(md.get("last-sequence-number", 0)) + 1
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    commit_uuid = uuid.uuid5(uuid.NAMESPACE_URL, f"{table_dir}/rm/{snap_id}")

    new_manifests, removed, removed_rows, removed_bytes = (
        _mark_removed_in_manifests(prev_manifests, targets, meta_dir, commit_uuid)
    )
    if not removed:
        raise KeyError(f"none of the {len(targets)} paths are live in snapshot {parent}")

    mlist_path = _write_new_file(
        os.path.join(meta_dir, f"snap-{snap_id}-{commit_uuid}.avro"),
        write_container(MANIFEST_FILE_SCHEMA, new_manifests,
                        metadata={"format-version": _fv_bytes(md)}),
    )
    prev_summary = (prev.get("summary", {}) or {})
    snapshot = {
        "snapshot-id": snap_id,
        "parent-snapshot-id": parent,
        "sequence-number": seq,
        "timestamp-ms": ts,
        "manifest-list": mlist_path,
        "schema-id": md["current-schema-id"],
        "summary": {
            "operation": "delete",
            "added-records": "0",
            "deleted-records": str(removed_rows),
            "deleted-data-files": str(removed),
            "removed-files-size": str(removed_bytes),
            "total-data-files": str(
                max(int(prev_summary.get("total-data-files", 0)) - removed, 0)
            ),
            "total-records": str(
                max(int(prev_summary.get("total-records", 0)) - removed_rows, 0)
            ),
            "total-files-size": str(
                max(int(prev_summary.get("total-files-size", 0)) - removed_bytes, 0)
            ),
        },
    }
    return snapshot


def _position_delete_refs(path: str, file_format: str | None) -> set[str] | None:
    """The data-file paths a position-delete PARQUET file references (its
    ``file_path`` column, spec field 2147483545). Returns None when the
    file can't be inspected — the caller must treat that as a conflict.
    Delete files are small by construction (one per DELETE's touched
    files); this is a driver-side footer+column read, planning-index
    scale, and only runs for delete manifests newer than the rewrite's
    base sequence number (the rare-conflict path)."""
    if str(file_format or "PARQUET").upper() != "PARQUET":
        return None
    try:
        import pyarrow.parquet as pq

        from iceberg_meta_spark.sources.iceberg_scan import _norm_path

        col = pq.read_table(_local_path(path), columns=["file_path"])
        return {_norm_path(p) for p in col.column("file_path").to_pylist()}
    except Exception:  # unreadable / unexpected layout -> conservative
        return None


def _validate_no_new_deletes(
    prev_manifests: list[dict], targets_norm: set[str], from_seq: int
) -> None:
    """Java RewriteFiles' ``validateNoNewDeletesForDataFiles``, jar-free:
    a compaction materialized its replacement files WITHOUT any delete
    committed after its scan, so if the rebased snapshot carries a delete
    (position delete, equality delete, or deletion vector) with sequence
    number > the plan-time ``from_seq`` that applies to a file being
    removed, committing the rewrite would silently DROP that delete —
    the deleted rows would live on in the compacted files. Raises
    CommitConflictError (genuine conflict: the compaction must re-plan
    against fresh state, re-applying the new deletes during its read).

    DVs name their file (``referenced_data_file``); position-delete
    parquet is inspected via :func:`_position_delete_refs`; equality
    deletes apply by sequence ordering to every older file in the
    partition scope, so any new one conflicts (Java's same conservative
    treatment without a filter-based narrowing)."""
    from iceberg_meta_spark.sources.avro_py import read_container
    from iceberg_meta_spark.sources.iceberg_scan import _norm_path

    for m in prev_manifests:
        if int(m.get("content", 0)) != 1:
            continue
        if int(m.get("sequence_number") or 0) <= from_seq:
            continue
        with open(_local_path(m["manifest_path"]), "rb") as fh:
            _, _, entries = read_container(fh.read())
        for e in entries:
            if e.get("status", 0) == 2:
                continue
            seq = e.get("sequence_number")
            if seq is None:
                seq = m.get("sequence_number") or 0
            if int(seq) <= from_seq:
                continue  # pre-plan delete, already applied by the rewrite read
            df = e["data_file"]
            ref = df.get("referenced_data_file")
            if ref is not None:  # v3 deletion vector: exact file check
                if _norm_path(ref) in targets_norm:
                    raise CommitConflictError(
                        f"concurrent deletion vector for {ref!r} (seq {seq} > "
                        f"plan seq {from_seq}); re-plan the rewrite"
                    )
                continue
            if int(df.get("content", 1)) == 2:
                raise CommitConflictError(
                    f"concurrent equality-delete file {df['file_path']!r} "
                    f"(seq {seq} > plan seq {from_seq}) may apply to the "
                    "files being rewritten; re-plan the rewrite"
                )
            refs = _position_delete_refs(df["file_path"], df.get("file_format"))
            if refs is None or refs & targets_norm:
                raise CommitConflictError(
                    f"concurrent position-delete file {df['file_path']!r} "
                    f"(seq {seq} > plan seq {from_seq}) references files "
                    "being rewritten; re-plan the rewrite"
                )


def commit_rewrite_files(
    table_dir: str,
    remove_paths: set[str] | list[str],
    add_files: list[dict],
    timestamp_ms: int | None = None,
    add_content: int = 0,
    validate_from_seq: int | None = None,
    committer=None,
) -> dict:
    """Publish ONE ``replace`` snapshot that atomically removes
    ``remove_paths`` (compacted-away files) and adds ``add_files`` (their
    rewritten replacements) — the commit shape of Iceberg's
    ``rewrite_data_files`` / ``rewrite_position_delete_files`` actions.
    Removed entries become DELETED in rewritten manifests (provenance
    preserved for survivors); added files get the NEW sequence number, so
    equality deletes committed earlier correctly stop applying to the
    rewritten rows (they were applied during the rewrite read) while
    later deletes still will.

    ``add_content=0`` (default) adds DATA files and moves the data totals
    honestly: physical rows drop by what the absorbed deletes removed;
    served rows are unchanged — the pre/post scan identity is pinned by
    the compaction tests. ``add_content=1`` adds position/equality DELETE
    files instead (the delete-file rewrite): data totals carry verbatim
    and ``total-delete-files`` moves by (added - removed); ``add_files``
    may be empty when every rewritten delete file was fully dangling.

    Concurrency: optimistic retry loop; the rebase re-resolves
    ``remove_paths`` against the winner's snapshot — a file another writer
    already removed raises KeyError (genuine conflict, the compaction must
    re-plan), concurrent appends rebase cleanly. ``validate_from_seq`` is
    the table's last-sequence-number AT PLAN TIME: when set (data rewrites
    pass it), the rebase also raises CommitConflictError if any delete
    (pos/eq/DV) newer than that sequence applies to the files being
    removed — otherwise a DELETE committed between the rewrite's scan and
    its commit would be silently lost (the replacement files were
    materialized without it). Java's validateNoNewDeletesForDataFiles.

    ``committer`` routes the publish through another catalog face
    (``RestCommitter`` — REST updateTable CAS); default filesystem."""
    committer = committer or FilesystemCommitter(table_dir)
    targets = set(remove_paths)
    return committer.commit_snapshot(
        lambda td, mdir, md: build_rewrite_snapshot(
            td, mdir, md, targets, add_files, timestamp_ms, add_content,
            validate_from_seq,
        )
    )


def build_rewrite_snapshot(
    table_dir: str,
    meta_dir: str,
    md: dict,
    targets: set[str],
    add_files: list[dict],
    timestamp_ms: int | None,
    add_content: int,
    validate_from_seq: int | None = None,
) -> dict:
    """The publish-free half of :func:`commit_rewrite_files`: concurrent-
    delete validation, carrying-manifest rewrite, replacement manifest +
    manifest list writes; returns the replace snapshot. Pure against
    ``md``."""
    if int(md.get("format-version", 1)) not in (2, 3):
        raise ValueError("commit_rewrite_files writes format-version 2/3 tables only")
    parent = md.get("current-snapshot-id")
    if parent is None:
        raise ValueError("table has no current snapshot to rewrite")

    from iceberg_meta_spark.sources.avro_py import read_container

    prev = next(s for s in md["snapshots"] if s["snapshot-id"] == parent)
    with open(_local_path(prev["manifest-list"]), "rb") as fh:
        _, _, prev_manifests = read_container(fh.read())

    if validate_from_seq is not None and add_content == 0:
        from iceberg_meta_spark.sources.iceberg_scan import _norm_path

        _validate_no_new_deletes(
            prev_manifests, {_norm_path(t) for t in targets},
            int(validate_from_seq),
        )

    snap_id = max(s["snapshot-id"] for s in md["snapshots"]) + 1
    seq = int(md.get("last-sequence-number", 0)) + 1
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    commit_uuid = uuid.uuid5(uuid.NAMESPACE_URL, f"{table_dir}/rewrite-data/{snap_id}")

    new_manifests, removed, removed_rows, removed_bytes = (
        _mark_removed_in_manifests(prev_manifests, targets, meta_dir, commit_uuid)
    )
    if not removed:
        raise KeyError(f"none of the {len(targets)} paths are live in snapshot {parent}")

    schema = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    types = {f["id"]: f["type"] for f in schema["fields"]}
    partition_fields = _partition_fields_from_spec(md, types)
    added_rows = sum(int(f["record_count"]) for f in add_files)
    added_bytes = sum(int(f["file_size_in_bytes"]) for f in add_files)
    # v3 row lineage: rewritten replacement files get FRESH row ids (the
    # spec's default when the writer does not materialize _row_id columns)
    lineage = int(md.get("format-version", 1)) >= 3 and add_content == 0
    frid_base = int(md.get("next-row-id", 0)) if lineage else None
    if add_files:
        if add_content == 0:
            entries = _added_data_entries(add_files, snap_id, seq, types,
                                          partition_fields,
                                          first_row_id_base=frid_base)
            blob = write_container(
                manifest_entry_schema(partition_fields,
                                      with_first_row_id=lineage),
                entries,
                metadata={"format-version": _fv_bytes(md), "content": b"data",
                          "partition-spec-id": str(md["default-spec-id"]).encode()},
            )
        else:
            blob, _ = _delete_manifest_blob(md, add_files, snap_id, seq)
        manifest_path = _write_new_file(
            os.path.join(meta_dir, f"{commit_uuid}-a0.avro"), blob
        )
        new_manifests.append({
            "manifest_path": manifest_path,
            "manifest_length": len(blob),
            "partition_spec_id": int(md["default-spec-id"]),
            "content": add_content,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snap_id,
            "added_files_count": len(add_files),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": added_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": None,
        })

    mlist_path = _write_new_file(
        os.path.join(meta_dir, f"snap-{snap_id}-{commit_uuid}.avro"),
        write_container(MANIFEST_FILE_SCHEMA, new_manifests,
                        metadata={"format-version": _fv_bytes(md)}),
    )
    prev_summary = (prev.get("summary", {}) or {})
    if add_content == 0:
        summary = {
            "operation": "replace",
            "added-records": str(added_rows),
            "deleted-records": str(removed_rows),
            "added-data-files": str(len(add_files)),
            "deleted-data-files": str(removed),
            "added-files-size": str(added_bytes),
            "removed-files-size": str(removed_bytes),
            "total-data-files": str(
                max(int(prev_summary.get("total-data-files", 0)) - removed, 0)
                + len(add_files)
            ),
            "total-records": str(
                max(int(prev_summary.get("total-records", 0)) - removed_rows, 0)
                + added_rows
            ),
            "total-files-size": str(
                max(int(prev_summary.get("total-files-size", 0)) - removed_bytes, 0)
                + added_bytes
            ),
        }
    else:
        # delete-file rewrite: data totals carry verbatim, only the
        # delete-file counter moves
        summary = {
            "operation": "replace",
            "added-records": "0",
            "deleted-records": "0",
            "added-delete-files": str(len(add_files)),
            "removed-delete-files": str(removed),
            "total-delete-files": str(
                max(int(prev_summary.get("total-delete-files", 0)) - removed, 0)
                + len(add_files)
            ),
            "total-data-files": prev_summary.get("total-data-files", "0"),
            "total-records": prev_summary.get("total-records", "0"),
            "total-files-size": prev_summary.get("total-files-size", "0"),
        }
    return {
        "snapshot-id": snap_id,
        "parent-snapshot-id": parent,
        "sequence-number": seq,
        "timestamp-ms": ts,
        **({"first-row-id": frid_base} if lineage else {}),
        "manifest-list": mlist_path,
        "schema-id": md["current-schema-id"],
        "summary": summary,
    }


def _delete_manifest_blob(
    md: dict, delete_files: list[dict], snap_id: int, seq: int
) -> tuple[bytes, int]:
    """Encode a content=1 DELETE manifest (position and/or equality delete
    files) and return (avro blob, entry count) — shared by the standalone
    delete commit and the merge commit. The entry schema is the data
    manifest's plus ``equality_ids`` (spec field 135)."""
    schema = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    types = {f["id"]: f["type"] for f in schema["fields"]}
    partition_fields = _partition_fields_from_spec(md, types)
    entry_schema = manifest_entry_schema(partition_fields)
    df_fields = entry_schema["fields"][-1]["type"]["fields"]
    df_fields.insert(
        len(df_fields) - 1,
        {"name": "equality_ids", "type": ["null", {"type": "array", "items": "int"}],
         "default": None, "field-id": 135},
    )
    entries = []
    for f in delete_files:
        eq = f.get("equality_ids")
        entries.append({
            "status": 1,
            "snapshot_id": snap_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 2 if eq else 1,  # EQUALITY_DELETES / POSITION_DELETES
                "file_path": f["file_path"],
                "file_format": str(f.get("file_format", "PARQUET")).upper(),
                "partition": f.get("partition") or {
                    pf["name"]: None for pf in partition_fields
                },
                "record_count": int(f["record_count"]),
                "file_size_in_bytes": int(f["file_size_in_bytes"]),
                "column_sizes": None,
                "value_counts": None,
                "null_value_counts": None,
                "lower_bounds": None,
                "upper_bounds": None,
                "split_offsets": None,
                "equality_ids": [int(i) for i in eq] if eq else None,
                "sort_order_id": None,
            },
        })
    blob = write_container(
        entry_schema, entries,
        metadata={"format-version": _fv_bytes(md), "content": b"deletes",
                  "partition-spec-id": str(md["default-spec-id"]).encode()},
    )
    return blob, len(entries)


def commit_delete_files(
    table_dir: str,
    delete_files: list[dict],
    timestamp_ms: int | None = None,
    committer=None,
) -> dict:
    """Publish row-level delete files as one new snapshot (v2 row-level
    deletes): a DELETE manifest (manifest content=1) carrying position
    (data_file content=1) or equality (content=2, with equality_ids)
    delete files rides the new manifest list next to the untouched data
    manifests — the 'overwrite' shape MERGE/DELETE writers publish.

    Each dict: ``file_path``, ``record_count`` (rows the delete file
    holds), ``file_size_in_bytes``, optional ``partition``, optional
    ``equality_ids`` (list[int] -> content=2 equality deletes; absent ->
    content=1 position deletes).

    Concurrency: optimistic retry loop — a rebase re-reads the winner's
    manifest list, so the delete manifest lands beside ALL current data
    manifests (row-level delete files conflict with nothing: they only
    narrow visibility of already-committed rows).

    ``committer`` routes the publish through another catalog face
    (``RestCommitter``); default filesystem.
    """
    committer = committer or FilesystemCommitter(table_dir)
    return committer.commit_snapshot(
        lambda td, mdir, md: build_delete_files_snapshot(
            td, mdir, md, delete_files, timestamp_ms
        )
    )


def build_delete_files_snapshot(
    table_dir: str,
    meta_dir: str,
    md: dict,
    delete_files: list[dict],
    timestamp_ms: int | None,
) -> dict:
    """The publish-free half of :func:`commit_delete_files`: encode the
    DELETE manifest, write the new manifest list, return the overwrite
    snapshot. Pure against ``md``."""
    fv = int(md.get("format-version", 1))
    if fv not in (2, 3):
        raise ValueError("row-level deletes require format-version 2/3")
    if fv >= 3 and any(not f.get("equality_ids") for f in delete_files):
        raise ValueError(
            "format-version 3 forbids parquet position-delete files — "
            "publish deletion vectors (iceberg_dv.commit_dv_files / "
            "delete_where) instead; equality deletes remain legal"
        )
    parent = md.get("current-snapshot-id")
    if parent is None:
        raise ValueError("table has no current snapshot")

    snap_id = max(s["snapshot-id"] for s in md["snapshots"]) + 1
    seq = int(md.get("last-sequence-number", 0)) + 1
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    commit_uuid = uuid.uuid5(uuid.NAMESPACE_URL, f"{table_dir}/del/{snap_id}")

    blob, n_entries = _delete_manifest_blob(md, delete_files, snap_id, seq)
    manifest_path = _write_new_file(
        os.path.join(meta_dir, f"{commit_uuid}-d0.avro"), blob
    )

    from iceberg_meta_spark.sources.avro_py import read_container

    prev = next(s for s in md["snapshots"] if s["snapshot-id"] == parent)
    with open(_local_path(prev["manifest-list"]), "rb") as fh:
        _, _, prev_manifests = read_container(fh.read())
    for m in prev_manifests:
        m.setdefault("partitions", None)
    new_manifest = {
        "manifest_path": manifest_path,
        "manifest_length": len(blob),
        "partition_spec_id": int(md["default-spec-id"]),
        "content": 1,  # DELETE manifest
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": n_entries,
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": sum(int(f["record_count"]) for f in delete_files),
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": None,
    }
    mlist_path = _write_new_file(
        os.path.join(meta_dir, f"snap-{snap_id}-{commit_uuid}.avro"),
        write_container(MANIFEST_FILE_SCHEMA,
                        prev_manifests + [new_manifest],
                        metadata={"format-version": _fv_bytes(md)}),
    )
    # row-level deletes leave the DATA files untouched: total-data-files /
    # total-records / total-files-size carry over verbatim from the parent
    # (the logical deletion is tracked by deleted-records and the
    # total-delete-files counter), so warehouse rollups keep reporting the
    # table's real size instead of a hardwired 0
    prev_summary = (prev.get("summary", {}) or {})
    snapshot = {
        "snapshot-id": snap_id,
        "parent-snapshot-id": parent,
        "sequence-number": seq,
        "timestamp-ms": ts,
        "manifest-list": mlist_path,
        "schema-id": md["current-schema-id"],
        "summary": {
            "operation": "overwrite",
            "added-records": "0",
            "deleted-records": str(sum(int(f["record_count"]) for f in delete_files)),
            "added-delete-files": str(n_entries),
            "total-delete-files": str(
                int(prev_summary.get("total-delete-files", 0)) + n_entries
            ),
            "total-data-files": prev_summary.get("total-data-files", "0"),
            "total-records": prev_summary.get("total-records", "0"),
            "total-files-size": prev_summary.get("total-files-size", "0"),
        },
    }
    return snapshot


def commit_merge(
    table_dir: str,
    data_files: list[dict],
    delete_files: list[dict],
    timestamp_ms: int | None = None,
    committer=None,
) -> dict:
    """Publish an upsert as ONE snapshot: a DELETE manifest (the equality
    deletes on the merge keys) AND a DATA manifest (the new rows), both at
    the same sequence number N — the MERGE INTO commit shape. Per spec the
    equality delete applies only where data_seq < N (strict), so it hides
    the OLD rows (seq < N) but never the rows committed WITH it: one
    metadata transaction, no torn read between delete and insert.

    Summary totals are physical (spec): data files/records/bytes grow by
    the added files; the logically-replaced rows stay on disk until
    compaction absorbs them (``rewrite_data_files``).

    Concurrency: optimistic retry loop — a rebased merge re-reads the
    winner's manifests and claims a NEW sequence number, so its equality
    deletes still hide exactly the rows committed before it (seq < N),
    including the concurrent winner's.

    ``committer`` routes the publish through another catalog face
    (``RestCommitter``); default filesystem."""
    committer = committer or FilesystemCommitter(table_dir)
    return committer.commit_snapshot(
        lambda td, mdir, md: build_merge_snapshot(
            td, mdir, md, data_files, delete_files, timestamp_ms
        )
    )


def build_merge_snapshot(
    table_dir: str,
    meta_dir: str,
    md: dict,
    data_files: list[dict],
    delete_files: list[dict],
    timestamp_ms: int | None,
) -> dict:
    """The publish-free half of :func:`commit_merge`: DATA + DELETE
    manifests at one sequence number, new manifest list; returns the
    overwrite snapshot. Pure against ``md``."""
    if int(md.get("format-version", 1)) not in (2, 3):
        raise ValueError("merge commits require format-version 2/3")
    if int(md.get("format-version", 1)) >= 3 and any(
        not f.get("equality_ids") for f in delete_files
    ):
        raise ValueError(
            "format-version 3 forbids parquet position-delete files in a "
            "merge; use equality deletes (merge_into does) or deletion "
            "vectors"
        )
    parent = md.get("current-snapshot-id")
    if parent is None:
        raise ValueError("table has no current snapshot; use commit_append")

    schema = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    types = {f["id"]: f["type"] for f in schema["fields"]}
    partition_fields = _partition_fields_from_spec(md, types)

    snap_id = max(s["snapshot-id"] for s in md["snapshots"]) + 1
    seq = int(md.get("last-sequence-number", 0)) + 1
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    commit_uuid = uuid.uuid5(uuid.NAMESPACE_URL, f"{table_dir}/merge/{snap_id}")

    lineage = int(md.get("format-version", 1)) >= 3
    frid_base = int(md.get("next-row-id", 0)) if lineage else None
    data_entries = _added_data_entries(data_files, snap_id, seq, types,
                                       partition_fields,
                                       first_row_id_base=frid_base)
    data_blob = write_container(
        manifest_entry_schema(partition_fields, with_first_row_id=lineage),
        data_entries,
        metadata={"format-version": _fv_bytes(md), "content": b"data",
                  "partition-spec-id": str(md["default-spec-id"]).encode()},
    )
    data_mpath = _write_new_file(
        os.path.join(meta_dir, f"{commit_uuid}-m0.avro"), data_blob
    )
    del_blob, n_del = _delete_manifest_blob(md, delete_files, snap_id, seq)
    del_mpath = _write_new_file(
        os.path.join(meta_dir, f"{commit_uuid}-d0.avro"), del_blob
    )

    from iceberg_meta_spark.sources.avro_py import read_container

    prev = next(s for s in md["snapshots"] if s["snapshot-id"] == parent)
    with open(_local_path(prev["manifest-list"]), "rb") as fh:
        _, _, prev_manifests = read_container(fh.read())
    for m in prev_manifests:
        m.setdefault("partitions", None)

    added_rows = sum(int(f["record_count"]) for f in data_files)
    added_bytes = sum(int(f["file_size_in_bytes"]) for f in data_files)
    delete_rows = sum(int(f["record_count"]) for f in delete_files)
    common = {
        "partition_spec_id": int(md["default-spec-id"]),
        "min_sequence_number": seq,
        "sequence_number": seq,
        "added_snapshot_id": snap_id,
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": None,
    }
    new_manifests = prev_manifests + [
        {**common, "manifest_path": data_mpath, "manifest_length": len(data_blob),
         "content": 0, "added_files_count": len(data_files),
         "added_rows_count": added_rows},
        {**common, "manifest_path": del_mpath, "manifest_length": len(del_blob),
         "content": 1, "added_files_count": n_del,
         "added_rows_count": delete_rows},
    ]
    mlist_path = _write_new_file(
        os.path.join(meta_dir, f"snap-{snap_id}-{commit_uuid}.avro"),
        write_container(MANIFEST_FILE_SCHEMA, new_manifests,
                        metadata={"format-version": _fv_bytes(md)}),
    )

    prev_summary = (prev.get("summary", {}) or {})
    snapshot = {
        "snapshot-id": snap_id,
        "parent-snapshot-id": parent,
        "sequence-number": seq,
        "timestamp-ms": ts,
        **({"first-row-id": frid_base} if lineage else {}),
        "manifest-list": mlist_path,
        "schema-id": md["current-schema-id"],
        "summary": {
            "operation": "overwrite",
            "added-records": str(added_rows),
            "deleted-records": str(delete_rows),
            "added-data-files": str(len(data_files)),
            "added-delete-files": str(n_del),
            "added-files-size": str(added_bytes),
            "total-delete-files": str(
                int(prev_summary.get("total-delete-files", 0)) + n_del
            ),
            "total-data-files": str(
                int(prev_summary.get("total-data-files", 0)) + len(data_files)
            ),
            "total-records": str(
                int(prev_summary.get("total-records", 0)) + added_rows
            ),
            "total-files-size": str(
                int(prev_summary.get("total-files-size", 0)) + added_bytes
            ),
        },
    }
    return snapshot


def merge_into(
    spark,
    df,
    table_dir: str,
    key_cols: list[str],
    timestamp_ms: int | None = None,
    when_matched: str | None = "update",
    matched_condition: str | None = None,
    when_not_matched: str | None = "insert",
    committer=None,
) -> dict:
    """MERGE INTO on the native path, one published snapshot
    (:func:`commit_merge`): the equality-delete half hides the old row
    versions, the data half carries the new rows at the same sequence
    number. The write-side idiom every CDC consumer needs.

    Clause shape (the SQL MERGE subset ``api.sql`` exposes):

    - ``when_matched="update"`` (default): source rows whose ``key_cols``
      match existing rows REPLACE them.
    - ``when_matched="delete"``: matched target rows are DELETED (their
      source rows are not written).
    - ``when_matched=None``: matched source rows are ignored (insert-only
      merge).
    - ``matched_condition``: SQL expression narrowing which matched rows
      the action applies to (``WHEN MATCHED AND <cond> THEN ...``);
      non-qualifying matches are left untouched. Columns referenced bare
      or as ``s.<col>`` are the SOURCE row's; ``t.<col>`` references the
      matched TARGET row's value (r12 — the CDC staleness guard ``WHEN
      MATCHED AND t.updated_at < s.updated_at THEN UPDATE``). When the
      condition reads target columns, a key matching MORE than one live
      target row raises (the SQL MERGE cardinality rule — pairing would
      be ambiguous).
    - ``when_not_matched="insert"`` (default) inserts unmatched source
      rows; ``None`` drops them.

    Distributed work: the data write + stats ride
    :func:`write_dataframe_files`; the delete file is the qualifying
    distinct key tuples (bounded by the merge batch, written as one
    parquet). The default unconditional upsert needs NO target scan
    (deleting an absent key is a no-op); conditional/delete forms split
    matched from unmatched with ONE left join against the target's
    distinct keys — the same single shuffle-on-keys every engine's MERGE
    pays. A target-reading condition carries exactly the referenced
    ``t.*`` columns through that same join (no extra scan or shuffle)."""
    import glob

    from pyspark.sql import functions as F

    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version, md = _read_meta(meta_dir)
    schema = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    by_name = {f["name"]: int(f["id"]) for f in schema["fields"]}
    missing = [c for c in key_cols if c not in by_name]
    if missing:
        raise KeyError(f"merge keys not in table schema: {missing}")
    if when_matched not in ("update", "delete", None):
        raise ValueError("when_matched must be 'update', 'delete', or None")
    if when_not_matched not in ("insert", None):
        raise ValueError("when_not_matched must be 'insert' or None")
    equality_ids = [by_name[c] for c in key_cols]

    plain_upsert = (
        when_matched == "update" and matched_condition is None
        and when_not_matched == "insert"
    )
    if plain_upsert:
        insert_rows, delete_keys = df, df.select(*key_cols).distinct()
    else:
        # split matched/unmatched with one left join on the target's
        # distinct keys (merge-on-read scan, so already-deleted rows
        # don't count as matches)
        import re as _re

        from iceberg_meta_spark.sources.iceberg_scan import scan_table

        cond = matched_condition
        # t.<col> references read the matched TARGET row: carry exactly
        # those columns through the same left join (aliased __t_* so they
        # never collide with the source's identically-named columns) and
        # rewrite the condition onto the joined frame; s.<col> / bare
        # names stay the source's
        tcols = sorted(set(_re.findall(r"\bt\.(\w+)", cond))) if cond else []
        bad = [c for c in tcols if c not in by_name]
        if bad:
            raise KeyError(f"t.* columns not in table schema: {bad}")
        target = scan_table(spark, table_dir)
        if tcols:
            from pyspark.sql import Window

            w = Window.partitionBy(*[F.col(c) for c in key_cols])
            target_keys = (
                target.select(*key_cols,
                              *[F.col(c).alias(f"__t_{c}") for c in tcols])
                .withColumn("__t_cnt", F.count(F.lit(1)).over(w))
                .withColumn("__matched", F.lit(1))
            )
            cond = _re.sub(r"\bt\.(\w+)", r"__t_\1", cond)
        else:
            target_keys = (
                target.select(*key_cols).distinct()
                .withColumn("__matched", F.lit(1))
            )
        if cond:
            cond = _re.sub(r"\bs\.(\w+)", r"\1", cond)
        tagged = df.join(target_keys, key_cols, "left")
        if tcols:
            # SQL MERGE cardinality rule: a source row matching >1 target
            # row cannot evaluate t.* unambiguously — refuse loudly
            if tagged.where(
                F.col("__matched").isNotNull() & (F.col("__t_cnt") > 1)
            ).limit(1).count():
                raise ValueError(
                    "MERGE matched_condition reads t.* columns but a key "
                    "matches more than one live target row — pairing is "
                    "ambiguous (the ON keys must identify at most one "
                    "target row, like SQL MERGE's cardinality rule)"
                )
        helper_cols = ["__matched", "__t_cnt",
                       *[f"__t_{c}" for c in tcols]]
        drop_helpers = [c for c in helper_cols if c in tagged.columns]
        matched = (tagged.where(F.col("__matched").isNotNull())
                   .drop(*drop_helpers) if not tcols else
                   tagged.where(F.col("__matched").isNotNull()))
        unmatched = tagged.where(F.col("__matched").isNull()).drop(*drop_helpers)
        hit = matched.where(cond) if cond else matched
        if tcols:
            hit = hit.drop(*drop_helpers)
            matched = matched.drop(*drop_helpers)
        if when_matched == "update":
            insert_rows = hit.unionByName(
                unmatched if when_not_matched == "insert"
                else unmatched.limit(0)
            )
            delete_keys = hit.select(*key_cols).distinct()
        elif when_matched == "delete":
            insert_rows = (unmatched if when_not_matched == "insert"
                           else unmatched.limit(0))
            delete_keys = hit.select(*key_cols).distinct()
        else:  # insert-only merge
            insert_rows = (unmatched if when_not_matched == "insert"
                           else unmatched.limit(0))
            delete_keys = unmatched.select(*key_cols).limit(0)
        # column order back to the source's (write schema stability)
        insert_rows = insert_rows.select(*df.columns)

    batch_root = _claim_batch_dir(
        os.path.join(table_dir, "data", f"merge-{version + 1:05d}")
    )
    data_files = write_dataframe_files(
        spark, insert_rows, md, os.path.join(batch_root, "rows")
    )
    key_dir = os.path.join(batch_root, "keys")
    delete_keys.coalesce(1).write.parquet(key_dir)
    [key_path] = glob.glob(os.path.join(key_dir, "*.parquet"))
    n_keys = spark.read.parquet(key_path).count()
    delete_files = [{
        "file_path": key_path,
        "record_count": n_keys,
        "file_size_in_bytes": os.path.getsize(key_path),
        "equality_ids": equality_ids,
    }] if n_keys else []
    if not data_files and not delete_files:
        return md  # nothing qualified: no-op, nothing published
    if not delete_files:
        return commit_append(table_dir, data_files, timestamp_ms=timestamp_ms,
                             committer=committer)
    if not data_files:  # delete-only merge: plain row-level delete commit
        return commit_delete_files(table_dir, delete_files,
                                   timestamp_ms=timestamp_ms,
                                   committer=committer)
    return commit_merge(table_dir, data_files, delete_files,
                        timestamp_ms=timestamp_ms, committer=committer)


def parse_sql_literal(tok: str):
    """'string' / int / float SQL literal -> Python value (the subset the
    WHERE interval dialect and the api.sql DDL parsers accept)."""
    tok = tok.strip()
    if re.fullmatch(r"'[^']*'", tok):
        return tok[1:-1]
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    if re.fullmatch(r"-?\d+\.\d+", tok):
        return float(tok)
    raise ValueError(f"unsupported literal {tok!r}")


def parse_where_intervals(clause: str) -> list[tuple]:
    """Parse an AND-composed WHERE conjunction into the engine's
    (col, lo, hi, lo_strict, hi_strict) predicate list. Each conjunct is
    one of ``col = v``, ``col >= v``, ``col <= v``, ``col > v``,
    ``col < v``, ``col BETWEEN lo AND hi`` (literals: 'string', int,
    float). BETWEEN's inner AND binds tighter than the conjunction's —
    matched first at each position. Raises ValueError on anything else;
    callers with arbitrary expressions fall back to
    :func:`split_where_conjuncts` + a residual row filter."""
    lit = r"'[^']*'|-?\d+(?:\.\d+)?"
    tok_between = re.compile(
        rf"(\w+)\s+BETWEEN\s+({lit})\s+AND\s+({lit})", re.IGNORECASE)
    tok_cmp = re.compile(rf"(\w+)\s*(>=|<=|=|<|>)\s*({lit})")
    tok_and = re.compile(r"\s*AND\s+", re.IGNORECASE)
    s = clause.strip()
    preds: list[tuple] = []
    pos = 0
    while True:
        m = tok_between.match(s, pos)
        if m:
            preds.append((m.group(1), parse_sql_literal(m.group(2)),
                          parse_sql_literal(m.group(3)), False, False))
        else:
            m = tok_cmp.match(s, pos)
            if not m:
                raise ValueError(
                    f"not an interval conjunction at: {s[pos:]!r} "
                    "(use col =/>=/<=/>/< literal or col BETWEEN lo AND hi, "
                    "AND-composed)"
                )
            col, op, rhs = m.group(1), m.group(2), m.group(3)
            v = parse_sql_literal(rhs)
            preds.append({
                "=": (col, v, v, False, False),
                ">=": (col, v, None, False, False),
                "<=": (col, None, v, False, False),
                ">": (col, v, None, True, False),
                "<": (col, None, v, False, True),
            }[op])
        pos = m.end()
        if pos >= len(s):
            return preds
        m = tok_and.match(s, pos)
        if not m:
            raise ValueError(f"expected AND between predicates at: {s[pos:]!r}")
        pos = m.end()


def split_where_conjuncts(clause: str) -> list[str]:
    """Split a boolean expression into its TOP-LEVEL AND conjuncts —
    respecting parens and string literals — or return [] when a top-level
    OR makes conjunct extraction unsound (every AND would then live under
    the OR, so no conjunct is implied by the whole expression)."""
    parts: list[str] = []
    buf: list[str] = []
    depth, in_str = 0, False
    tokens = re.split(r"(\s+|\(|\)|')", clause)
    has_or = False
    for tok in tokens:
        if tok == "'":
            in_str = not in_str
            buf.append(tok)
            continue
        if not in_str:
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
            elif depth == 0 and tok.upper() == "AND":
                parts.append("".join(buf))
                buf = []
                continue
            elif depth == 0 and tok.upper() == "OR":
                has_or = True
        buf.append(tok)
    if buf:
        parts.append("".join(buf))
    if has_or:
        return []
    return [p.strip() for p in parts if p.strip()]


def _predicate_plan(predicate) -> tuple[list[tuple], str | None]:
    """Normalize a DELETE/UPDATE predicate into (interval 5-tuples used
    for FILE PRUNING, residual SQL applied as the ROW FILTER).

    - tuples / lists of tuples (the programmatic shape): intervals only,
      no residual — pruning and filtering both ride the intervals.
    - a string that parses as an interval conjunction: same fast path.
    - any other string (OR / IN / != / functions / cross-column): the
      WHOLE expression becomes the residual row filter — correctness
      never depended on the interval shape — and any top-level AND
      conjunct that DOES parse as an interval still contributes file
      pruning (zone-map pruning is conservative, so a partial conjunct
      set is always sound; a top-level OR yields no conjuncts)."""
    if isinstance(predicate, str):
        try:
            return parse_where_intervals(predicate), None
        except ValueError:
            intervals: list[tuple] = []
            for part in split_where_conjuncts(predicate):
                try:
                    intervals.extend(parse_where_intervals(part))
                except ValueError:
                    pass
            return intervals, predicate
    return _norm_predicates(predicate), None


def _norm_predicates(predicate) -> list[tuple]:
    """Normalize DELETE predicates to (col, lo, hi, lo_strict, hi_strict)
    5-tuples. Accepts one 3-tuple (closed interval, the scan planner's
    shape), one 5-tuple (strict flags for open bounds), or a LIST of
    either (a conjunction, ANDed)."""
    preds = [predicate] if isinstance(predicate, tuple) else list(predicate)
    out = []
    for p in preds:
        if len(p) == 3:
            col, lo, hi = p
            ls = hs = False
        elif len(p) == 5:
            col, lo, hi, ls, hs = p
        else:
            raise ValueError(f"predicate must be a 3- or 5-tuple, got {p!r}")
        out.append((col, lo, hi, bool(ls), bool(hs)))
    return out


def delete_where(
    spark,
    table_dir: str,
    predicate,
    timestamp_ms: int | None = None,
    committer=None,
) -> dict:
    """DELETE FROM ... WHERE — predicates over the merge-on-read scan:
    resolve the matching rows' physical (file, position) pairs — so rows
    already hidden by earlier deletes are never re-deleted — and publish
    them as ONE position-delete commit. The row-level DELETE verb over
    the same machinery MERGE uses.

    ``predicate``: ``(col, lo, hi)`` closed interval (``None`` = open
    end), ``(col, lo, hi, lo_strict, hi_strict)`` for strict ``<`` / ``>``
    bounds, a LIST of either (a conjunction, ANDed) — or, r12, ANY Spark
    SQL boolean expression as a STRING (``OR`` / ``IN`` / ``!=`` /
    functions / cross-column predicates). File pruning uses each
    extractable interval conjunct's CLOSED hull (zone-map pruning is
    conservative, so a partial conjunct set is always sound; a top-level
    OR prunes nothing); the full expression runs as the residual ROW
    filter over the merge-on-read scan — the same prune/filter split
    every engine's scan does, and correctness never depends on the
    interval shape.

    Distributed work: file pruning + the matching scan are the planner's
    own plan; the delete file is written sorted by (file, pos) per the
    spec's recommendation. One output file per delete batch (bounded by
    the matched-row count — the scope a single DELETE statement has);
    shard upstream for larger sweeps. No matches -> no-op, nothing
    published, {"rows_deleted": 0, "snapshot_id": None}."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from iceberg_meta_spark.sources.iceberg_scan import _merged_rows, plan_scan

    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version, md = _read_meta(meta_dir)

    preds, residual = _predicate_plan(predicate)
    plan = plan_scan(
        spark, table_dir,
        predicate=[(c, lo, hi) for c, lo, hi, _, _ in preds] or None,
    )
    rows = _merged_rows(spark, plan, plan.data_files, keep_helpers=True)
    if rows is None:
        return {"rows_deleted": 0, "snapshot_id": None}
    if residual is not None:
        # the intervals (if any) were implied conjuncts used for file
        # pruning only; the expression itself is the complete row filter
        rows = rows.where(F.expr(residual))
    else:
        for col, lo, hi, lo_strict, hi_strict in preds:
            if lo is not None:
                rows = rows.where(
                    F.col(col) > F.lit(lo) if lo_strict
                    else F.col(col) >= F.lit(lo)
                )
            if hi is not None:
                rows = rows.where(
                    F.col(col) < F.lit(hi) if hi_strict
                    else F.col(col) <= F.lit(hi)
                )
    if int(md.get("format-version", 1)) >= 3:
        # v3: the DELETE verb publishes deletion vectors, not parquet
        # position-delete files — per-file roaring bitmaps merged with any
        # previous DV (one-DV-per-file invariant), encoded executor-side
        from iceberg_meta_spark.sources.iceberg_dv import delete_where_dv

        return delete_where_dv(
            spark, table_dir, plan, rows.select("__file", "__pos"),
            version, timestamp_ms=timestamp_ms, committer=committer,
        )
    hits = (
        rows.select(F.col("__file").alias("file_path"),
                    F.col("__pos").alias("pos"))
        .sort("file_path", "pos")
        .coalesce(1)
    )
    del_dir = _claim_batch_dir(
        os.path.join(table_dir, "data", f"delete-{version + 1:05d}")
    )
    hits.write.mode("overwrite").parquet(del_dir)
    [dp] = glob.glob(os.path.join(del_dir, "*.parquet"))
    n = spark.read.parquet(dp).count()
    if n == 0:
        shutil.rmtree(del_dir)
        return {"rows_deleted": 0, "snapshot_id": None}
    md = commit_delete_files(table_dir, [{
        "file_path": dp,
        "record_count": n,
        "file_size_in_bytes": os.path.getsize(dp),
    }], timestamp_ms=timestamp_ms, committer=committer)
    return {"rows_deleted": int(n),
            "snapshot_id": int(md["current-snapshot-id"])}


def update_where(
    spark,
    table_dir: str,
    set_exprs: dict[str, object],
    predicate,
    timestamp_ms: int | None = None,
    committer=None,
) -> dict:
    """UPDATE ... SET ... WHERE — row-level update over the merge-on-read
    scan: resolve the matching LIVE rows (same predicate shapes as
    :func:`delete_where`, including arbitrary SQL expression strings),
    rewrite them with ``set_exprs`` applied
    (column -> Spark SQL expression string, or a literal), and publish
    ONE atomic snapshot in which the old versions are hidden and the new
    versions are served:

    - v2: a position-delete file for the matched (file, pos) pairs plus
      the rewritten rows as new data files, committed together
      (:func:`commit_merge`'s overwrite shape).
    - v3: deletion vectors (merged with any prior DV per touched file)
      plus the rewritten rows, committed together
      (``commit_dv_files(add_data_files=...)``); rewritten rows get fresh
      v3 row-lineage ids (the spec default for unmaterialized lineage).

    Distributed shape: file pruning + the matching scan are the planner's
    plan; the SET expressions run JVM-side (``F.expr``); the rewrite
    write + stats ride :func:`write_dataframe_files`. No matches -> no-op,
    nothing published."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from iceberg_meta_spark.sources.iceberg_scan import _merged_rows, plan_scan

    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version, md = _read_meta(meta_dir)
    schema = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    schema_cols = [f["name"] for f in schema["fields"]]
    unknown = [c for c in set_exprs if c not in schema_cols]
    if unknown:
        raise KeyError(f"SET columns not in table schema: {unknown}")

    fv3 = int(md.get("format-version", 1)) >= 3
    preds, residual = _predicate_plan(predicate)
    plan = plan_scan(
        spark, table_dir,
        predicate=[(c, lo, hi) for c, lo, hi, _, _ in preds] or None,
    )
    rows = _merged_rows(spark, plan, plan.data_files, keep_helpers=True,
                        keep_lineage_cols=fv3)
    if rows is None:
        return {"rows_updated": 0, "snapshot_id": None}
    if residual is not None:
        rows = rows.where(F.expr(residual))
    else:
        for col, lo, hi, lo_strict, hi_strict in preds:
            if lo is not None:
                rows = rows.where(
                    F.col(col) > F.lit(lo) if lo_strict
                    else F.col(col) >= F.lit(lo)
                )
            if hi is not None:
                rows = rows.where(
                    F.col(col) < F.lit(hi) if hi_strict
                    else F.col(col) <= F.lit(hi)
                )

    updated = rows
    declared = {f["name"]: f["type"] for f in schema["fields"]}
    for col, expr in set_exprs.items():
        new_val = F.expr(expr) if isinstance(expr, str) else F.lit(expr)
        # cast to the declared type: a SQL literal 1 is INT while the
        # column declares long — mixed-width batches would break the
        # mergeSchema read, same rule as the SQL INSERT path
        from iceberg_meta_spark.sources.iceberg_scan import _ICEBERG_TO_SPARK

        updated = updated.withColumn(
            col, new_val.cast(_ICEBERG_TO_SPARK.get(declared[col], "string"))
        )

    out_cols = list(schema_cols)
    if fv3:
        # v3 row lineage: an UPDATE rewrites EXISTING rows, so the new
        # files MATERIALIZE _row_id (spec: a moved row keeps its id) —
        # _last_updated_sequence_number is NOT written, so readers derive
        # it from the new file's data sequence, which IS the update's
        # (the row was just modified)
        from iceberg_meta_spark.sources.iceberg_scan import (
            _with_lineage_columns,
        )

        updated = _with_lineage_columns(
            spark, updated, plan.data_files, keep_helpers=True
        ).drop("_last_updated_sequence_number")
        out_cols.append("_row_id")
    batch_dir = _claim_batch_dir(
        os.path.join(table_dir, "data", f"update-{version + 1:05d}")
    )
    data_files = write_dataframe_files(
        spark, updated.select(*out_cols), md, os.path.join(batch_dir, "rows")
    )
    n = sum(int(f["record_count"]) for f in data_files)
    if n == 0:
        shutil.rmtree(batch_dir, ignore_errors=True)
        return {"rows_updated": 0, "snapshot_id": None}

    if int(md.get("format-version", 1)) >= 3:
        from iceberg_meta_spark.sources.iceberg_dv import delete_where_dv

        out = delete_where_dv(
            spark, table_dir, plan, rows.select("__file", "__pos"),
            version, timestamp_ms=timestamp_ms, add_data_files=data_files,
            committer=committer,
        )
        return {"rows_updated": n, "snapshot_id": out["snapshot_id"]}

    hits = (
        rows.select(F.col("__file").alias("file_path"),
                    F.col("__pos").alias("pos"))
        .sort("file_path", "pos")
        .coalesce(1)
    )
    del_dir = os.path.join(batch_dir, "deletes")
    hits.write.mode("overwrite").parquet(del_dir)
    [dp] = glob.glob(os.path.join(del_dir, "*.parquet"))
    new_md = commit_merge(table_dir, data_files, [{
        "file_path": dp,
        "record_count": n,
        "file_size_in_bytes": os.path.getsize(dp),
    }], timestamp_ms=timestamp_ms, committer=committer)
    return {"rows_updated": n,
            "snapshot_id": int(new_md["current-snapshot-id"])}


def create_table(
    table_dir: str,
    fields: list[tuple[int, str, str]],
    partition_fields: list[tuple[str, int, int]] | None = None,
    properties: dict | None = None,
    timestamp_ms: int = 1713139200000,
    format_version: int = 2,
) -> dict:
    """CREATE TABLE, HadoopTables protocol: write v1.metadata.json (v2
    format, zero snapshots) + version-hint.text for a new filesystem table.

    ``fields``: (field-id, name, type) of the table schema; required for
    ids ≤ 2 mirrors the fixture's convention but all fields are optional
    here. ``partition_fields``: (name, source-field-id, partition-field-id)
    identity transforms, or a 4-tuple adding the transform string —
    ``("id_bucket", 2, 1000, "bucket[4]")``, ``("ts_month", 3, 1001,
    "month")`` (spec § Partition Transforms; validated at create time).
    Default unpartitioned. The created table is immediately consumable by
    the native reader and every commit path. ``format_version=3`` creates
    a v3 table (deletion vectors via ``iceberg_dv.commit_dv_files``; v2
    parquet position-delete commits refuse v3 tables)."""
    if int(format_version) not in (2, 3):
        raise ValueError("format_version must be 2 or 3")
    from iceberg_meta_spark.sources.iceberg_transforms import result_avro_type

    type_by_fid = {fid: typ for fid, _, typ in fields}
    name_by_fid = {fid: name for fid, name, _ in fields}
    pf_norm = []
    for tup in (partition_fields or []):
        n, sid, pfid = tup[0], tup[1], tup[2]
        transform = tup[3] if len(tup) > 3 else "identity"
        if sid not in type_by_fid:
            raise KeyError(
                f"partition field {n!r}: source-id {sid} matches no column"
            )
        # reject unknown transforms AND unsupported (transform, type)
        # pairs at DDL time, not at first commit
        result_avro_type(transform, type_by_fid[sid])
        pf_norm.append((n, sid, pfid, transform))
    _check_partition_names(
        [(n, t, name_by_fid[sid]) for n, sid, _pfid, t in pf_norm],
        {name for _, name, _ in fields},
    )
    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    if os.path.exists(os.path.join(meta_dir, "version-hint.text")):
        raise FileExistsError(f"table already exists at {table_dir}")
    md = {
        "format-version": int(format_version),
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, table_dir)),
        "location": table_dir,
        # v3 row lineage (spec § Row Lineage): the row-id high-water mark
        # commits advance as they assign first_row_id to added data files
        **({"next-row-id": 0} if int(format_version) >= 3 else {}),
        "last-sequence-number": 0,
        "last-updated-ms": int(timestamp_ms),
        "last-column-id": max(fid for fid, _, _ in fields),
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": fid, "name": name, "required": False, "type": typ}
                    for fid, name, typ in fields
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {"name": n, "transform": t, "source-id": sid, "field-id": pfid}
                    for n, sid, pfid, t in pf_norm
                ],
            }
        ],
        "last-partition-id": max(
            (pfid for _, _, pfid, _ in pf_norm), default=999
        ),
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": properties or {"write.format.default": "parquet"},
        "current-snapshot-id": None,
        "refs": {},
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(md, fh, indent=1)
    tmp = os.path.join(meta_dir, ".version-hint.text.tmp")
    with open(tmp, "w") as fh:
        fh.write("1")
    os.replace(tmp, os.path.join(meta_dir, "version-hint.text"))
    return md


_LEGAL_WIDENINGS = {("int", "long"), ("float", "double")}


def build_evolved_schema(
    md: dict,
    add: list[tuple] | None = None,
    drop: list[str] | None = None,
    rename: dict[str, str] | None = None,
    widen: dict[str, str] | None = None,
) -> tuple[list[dict], int]:
    """The pure half of schema evolution, shared by the filesystem face
    (:func:`update_schema`) and the REST face (``rest_update_schema``) so
    the two faces cannot drift on validation: fresh ids for adds (never
    reused), id-stable renames, legal-promotion-only widens, and the
    partition-source drop guard. Returns (new field list, last column
    id)."""
    cur = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    fields = [dict(f) for f in cur["fields"]]
    names = {f["name"] for f in fields}
    # widen BEFORE rename: a combined call addresses columns by their
    # PRE-rename names (the reader's mental model of one ALTER statement)
    for name, new_type in (widen or {}).items():
        if name not in names:
            raise KeyError(f"no column {name!r} to widen")
        f = next(f for f in fields if f["name"] == name)
        if (f["type"], new_type) not in _LEGAL_WIDENINGS:
            raise ValueError(
                f"illegal type promotion {f['type']} -> {new_type}; the "
                "spec allows int -> long and float -> double"
            )
        f["type"] = new_type
    for old, new in (rename or {}).items():
        if old not in names:
            raise KeyError(f"no column {old!r} to rename")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        for f in fields:
            if f["name"] == old:
                f["name"] = new
        names = {f["name"] for f in fields}
    # Iceberg forbids dropping a column any partition spec sources: the
    # spec would keep a dangling source-id, partition-value injection and
    # pruning would silently stop, and equality deletes keyed on the field
    # would fail to resolve. (Equality-delete key columns carry the same
    # caveat; delete files name field ids, so a dropped id orphans them.)
    partition_source_ids = {
        int(pf["source-id"])
        for spec in md.get("partition-specs", [])
        for pf in spec.get("fields", [])
    }
    for name in drop or []:
        if name not in names:
            raise KeyError(f"no column {name!r} to drop")
        fid = next(f["id"] for f in fields if f["name"] == name)
        if int(fid) in partition_source_ids:
            raise ValueError(
                f"cannot drop {name!r}: it is a partition source column "
                f"(field id {fid}) of an existing partition spec"
            )
        fields = [f for f in fields if f["name"] != name]
        names.discard(name)
    last_id = int(md.get("last-column-id", max(f["id"] for f in fields)))
    for tup in add or []:
        name, typ = tup[0], tup[1]
        default = tup[2] if len(tup) > 2 else None
        if name in names:
            raise ValueError(f"column {name!r} already exists")
        if default is not None and int(md.get("format-version", 1)) < 3:
            raise ValueError(
                "column defaults (initial-default) are a format-version 3 "
                "feature; upgrade the table or add the column without one"
            )
        last_id += 1
        fields.append({
            "id": last_id, "name": name, "required": False, "type": typ,
            **({"initial-default": default, "write-default": default}
               if default is not None else {}),
        })
        names.add(name)
    return fields, last_id


def update_schema(
    table_dir: str,
    add: list[tuple] | None = None,
    drop: list[str] | None = None,
    rename: dict[str, str] | None = None,
    timestamp_ms: int | None = None,
    widen: dict[str, str] | None = None,
) -> dict:
    """ALTER TABLE schema evolution (spec § Schema Evolution): publish a new
    schema version — columns added get FRESH field ids (never reused, so
    old data files resolve by id), drops remove the field from the current
    schema only (historical schemas stay in ``schemas`` for time travel),
    renames keep the field id (rename is metadata-only). The new schema
    becomes ``current-schema-id`` in a new metadata version; no snapshot is
    created (schema changes are not data changes).

    ``add`` tuples are ``(name, type)`` or — v3 tables only —
    ``(name, type, default)`` (spec § Default values): the default is
    stored as the field's ``initial-default`` AND ``write-default``;
    scans serve it for rows in files written BEFORE the column existed
    (per-file resolution via the adding snapshot's schema-id), while
    explicitly-written NULLs in newer files stay NULL.

    ``widen`` promotes a column's type in place (same field id), limited
    to the spec's legal promotions: ``int -> long`` and ``float ->
    double``. Files written at the narrow width keep reading correctly —
    the scan switches to an explicit promoted read schema and bound
    decoding is buffer-width-aware.
    """
    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version, md = _read_meta(meta_dir)
    fields, last_id = build_evolved_schema(
        md, add=add, drop=drop, rename=rename, widen=widen
    )
    new_schema = {
        "type": "struct",
        "schema-id": max(s["schema-id"] for s in md["schemas"]) + 1,
        "fields": fields,
    }
    md["schemas"] = md["schemas"] + [new_schema]
    md["current-schema-id"] = new_schema["schema-id"]
    md["last-column-id"] = last_id
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    md["metadata-log"] = md.get("metadata-log", []) + [
        {"metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
         "timestamp-ms": int(md["last-updated-ms"])}
    ]
    md["last-updated-ms"] = ts
    with open(os.path.join(meta_dir, f"v{version + 1}.metadata.json"), "x") as fh:
        json.dump(md, fh, indent=1)
    tmp_hint = os.path.join(meta_dir, ".version-hint.text.tmp")
    with open(tmp_hint, "w") as fh:
        fh.write(str(version + 1))
    os.replace(tmp_hint, os.path.join(meta_dir, "version-hint.text"))
    return md


def rollback_to_snapshot(
    table_dir: str, snapshot_id: int, timestamp_ms: int | None = None
) -> dict:
    """Iceberg's rollback: point the table back at an EXISTING snapshot
    (spec: rollback does not rewrite history — the target must still be in
    the snapshot list; newer snapshots stay for time travel until expiry).
    Publishes a new metadata version with current-snapshot-id (and the
    main branch ref) at the target and a snapshot-log entry recording the
    rollback as a state change."""
    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version, md = _read_meta(meta_dir)
    if not any(s["snapshot-id"] == snapshot_id for s in md.get("snapshots", [])):
        raise KeyError(f"snapshot {snapshot_id} not in table metadata")
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    md["current-snapshot-id"] = snapshot_id
    if "main" in (md.get("refs") or {}):
        md["refs"]["main"]["snapshot-id"] = snapshot_id
    md["snapshot-log"] = md.get("snapshot-log", []) + [
        {"snapshot-id": snapshot_id, "timestamp-ms": ts}
    ]
    md["metadata-log"] = md.get("metadata-log", []) + [
        {"metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
         "timestamp-ms": int(md["last-updated-ms"])}
    ]
    md["last-updated-ms"] = ts
    with open(os.path.join(meta_dir, f"v{version + 1}.metadata.json"), "x") as fh:
        json.dump(md, fh, indent=1)
    tmp_hint = os.path.join(meta_dir, ".version-hint.text.tmp")
    with open(tmp_hint, "w") as fh:
        fh.write(str(version + 1))
    os.replace(tmp_hint, os.path.join(meta_dir, "version-hint.text"))
    return md


def _claim_batch_dir(base: str) -> str:
    """Atomically claim a unique batch directory for one write.
    ``makedirs(exist_ok=False)`` is the claim: the single-writer path keeps
    the deterministic versioned name (fixture oracles pin it), a concurrent
    writer that read the same metadata version gets ``base-rK``. The caller
    then writes INTO the claimed (empty) dir with overwrite mode."""
    d, k = base, 0
    while True:
        try:
            os.makedirs(d, exist_ok=False)
            return d
        except FileExistsError:
            k += 1
            d = f"{base}-r{k}"


def write_dataframe_files(
    spark, df, md: dict, batch_dir: str, mode: str = "errorifexists"
) -> list[dict]:
    """Write ``df`` as parquet under ``batch_dir`` (Hive layout when the
    default spec identity-partitions on columns ``df`` carries) and return
    the commit-ready file dicts with REAL per-file statistics — record
    counts, byte sizes, and Appendix-D min/max bounds for every int/long/
    string column (string bounds metrics-truncated to 16 codepoints, upper
    side incremented), computed by one distributed pass over the just-written files
    (groupBy on ``_metadata.file_path``). Shared by INSERT
    (:func:`append_dataframe`), MERGE (:func:`merge_into`) and compaction
    (``iceberg_maintenance.rewrite_data_files``).

    File COUNT per write is bounded by the write's task count (the same
    planning-index scale every commit already handles driver-side)."""
    from pyspark.sql import functions as F

    schema = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    stat_cols = {
        f["name"]: (int(f["id"]), f["type"])
        for f in schema["fields"]
        if f["type"] in ("int", "long", "string") and f["name"] in df.columns
    }
    # partition columns of the default spec that df carries: the write
    # lays them out Hive-style and the commit records each file's
    # partition tuple. Identity fields partition BY the source column
    # (Spark drops it from the file; scan_table re-injects the value from
    # metadata). Transformed fields (bucket/truncate/year/month/day/hour)
    # partition by a DERIVED column computed with the transform's Spark
    # expression — the source column stays in the data file, only the
    # derived value rides the directory + manifest partition tuple.
    from iceberg_meta_spark.sources.iceberg_transforms import spark_expr

    id_to_name = {f["id"]: f["name"] for f in schema["fields"]}
    type_by_id = {f["id"]: f["type"] for f in schema["fields"]}
    spec = next(
        s for s in md["partition-specs"] if s["spec-id"] == md["default-spec-id"]
    )
    # (spec field name, transform, source col, source type), df-carried only
    part_fields = [
        (f["name"], f["transform"], id_to_name[f["source-id"]],
         type_by_id[f["source-id"]])
        for f in spec["fields"]
        if id_to_name.get(f["source-id"]) in df.columns
    ]
    out_df, part_cols = df, []
    for fname, transform, src, styp in part_fields:
        if transform == "identity":
            part_cols.append(src)
        else:
            out_df = out_df.withColumn(fname, spark_expr(transform, src, styp))
            part_cols.append(fname)
    # table default sort order: sort WITHIN write tasks (no shuffle) so
    # every file is internally ordered — tight row-group locality and the
    # order engines expect from a WRITE ORDERED BY table
    order_cols = default_sort_columns(md)
    sort_cols = [(c, d) for c, d in order_cols if c in out_df.columns]
    # entries are stamped with the order id ONLY when the write satisfied
    # the ENTIRE default order (every order column present); a partial
    # sort must not claim the order to downstream planners
    sorted_under_default = bool(sort_cols) and len(sort_cols) == len(order_cols)
    if sort_cols:
        out_df = out_df.sortWithinPartitions(
            *[F.col(c).asc() if d == "asc" else F.col(c).desc()
              for c, d in sort_cols]
        )
    writer = out_df.write.mode(mode)
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(batch_dir)

    # identity-partitioned sources are directory-only in the written files
    # (Spark drops them); the re-read would re-add them through Hive TYPE
    # INFERENCE, which corrupts numeric-looking strings ('00123' -> 123).
    # They are excluded from the stats pass — an identity column's
    # partition value IS its bound and the planner prunes it by partition,
    # never by zone map — and partition values are parsed from the FILE
    # PATH below, preserving the exact written string.
    identity_srcs = {src for _, tr, src, _ in part_fields if tr == "identity"}
    stat_cols = {n: v for n, v in stat_cols.items() if n not in identity_srcs}
    int_cols = {n: fid for n, (fid, _t) in stat_cols.items()}

    written = spark.read.parquet(batch_dir)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name in int_cols:
        aggs.append(F.min(name).alias(f"__lo_{name}"))
        aggs.append(F.max(name).alias(f"__hi_{name}"))
        aggs.append(
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0)).alias(f"__nn_{name}")
        )
    per_file = (
        written.groupBy(F.col("_metadata.file_path").alias("__fp"))
        .agg(*aggs)
        .collect()
    )
    # byte sizes via a local directory walk (the write path is local-fs
    # throughout — see _local_path uses above); a Spark binaryFile listing
    # job here cost a full scheduler round trip per commit
    # abspath: _metadata.file_path is always absolute, so the size keys
    # must be too — a relative batch_dir would otherwise miss every lookup
    # and silently write file_size_in_bytes=0 into the manifests
    sizes = {}
    for dirpath, _dirs, files in os.walk(os.path.abspath(_local_path(batch_dir))):
        for fname in files:
            if fname.endswith(".parquet"):
                fp = os.path.join(dirpath, fname)
                sizes[fp] = os.path.getsize(fp)

    def _strip(p: str) -> str:
        while p.startswith("file:"):
            p = p[len("file:"):]
        return "/" + p.lstrip("/") if p.startswith("/") else p

    def _norm(p: str) -> str:
        # for _metadata.file_path values ONLY: strip the scheme AND
        # url-decode the one URI layer _metadata adds on top of the
        # on-disk name — manifests must store the ON-DISK path (the form
        # spark.read.parquet can open; Hive-escaped dirs like 'k=a%3Db'
        # read back as 'k=a%253Db'). binaryFile paths are ALREADY on-disk
        # (probe-verified) and use _strip. unquote leaves literal '+'.
        import urllib.parse as _u

        return _strip(_u.unquote(p))

    sizes = {_strip(k): v for k, v in sizes.items()}
    # partition values parse from the Hive FILE PATH ('.../col=value/...'),
    # NOT from partition-discovery columns — directory parsing preserves
    # the exact written string ('00123' stays '00123'; discovery would
    # type-infer it to 123) and un-escapes Spark's %XX path encoding
    import re as _re
    import urllib.parse as _up

    from iceberg_meta_spark.sources.iceberg_transforms import result_avro_type

    pmeta_by_col = {}  # partitionBy col -> (spec field name, avro type)
    for fname, transform, src, styp in part_fields:
        col = src if transform == "identity" else fname
        pmeta_by_col[col] = (fname, result_avro_type(transform, styp))

    def _pcast(v, avro_t: str):
        if v is None:
            return None
        if avro_t in ("int", "long"):
            return int(v)
        if avro_t == "string":
            return str(v)
        return v

    def _part_from_path(path: str) -> dict:
        out = {}
        for c in part_cols:
            # LAST match: a table rooted under a directory that itself
            # contains a 'col=value' segment (/data/region=us/tables/t)
            # must not shadow the Hive dir the WRITE just laid down —
            # partition dirs are always the innermost segments
            ms = _re.findall(f"/{_re.escape(c)}=([^/]+)(?=/)", path)
            # `path` is the _norm'd ON-DISK path (URI layer already
            # decoded), so ONE unquote inverts the remaining Hive
            # escaping ('a%3Db' -> 'a=b'); probe-verified
            v = _up.unquote(ms[-1]) if ms else None
            if v == "__HIVE_DEFAULT_PARTITION__":
                v = None
            fname, at = pmeta_by_col[c]
            out[fname] = _pcast(v, at)
        return out

    files = []
    for r in per_file:
        path = _norm(r["__fp"])
        lows, highs = {}, {}
        for n, (fid, typ) in stat_cols.items():
            lo, hi = r[f"__lo_{n}"], r[f"__hi_{n}"]
            if typ == "string":
                # spec Appendix D metrics truncation (default length 16):
                # a truncated LOWER bound is still <= every value; the
                # UPPER bound truncates then increments the last codepoint
                # so it stays >= every value — both directions keep the
                # zone-map prune conservative
                lo = truncate_lower_bound(lo) if lo is not None else None
                hi = truncate_upper_bound(hi) if hi is not None else None
            if lo is not None:
                lows[fid] = lo
            if hi is not None:
                highs[fid] = hi
        files.append({
            "file_path": path,
            "record_count": int(r["__n"]),
            "file_size_in_bytes": sizes.get(path, 0),
            "value_counts": {fid: int(r["__n"]) for fid in int_cols.values()},
            "null_value_counts": {
                fid: int(r[f"__nn_{n}"]) for n, fid in int_cols.items()
            },
            "lower_bounds": lows,
            "upper_bounds": highs,
            **({"partition": _part_from_path(path)} if part_cols else {}),
            # files written sorted under the table's default order carry its
            # id (spec: sort_order_id names the order the file satisfies);
            # unsorted writes stay 0 via _added_data_entries' default
            **(
                {"sort_order_id": int(md.get("default-sort-order-id", 0))}
                if sorted_under_default else {}
            ),
        })
    return files


def append_dataframe(
    spark,
    df,
    table_dir: str,
    timestamp_ms: int | None = None,
    branch: str | None = None,
    extra_summary: dict[str, str] | None = None,
    extra_properties: dict[str, str] | None = None,
    committer=None,
) -> dict:
    """INSERT INTO: write ``df`` into the table's data dir with real
    per-file statistics (:func:`write_dataframe_files`) and commit the
    files as one append snapshot. The committed bounds immediately feed
    the scan planner's zone-map pruning, so an inserted-then-queried
    table prunes like an engine-written one. ``branch=`` stages the
    commit on a named branch (write-audit-publish); see
    :func:`commit_append` and :func:`fast_forward`. ``committer`` routes
    the publish through another catalog face (``RestCommitter``)."""
    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version, md = _read_meta(meta_dir)
    batch_dir = _claim_batch_dir(
        os.path.join(table_dir, "data", f"commit-{version + 1:05d}")
    )
    files = write_dataframe_files(spark, df, md, batch_dir, mode="overwrite")
    return commit_append(table_dir, files, timestamp_ms=timestamp_ms,
                         branch=branch, extra_summary=extra_summary,
                         extra_properties=extra_properties,
                         committer=committer)


def build_evolved_partition_spec(
    md: dict,
    add_identity: list[str] | None = None,
    add_fields: list[tuple[str, str, str]] | None = None,
    drop_fields: list[str] | None = None,
) -> tuple[list[dict], int]:
    """The pure half of partition evolution, shared by the filesystem face
    (:func:`update_partition_spec`) and the REST face
    (``rest_update_partition_spec``): fresh partition field ids (never
    reused), one (source, transform) pair per spec, DDL-time transform/
    type validation. Returns (new partition field list, last partition
    id)."""
    from iceberg_meta_spark.sources.iceberg_transforms import (
        parse_transform,
        result_avro_type,
    )

    schema = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    by_name = {f["name"]: f for f in schema["fields"]}
    cur_spec = next(
        s for s in md["partition-specs"] if s["spec-id"] == md["default-spec-id"]
    )
    new_fields = [dict(f) for f in cur_spec["fields"]]
    for fname in drop_fields or []:
        if not any(f["name"] == fname for f in new_fields):
            raise KeyError(
                f"no partition field {fname!r} in the current spec "
                f"(fields: {[f['name'] for f in new_fields]})"
            )
        new_fields = [f for f in new_fields if f["name"] != fname]
    existing = {(f["source-id"], f["transform"]) for f in new_fields}
    last_pid = int(md.get("last-partition-id", 999))
    additions = [(name, "identity", name) for name in (add_identity or [])]
    additions += [tuple(t) for t in (add_fields or [])]
    _check_partition_names(
        additions,
        set(by_name),
        taken_names={f["name"] for f in new_fields},
    )
    for fname, transform, src in additions:
        parse_transform(transform)
        if src not in by_name:
            raise KeyError(f"no column {src!r} to partition by")
        # reject unsupported (transform, type) pairs at DDL time
        result_avro_type(transform, by_name[src].get("type", "long"))
        key = (by_name[src]["id"], transform)
        if key in existing:
            raise ValueError(
                f"({src!r}, {transform!r}) already partitions the table"
            )
        existing.add(key)
        last_pid += 1
        new_fields.append(
            {"name": fname, "transform": transform,
             "source-id": by_name[src]["id"], "field-id": last_pid}
        )
    return new_fields, last_pid


def update_partition_spec(
    table_dir: str,
    add_identity: list[str] | None = None,
    timestamp_ms: int | None = None,
    add_fields: list[tuple[str, str, str]] | None = None,
    drop_fields: list[str] | None = None,
) -> dict:
    """Partition evolution (spec § Partition Evolution): publish a NEW
    default partition spec extending the current one with identity
    transforms over existing columns (``add_identity``) and/or transformed
    fields (``add_fields`` = (field_name, transform, source_column), e.g.
    ``("id_bucket", "bucket[8]", "id")``), and/or REMOVING fields by
    partition-field name (``drop_fields`` — v2 drops the field from the
    new spec outright; old specs keep it, so time travel and old-file
    reads are untouched, and the scan injects old identity values from
    each entry's own partition tuple). Old data files keep their old
    spec (manifests are self-describing; readers see each entry's own
    partition shape), new commits write under the new spec — exactly how
    engines evolve layout without rewriting data. Partition field ids are
    fresh (``last-partition-id`` + 1...), never reused. A (source,
    transform) pair may appear only once across the new spec. No snapshot
    is created.
    """
    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version, md = _read_meta(meta_dir)
    new_fields, last_pid = build_evolved_partition_spec(
        md, add_identity=add_identity, add_fields=add_fields,
        drop_fields=drop_fields,
    )
    new_spec = {
        "spec-id": max(s["spec-id"] for s in md["partition-specs"]) + 1,
        "fields": new_fields,
    }
    md["partition-specs"] = md["partition-specs"] + [new_spec]
    md["default-spec-id"] = new_spec["spec-id"]
    md["last-partition-id"] = last_pid
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    md["metadata-log"] = md.get("metadata-log", []) + [
        {"metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
         "timestamp-ms": int(md["last-updated-ms"])}
    ]
    md["last-updated-ms"] = ts
    with open(os.path.join(meta_dir, f"v{version + 1}.metadata.json"), "x") as fh:
        json.dump(md, fh, indent=1)
    tmp_hint = os.path.join(meta_dir, ".version-hint.text.tmp")
    with open(tmp_hint, "w") as fh:
        fh.write(str(version + 1))
    os.replace(tmp_hint, os.path.join(meta_dir, "version-hint.text"))
    return md


def build_sort_order_fields(md: dict, sort_by: list) -> list[dict]:
    """The pure half of sort-order evolution, shared by the filesystem
    face (:func:`update_sort_order`) and the REST face
    (``rest_update_sort_order``): column resolution + direction/null-order
    validation per spec defaults."""
    schema = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    by_name = {f["name"]: int(f["id"]) for f in schema["fields"]}
    fields = []
    for item in sort_by:
        col, direction = (item, "asc") if isinstance(item, str) else item
        if col not in by_name:
            raise KeyError(f"no column {col!r} to sort by")
        if direction not in ("asc", "desc"):
            raise ValueError(f"direction must be 'asc' or 'desc', got {direction!r}")
        fields.append({
            "transform": "identity",
            "source-id": by_name[col],
            "direction": direction,
            "null-order": "nulls-first" if direction == "asc" else "nulls-last",
        })
    return fields


def update_sort_order(
    table_dir: str,
    sort_by: list,
    timestamp_ms: int | None = None,
) -> dict:
    """ALTER TABLE WRITE ORDERED BY (spec § Sort Orders): publish a new
    sort order — ``sort_by`` is a list of column names or
    ``(column, "asc"|"desc")`` tuples — and make it the table default.
    Sort-order ids are fresh, never reused; existing orders stay listed
    (files reference the order they were written under). No snapshot is
    created. Consumers: :func:`write_dataframe_files` sorts rows within
    write tasks by the default order (tight per-file bounds, row-group
    locality), and ``rewrite_data_files`` uses it as the default SORT
    compaction strategy. Null ordering follows the spec defaults
    (asc -> nulls-first, desc -> nulls-last)."""
    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version, md = _read_meta(meta_dir)
    fields = build_sort_order_fields(md, sort_by)
    order = {
        "order-id": max((o["order-id"] for o in md.get("sort-orders", [])),
                        default=0) + 1,
        "fields": fields,
    }
    md["sort-orders"] = md.get("sort-orders", []) + [order]
    md["default-sort-order-id"] = order["order-id"]
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    md["metadata-log"] = md.get("metadata-log", []) + [
        {"metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
         "timestamp-ms": int(md["last-updated-ms"])}
    ]
    md["last-updated-ms"] = ts
    with open(os.path.join(meta_dir, f"v{version + 1}.metadata.json"), "x") as fh:
        json.dump(md, fh, indent=1)
    tmp_hint = os.path.join(meta_dir, ".version-hint.text.tmp")
    with open(tmp_hint, "w") as fh:
        fh.write(str(version + 1))
    os.replace(tmp_hint, os.path.join(meta_dir, "version-hint.text"))
    return md


def default_sort_columns(md: dict) -> list[tuple[str, str]]:
    """The default sort order's identity (column, direction) pairs, [] when
    unsorted — shared by the write path and SORT compaction."""
    order = next(
        (o for o in md.get("sort-orders", [])
         if o["order-id"] == md.get("default-sort-order-id", 0)),
        None,
    )
    if not order or not order.get("fields"):
        return []
    schema = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    name_by_id = {int(f["id"]): f["name"] for f in schema["fields"]}
    return [
        (name_by_id[int(f["source-id"])], f.get("direction", "asc"))
        for f in order["fields"]
        if f.get("transform", "identity") == "identity"
        and int(f["source-id"]) in name_by_id
    ]


def set_properties(
    table_dir: str,
    set_props: dict[str, str] | None = None,
    unset: list[str] | None = None,
    timestamp_ms: int | None = None,
) -> dict:
    """ALTER TABLE SET/UNSET TBLPROPERTIES: publish updated table
    properties as a new metadata version (no snapshot; properties are not
    data). Unknown unset keys are ignored, matching engine behavior."""
    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version, md = _read_meta(meta_dir)
    props = dict(md.get("properties") or {})
    props.update({str(k): str(v) for k, v in (set_props or {}).items()})
    for k in unset or []:
        props.pop(k, None)
    md["properties"] = props
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    md["metadata-log"] = md.get("metadata-log", []) + [
        {"metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
         "timestamp-ms": int(md["last-updated-ms"])}
    ]
    md["last-updated-ms"] = ts
    with open(os.path.join(meta_dir, f"v{version + 1}.metadata.json"), "x") as fh:
        json.dump(md, fh, indent=1)
    tmp_hint = os.path.join(meta_dir, ".version-hint.text.tmp")
    with open(tmp_hint, "w") as fh:
        fh.write(str(version + 1))
    os.replace(tmp_hint, os.path.join(meta_dir, "version-hint.text"))
    return md


def manage_ref(
    table_dir: str,
    name: str,
    snapshot_id: int | None = None,
    ref_type: str = "tag",
    drop: bool = False,
    timestamp_ms: int | None = None,
) -> dict:
    """Branch/tag DDL (spec § Refs): create or replace a named ref pinned
    at ``snapshot_id`` (default: current), or ``drop`` it. Refs gate
    snapshot expiry (a pinned snapshot is never expired) and address time
    travel by name; publishing is the usual new-metadata-version commit.
    The ``main`` branch cannot be dropped."""
    if ref_type not in ("tag", "branch"):
        raise ValueError("ref_type must be 'tag' or 'branch'")
    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version, md = _read_meta(meta_dir)
    refs = dict(md.get("refs") or {})
    if drop:
        if name == "main":
            raise ValueError("cannot drop the main branch")
        if name not in refs:
            raise KeyError(f"no ref {name!r}")
        refs.pop(name)
    else:
        sid = snapshot_id if snapshot_id is not None else md.get("current-snapshot-id")
        if not any(s["snapshot-id"] == sid for s in md.get("snapshots", [])):
            raise KeyError(f"snapshot {sid} not in table metadata")
        refs[name] = {"snapshot-id": int(sid), "type": ref_type}
    md["refs"] = refs
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    md["metadata-log"] = md.get("metadata-log", []) + [
        {"metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
         "timestamp-ms": int(md["last-updated-ms"])}
    ]
    md["last-updated-ms"] = ts
    with open(os.path.join(meta_dir, f"v{version + 1}.metadata.json"), "x") as fh:
        json.dump(md, fh, indent=1)
    tmp_hint = os.path.join(meta_dir, ".version-hint.text.tmp")
    with open(tmp_hint, "w") as fh:
        fh.write(str(version + 1))
    os.replace(tmp_hint, os.path.join(meta_dir, "version-hint.text"))
    return md


def resolve_fast_forward(md: dict, name: str, from_ref: str) -> tuple:
    """The pure half of :func:`fast_forward`, shared with the REST face
    (``rest_fast_forward``): resolve (source head, target head) and raise
    unless the target head is an ancestor of the source head (publishing
    over a diverged target would silently drop its commits)."""
    refs = dict(md.get("refs") or {})
    if from_ref in refs:
        src = int(refs[from_ref]["snapshot-id"])
    elif from_ref == "main" and md.get("current-snapshot-id") is not None:
        src = int(md["current-snapshot-id"])  # implicit main head
    else:
        raise KeyError(f"no ref {from_ref!r} on table")
    if name == "main":
        tgt = md.get("current-snapshot-id")
    elif name in refs:
        if refs[name].get("type") != "branch":
            raise ValueError(f"ref {name!r} is a tag; cannot fast-forward")
        tgt = int(refs[name]["snapshot-id"])
    else:
        tgt = None  # creating the branch at the source head
    if tgt == src:
        return src, tgt
    by_id = {int(s["snapshot-id"]): s for s in md.get("snapshots", [])}
    cur, ok = src, tgt is None
    while cur is not None and not ok:
        if cur == tgt:
            ok = True
            break
        cur = by_id.get(cur, {}).get("parent-snapshot-id")
        cur = int(cur) if cur is not None else None
    if not ok:
        raise ValueError(
            f"cannot fast-forward {name!r} ({tgt}) to {from_ref!r} ({src}): "
            "target head is not an ancestor of the source head"
        )
    return src, tgt


def fast_forward(
    table_dir: str,
    name: str,
    from_ref: str,
    timestamp_ms: int | None = None,
) -> dict:
    """Fast-forward branch ``name`` to ``from_ref``'s head — the PUBLISH
    step of write-audit-publish (the engine's ``fast_forward`` procedure):
    staged branch commits become visible atomically, with no data or
    manifest rewrite, ONLY when the target's head is an ancestor of the
    source's head (a diverged target refuses — publishing would silently
    drop its commits). Fast-forwarding ``main`` moves the table's current
    snapshot and appends to the snapshot log. Returns
    {"updated": bool, "from": old_head, "to": new_head}."""
    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version, md = _read_meta(meta_dir)
    refs = dict(md.get("refs") or {})
    src, tgt = resolve_fast_forward(md, name, from_ref)
    if tgt == src:
        return {"updated": False, "from": tgt, "to": src}
    ts = timestamp_ms if timestamp_ms is not None else int(md["last-updated-ms"]) + 1
    refs[name] = {"snapshot-id": src, "type": "branch"}
    md["refs"] = refs
    if name == "main":
        md["current-snapshot-id"] = src
        md["snapshot-log"] = md.get("snapshot-log", []) + [
            {"snapshot-id": src, "timestamp-ms": ts}
        ]
    md["metadata-log"] = md.get("metadata-log", []) + [
        {"metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
         "timestamp-ms": int(md["last-updated-ms"])}
    ]
    md["last-updated-ms"] = ts
    with open(os.path.join(meta_dir, f"v{version + 1}.metadata.json"), "x") as fh:
        json.dump(md, fh, indent=1)
    tmp_hint = os.path.join(meta_dir, ".version-hint.text.tmp")
    with open(tmp_hint, "w") as fh:
        fh.write(str(version + 1))
    os.replace(tmp_hint, os.path.join(meta_dir, "version-hint.text"))
    return {"updated": True, "from": tgt, "to": src}
