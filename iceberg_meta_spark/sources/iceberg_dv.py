"""Iceberg v3 deletion vectors, jar-free (spec § Deletion Vectors +
Puffin spec `deletion-vector-v1` + the public RoaringFormatSpec).

v3 replaces per-file position-delete PARQUET files with deletion vectors:
a roaring bitmap of deleted row positions per data file, stored as a blob
in a Puffin file and referenced from a position-delete manifest entry via
three v3 fields — ``referenced_data_file`` (field-id 143),
``content_offset`` (144), ``content_size_in_bytes`` (145). This module
implements the whole byte stack so the native path can read AND write
them:

- 32-bit roaring serialization (RoaringFormatSpec): array / bitmap / run
  containers are all READ; writes emit the no-run layout (cookie 12346,
  array containers <= 4096 cardinality, bitmap containers above).
- The portable 64-bit wrapper (Roaring64NavigableMap portable format,
  the one the Iceberg v3 spec mandates): 8-byte LE bucket count, then per
  bucket a 4-byte LE high-32 key + the bucket's 32-bit roaring bytes.
- The Puffin ``deletion-vector-v1`` blob: 4-byte big-endian length of
  (magic + vector), magic D1 D3 39 64, the portable-64 bitmap, and a
  4-byte big-endian CRC-32 of (magic + vector); blob properties carry
  ``referenced-data-file`` and ``cardinality``.

Scan integration lives in ``iceberg_scan.py``: DV entries plan like
position-delete files (planning-index scale — one DV per referenced data
file), and the POSITIONS decode executor-side in an Arrow-batched
``mapInPandas`` over the DV descriptors, so a 100-TB table's millions of
deleted positions never materialize on the driver.

The reference has no v3 story at all (pyiceberg reads v2); byte formats
here come exclusively from the public specs named above, pinned by
round-trip + known-answer tests in tests/test_iceberg_dv.py.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # run-cookie streams omit offsets below 4 containers
_ARRAY_MAX = 4096

DV_MAGIC = bytes((0xD1, 0xD3, 0x39, 0x64))
DV_BLOB_TYPE = "deletion-vector-v1"


# --------------------------------------------------------- 32-bit roaring
def _serialize_rb32(values: np.ndarray) -> bytes:
    """Serialize sorted uint32 values as a standard 32-bit roaring bitmap
    (no-run layout: cookie 12346, array/bitmap containers, offset header)."""
    keys = (values >> 16).astype(np.uint32)
    lows = (values & 0xFFFF).astype(np.uint16)
    uniq, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(values)]
    containers: list[tuple[int, int, bytes]] = []  # (key, card, payload)
    for i, key in enumerate(uniq):
        chunk = lows[bounds[i]:bounds[i + 1]]
        card = len(chunk)
        if card <= _ARRAY_MAX:
            payload = chunk.astype("<u2").tobytes()
        else:
            bits = np.zeros(65536, dtype=bool)
            bits[chunk] = True
            payload = np.packbits(bits, bitorder="little").tobytes()
        containers.append((int(key), card, payload))
    n = len(containers)
    out = bytearray(struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n))
    for key, card, _ in containers:
        out += struct.pack("<HH", key, card - 1)
    # offset header: byte offsets from the start of THIS 32-bit stream
    off = 8 + 4 * n + 4 * n
    for _, _, payload in containers:
        out += struct.pack("<I", off)
        off += len(payload)
    for _, _, payload in containers:
        out += payload
    return bytes(out)


def _deserialize_rb32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Parse one 32-bit roaring bitmap at ``buf[pos:]``; returns (sorted
    uint32 values, next position). Reads all three container types and
    both cookies."""
    (cookie32,) = struct.unpack_from("<I", buf, pos)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE_RUN:
        n = (cookie32 >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=pos),
            bitorder="little",
        )[:n].astype(bool)
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie32 == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = np.zeros(n, dtype=bool)
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie32})")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, c + 1
        pos += 4
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential parsing
    parts: list[np.ndarray] = []
    for i in range(n):
        base = np.uint32(keys[i]) << np.uint32(16)
        if run_flags[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=pos)
            pos += 4 * n_runs
            vals = np.concatenate([
                np.arange(int(runs[2 * r]),
                          int(runs[2 * r]) + int(runs[2 * r + 1]) + 1,
                          dtype=np.uint32)
                for r in range(n_runs)
            ]) if n_runs else np.empty(0, dtype=np.uint32)
        elif cards[i] <= _ARRAY_MAX:
            vals = np.frombuffer(
                buf, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype(np.uint32)
            pos += 2 * int(cards[i])
        else:
            bits = np.unpackbits(
                np.frombuffer(buf, dtype=np.uint8, count=8192, offset=pos),
                bitorder="little",
            )
            vals = np.nonzero(bits)[0].astype(np.uint32)
            pos += 8192
        parts.append(base | vals)
    if not parts:
        return np.empty(0, dtype=np.uint32), pos
    return np.concatenate(parts), pos


# ------------------------------------------------- portable 64-bit wrapper
def serialize_positions(positions) -> bytes:
    """Sorted 64-bit row positions -> portable Roaring64 bytes (8-byte LE
    bucket count, then per bucket 4-byte LE high-32 key + 32-bit roaring)."""
    # a bitmap is a SET: dedup as well as sort (a position deleted twice
    # is one deleted row)
    vals = np.asarray(sorted({int(p) for p in positions}), dtype=np.uint64)
    highs = (vals >> np.uint64(32)).astype(np.uint32)
    lows = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uniq, starts = np.unique(highs, return_index=True)
    bounds = list(starts) + [len(vals)]
    out = bytearray(struct.pack("<Q", len(uniq)))
    for i, high in enumerate(uniq):
        out += struct.pack("<I", int(high))
        out += _serialize_rb32(lows[bounds[i]:bounds[i + 1]])
    return bytes(out)


def deserialize_positions(buf: bytes) -> np.ndarray:
    """Portable Roaring64 bytes -> sorted int64 positions."""
    (n_buckets,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    parts: list[np.ndarray] = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lows, pos = _deserialize_rb32(buf, pos)
        parts.append(
            (np.uint64(high) << np.uint64(32)) | lows.astype(np.uint64)
        )
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(parts).astype(np.int64)


# --------------------------------------------------------------- DV blobs
def encode_dv_blob(positions) -> bytes:
    """Positions -> the Puffin ``deletion-vector-v1`` blob payload."""
    vector = serialize_positions(positions)
    body = DV_MAGIC + vector
    crc = zlib.crc32(body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + body + struct.pack(">I", crc)


def decode_dv_blob(blob: bytes) -> np.ndarray:
    """Puffin ``deletion-vector-v1`` blob payload -> sorted positions.
    Validates the big-endian length, the magic, and the CRC-32."""
    (length,) = struct.unpack_from(">I", blob, 0)
    body = blob[4:4 + length]
    if body[:4] != DV_MAGIC:
        raise ValueError("deletion-vector blob: bad magic")
    (crc,) = struct.unpack_from(">I", blob, 4 + length)
    if (zlib.crc32(body) & 0xFFFFFFFF) != crc:
        raise ValueError("deletion-vector blob: CRC mismatch")
    return deserialize_positions(body[4:])


def read_dv_positions(puffin_path: str, offset: int, length: int) -> np.ndarray:
    """Random-access read of one DV blob (the executor-side decode): seek
    to the manifest entry's content_offset, read content_size bytes,
    decode. Never reads the whole Puffin file."""
    with open(puffin_path, "rb") as fh:
        fh.seek(int(offset))
        blob = fh.read(int(length))
    return decode_dv_blob(blob)


# ------------------------------------------------ Puffin DV file + commit
def write_dv_file(
    path: str,
    dvs: dict[str, list[int]],
    snapshot_id: int,
    sequence_number: int,
) -> list[dict]:
    """Write one Puffin file holding a ``deletion-vector-v1`` blob per
    referenced data file; returns commit-ready entry dicts (file_path,
    referenced_data_file, content_offset, content_size_in_bytes,
    record_count = cardinality) for :func:`commit_dv_files`."""
    from iceberg_meta_spark.sources.iceberg_puffin import write_puffin

    blobs = []
    for data_file, positions in sorted(dvs.items()):
        blobs.append({
            "type": DV_BLOB_TYPE,
            "fields": [2147483546],  # _pos reserved field id (spec)
            "snapshot_id": snapshot_id,
            "sequence_number": sequence_number,
            "payload": encode_dv_blob(positions),
            "properties": {
                "referenced-data-file": data_file,
                "cardinality": str(len(set(positions))),
            },
        })
    out = write_puffin(path, blobs)
    size = out["file_size_in_bytes"]
    return [
        {
            "file_path": path,
            "file_format": "PUFFIN",
            "referenced_data_file": bm["properties"]["referenced-data-file"],
            "content_offset": bm["offset"],
            "content_size_in_bytes": bm["length"],
            "record_count": int(bm["properties"]["cardinality"]),
            "file_size_in_bytes": size,
        }
        for bm in out["blob_metadata"]
    ]


def dv_entry_schema(partition_fields: list[dict]) -> dict:
    """v3 manifest_entry: the v2 schema + the three DV fields (spec
    field-ids 143/144/145)."""
    from iceberg_meta_spark.sources.iceberg_schemas import (
        manifest_entry_schema,
    )

    schema = manifest_entry_schema(partition_fields)
    df_fields = schema["fields"][-1]["type"]["fields"]
    df_fields.extend([
        {"name": "referenced_data_file", "type": ["null", "string"],
         "default": None, "field-id": 143},
        {"name": "content_offset", "type": ["null", "long"],
         "default": None, "field-id": 144},
        {"name": "content_size_in_bytes", "type": ["null", "long"],
         "default": None, "field-id": 145},
    ])
    return schema


def commit_dv_files(
    table_dir: str,
    dv_entries: list[dict],
    timestamp_ms: int | None = None,
    supersede: set[tuple[str, int]] | None = None,
    add_data_files: list[dict] | None = None,
    committer=None,
) -> dict:
    """Publish deletion vectors as one snapshot on a format-version 3
    table: a DELETE manifest whose position-delete entries carry
    file_format=PUFFIN + referenced_data_file/content_offset/
    content_size_in_bytes (spec § Deletion Vectors: "a deletion vector is
    stored as a position delete entry referencing a Puffin blob"). Runs
    the optimistic commit retry loop like every other snapshot commit.

    ``supersede`` = {(puffin path, content_offset)} of PREVIOUS DV entries
    this commit replaces: the spec allows at most ONE deletion vector per
    data file, so a writer re-deleting from a file must MERGE the old
    positions into its new DV and remove the old entry — superseded
    entries are marked DELETED in rewritten delete manifests (provenance
    preserved for survivors), exactly like data-file removal. Committing
    a second DV for a referenced file WITHOUT superseding the first
    raises, enforcing the invariant.

    ``add_data_files`` commits new DATA files in the SAME snapshot (the
    UPDATE shape: deletion vectors hide the old row versions, the data
    half carries the rewritten rows at the same sequence number) — one
    atomic commit, exactly like the v2 merge commit. Added files get v3
    row-lineage first_row_id values and the snapshot records
    first-row-id.

    ``committer`` routes the publish through another catalog face
    (``RestCommitter`` — REST updateTable CAS); default filesystem."""
    from iceberg_meta_spark.sources.iceberg_write import FilesystemCommitter

    committer = committer or FilesystemCommitter(table_dir)
    return committer.commit_snapshot(
        lambda td, mdir, md: build_dv_snapshot(
            td, mdir, md, dv_entries, timestamp_ms, supersede, add_data_files
        )
    )


def build_dv_snapshot(
    table_dir: str,
    meta_dir: str,
    md: dict,
    dv_entries: list[dict],
    timestamp_ms: int | None = None,
    supersede: set[tuple[str, int]] | None = None,
    add_data_files: list[dict] | None = None,
) -> dict:
    """The publish-free half of :func:`commit_dv_files`: one-DV-per-file
    invariant + live-file validation, superseded-entry rewrite, DV (and
    optional data) manifest + manifest list writes; returns the snapshot.
    Pure against ``md``."""
    from iceberg_meta_spark.sources.avro_py import (
        read_container,
        write_container,
    )
    from iceberg_meta_spark.sources.iceberg_schemas import (
        MANIFEST_FILE_SCHEMA,
    )
    from iceberg_meta_spark.sources.iceberg_write import (
        _local_path,
        _partition_fields_from_spec,
        _write_new_file,
    )
    import uuid as _uuid

    table_dir = _local_path(table_dir.rstrip("/"))
    if int(md.get("format-version", 1)) < 3:
        raise ValueError(
            "deletion vectors require format-version 3 (v2 tables use "
            "parquet position-delete files via commit_delete_files)"
        )
    parent = md.get("current-snapshot-id")
    if parent is None:
        raise ValueError("table has no current snapshot")
    schema = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    types = {f["id"]: f["type"] for f in schema["fields"]}
    partition_fields = _partition_fields_from_spec(md, types)
    snap_id = max(s["snapshot-id"] for s in md["snapshots"]) + 1
    seq = int(md.get("last-sequence-number", 0)) + 1
    ts = (timestamp_ms if timestamp_ms is not None
          else int(md["last-updated-ms"]) + 1)
    commit_uuid = _uuid.uuid5(
        _uuid.NAMESPACE_URL, f"{table_dir}/dv/{snap_id}"
    )
    if not dv_entries and not supersede and not add_data_files:
        raise ValueError("nothing to commit: no DV entries, no supersede")
    entries = [
        {
            "status": 1,
            "snapshot_id": snap_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 1,  # POSITION_DELETES (a DV is one, in v3)
                "file_path": e["file_path"],
                "file_format": "PUFFIN",
                "partition": {
                    pf["name"]: None for pf in partition_fields
                },
                "record_count": int(e["record_count"]),
                "file_size_in_bytes": int(e["file_size_in_bytes"]),
                "column_sizes": None,
                "value_counts": None,
                "null_value_counts": None,
                "lower_bounds": None,
                "upper_bounds": None,
                "split_offsets": None,
                "sort_order_id": None,
                "referenced_data_file": e["referenced_data_file"],
                "content_offset": int(e["content_offset"]),
                "content_size_in_bytes": int(e["content_size_in_bytes"]),
            },
        }
        for e in dv_entries
    ]
    blob = manifest_path = None
    if entries:  # a supersede-only commit (dangling-DV cleanup) adds none
        blob = write_container(
            dv_entry_schema(partition_fields), entries,
            metadata={"format-version": b"3", "content": b"deletes",
                      "partition-spec-id": str(md["default-spec-id"]).encode()},
        )
        manifest_path = _write_new_file(
            os.path.join(meta_dir, f"{commit_uuid}-dv0.avro"), blob
        )
    prev = next(s for s in md["snapshots"] if s["snapshot-id"] == parent)
    with open(_local_path(prev["manifest-list"]), "rb") as fh:
        _, _, prev_manifests = read_container(fh.read())
    for m in prev_manifests:
        m.setdefault("partitions", None)

    # the one-DV-per-file invariant: find live DV entries for the
    # files this commit references; each must be superseded
    from iceberg_meta_spark.sources.iceberg_scan import _norm_path

    sup = {(_norm_path(p), int(o)) for p, o in (supersede or set())}
    new_refs = {_norm_path(e["referenced_data_file"]) for e in dv_entries}
    if new_refs:
        # every referenced data file must still be LIVE in the (possibly
        # rebased) snapshot: a concurrent rewrite_data_files may have
        # removed it, and committing a DV against a dead file silently
        # loses the DELETE — the deleted rows live on in the compacted
        # replacement. Genuine conflict: the caller must re-plan against
        # fresh state (Java's validateDataFilesExist).
        from iceberg_meta_spark.sources.iceberg_write import (
            CommitConflictError,
        )

        live: set[str] = set()
        for m in prev_manifests:
            if int(m.get("content", 0)) != 0:
                continue
            with open(_local_path(m["manifest_path"]), "rb") as fh:
                _, _, dentries = read_container(fh.read())
            live.update(
                _norm_path(e["data_file"]["file_path"])
                for e in dentries if e.get("status", 0) != 2
            )
        dead = sorted(new_refs - live)
        if dead:
            raise CommitConflictError(
                f"deletion vector references data file {dead[0]!r} which "
                "is no longer live (concurrently rewritten/removed); "
                "re-plan the delete against the current snapshot"
            )
    superseded_total = 0
    superseded_rows = 0
    rewritten_manifests = []
    for mi, m in enumerate(prev_manifests):
        if int(m.get("content", 0)) != 1:
            rewritten_manifests.append(m)
            continue
        with open(_local_path(m["manifest_path"]), "rb") as fh:
            mschema, mmeta, mentries = read_container(fh.read())
        hit = [
            e for e in mentries
            if e.get("status", 0) != 2
            and e["data_file"].get("content_offset") is not None
            and (_norm_path(e["data_file"]["file_path"]),
                 int(e["data_file"]["content_offset"])) in sup
        ]
        live_conflict = [
            e for e in mentries
            if e.get("status", 0) != 2
            and e["data_file"].get("referenced_data_file") is not None
            and _norm_path(e["data_file"]["referenced_data_file"]) in new_refs
            and (_norm_path(e["data_file"]["file_path"]),
                 int(e["data_file"]["content_offset"] or -1)) not in sup
        ]
        if live_conflict:
            raise ValueError(
                "a live deletion vector already covers "
                f"{live_conflict[0]['data_file']['referenced_data_file']!r};"
                " merge its positions and pass supersede= (the spec"
                " allows one DV per data file)"
            )
        if not hit:
            rewritten_manifests.append(m)
            continue
        kept = deleted = 0
        kept_rows = deleted_rows_m = 0
        out_entries = []
        for e in mentries:
            if e.get("status", 0) == 2:
                continue
            e = dict(e)
            if e.get("sequence_number") is None:
                e["sequence_number"] = m.get("sequence_number")
            if e.get("file_sequence_number") is None:
                e["file_sequence_number"] = m.get("sequence_number")
            key = (_norm_path(e["data_file"]["file_path"]),
                   int(e["data_file"].get("content_offset") or -1))
            if key in sup:
                e["status"] = 2
                deleted += 1
                superseded_total += 1
                deleted_rows_m += int(e["data_file"]["record_count"])
            else:
                e["status"] = 0
                kept += 1
                kept_rows += int(e["data_file"]["record_count"])
            out_entries.append(e)
        superseded_rows += deleted_rows_m
        mblob = write_container(mschema, out_entries, metadata=dict(mmeta))
        rpath = _write_new_file(
            os.path.join(meta_dir, f"{commit_uuid}-dvr{mi}.avro"), mblob
        )
        rewritten_manifests.append({
            **m,
            "manifest_path": rpath,
            "manifest_length": len(mblob),
            "added_files_count": 0,
            "existing_files_count": kept,
            "deleted_files_count": deleted,
            "added_rows_count": 0,
            "existing_rows_count": kept_rows,
            "deleted_rows_count": deleted_rows_m,
        })
    prev_manifests = rewritten_manifests
    new_manifests = []
    added_rows = added_bytes = 0
    frid_base = None
    if add_data_files:
        from iceberg_meta_spark.sources.iceberg_write import (
            _added_data_entries,
            _fv_bytes,
        )

        frid_base = int(md.get("next-row-id", 0))
        data_entries = _added_data_entries(
            add_data_files, snap_id, seq, types, partition_fields,
            first_row_id_base=frid_base,
        )
        from iceberg_meta_spark.sources.iceberg_schemas import (
            manifest_entry_schema,
        )

        data_blob = write_container(
            manifest_entry_schema(partition_fields, with_first_row_id=True),
            data_entries,
            metadata={"format-version": _fv_bytes(md), "content": b"data",
                      "partition-spec-id": str(md["default-spec-id"]).encode()},
        )
        data_mpath = _write_new_file(
            os.path.join(meta_dir, f"{commit_uuid}-um0.avro"), data_blob
        )
        added_rows = sum(int(f["record_count"]) for f in add_data_files)
        added_bytes = sum(int(f["file_size_in_bytes"]) for f in add_data_files)
        new_manifests.append({
            "manifest_path": data_mpath,
            "manifest_length": len(data_blob),
            "partition_spec_id": int(md["default-spec-id"]),
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snap_id,
            "added_files_count": len(add_data_files),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": added_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": None,
        })
    if entries:
        new_manifests.append({
            "manifest_path": manifest_path,
            "manifest_length": len(blob),
            "partition_spec_id": int(md["default-spec-id"]),
            "content": 1,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snap_id,
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": sum(
                int(e["record_count"]) for e in dv_entries
            ),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": None,
        })
    mlist_path = _write_new_file(
        os.path.join(meta_dir, f"snap-{snap_id}-{commit_uuid}.avro"),
        write_container(MANIFEST_FILE_SCHEMA,
                        prev_manifests + new_manifests,
                        metadata={"format-version": b"3"}),
    )
    prev_summary = prev.get("summary", {}) or {}
    # a superseding DV's record_count is the MERGED cardinality (old
    # positions + new); report only the net-new deletes, otherwise
    # repeated DELETEs on the same file double-count rows already
    # reported deleted by the superseded entry
    deleted_rows = max(
        sum(int(e["record_count"]) for e in dv_entries) - superseded_rows,
        0,
    )
    snapshot = {
        "snapshot-id": snap_id,
        "parent-snapshot-id": parent,
        "sequence-number": seq,
        "timestamp-ms": ts,
        **({"first-row-id": frid_base} if frid_base is not None else {}),
        "manifest-list": mlist_path,
        "schema-id": md["current-schema-id"],
        "summary": {
            # adding DVs (and UPDATE's rewritten rows) hides/replaces
            # rows (overwrite); a supersede-only cleanup rewrites
            # metadata, no logical change (replace)
            "operation": (
                "overwrite" if entries or add_data_files else "replace"
            ),
            "added-records": str(added_rows),
            "deleted-records": str(deleted_rows),
            "added-delete-files": str(len(entries)),
            "removed-delete-files": str(superseded_total),
            **({"added-data-files": str(len(add_data_files)),
                "added-files-size": str(added_bytes)}
               if add_data_files else {}),
            "total-delete-files": str(
                max(int(prev_summary.get("total-delete-files", 0))
                    - superseded_total, 0)
                + len(entries)
            ),
            "total-data-files": str(
                int(prev_summary.get("total-data-files", 0))
                + len(add_data_files or [])
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


def delete_where_dv(
    spark,
    table_dir: str,
    plan,
    matches,
    version: int,
    timestamp_ms: int | None = None,
    add_data_files: list[dict] | None = None,
    committer=None,
) -> dict:
    """DELETE WHERE on a v3 table: publish the matched (file, pos) rows as
    deletion vectors — one roaring bitmap per touched data file, MERGED
    with the file's previous DV (the spec's one-DV-per-file invariant;
    the superseded entries are removed in the same commit).

    Distributed shape: ``matches`` is (__file, __pos) of LIVE matching
    rows straight from the merge-on-read scan; the bitmap ENCODE runs
    executor-side per file (groupBy __file -> applyInPandas), so raw
    positions never reach the driver — only the roaring-COMPRESSED blobs
    do (one per touched file, <= ~8 KiB per 64 Ki positions: the same
    planning-index scale every commit already accepts), because the
    Puffin container is a sequential driver-side assembly."""
    import pandas as pd  # noqa: F401 (kernel import, executor-side)

    from iceberg_meta_spark.sources.iceberg_puffin import write_puffin
    from iceberg_meta_spark.sources.iceberg_scan import _norm_path

    old = {
        _norm_path(d["referenced_data_file"]):
            (_norm_path(d["path"]), int(d["offset"]), int(d["length"]))
        for d in plan.deletion_vectors
    }

    def kernel(key, pdf):
        import pandas as pd

        file_ = key[0]
        positions = {int(p) for p in pdf["__pos"]}
        n_new = len(positions)
        prev = old.get(file_)
        if prev is not None:  # merge the superseded DV's positions
            positions |= {int(x) for x in read_dv_positions(*prev)}
        return pd.DataFrame({
            "file": [file_],
            "blob": [encode_dv_blob(sorted(positions))],
            "card": [len(positions)],
            "new_rows": [n_new],
        })

    per_file = (
        matches.groupBy("__file")
        .applyInPandas(kernel, "file string, blob binary, card long, new_rows long")
        .collect()
    )
    if not per_file:
        return {"rows_deleted": 0, "snapshot_id": None}

    # atomic name claim (exclusive create, not exists-then-write: two
    # concurrent DELETEs that read the same version must not share a path)
    base = os.path.join(table_dir, "data", f"dv-{version + 1:05d}")
    dv_path, k = f"{base}.puffin", 0
    while True:
        try:
            with open(dv_path, "xb"):
                pass
            break
        except FileExistsError:
            k += 1
            dv_path = f"{base}-r{k}.puffin"
    out = write_puffin(dv_path, [
        {
            "type": DV_BLOB_TYPE,
            "fields": [2147483546],
            "snapshot_id": -1,  # assigned at commit; informational here
            "sequence_number": -1,
            "payload": bytes(r.blob),
            "properties": {
                "referenced-data-file": r.file,
                "cardinality": str(int(r.card)),
            },
        }
        for r in sorted(per_file, key=lambda r: r.file)
    ])
    size = out["file_size_in_bytes"]
    entries = [
        {
            "file_path": dv_path,
            "file_format": "PUFFIN",
            "referenced_data_file": bm["properties"]["referenced-data-file"],
            "content_offset": bm["offset"],
            "content_size_in_bytes": bm["length"],
            "record_count": int(bm["properties"]["cardinality"]),
            "file_size_in_bytes": size,
        }
        for bm in out["blob_metadata"]
    ]
    touched = {r.file for r in per_file}
    supersede = {
        (d["path"], int(d["offset"]))
        for d in plan.deletion_vectors
        if _norm_path(d["referenced_data_file"]) in touched
    }
    md = commit_dv_files(table_dir, entries, timestamp_ms=timestamp_ms,
                         supersede=supersede, add_data_files=add_data_files,
                         committer=committer)
    return {
        "rows_deleted": int(sum(r.new_rows for r in per_file)),
        "snapshot_id": int(md["current-snapshot-id"]),
    }
