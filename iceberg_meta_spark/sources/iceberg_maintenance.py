"""Maintenance EXECUTION on the native Iceberg path (jar-free, from the
public spec) — the action side of the planning queries.

The repo already PLANS maintenance (``meta_compaction_plan``,
``meta_snapshot_expiry``, ``meta_orphan_files``, ``meta_manifest_rewrite``
— reference parity: the reference only reports). This module EXECUTES the
three table-maintenance actions every Iceberg deployment runs, against the
same HadoopTables-protocol filesystem tables the native writer commits to
(``iceberg_write.py``: new vN+1.metadata.json + atomic version-hint swap):

- :func:`expire_snapshots` — drop expired snapshots from table metadata
  (spec § Table Metadata: snapshots/snapshot-log) while keeping everything
  a ref (branch/tag) pins, and report the manifest-list/manifest files no
  retained snapshot references (the deletion list).
- :func:`orphan_files_frame` — DISTRIBUTED orphan detection: one recursive
  listing scan of the table location anti-joined against every path any
  retained metadata version can reach. The data-file level (unbounded)
  rides the same distributed manifest decode as the reader; only
  planning-index levels (metadata JSONs, manifest lists) touch the driver.
- :func:`rewrite_manifests` — execute the bin-pack plan
  (operators/maintenance.py:manifest_rewrite_plan's 8 MiB first-fit
  shape): merge small data manifests into grouped manifests and publish a
  ``replace`` snapshot whose manifest list carries the merged manifests
  plus the untouched ones. Entry provenance is preserved (spec
  § Manifests: rewritten entries become EXISTING with their original
  snapshot/sequence numbers).

Scope matches the writer's, stated plainly: local-filesystem table dirs
(the HadoopTables protocol); catalog-pointer CAS paths stay jar-gated in
``sources/iceberg.py``.

Concurrency, stated plainly: the DATA-commit actions here
(``rewrite_data_files``, ``rewrite_position_deletes``,
``rewrite_deletion_vectors``) publish through ``iceberg_write``'s
optimistic retry loop and rebase like every writer. The metadata-only
publishes in THIS module (``expire_snapshots``, ``rewrite_manifests``,
``expire_metadata``) are single-shot: losing a version race raises
FileExistsError and the caller re-runs the action against fresh state —
acceptable for maintenance jobs, which deployments serialize anyway.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.sources.avro_py import read_container, write_container
from iceberg_meta_spark.sources.iceberg_schemas import MANIFEST_FILE_SCHEMA
from iceberg_meta_spark.sources.iceberg_write import _local_path


def _load_md(table_dir: str) -> tuple[dict, int, str]:
    meta_dir = os.path.join(table_dir, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        version = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as fh:
        return json.load(fh), version, meta_dir


def _publish(md: dict, version: int, meta_dir: str, ts: int) -> dict:
    """Write vN+1 + metadata-log entry, then atomically swap the hint."""
    md["metadata-log"] = md.get("metadata-log", []) + [
        {
            "metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
            "timestamp-ms": int(md["last-updated-ms"]),
        }
    ]
    md["last-updated-ms"] = ts
    with open(os.path.join(meta_dir, f"v{version + 1}.metadata.json"), "x") as fh:
        json.dump(md, fh, indent=1)
    tmp = os.path.join(meta_dir, ".version-hint.text.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version + 1))
    os.replace(tmp, os.path.join(meta_dir, "version-hint.text"))
    return md


def _manifest_paths(snapshot: dict) -> list[str]:
    with open(_local_path(snapshot["manifest-list"]), "rb") as fh:
        _, _, records = read_container(fh.read())
    return [r["manifest_path"] for r in records]


def expire_snapshots(
    table_dir: str,
    keep_last: int | None = None,
    older_than_ms: int | None = None,
    timestamp_ms: int | None = None,
) -> dict:
    """Expire snapshots per Iceberg's ``expire_snapshots`` semantics and
    publish the shrunken metadata as a new version.

    Retained: the current snapshot, every snapshot a ref (branch/tag) pins,
    the ``keep_last`` newest by timestamp (if given), and every snapshot at
    or after ``older_than_ms`` (if given). Returns a dict with
    ``expired_snapshot_ids`` and ``removable_files`` — the manifest lists
    and manifests referenced ONLY by expired snapshots (the caller may
    delete them; the metadata commit itself never deletes data). A no-op
    (nothing expired) publishes nothing and returns empty lists.

    Snapshot COUNT is planning-index scale (the log every engine replays
    at commit time), so the retain/expire set computation is bounded
    driver work; file IO here is manifest LISTS only (KBs per snapshot).
    """
    table_dir = _local_path(table_dir.rstrip("/"))
    md, version, meta_dir = _load_md(table_dir)
    expired_ids, removable = plan_expiry(
        md, keep_last=keep_last, older_than_ms=older_than_ms
    )
    if not expired_ids:
        return {"expired_snapshot_ids": [], "removable_files": []}

    apply_snapshot_removal(md, expired_ids)
    ts = (
        int(timestamp_ms)
        if timestamp_ms is not None
        else int(md["last-updated-ms"]) + 1
    )
    _publish(md, version, meta_dir, ts)
    return {
        "expired_snapshot_ids": expired_ids,
        "removable_files": removable,
    }


def plan_expiry(
    md: dict,
    keep_last: int | None = None,
    older_than_ms: int | None = None,
) -> tuple[list[int], list[str]]:
    """The pure PLAN half of :func:`expire_snapshots`, shared by the
    filesystem face and the REST face (``rest_expire_snapshots`` ships
    the result as a ``remove-snapshots`` update): retained = current +
    every ref-pinned + ``keep_last`` newest + everything at/after
    ``older_than_ms``. Returns (expired snapshot ids sorted, files
    referenced ONLY by expired snapshots — manifest lists + manifests)."""
    snaps = md.get("snapshots", [])
    if not snaps:
        return [], []
    keep: set[int] = set()
    cur = md.get("current-snapshot-id")
    if cur is not None:
        keep.add(int(cur))
    for ref in (md.get("refs") or {}).values():
        keep.add(int(ref["snapshot-id"]))
    if keep_last is not None:
        newest = sorted(snaps, key=lambda s: int(s["timestamp-ms"]), reverse=True)
        keep.update(int(s["snapshot-id"]) for s in newest[: int(keep_last)])
    if older_than_ms is not None:
        keep.update(
            int(s["snapshot-id"])
            for s in snaps
            if int(s["timestamp-ms"]) >= int(older_than_ms)
        )
    expired = [s for s in snaps if int(s["snapshot-id"]) not in keep]
    if not expired:
        return [], []
    retained = [s for s in snaps if int(s["snapshot-id"]) in keep]
    # files referenced only by expired snapshots become removable
    kept_files: set[str] = set()
    for s in retained:
        kept_files.add(s["manifest-list"])
        kept_files.update(_manifest_paths(s))
    removable: list[str] = []
    for s in expired:
        if s["manifest-list"] not in kept_files:
            removable.append(s["manifest-list"])
        removable.extend(
            p for p in _manifest_paths(s) if p not in kept_files
        )
    return (sorted(int(s["snapshot-id"]) for s in expired),
            sorted(set(removable)))


def apply_snapshot_removal(md: dict, expired_ids: list[int]) -> None:
    """Apply a ``remove-snapshots`` action to table metadata IN PLACE:
    drop the snapshots and their snapshot-log entries. Shared by the
    filesystem expiry tail and the REST mock server's update handler.

    Before dropping, each expired snapshot's (sequence-number ->
    schema-id) pair is preserved in the schema-seq-log table property:
    the scan resolves every file's WRITE-TIME schema (renames, v3
    default-absence) through its adding snapshot, and files outlive the
    snapshots that added them — without this log, expiring a pre-rename
    snapshot would silently flip its files' renamed columns to NULL
    (schemas themselves are never dropped from metadata, only the
    seq -> schema edge was lost)."""
    from iceberg_meta_spark.sources.iceberg_scan import SCHEMA_SEQ_LOG_PROP

    drop = {int(i) for i in expired_ids}
    props = dict(md.get("properties") or {})
    log = json.loads(props.get(SCHEMA_SEQ_LOG_PROP, "{}"))
    for s in md.get("snapshots", []):
        if int(s["snapshot-id"]) in drop and s.get("schema-id") is not None:
            log[str(int(s.get("sequence-number", 0)))] = int(s["schema-id"])
    if log:
        props[SCHEMA_SEQ_LOG_PROP] = json.dumps(log, sort_keys=True)
        md["properties"] = props
    md["snapshots"] = [
        s for s in md.get("snapshots", [])
        if int(s["snapshot-id"]) not in drop
    ]
    md["snapshot-log"] = [
        e for e in md.get("snapshot-log", [])
        if int(e["snapshot-id"]) not in drop
    ]


def _norm(col):
    """Scheme-strip only: binaryFile ``path`` values (the orphan listing)
    AND metadata-sourced paths are both already in the canonical on-disk
    form — probe-verified: binaryFile reports 'k=a%3Db' verbatim, unlike
    ``_metadata.file_path`` which URI-encodes one extra layer (THAT form
    decodes via the scan's ``_norm_path_col``). Decoding here would
    corrupt Hive-escaped names ('k=a%3Db' -> 'k=a=b') and flag LIVE
    files as orphans."""
    return F.regexp_replace(col, r"^file:/*", "/")


_strip = _norm  # referenced-side alias: same canonical on-disk form


def referenced_files_frame(spark: SparkSession, table_dir: str) -> DataFrame:
    """Every path ANY retained metadata version can reach, as one column
    ``path`` — metadata JSONs + hint (driver list, O(versions)), manifest
    lists (O(snapshots)), manifests (O(manifests), from the planning
    index), and the UNBOUNDED data/delete-file level via one distributed
    binaryFile + Arrow decode over the UNIQUE manifest set (deleted
    entries included: status=2 files stay on disk until expiry)."""
    from iceberg_meta_spark.sources.iceberg_native import (
        _entries_map_fn,
        _ENTRY_COLS,
    )

    table_dir = _local_path(table_dir.rstrip("/"))
    md, version, meta_dir = _load_md(table_dir)

    driver_paths: set[str] = {
        os.path.join(meta_dir, "version-hint.text"),
        os.path.join(meta_dir, f"v{version}.metadata.json"),
    }
    for e in md.get("metadata-log", []):
        driver_paths.add(e["metadata-file"])
    # registered STATISTICS files (spec § Table Statistics / § Partition
    # Statistics) are metadata-reachable, never orphans; the partition
    # stats parquet rides a Spark-written directory, so protect its
    # siblings (_SUCCESS marker) too
    for e in md.get("statistics", []):
        driver_paths.add(e["statistics-path"])
    for e in md.get("partition-statistics", []):
        p = _local_path(e["statistics-path"])
        driver_paths.add(p)
        d = os.path.dirname(p)
        if os.path.isdir(d):
            driver_paths.update(os.path.join(d, f) for f in os.listdir(d))
    manifest_paths: set[str] = set()
    for s in md.get("snapshots", []):
        driver_paths.add(s["manifest-list"])
        manifest_paths.update(_manifest_paths(s))
    driver_paths.update(manifest_paths)

    small = spark.createDataFrame([(p,) for p in sorted(driver_paths)], "path string")
    if not manifest_paths:
        return small.select(_strip("path").alias("path"))
    data_files = (
        spark.read.format("binaryFile")
        .load(sorted(manifest_paths))
        .select("path", "content")
        .mapInPandas(_entries_map_fn, _ENTRY_COLS)
        .select(F.col("file_path").alias("path"))
    )
    return small.unionByName(data_files).select(_strip("path").alias("path")).distinct()


def orphan_files_frame(spark: SparkSession, table_dir: str) -> DataFrame:
    """Iceberg's ``remove_orphan_files`` detection, Spark-first: ONE
    recursive listing scan of the table location LEFT ANTI JOINed against
    :func:`referenced_files_frame` — rows are files on disk no retained
    metadata version references (safe to delete after the usual
    grace-period check, which the CALLER applies: this frame carries
    modificationTime for exactly that). At 100 TB both sides are
    distributed scans; the join key is the normalized path."""
    table_dir = _local_path(table_dir.rstrip("/"))
    listing = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(table_dir)
        .select(
            _norm("path").alias("path"),
            F.col("length").alias("file_size"),
            (F.col("modificationTime").cast("long") * 1000).alias("modified_ms"),
        )
        # the hint tmp file is commit-protocol scratch, never an orphan
        .where(~F.col("path").endswith(".version-hint.text.tmp"))
    )
    referenced = referenced_files_frame(spark, table_dir)
    return listing.join(F.broadcast(referenced), "path", "left_anti")


def rewrite_manifests(
    table_dir: str,
    small_threshold: int = 1 << 20,
    target_bytes: int = 8 << 20,
    timestamp_ms: int | None = None,
    committer=None,
) -> dict:
    """Execute Iceberg's ``rewrite_manifests``: first-fit bin-pack every
    small (< ``small_threshold``) DATA manifest of the current snapshot
    into ~``target_bytes`` groups, write one merged manifest per group,
    and publish a ``replace`` snapshot whose manifest list carries the
    merged manifests plus every untouched one (delete manifests and
    already-large manifests ride along verbatim).

    Spec § Manifests: rewritten entries keep their original snapshot_id /
    sequence numbers and become EXISTING (status 0); ADDED/EXISTING both
    map to EXISTING, DELETED entries do not carry forward. Totals are
    unchanged (a rewrite moves no data), so the summary carries the parent
    totals verbatim. Returns {"groups": n, "rewritten": n_manifests,
    "snapshot_id": new} — {"groups": 0, ...} means nothing to do and no
    commit was published.

    Group COUNT is bounded (each holds ≥2 manifests of ≤ target size), and
    each group's working set is ≤ ``target_bytes`` — the per-group merge is
    bounded work; a deployment with 10⁶ small manifests gets ~10³ groups
    sequentially here or sharded upstream by the caller.

    ``committer`` routes the publish through another catalog face
    (``RestCommitter``); default filesystem. Either way the commit runs
    the optimistic retry loop: the build below re-derives its groups from
    the metadata each attempt sees, so a rebase after a concurrent commit
    re-plans instead of replaying stale manifests (r12 — the pre-r12
    filesystem path published without a retry loop).
    """
    from iceberg_meta_spark.sources.iceberg_write import FilesystemCommitter

    stats: dict = {}

    class _NothingToRewrite(Exception):
        pass

    def build(table_dir, meta_dir, md):
        return _build_manifest_rewrite(
            table_dir, meta_dir, md, small_threshold, target_bytes,
            timestamp_ms, stats, _NothingToRewrite,
        )

    committer = committer or FilesystemCommitter(table_dir)
    try:
        committer.commit_snapshot(build)
    except _NothingToRewrite:
        return {"groups": 0, "rewritten": 0, "snapshot_id": None}
    return {"groups": stats["groups"], "rewritten": stats["rewritten"],
            "snapshot_id": stats["snapshot_id"]}


def _build_manifest_rewrite(
    table_dir: str,
    meta_dir: str,
    md: dict,
    small_threshold: int,
    target_bytes: int,
    timestamp_ms: int | None,
    stats: dict,
    nothing_exc: type,
) -> dict:
    """The publish-free half of :func:`rewrite_manifests` (pure against
    ``md``); raises ``nothing_exc`` when no group qualifies so the caller
    can skip the commit entirely."""
    parent_id = md.get("current-snapshot-id")
    if parent_id is None:
        raise ValueError("table has no current snapshot")
    parent = next(s for s in md["snapshots"] if s["snapshot-id"] == parent_id)
    with open(_local_path(parent["manifest-list"]), "rb") as fh:
        _, _, manifests = read_container(fh.read())
    for m in manifests:
        m.setdefault("partitions", None)

    def key(m):  # first-fit order mirrors manifest_rewrite_plan's
        return (m["manifest_path"], int(m["manifest_length"]))

    small = sorted(
        (
            m
            for m in manifests
            if int(m.get("content", 0)) == 0
            and int(m["manifest_length"]) < small_threshold
        ),
        key=key,
    )
    # first-fit into groups PER PARTITION SPEC: a manifest's Avro entry
    # schema encodes its spec's partition shape, so merging across specs
    # would re-encode foreign entries with the wrong partition record
    # (silently dropping fields or crashing) and stamp the merged manifest
    # with a spec id its entries don't match — after partition evolution
    # both specs legitimately coexist in one snapshot
    by_spec: dict[int, list[dict]] = {}
    for m in small:
        by_spec.setdefault(int(m.get("partition_spec_id", 0)), []).append(m)
    groups: list[list[dict]] = []
    for spec_id in sorted(by_spec):
        cur_group: list[dict] = []
        cur_bytes = 0
        for m in by_spec[spec_id]:
            if cur_group and cur_bytes + int(m["manifest_length"]) > target_bytes:
                groups.append(cur_group)
                cur_group, cur_bytes = [], 0
            cur_group.append(m)
            cur_bytes += int(m["manifest_length"])
        if cur_group:
            groups.append(cur_group)
    # singleton groups are not worth rewriting
    groups = [g for g in groups if len(g) > 1]
    if not groups:
        raise nothing_exc()

    rewritten_paths = {m["manifest_path"] for g in groups for m in g}
    snap_id = max(s["snapshot-id"] for s in md["snapshots"]) + 1
    seq = int(md.get("last-sequence-number", 0)) + 1
    ts = (
        int(timestamp_ms)
        if timestamp_ms is not None
        else int(md["last-updated-ms"]) + 1
    )
    commit_uuid = uuid.uuid5(uuid.NAMESPACE_URL, f"{table_dir}/rewrite/{snap_id}")

    new_manifests = [m for m in manifests if m["manifest_path"] not in rewritten_paths]
    n_rewritten = 0
    for gi, group in enumerate(groups):
        merged: list[dict] = []
        entry_schema = None
        mmeta: dict = {}
        existing_rows = 0
        min_seq = None
        for m in group:
            with open(_local_path(m["manifest_path"]), "rb") as fh:
                schema, meta, entries = read_container(fh.read())
            entry_schema = entry_schema or schema
            mmeta = mmeta or dict(meta)
            for e in entries:
                if int(e.get("status", 0)) == 2:
                    continue  # deleted entries do not carry forward
                e = dict(e)
                e["status"] = 0  # EXISTING, provenance preserved
                # spec § Sequence Number Inheritance: a null entry seq means
                # "inherit from MY manifest" and is legal on ADDED entries
                # only — an EXISTING entry must carry it explicitly, so
                # materialize the SOURCE manifest's seq before the entry
                # moves into a manifest with a different (newer) seq
                if e.get("sequence_number") is None:
                    e["sequence_number"] = m.get("sequence_number")
                if e.get("file_sequence_number") is None:
                    e["file_sequence_number"] = m.get("sequence_number")
                merged.append(e)
                existing_rows += int(e["data_file"]["record_count"])
            ms = m.get("min_sequence_number")
            if ms is not None:
                min_seq = ms if min_seq is None else min(min_seq, ms)
        n_rewritten += len(group)
        from iceberg_meta_spark.sources.iceberg_write import _write_new_file

        blob = write_container(entry_schema, merged, metadata=mmeta)
        gpath = _write_new_file(
            os.path.join(meta_dir, f"{commit_uuid}-rw{gi}.avro"), blob
        )
        new_manifests.append(
            {
                "manifest_path": gpath,
                "manifest_length": len(blob),
                "partition_spec_id": int(group[0].get("partition_spec_id", 0)),
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": min_seq if min_seq is not None else seq,
                "added_snapshot_id": snap_id,
                "added_files_count": 0,
                "existing_files_count": len(merged),
                "deleted_files_count": 0,
                "added_rows_count": 0,
                "existing_rows_count": existing_rows,
                "deleted_rows_count": 0,
                "partitions": None,
            }
        )

    from iceberg_meta_spark.sources.iceberg_write import (
        _fv_bytes,
        _write_new_file,
    )

    mlist_path = _write_new_file(
        os.path.join(meta_dir, f"snap-{snap_id}-{commit_uuid}.avro"),
        write_container(
            MANIFEST_FILE_SCHEMA, new_manifests,
            metadata={"format-version": _fv_bytes(md)},
        ),
    )
    prev_summary = parent.get("summary", {}) or {}
    stats.update(groups=len(groups), rewritten=n_rewritten,
                 snapshot_id=snap_id)
    return {
        "snapshot-id": snap_id,
        "parent-snapshot-id": parent_id,
        "sequence-number": seq,
        "timestamp-ms": ts,
        "manifest-list": mlist_path,
        "schema-id": md["current-schema-id"],
        "summary": {
            "operation": "replace",
            "added-records": "0",
            "deleted-records": "0",
            "manifests-replaced": str(n_rewritten),
            "manifests-created": str(len(groups)),
            "total-data-files": prev_summary.get("total-data-files", "0"),
            "total-records": prev_summary.get("total-records", "0"),
            "total-files-size": prev_summary.get("total-files-size", "0"),
        },
    }


def rewrite_data_files(
    spark: SparkSession,
    table_dir: str,
    small_threshold: int = 1 << 27,
    target_bytes: int = 1 << 29,
    sort_by: str | None = None,
    timestamp_ms: int | None = None,
    committer=None,
) -> dict:
    """EXECUTE Iceberg's ``rewrite_data_files`` (bin-pack strategy): the
    action half of ``meta_compaction_plan``/``api.compaction_plan`` (the
    reference only FLAGS compaction, formatters.py:445-462).

    1. Plan the current snapshot (:func:`~iceberg_meta_spark.sources.
       iceberg_scan.plan_scan`) and pick candidates: live data files under
       ``small_threshold`` bytes, plus any file a pending row-level delete
       can apply to (pos: delete_seq >= data_seq; eq: delete_seq >
       data_seq) — rewriting those ABSORBS the deletes, Iceberg's
       delete-threshold behavior.
    2. First-fit bin-pack candidates into ~``target_bytes`` groups PER
       PARTITION TUPLE (an output file carries exactly one partition
       value). Groups of one are only kept when delete-affected.
    3. Read each group through the merge-on-read core so pending deletes
       are APPLIED and dropped, write one target-sized parquet per group,
       and commit everything as ONE ``replace`` snapshot
       (:func:`~iceberg_meta_spark.sources.iceberg_write.
       commit_rewrite_files`): old files DELETED, new files ADDED at the
       new sequence number. Served rows are identical pre/post (the
       tests pin it); time travel still reaches the old layout.

    ``sort_by`` switches bin-pack to the SORT strategy: each partition's
    whole candidate set reads as one group and writes back
    ``repartitionByRange``-split on the sort column into ~``target_bytes``
    files — every output file covers a tight value range, so the committed
    Appendix-D bounds make subsequent zone-map pruning maximally
    selective (Iceberg's sort-order rewrite, Spark-first: the range
    exchange IS the sort cluster step).

    Dangling delete files (all their targets rewritten) stay committed —
    they apply to nothing and are dropped by
    :func:`rewrite_position_deletes` or reclaimed by snapshot expiry,
    matching the engine's separate rewrite_position_delete_files action.
    A no-op (no groups) publishes nothing: {"groups": 0, ...}.

    Group COUNT is bounded (each holds ~target_bytes); the per-group read
    +write is distributed work, the commit driver work is planning-index
    scale. Each group coalesces to ONE output task — bounded by
    target_bytes, the same contract a real compaction job sizes for.
    """
    from iceberg_meta_spark.sources.iceberg_scan import (
        _merged_rows,
        _with_lineage_columns,
        plan_scan,
    )
    from iceberg_meta_spark.sources.iceberg_write import (
        commit_rewrite_files,
        write_dataframe_files,
    )

    table_dir = _local_path(table_dir.rstrip("/"))
    md, version, meta_dir = _load_md(table_dir)
    if sort_by is None:
        # a table with a declared sort order (WRITE ORDERED BY) compacts
        # with the SORT strategy by default, like the engine's rewrite
        from iceberg_meta_spark.sources.iceberg_write import (
            default_sort_columns,
        )

        order_cols = default_sort_columns(md)
        if order_cols:
            sort_by = order_cols[0][0]  # range-split on the leading column
    plan = plan_scan(spark, table_dir)

    def delete_affected(f: dict) -> bool:
        from iceberg_meta_spark.sources.iceberg_scan import _norm_path

        fpath = _norm_path(f["path"])
        return (
            any(d["seq"] >= f["seq"] for d in plan.position_deletes)
            or any(d["seq"] > f["seq"] for d in plan.equality_deletes)
            # a v3 deletion vector names its file: only THAT file is affected
            or any(
                d["seq"] >= f["seq"]
                and _norm_path(d["referenced_data_file"]) == fpath
                for d in plan.deletion_vectors
            )
        )

    candidates = [
        f for f in plan.data_files
        if int(f["size"]) < small_threshold or delete_affected(f)
    ]
    # bin-pack per partition tuple, deterministic first-fit by path
    by_part: dict[str, list[dict]] = {}
    for f in sorted(candidates, key=lambda f: f["path"]):
        by_part.setdefault(json.dumps(f["part"], sort_keys=True, default=str), []).append(f)
    groups: list[list[dict]] = []
    for part_key in sorted(by_part):
        cur: list[dict] = []
        cur_bytes = 0
        for f in by_part[part_key]:
            if cur and cur_bytes + int(f["size"]) > target_bytes:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(f)
            cur_bytes += int(f["size"])
        if cur:
            groups.append(cur)
    if sort_by is not None:
        # SORT strategy: one group per partition (the whole candidate set)
        # so the range split is global within the partition
        groups = [g for g in
                  ([f for f in by_part[pk]] for pk in sorted(by_part))
                  if len(g) > 1 or any(delete_affected(f) for f in g)]
    else:
        groups = [g for g in groups
                  if len(g) > 1 or any(delete_affected(f) for f in g)]
    if not groups:
        return {"groups": 0, "rewritten_files": 0, "added_files": 0,
                "snapshot_id": None}

    add_files: list[dict] = []
    remove_paths: list[str] = []
    out_root = os.path.join(table_dir, "data", f"compact-{version + 1:05d}")
    # v3 row lineage (spec § Row Lineage): a rewrite MOVES existing rows,
    # so the replacement files MATERIALIZE _row_id and
    # _last_updated_sequence_number — row identity survives compaction
    # (readers prefer the written values over first-row-id derivation);
    # rows whose source file predates lineage keep NULL and re-derive
    lineage = int(md.get("format-version", 1)) >= 3
    for gi, group in enumerate(groups):
        if lineage:
            rows = _merged_rows(spark, plan, group, keep_helpers=True,
                                keep_lineage_cols=True)
            rows = _with_lineage_columns(spark, rows, group)
        else:
            rows = _merged_rows(spark, plan, group)  # deletes applied here
        if sort_by is not None:
            n_out = max(1, -(-sum(int(f["size"]) for f in group) // target_bytes))
            rows = rows.repartitionByRange(n_out, F.col(sort_by))
        else:
            rows = rows.coalesce(1)
        files = write_dataframe_files(
            spark, rows, md, os.path.join(out_root, f"g{gi}")
        )
        add_files.extend(files)
        remove_paths.extend(f["path"] for f in group)

    # validate_from_seq pins the plan-time sequence number: if a DELETE
    # (pos/eq/DV) commits between plan_scan above and this commit, the
    # rebase raises CommitConflictError instead of silently dropping it
    commit_rewrite_files(table_dir, remove_paths, add_files,
                         timestamp_ms=timestamp_ms,
                         validate_from_seq=int(md.get("last-sequence-number", 0)),
                         committer=committer)
    new_md, _, _ = _load_md(table_dir)
    return {
        "groups": len(groups),
        "rewritten_files": len(remove_paths),
        "added_files": len(add_files),
        "snapshot_id": int(new_md["current-snapshot-id"]),
    }


def rewrite_position_deletes(
    spark: SparkSession,
    table_dir: str,
    timestamp_ms: int | None = None,
    committer=None,
) -> dict:
    """EXECUTE Iceberg's ``rewrite_position_delete_files``: drop DANGLING
    position-delete files (every row targets a data file no longer live —
    the debris ``rewrite_data_files`` leaves behind) and SHRINK partially-
    dangling ones to only their live-target rows, published as one
    ``replace`` snapshot (``commit_rewrite_files(add_content=1)``).

    Detection is distributed: one parquet read over every position-delete
    file classifies each row's target against the live-path set (a
    broadcast planning-index frame); only the per-delete-file (live,
    total) counts reach the driver. Fully-live files ride along untouched.
    A no-op publishes nothing. Served rows are identical pre/post (the
    deletes being dropped apply to nothing) — pinned by the tests."""
    from iceberg_meta_spark.sources.iceberg_scan import (
        _norm_path,
        _norm_path_col,
        plan_scan,
    )
    from iceberg_meta_spark.sources.iceberg_write import commit_rewrite_files

    table_dir = _local_path(table_dir.rstrip("/"))
    _, version, _ = _load_md(table_dir)
    plan = plan_scan(spark, table_dir)
    if not plan.position_deletes:
        return {"dropped": 0, "rewritten": 0, "snapshot_id": None}
    live_df = spark.createDataFrame(
        [(_norm_path(f["path"]),) for f in plan.data_files] or [("",)],
        "target string",
    )
    del_paths = [_norm_path(d["path"]) for d in plan.position_deletes]
    rows = (
        spark.read.parquet(*del_paths)
        .select(
            _strip("file_path").alias("target"),  # stored values: on-disk
            "pos",
            # _metadata.file_path is the ONE doubly-encoded source here
            _norm_path_col(F.col("_metadata.file_path")).alias("__dfile"),
        )
        .join(F.broadcast(live_df.withColumn("__live", F.lit(1))),
              "target", "left")
    )
    per_file = {
        r["__dfile"]: (int(r["live"]), int(r["total"]))
        for r in rows.groupBy("__dfile")
        .agg(F.sum(F.coalesce(F.col("__live"), F.lit(0))).alias("live"),
             F.count(F.lit(1)).alias("total"))
        .collect()
    }
    norm_to_orig = {_norm_path(d["path"]): d["path"] for d in plan.position_deletes}
    dangling = [p for p, (lv, _) in per_file.items() if lv == 0]
    partial = [p for p, (lv, tot) in per_file.items() if 0 < lv < tot]
    if not dangling and not partial:
        return {"dropped": 0, "rewritten": 0, "snapshot_id": None}

    add_files = []
    if partial:
        out_dir = os.path.join(table_dir, "data", f"posdel-rw-{version + 1:05d}")
        (rows.where(F.col("__dfile").isin(partial) & F.col("__live").isNotNull())
         .select(F.col("target").alias("file_path"), "pos")
         .sort("file_path", "pos").coalesce(1)
         .write.parquet(out_dir))
        import glob

        [np_] = glob.glob(os.path.join(out_dir, "*.parquet"))
        n = spark.read.parquet(np_).count()
        add_files.append({
            "file_path": np_, "record_count": int(n),
            "file_size_in_bytes": os.path.getsize(np_),
        })
    remove = [norm_to_orig.get(p, p) for p in dangling + partial]
    new_md = commit_rewrite_files(table_dir, remove, add_files,
                                  committer=committer,
                                  timestamp_ms=timestamp_ms, add_content=1)
    return {
        "dropped": len(dangling),
        "rewritten": len(partial),
        "snapshot_id": int(new_md["current-snapshot-id"]),
    }


def remove_orphans(
    spark: SparkSession,
    table_dir: str,
    older_than_ms: int,
    dry_run: bool = True,
) -> dict:
    """EXECUTE orphan cleanup: delete the files :func:`orphan_files_frame`
    flags, guarded by the grace period every engine applies — only files
    whose modification time is STRICTLY BEFORE ``older_than_ms`` are
    touched (an in-flight commit's just-written files look orphaned until
    its hint swap lands; age is the only safe discriminator). ``dry_run``
    (the default, like Iceberg's action) lists without deleting.

    Returns {"deleted": [paths], "skipped_recent": n}. Deletion runs
    executor-side (``foreachPartition``), so a pathological orphan backlog
    deletes in parallel without routing paths through the driver; the
    returned list is the reporting surface (collected bounded, like every
    render). Local-filesystem tables only (the writer's documented scope —
    executors share the driver's filesystem in this deployment shape).
    """
    # one detection pass: the listing + manifest decode + anti-join is the
    # expensive part, so pin it before the three consumers (old collect,
    # recent count, distributed delete) instead of recomputing it per action
    frame = orphan_files_frame(spark, table_dir).persist()
    try:
        old_df = frame.where(F.col("modified_ms") < F.lit(older_than_ms))
        deleted = sorted(r.path for r in old_df.select("path").collect())
        skipped = frame.count() - len(deleted)
        if not dry_run:

            def _rm(rows):
                for r in rows:
                    os.remove(r.path)

            old_df.select("path").foreachPartition(_rm)
    finally:
        frame.unpersist()
    return {"deleted": deleted, "skipped_recent": skipped}


def expire_by_policy(
    table_dir: str,
    now_ms: int,
    timestamp_ms: int | None = None,
) -> dict:
    """Property-driven retention (the engine's unattended expiry): read
    the table's retention properties and apply them in one pass —

    - ``history.expire.max-ref-age-ms`` (per-ref ``max-ref-age-ms``
      overrides; ``main`` never expires): branches/tags whose pinned
      snapshot is older than the limit are DROPPED first, releasing
      their pins;
    - ``history.expire.max-snapshot-age-ms`` (default 5 days, Iceberg's
      own): snapshots older than ``now_ms - max_age`` expire;
    - ``history.expire.min-snapshots-to-keep`` (default 1): the newest N
      survive regardless of age.

    ``now_ms`` is explicit (no wall clock in the engine — callers and
    tests pass time in). Returns the :func:`expire_snapshots` result plus
    ``dropped_refs`` and the resolved ``policy``."""
    table_dir = _local_path(table_dir.rstrip("/"))
    md, version, meta_dir = _load_md(table_dir)
    props = md.get("properties") or {}
    max_age = int(props.get("history.expire.max-snapshot-age-ms",
                            5 * 24 * 3600 * 1000))
    min_keep = int(props.get("history.expire.min-snapshots-to-keep", 1))
    table_ref_age = props.get("history.expire.max-ref-age-ms")
    snap_ts = {int(s["snapshot-id"]): int(s["timestamp-ms"])
               for s in md.get("snapshots", [])}

    dropped_refs: list[str] = []
    refs = dict(md.get("refs") or {})
    for name, ref in list(refs.items()):
        if name == "main":
            continue
        limit = ref.get("max-ref-age-ms", table_ref_age)
        if limit is None:
            continue
        ts = snap_ts.get(int(ref["snapshot-id"]))
        if ts is not None and now_ms - ts > int(limit):
            refs.pop(name)
            dropped_refs.append(name)
    if dropped_refs:
        md["refs"] = refs
        ts_pub = (timestamp_ms if timestamp_ms is not None
                  else int(md["last-updated-ms"]) + 1)
        _publish(md, version, meta_dir, ts_pub)

    res = expire_snapshots(
        table_dir,
        keep_last=min_keep,
        older_than_ms=now_ms - max_age,
        timestamp_ms=timestamp_ms,
    )
    res["dropped_refs"] = dropped_refs
    res["policy"] = {
        "max-snapshot-age-ms": max_age,
        "min-snapshots-to-keep": min_keep,
        "max-ref-age-ms": int(table_ref_age) if table_ref_age else None,
    }
    return res


def expire_metadata_versions(
    table_dir: str,
    timestamp_ms: int | None = None,
    force_keep: int | None = None,
) -> dict:
    """Metadata-file cleanup (``write.metadata.delete-after-commit.
    enabled`` + ``write.metadata.previous-versions-max``, default 100):
    delete the OLDEST previous ``vN.metadata.json`` files beyond the
    keep-window and publish a trimmed metadata-log — what engines do on
    every commit when enabled, exposed as an explicit maintenance verb
    (the property gates it; ``force_keep=`` overrides for ad-hoc runs).
    Deleting old versions retires their ``version=`` time travel, exactly
    like the engine; a no-op (nothing beyond the window, or disabled)
    publishes nothing."""
    table_dir = _local_path(table_dir.rstrip("/"))
    md, version, meta_dir = _load_md(table_dir)
    props = md.get("properties") or {}
    if force_keep is not None:
        keep = int(force_keep)
    elif str(props.get("write.metadata.delete-after-commit.enabled",
                       "false")).lower() == "true":
        keep = int(props.get("write.metadata.previous-versions-max", 100))
    else:
        return {"deleted": [], "kept": len(md.get("metadata-log", []))}
    log = md.get("metadata-log", [])
    # keep <= 0 means "no previous versions": log[:-0] would be [] and
    # silently no-op the strictest retention, so slice explicitly
    excess = list(log) if keep <= 0 else (log[:-keep] if len(log) > keep else [])
    if not excess:
        return {"deleted": [], "kept": len(log)}
    deleted = []
    for e in excess:
        p = _local_path(e["metadata-file"])
        if os.path.exists(p):
            os.remove(p)
            deleted.append(p)
    md["metadata-log"] = log[len(excess):]
    ts = (timestamp_ms if timestamp_ms is not None
          else int(md["last-updated-ms"]) + 1)
    _publish(md, version, meta_dir, ts)
    return {"deleted": deleted, "kept": keep}


def rewrite_deletion_vectors(
    spark: SparkSession,
    table_dir: str,
    timestamp_ms: int | None = None,
    committer=None,
) -> dict:
    """Drop DANGLING deletion vectors on a v3 table — the DV sibling of
    :func:`rewrite_position_deletes`. A deletion vector references exactly
    ONE data file, so dangling is all-or-nothing: when ``rewrite_data_files``
    absorbs and removes the referenced file, its DV applies to nothing and
    is pure metadata debris. Detection is a planning-index set difference
    (no blob reads, no data scan); the cleanup publishes one ``replace``
    snapshot that marks the dangling entries DELETED in rewritten delete
    manifests (``commit_dv_files`` supersede-only commit). Served rows are
    identical pre/post — the dropped DVs applied to nothing. A no-op
    publishes nothing."""
    from iceberg_meta_spark.sources.iceberg_dv import commit_dv_files
    from iceberg_meta_spark.sources.iceberg_scan import _norm_path, plan_scan

    table_dir = _local_path(table_dir.rstrip("/"))
    plan = plan_scan(spark, table_dir)
    if not plan.deletion_vectors:
        return {"dropped": 0, "snapshot_id": None}
    live = {_norm_path(f["path"]) for f in plan.data_files}
    dangling = [
        d for d in plan.deletion_vectors
        if _norm_path(d["referenced_data_file"]) not in live
    ]
    if not dangling:
        return {"dropped": 0, "snapshot_id": None}
    md = commit_dv_files(
        table_dir, [], timestamp_ms=timestamp_ms,
        supersede={(d["path"], int(d["offset"])) for d in dangling},
        committer=committer,
    )
    return {"dropped": len(dangling),
            "snapshot_id": int(md["current-snapshot-id"])}
