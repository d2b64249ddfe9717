"""Iceberg REST-catalog commit protocol, client side (jar-free).

Implements the public REST catalog API's table-commit half
(iceberg.apache.org/spec `rest-catalog-open-api.yaml`): ``loadTable``
(GET ``/v1/{prefix}/namespaces/{ns}/tables/{table}``) and ``updateTable``
(POST the same path with ``{"requirements": [...], "updates": [...]}``).
Against a REST catalog the commit is a compare-and-swap ON THE SERVER:
the client states what it observed (``assert-ref-snapshot-id``) and what
to apply (``add-snapshot`` + ``set-snapshot-ref``); a concurrent winner
makes the server answer 409, and the client REBASES — reload, rebuild the
snapshot against fresh metadata, retry — exactly the
refresh-revalidate-retry loop the filesystem path runs in
``iceberg_write._retrying_commit``.

Reference parity: catalog.py:145-161 (the reference's load_catalog /
load_table is the client half of this same protocol, delegated to
pyiceberg); this module speaks the wire format directly so the native
write path can commit through ANY spec-compliant REST catalog. The
loopback test double lives in ``iceberg_rest_mock.py``.

Scale: one GET + one POST per commit attempt, both carrying metadata
JSON (planning-index scale). Manifests and manifest lists are written
to the table's storage location by the CLIENT (``build_append_snapshot``)
— the catalog moves pointers, never data, exactly as in production REST
catalogs backed by object storage.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import os

from iceberg_meta_spark.sources.iceberg_write import (
    CommitConflictError,
    _local_path,
    build_append_snapshot,
)


class RestCommitConflict(CommitConflictError):
    """The server rejected the commit's requirements (HTTP 409): a
    concurrent writer moved the ref, or an assertion is stale. Retryable
    by rebasing against freshly-loaded metadata."""


class RestCatalogError(RuntimeError):
    """Non-409 REST catalog failure (4xx/5xx with the error payload)."""


class RestCatalog:
    """Minimal spec-compliant REST catalog client: config, load, commit.

    ``ident`` everywhere is ``"namespace.table"``. Multipart namespaces
    are dot-joined in idents (``"a.b.t"`` = table ``t`` in namespace
    ``a.b``) and URL-encode the spec's ``0x1F`` unit separator in paths
    (``/v1/namespaces/a%1Fb/tables/t``), per rest-catalog-open-api.yaml's
    namespace serialization rule."""

    def __init__(self, uri: str, timeout_s: float = 10.0):
        self.uri = uri.rstrip("/")
        self.timeout_s = timeout_s

    @staticmethod
    def _ns_path(ns: str) -> str:
        """Dotted namespace -> URL path segment: levels joined by the
        spec's 0x1F unit separator, percent-encoded (``a.b`` ->
        ``a%1Fb``)."""
        import urllib.parse

        return urllib.parse.quote(ns.replace(".", "\x1f"), safe="")

    # ------------------------------------------------------------ plumbing
    def _request(self, method: str, path: str, body: dict | None = None) -> dict:
        req = urllib.request.Request(
            f"{self.uri}{path}",
            method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            payload = e.read().decode(errors="replace")
            if e.code == 409:
                raise RestCommitConflict(
                    f"commit requirements failed (409): {payload}"
                ) from None
            raise RestCatalogError(f"HTTP {e.code} on {path}: {payload}") from None

    @staticmethod
    def _split(ident: str) -> tuple[str, str]:
        ns, _, table = ident.rpartition(".")
        if not ns:
            raise ValueError(f"ident must be 'namespace.table', got {ident!r}")
        return ns, table

    def _table_path(self, ident: str) -> str:
        ns, table = self._split(ident)
        return f"/v1/namespaces/{self._ns_path(ns)}/tables/{table}"

    # ------------------------------------------------------------- protocol
    def config(self) -> dict:
        return self._request("GET", "/v1/config")

    def load_table(self, ident: str) -> tuple[str, dict]:
        """-> (metadata-location, metadata). The metadata is the full
        table-metadata JSON; its ``location`` names the storage root the
        client writes manifests/data under."""
        out = self._request("GET", self._table_path(ident))
        return out.get("metadata-location", ""), out["metadata"]

    def commit_table(self, ident: str, requirements: list[dict],
                     updates: list[dict]) -> dict:
        """updateTable: CAS commit. Raises RestCommitConflict on 409 (a
        stale requirement — rebase and retry), RestCatalogError otherwise.
        Returns the server's new metadata."""
        out = self._request(
            "POST", self._table_path(ident),
            {"requirements": requirements, "updates": updates},
        )
        return out["metadata"]

    def list_namespaces(self, parent: str | None = None) -> list[str]:
        """Namespaces directly under ``parent`` (dotted; None = top
        level) — the spec's ``GET /v1/namespaces?parent=a%1Fb``."""
        path = "/v1/namespaces"
        if parent is not None:
            path += f"?parent={self._ns_path(parent)}"
        out = self._request("GET", path)
        return [".".join(n) for n in out.get("namespaces", [])]

    def list_tables(self, ns: str) -> list[str]:
        """Table names in a (possibly multipart) namespace — the
        catalog-listing half the reference's recursive warehouse scan
        serves (catalog.py:145-161)."""
        out = self._request("GET", f"/v1/namespaces/{self._ns_path(ns)}/tables")
        return [i["name"] for i in out.get("identifiers", [])]

    def create_table(self, ident: str,
                     fields: list[tuple[int, str, str]],
                     format_version: int = 2) -> dict:
        """createTable: the server provisions the storage location in its
        warehouse and answers with the initial metadata."""
        ns, table = self._split(ident)
        out = self._request(
            "POST", f"/v1/namespaces/{self._ns_path(ns)}/tables",
            {
                "name": table,
                "schema": {
                    "type": "struct",
                    "fields": [
                        {"id": fid, "name": name, "required": False,
                         "type": typ}
                        for fid, name, typ in fields
                    ],
                },
                "properties": {"format-version": str(int(format_version))},
            },
        )
        return out["metadata"]

    def drop_table(self, ident: str, purge: bool = False) -> None:
        """dropTable. ``purge=False`` (default): the catalog forgets the
        pointer, files stay for remove_orphans. ``purge=True`` sends the
        spec's ``purgeRequested=true`` — the server deletes the table's
        data and metadata."""
        path = self._table_path(ident)
        if purge:
            path += "?purgeRequested=true"
        self._request("DELETE", path)


class RestCommitter:
    """The REST commit face of :class:`~iceberg_meta_spark.sources.
    iceberg_write.FilesystemCommitter`'s ``commit_snapshot(build)``
    contract: every snapshot-producing verb — append, DELETE WHERE,
    UPDATE, MERGE, DV commits, compaction, delete-file/manifest rewrites —
    routes its built snapshot through the catalog's updateTable CAS by
    passing ``committer=RestCommitter(catalog, ident)``.

    Per attempt: loadTable, run ``build(table_dir, meta_dir, md)`` against
    the loaded metadata (the builder writes manifests/manifest lists into
    the table's storage location and re-runs its OWN conflict validation —
    e.g. validateNoNewDeletesForDataFiles, the one-DV-per-file check),
    then POST the snapshot as ``add-snapshot`` + ``set-snapshot-ref``
    guarded by ``assert-table-uuid`` + ``assert-ref-snapshot-id`` on the
    committer's ``ref`` (default ``main``; a named branch makes this a
    write-audit-publish STAGING commit — only that ref moves, main
    readers see nothing until fast-forward). A 409 rebases: reload,
    rebuild, retry — the same refresh-revalidate-retry loop the
    filesystem face runs, with the SERVER as the arbiter. Builders that
    raise ``CommitConflictError`` (genuine semantic conflicts) propagate
    to the caller for re-planning, exactly as on the filesystem face.
    ``extra_properties`` ride the SAME updateTable as a set-properties
    update (one atomic commit — the streaming sink's exactly-once epoch
    high-water mark needs this)."""

    def __init__(self, catalog: RestCatalog, ident: str, retries: int = 10,
                 ref: str = "main"):
        self.catalog = catalog
        self.ident = ident
        self.retries = retries
        self.ref = ref

    def commit_snapshot(self, build, extra_properties=None) -> dict:
        last: RestCommitConflict | None = None
        for i in range(self.retries + 1):
            _, md = self.catalog.load_table(self.ident)
            table_dir = _local_path(md["location"].rstrip("/"))
            meta_dir = os.path.join(table_dir, "metadata")
            head = ((md.get("refs") or {}).get(self.ref) or {}).get(
                "snapshot-id")
            if head is None and self.ref == "main":
                head = md.get("current-snapshot-id")
            snapshot = build(table_dir, meta_dir, md)
            requirements = [
                {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
                {"type": "assert-ref-snapshot-id", "ref": self.ref,
                 "snapshot-id": head},
            ]
            updates = [
                {"action": "add-snapshot", "snapshot": snapshot},
                {"action": "set-snapshot-ref", "ref-name": self.ref,
                 "type": "branch", "snapshot-id": snapshot["snapshot-id"]},
            ]
            if extra_properties:
                updates.append({
                    "action": "set-properties",
                    "updates": {str(k): str(v)
                                for k, v in extra_properties.items()},
                })
            try:
                return self.catalog.commit_table(
                    self.ident, requirements, updates)
            except RestCommitConflict as e:
                last = e
                time.sleep(0.02 * (i + 1))
        raise RestCommitConflict(
            f"lost the REST commit race {self.retries + 1} times on "
            f"{self.ident}: {last}"
        )


def rest_append_files(
    catalog: RestCatalog,
    ident: str,
    files: list[dict],
    timestamp_ms: int | None = None,
    retries: int = 10,
) -> dict:
    """Append ``files`` as one snapshot THROUGH the REST catalog: load the
    table, build the snapshot against what was loaded (manifest + manifest
    list written to the table's storage location — the publish-free half
    shared with the filesystem commit), then commit with the spec's CAS
    requirements:

    - ``assert-table-uuid`` — the table wasn't dropped/recreated;
    - ``assert-ref-snapshot-id(main)`` — main still points at the parent
      this snapshot was built on (None = table must still be empty).

    A 409 means a concurrent writer won: REBASE — reload, rebuild (new
    snapshot id / sequence number / parent / carried manifests), retry.
    Appends never conflict semantically, so the rebase is unconditional;
    files from losing attempts are orphans for remove_orphans. Returns
    the server's committed metadata."""
    return RestCommitter(catalog, ident, retries=retries).commit_snapshot(
        lambda td, mdir, md: build_append_snapshot(
            td, mdir, md, files, md.get("current-snapshot-id"),
            timestamp_ms=timestamp_ms,
        )
    )


def rest_expire_snapshots(
    catalog: RestCatalog,
    ident: str,
    keep_last: int | None = None,
    older_than_ms: int | None = None,
    retries: int = 10,
) -> dict:
    """``expire_snapshots`` THROUGH the REST catalog: load the table,
    compute the retain/expire sets with the SAME policy the filesystem
    face runs (current + ref-pinned + keep_last newest + not-older-than —
    the shared :func:`~iceberg_meta_spark.sources.iceberg_maintenance.
    plan_expiry`), then commit the spec's ``remove-snapshots`` update
    guarded by ``assert-ref-snapshot-id(main)`` — a concurrent commit
    409s and the plan rebases against fresh metadata. Returns
    ``{"expired_snapshot_ids": [...], "removable_files": [...]}`` like
    the filesystem verb (the metadata commit never deletes data; hand
    removable_files to remove_orphans)."""
    from iceberg_meta_spark.sources.iceberg_maintenance import plan_expiry

    last: RestCommitConflict | None = None
    for i in range(retries + 1):
        _, md = catalog.load_table(ident)
        expired_ids, removable = plan_expiry(
            md, keep_last=keep_last, older_than_ms=older_than_ms
        )
        if not expired_ids:
            return {"expired_snapshot_ids": [], "removable_files": []}
        try:
            catalog.commit_table(
                ident,
                requirements=[
                    {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
                    {"type": "assert-ref-snapshot-id", "ref": "main",
                     "snapshot-id": md.get("current-snapshot-id")},
                ],
                updates=[{"action": "remove-snapshots",
                          "snapshot-ids": expired_ids}],
            )
            return {"expired_snapshot_ids": expired_ids,
                    "removable_files": removable}
        except RestCommitConflict as e:
            last = e
            time.sleep(0.02 * (i + 1))
    raise RestCommitConflict(
        f"lost the expiry commit race {retries + 1} times on {ident}: {last}"
    )


def rest_update_schema(
    catalog: RestCatalog,
    ident: str,
    add: list[tuple] | None = None,
    drop: list[str] | None = None,
    rename: dict[str, str] | None = None,
    retries: int = 10,
    widen: dict[str, str] | None = None,
) -> dict:
    """ALTER TABLE through the REST catalog: build the evolved schema from
    the loaded metadata with the SAME shared builder the filesystem face
    uses (``iceberg_write.build_evolved_schema`` — fresh field ids for
    adds, id-stable renames, legal-promotion-only ``widen``, and the
    partition-source drop guard, so the two faces cannot drift on
    validation) and commit it as ``add-schema`` + ``set-current-schema
    (-1)`` updates guarded by ``assert-current-schema-id`` — a concurrent
    schema change 409s and the client rebases on reloaded metadata.
    ``add`` tuples are ``(name, type)`` or ``(name, type, default)`` (v3
    initial-default)."""
    import time as _time

    from iceberg_meta_spark.sources.iceberg_write import build_evolved_schema

    last: RestCommitConflict | None = None
    for i in range(retries + 1):
        _, md = catalog.load_table(ident)
        fields, _ = build_evolved_schema(
            md, add=add, drop=drop, rename=rename, widen=widen
        )
        new_schema = {"type": "struct", "schema-id": -1, "fields": fields}
        try:
            return catalog.commit_table(
                ident,
                requirements=[
                    {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
                    {"type": "assert-current-schema-id",
                     "current-schema-id": md["current-schema-id"]},
                ],
                updates=[
                    {"action": "add-schema", "schema": new_schema},
                    {"action": "set-current-schema", "schema-id": -1},
                ],
            )
        except RestCommitConflict as e:
            last = e
            _time.sleep(0.02 * (i + 1))
    raise RestCommitConflict(
        f"lost the schema-commit race {retries + 1} times on {ident}: {last}"
    )


def rest_update_partition_spec(
    catalog: RestCatalog,
    ident: str,
    add_identity: list[str] | None = None,
    add_fields: list[tuple[str, str, str]] | None = None,
    drop_fields: list[str] | None = None,
    retries: int = 10,
) -> dict:
    """Partition evolution through the REST catalog: build the new spec
    with the SAME shared builder the filesystem face uses
    (``iceberg_write.build_evolved_partition_spec``) and commit it as
    ``add-spec`` + ``set-default-spec(-1)`` guarded by
    ``assert-default-spec-id`` — a concurrent spec change 409s and the
    client rebases on reloaded metadata."""
    import time as _time

    from iceberg_meta_spark.sources.iceberg_write import (
        build_evolved_partition_spec,
    )

    last: RestCommitConflict | None = None
    for i in range(retries + 1):
        _, md = catalog.load_table(ident)
        new_fields, last_pid = build_evolved_partition_spec(
            md, add_identity=add_identity, add_fields=add_fields,
            drop_fields=drop_fields,
        )
        try:
            return catalog.commit_table(
                ident,
                requirements=[
                    {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
                    {"type": "assert-default-spec-id",
                     "default-spec-id": md["default-spec-id"]},
                ],
                updates=[
                    {"action": "add-spec",
                     "spec": {"spec-id": -1, "fields": new_fields}},
                    {"action": "set-default-spec", "spec-id": -1},
                ],
            )
        except RestCommitConflict as e:
            last = e
            _time.sleep(0.02 * (i + 1))
    raise RestCommitConflict(
        f"lost the spec-commit race {retries + 1} times on {ident}: {last}"
    )


def rest_update_sort_order(
    catalog: RestCatalog,
    ident: str,
    sort_by: list,
    retries: int = 10,
) -> dict:
    """WRITE ORDERED BY through the REST catalog: shared field builder
    (``iceberg_write.build_sort_order_fields``), committed as
    ``add-sort-order`` + ``set-default-sort-order(-1)`` guarded by
    ``assert-default-sort-order-id``."""
    import time as _time

    from iceberg_meta_spark.sources.iceberg_write import (
        build_sort_order_fields,
    )

    last: RestCommitConflict | None = None
    for i in range(retries + 1):
        _, md = catalog.load_table(ident)
        fields = build_sort_order_fields(md, sort_by)
        try:
            return catalog.commit_table(
                ident,
                requirements=[
                    {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
                    {"type": "assert-default-sort-order-id",
                     "default-sort-order-id":
                         int(md.get("default-sort-order-id", 0))},
                ],
                updates=[
                    {"action": "add-sort-order",
                     "sort-order": {"order-id": -1, "fields": fields}},
                    {"action": "set-default-sort-order", "sort-order-id": -1},
                ],
            )
        except RestCommitConflict as e:
            last = e
            _time.sleep(0.02 * (i + 1))
    raise RestCommitConflict(
        f"lost the sort-order race {retries + 1} times on {ident}: {last}"
    )


def rest_rollback(
    catalog: RestCatalog,
    ident: str,
    snapshot_id: int,
) -> dict:
    """rollback_to_snapshot through the REST catalog: validate the target
    still exists in the loaded metadata, then move main with one
    ``set-snapshot-ref`` guarded by ``assert-ref-snapshot-id(main)``."""
    _, md = catalog.load_table(ident)
    if not any(s["snapshot-id"] == snapshot_id
               for s in md.get("snapshots", [])):
        raise KeyError(f"snapshot {snapshot_id} not in table metadata")
    return catalog.commit_table(
        ident,
        requirements=[
            {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
            {"type": "assert-ref-snapshot-id", "ref": "main",
             "snapshot-id": md.get("current-snapshot-id")},
        ],
        updates=[{"action": "set-snapshot-ref", "ref-name": "main",
                  "type": "branch", "snapshot-id": int(snapshot_id)}],
    )


def rest_manage_ref(
    catalog: RestCatalog,
    ident: str,
    name: str,
    snapshot_id: int | None = None,
    ref_type: str = "tag",
    drop: bool = False,
) -> dict:
    """Branch/tag DDL through the REST catalog: ``set-snapshot-ref`` to
    create/replace (pinned at ``snapshot_id``, default current head) or
    ``remove-snapshot-ref`` to drop — same validation as the filesystem
    ``manage_ref`` (main is never droppable; the pinned snapshot must
    exist)."""
    if ref_type not in ("tag", "branch"):
        raise ValueError("ref_type must be 'tag' or 'branch'")
    _, md = catalog.load_table(ident)
    if drop:
        if name == "main":
            raise ValueError("cannot drop the main branch")
        if name not in (md.get("refs") or {}):
            raise KeyError(f"no ref {name!r}")
        return catalog.commit_table(
            ident,
            requirements=[
                {"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
            updates=[{"action": "remove-snapshot-ref", "ref-name": name}],
        )
    sid = snapshot_id if snapshot_id is not None else md.get(
        "current-snapshot-id")
    if not any(s["snapshot-id"] == sid for s in md.get("snapshots", [])):
        raise KeyError(f"snapshot {sid} not in table metadata")
    return catalog.commit_table(
        ident,
        requirements=[
            {"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
        updates=[{"action": "set-snapshot-ref", "ref-name": name,
                  "type": ref_type, "snapshot-id": int(sid)}],
    )


def rest_fast_forward(
    catalog: RestCatalog,
    ident: str,
    name: str,
    from_ref: str,
) -> dict:
    """The write-audit-publish PUBLISH step through the REST catalog:
    ancestry-validate with the SAME shared resolver the filesystem face
    uses (``iceberg_write.resolve_fast_forward``), then move the target
    branch with ``set-snapshot-ref`` guarded by
    ``assert-ref-snapshot-id(target)`` — a concurrent move of the target
    409s rather than silently dropping its commits."""
    from iceberg_meta_spark.sources.iceberg_write import resolve_fast_forward

    _, md = catalog.load_table(ident)
    src, tgt = resolve_fast_forward(md, name, from_ref)
    if tgt == src:
        return {"updated": False, "from": tgt, "to": src}
    catalog.commit_table(
        ident,
        requirements=[
            {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
            {"type": "assert-ref-snapshot-id", "ref": name,
             "snapshot-id": tgt},
        ],
        updates=[{"action": "set-snapshot-ref", "ref-name": name,
                  "type": "branch", "snapshot-id": src}],
    )
    return {"updated": True, "from": tgt, "to": src}


def rest_set_properties(
    catalog: RestCatalog,
    ident: str,
    set_props: dict | None = None,
    unset: list | None = None,
) -> dict:
    """SET/UNSET TBLPROPERTIES through the REST catalog: one updateTable
    carrying ``set-properties`` and/or ``remove-properties`` (property
    commits never conflict semantically — no snapshot assertion)."""
    updates: list[dict] = []
    if set_props:
        updates.append({"action": "set-properties",
                        "updates": {str(k): str(v)
                                    for k, v in set_props.items()}})
    if unset:
        updates.append({"action": "remove-properties",
                        "removals": [str(k) for k in unset]})
    if not updates:
        raise ValueError("nothing to change: pass set_props and/or unset")
    return catalog.commit_table(ident, requirements=[], updates=updates)


def rest_append_dataframe(
    spark,
    catalog: RestCatalog,
    ident: str,
    df,
    timestamp_ms: int | None = None,
) -> dict:
    """INSERT INTO through the REST catalog: write ``df`` as parquet with
    real per-file statistics into the table's storage location (the same
    distributed write + stats pass the filesystem INSERT uses), then
    commit via :func:`rest_append_files`."""
    import os

    from iceberg_meta_spark.sources.iceberg_write import (
        _claim_batch_dir,
        write_dataframe_files,
    )

    _, md = catalog.load_table(ident)
    table_dir = _local_path(md["location"].rstrip("/"))
    n_meta = len(md.get("metadata-log", []))
    batch_dir = _claim_batch_dir(
        os.path.join(table_dir, "data", f"rest-{n_meta:05d}")
    )
    files = write_dataframe_files(spark, df, md, batch_dir, mode="overwrite")
    return rest_append_files(catalog, ident, files, timestamp_ms=timestamp_ms)
