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

    ``ident`` everywhere is ``"namespace.table"`` (single-level
    namespaces, the common layout; multipart namespaces URL-encode their
    unit separator per spec — out of scope here)."""

    def __init__(self, uri: str, timeout_s: float = 10.0):
        self.uri = uri.rstrip("/")
        self.timeout_s = timeout_s

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

    # ------------------------------------------------------------- protocol
    def config(self) -> dict:
        return self._request("GET", "/v1/config")

    def load_table(self, ident: str) -> tuple[str, dict]:
        """-> (metadata-location, metadata). The metadata is the full
        table-metadata JSON; its ``location`` names the storage root the
        client writes manifests/data under."""
        ns, table = self._split(ident)
        out = self._request("GET", f"/v1/namespaces/{ns}/tables/{table}")
        return out.get("metadata-location", ""), out["metadata"]

    def commit_table(self, ident: str, requirements: list[dict],
                     updates: list[dict]) -> dict:
        """updateTable: CAS commit. Raises RestCommitConflict on 409 (a
        stale requirement — rebase and retry), RestCatalogError otherwise.
        Returns the server's new metadata."""
        ns, table = self._split(ident)
        out = self._request(
            "POST", f"/v1/namespaces/{ns}/tables/{table}",
            {"requirements": requirements, "updates": updates},
        )
        return out["metadata"]

    def list_namespaces(self) -> list[str]:
        out = self._request("GET", "/v1/namespaces")
        return [".".join(n) for n in out.get("namespaces", [])]

    def list_tables(self, ns: str) -> list[str]:
        """Table names in a namespace — the catalog-listing half the
        reference's recursive warehouse scan serves (catalog.py:145-161)."""
        out = self._request("GET", f"/v1/namespaces/{ns}/tables")
        return [i["name"] for i in out.get("identifiers", [])]

    def create_table(self, ident: str,
                     fields: list[tuple[int, str, str]],
                     format_version: int = 2) -> dict:
        """createTable: the server provisions the storage location in its
        warehouse and answers with the initial metadata."""
        ns, table = self._split(ident)
        out = self._request(
            "POST", f"/v1/namespaces/{ns}/tables",
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

    def drop_table(self, ident: str) -> None:
        """dropTable: the catalog forgets the pointer (purge semantics are
        the caller's remove_orphans problem, like purgeRequested=false)."""
        ns, table = self._split(ident)
        self._request("DELETE", f"/v1/namespaces/{ns}/tables/{table}")


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
    import os

    last: RestCommitConflict | None = None
    for i in range(retries + 1):
        _, md = catalog.load_table(ident)
        table_dir = _local_path(md["location"].rstrip("/"))
        meta_dir = os.path.join(table_dir, "metadata")
        parent = md.get("current-snapshot-id")
        snapshot = build_append_snapshot(
            table_dir, meta_dir, md, files, parent, timestamp_ms=timestamp_ms,
        )
        requirements = [
            {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
            {"type": "assert-ref-snapshot-id", "ref": "main",
             "snapshot-id": parent},
        ]
        updates = [
            {"action": "add-snapshot", "snapshot": snapshot},
            {"action": "set-snapshot-ref", "ref-name": "main",
             "type": "branch", "snapshot-id": snapshot["snapshot-id"]},
        ]
        try:
            return catalog.commit_table(ident, requirements, updates)
        except RestCommitConflict as e:
            last = e
            time.sleep(0.02 * (i + 1))
    raise RestCommitConflict(
        f"lost the REST commit race {retries + 1} times on {ident}: {last}"
    )


def rest_update_schema(
    catalog: RestCatalog,
    ident: str,
    add: list[tuple] | None = None,
    drop: list[str] | None = None,
    rename: dict[str, str] | None = None,
    retries: int = 10,
) -> dict:
    """ALTER TABLE through the REST catalog: build the evolved schema from
    the loaded metadata (fresh field ids for adds — never reused; renames
    keep the id; drops remove from the new schema only) and commit it as
    ``add-schema`` + ``set-current-schema(-1)`` updates guarded by
    ``assert-current-schema-id`` — a concurrent schema change 409s and the
    client rebases on reloaded metadata. ``add`` tuples are ``(name,
    type)`` or ``(name, type, default)`` (v3 initial-default)."""
    import time as _time

    last: RestCommitConflict | None = None
    for i in range(retries + 1):
        _, md = catalog.load_table(ident)
        cur = next(s for s in md["schemas"]
                   if s["schema-id"] == md["current-schema-id"])
        fields = [dict(f) for f in cur["fields"]]
        names = {f["name"] for f in fields}
        for old, new in (rename or {}).items():
            if old not in names:
                raise KeyError(f"no column {old!r} to rename")
            for f in fields:
                if f["name"] == old:
                    f["name"] = new
            names = {f["name"] for f in fields}
        for name in drop or []:
            if name not in names:
                raise KeyError(f"no column {name!r} to drop")
            fields = [f for f in fields if f["name"] != name]
            names.discard(name)
        last_id = int(md.get("last-column-id",
                             max(f["id"] for f in fields)))
        for tup in add or []:
            name, typ = tup[0], tup[1]
            default = tup[2] if len(tup) > 2 else None
            if name in names:
                raise ValueError(f"column {name!r} already exists")
            if default is not None and int(md.get("format-version", 1)) < 3:
                raise ValueError("column defaults need format-version 3")
            last_id += 1
            fields.append({
                "id": last_id, "name": name, "required": False, "type": typ,
                **({"initial-default": default, "write-default": default}
                   if default is not None else {}),
            })
            names.add(name)
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
