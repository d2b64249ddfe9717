"""Loopback REST-catalog server: an in-process test double implementing
the SERVER half of the public Iceberg REST catalog API
(`rest-catalog-open-api.yaml`) with real compare-and-swap enforcement,
so the client adapter (``iceberg_rest.py``) can be exercised end to end
without external infrastructure.

What it implements:

- ``GET /v1/config`` — empty defaults/overrides (spec shape).
- ``GET /v1/namespaces/{ns}/tables/{table}`` — loadTable: the current
  metadata + metadata-location.
- ``POST /v1/namespaces/{ns}/tables/{table}`` — updateTable: validates
  ``requirements`` under a lock (``assert-table-uuid``,
  ``assert-ref-snapshot-id``), answers **409** when any fails (the CAS),
  applies ``updates`` (``add-snapshot``, ``set-snapshot-ref``,
  ``set-properties``, ``remove-properties``) and persists the new
  metadata JSON into the table's warehouse directory through the same
  exclusive-create two-phase publish the filesystem path uses — so a
  REST-committed table stays scannable by ``scan_table`` and every
  metadata query.

Faithful to production layout: a REST catalog owns the POINTER; metadata
files, manifests, and data live in the warehouse (object storage there,
the local filesystem here). Tables are seeded with ``register`` from an
existing filesystem-layout table. Multipart namespaces arrive with the
spec's percent-encoded 0x1F unit separator and are stored dotted;
``GET /v1/namespaces?parent=`` lists one level at a time, and
``DELETE ...?purgeRequested=true`` removes the table's files.

This is test infrastructure shipped in-package (like Iceberg's own
``RESTCatalogAdapter`` test fixture) because the FULL-registry query
``iceberg_rest_catalog_scan`` drives it to prove the protocol round
trip under the oracle gate.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from iceberg_meta_spark.sources.iceberg_write import (
    _latest_version,
    _local_path,
    _publish,
)

_TABLE_RE = re.compile(r"^/v1/namespaces/([^/]+)/tables/([^/]+)$")
_TABLES_RE = re.compile(r"^/v1/namespaces/([^/]+)/tables$")


class _RequirementFailed(Exception):
    pass


class LoopbackRestCatalog:
    """ThreadingHTTPServer on 127.0.0.1:<ephemeral port>; ``uri`` after
    :meth:`start`. Context-manager friendly::

        with LoopbackRestCatalog() as server:
            server.register("ns.t", table_dir)
            catalog = RestCatalog(server.uri)
    """

    def __init__(self, warehouse: str | None = None):
        import tempfile

        self._tables: dict[str, dict] = {}  # ident -> {"dir": ..., "md": ...}
        self._lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self.uri = ""
        # createTable provisions storage here (object storage in production)
        self.warehouse = warehouse or tempfile.mkdtemp(prefix="rest_warehouse_")

    # ------------------------------------------------------------ lifecycle
    def start(self) -> "LoopbackRestCatalog":
        mock = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr noise
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _route(self):
                """(decoded path, query dict): %1F unit separators in
                namespace segments decode to dots, query split off."""
                parts = urllib.parse.urlsplit(self.path)
                path = urllib.parse.unquote(parts.path).replace("\x1f", ".")
                query = dict(urllib.parse.parse_qsl(parts.query))
                # parent= also carries the encoded separator
                if "parent" in query:
                    query["parent"] = query["parent"].replace("\x1f", ".")
                return path, query

            def do_GET(self):
                path, query = self._route()
                if path == "/v1/config":
                    return self._json(200, {"defaults": {}, "overrides": {}})
                if path == "/v1/namespaces":
                    # hierarchical listing: namespaces DIRECTLY under
                    # parent (spec ListNamespaces), derived from the
                    # registered tables' dotted namespaces
                    parent = query.get("parent")
                    prefix = f"{parent}." if parent else ""
                    with mock._lock:
                        all_ns = {i.rpartition(".")[0] for i in mock._tables}
                    children = set()
                    for ns in all_ns:
                        if parent is None:
                            children.add(ns.split(".")[0])
                        elif ns == parent or ns.startswith(prefix):
                            rest = ns[len(prefix):]
                            if rest:
                                children.add(f"{parent}.{rest.split('.')[0]}")
                    return self._json(200, {
                        "namespaces": [ns.split(".")
                                       for ns in sorted(children)]})
                m = _TABLES_RE.match(path)
                if m:
                    ns = m.group(1)
                    with mock._lock:
                        names = sorted(
                            i.rpartition(".")[2] for i in mock._tables
                            if i.rpartition(".")[0] == ns
                        )
                    return self._json(200, {"identifiers": [
                        {"namespace": ns.split("."), "name": n}
                        for n in names
                    ]})
                m = _TABLE_RE.match(path)
                if m:
                    ident = f"{m.group(1)}.{m.group(2)}"
                    entry = mock._tables.get(ident)
                    if entry is None:
                        return self._json(404, {"error": {
                            "message": f"table {ident} not found",
                            "type": "NoSuchTableException"}})
                    with mock._lock:
                        return self._json(200, {
                            "metadata-location": entry["location"],
                            "metadata": entry["md"],
                        })
                return self._json(404, {"error": {"message": "no route"}})

            def do_POST(self):
                path, _query = self._route()
                m = _TABLES_RE.match(path)
                if m:  # createTable
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    try:
                        out = mock._create(m.group(1), body)
                    except FileExistsError as e:
                        return self._json(409, {"error": {
                            "message": str(e),
                            "type": "AlreadyExistsException"}})
                    except (KeyError, ValueError) as e:
                        return self._json(400, {"error": {"message": str(e)}})
                    return self._json(200, out)
                m = _TABLE_RE.match(path)
                if not m:
                    return self._json(404, {"error": {"message": "no route"}})
                ident = f"{m.group(1)}.{m.group(2)}"
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                try:
                    out = mock._commit(ident, body.get("requirements", []),
                                       body.get("updates", []))
                except _RequirementFailed as e:
                    return self._json(409, {"error": {
                        "message": str(e),
                        "type": "CommitFailedException"}})
                except FileExistsError as e:
                    # an external FILESYSTEM writer claimed the next
                    # metadata version on disk: same CAS loss, same answer
                    return self._json(409, {"error": {
                        "message": f"metadata version claimed externally: {e}",
                        "type": "CommitFailedException"}})
                except KeyError as e:
                    return self._json(404, {"error": {"message": str(e)}})
                except ValueError as e:
                    return self._json(400, {"error": {"message": str(e)}})
                return self._json(200, out)

            def do_DELETE(self):
                path, query = self._route()
                m = _TABLE_RE.match(path)
                if not m:
                    return self._json(404, {"error": {"message": "no route"}})
                ident = f"{m.group(1)}.{m.group(2)}"
                purge = query.get("purgeRequested", "").lower() == "true"
                with mock._lock:
                    if ident not in mock._tables:
                        return self._json(404, {"error": {
                            "message": f"table {ident} not found",
                            "type": "NoSuchTableException"}})
                    entry = mock._tables.pop(ident)
                # purgeRequested=true: the server deletes data AND
                # metadata; otherwise the catalog only forgets the
                # pointer and files stay for remove_orphans
                if purge:
                    shutil.rmtree(entry["dir"], ignore_errors=True)
                self.send_response(204)
                self.send_header("Content-Length", "0")
                self.end_headers()

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.uri = f"http://127.0.0.1:{self._httpd.server_port}"
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # ------------------------------------------------------------- catalog
    def register(self, ident: str, table_dir: str) -> None:
        """Adopt an existing filesystem-layout table: the catalog takes
        over its pointer, seeded from the current metadata version."""
        table_dir = _local_path(table_dir.rstrip("/"))
        meta_dir = os.path.join(table_dir, "metadata")
        version = _latest_version(meta_dir)
        path = os.path.join(meta_dir, f"v{version}.metadata.json")
        with open(path) as fh:
            md = json.load(fh)
        with self._lock:
            self._tables[ident] = {
                "dir": table_dir, "md": md, "version": version,
                "location": path,
            }

    def _create(self, ns: str, body: dict) -> dict:
        """createTable: provision a filesystem-layout table under the
        warehouse and take its pointer."""
        from iceberg_meta_spark.sources.iceberg_write import create_table

        name = body["name"]
        ident = f"{ns}.{name}"
        with self._lock:
            if ident in self._tables:
                raise FileExistsError(f"table {ident} already exists")
        fields = [
            (int(f["id"]), f["name"], f["type"])
            for f in (body.get("schema") or {}).get("fields", [])
        ]
        if not fields:
            raise ValueError("createTable needs a schema with fields")
        fv = int((body.get("properties") or {}).get("format-version", 2))
        table_dir = os.path.join(self.warehouse, ns, name)
        create_table(table_dir, fields=fields, format_version=fv)
        self.register(ident, table_dir)
        with self._lock:
            entry = self._tables[ident]
            return {"metadata-location": entry["location"],
                    "metadata": entry["md"]}

    def _commit(self, ident: str, requirements: list[dict],
                updates: list[dict]) -> dict:
        with self._lock:
            entry = self._tables.get(ident)
            if entry is None:
                raise KeyError(f"table {ident} not found")
            md = json.loads(json.dumps(entry["md"]))  # work on a copy

            for r in requirements:
                rtype = r.get("type")
                if rtype == "assert-table-uuid":
                    if md.get("table-uuid") != r.get("uuid"):
                        raise _RequirementFailed(
                            f"table uuid changed: {md.get('table-uuid')}")
                elif rtype == "assert-ref-snapshot-id":
                    ref = r.get("ref", "main")
                    have = (md.get("refs") or {}).get(ref, {}).get("snapshot-id")
                    if have is None and ref == "main":
                        have = md.get("current-snapshot-id")
                    want = r.get("snapshot-id")
                    if have != want:
                        raise _RequirementFailed(
                            f"ref {ref} is at {have}, requirement says {want}")
                elif rtype == "assert-current-schema-id":
                    if int(md.get("current-schema-id", 0)) != int(
                            r.get("current-schema-id", -1)):
                        raise _RequirementFailed(
                            "current schema id is "
                            f"{md.get('current-schema-id')}, requirement "
                            f"says {r.get('current-schema-id')}")
                elif rtype == "assert-default-spec-id":
                    if int(md.get("default-spec-id", 0)) != int(
                            r.get("default-spec-id", -1)):
                        raise _RequirementFailed(
                            f"default spec id is {md.get('default-spec-id')},"
                            f" requirement says {r.get('default-spec-id')}")
                elif rtype == "assert-default-sort-order-id":
                    if int(md.get("default-sort-order-id", 0)) != int(
                            r.get("default-sort-order-id", -1)):
                        raise _RequirementFailed(
                            "default sort order id is "
                            f"{md.get('default-sort-order-id')}, requirement "
                            f"says {r.get('default-sort-order-id')}")
                else:
                    raise ValueError(f"unsupported requirement {rtype!r}")

            last_added_schema = None
            last_added_spec = None
            last_added_order = None
            for u in updates:
                action = u.get("action")
                if action == "add-snapshot":
                    snap = u["snapshot"]
                    if any(s["snapshot-id"] == snap["snapshot-id"]
                           for s in md.get("snapshots", [])):
                        raise _RequirementFailed(
                            f"snapshot {snap['snapshot-id']} already exists")
                    md["snapshots"] = md.get("snapshots", []) + [snap]
                    md["last-sequence-number"] = max(
                        int(md.get("last-sequence-number", 0)),
                        int(snap.get("sequence-number", 0)),
                    )
                    md["last-updated-ms"] = max(
                        int(md.get("last-updated-ms", 0)),
                        int(snap["timestamp-ms"]),
                    )
                    if snap.get("first-row-id") is not None:
                        # v3 row lineage: the catalog advances the row-id
                        # high-water mark past the committed snapshot
                        added = int((snap.get("summary") or {})
                                    .get("added-records", 0))
                        md["next-row-id"] = max(
                            int(md.get("next-row-id", 0)),
                            int(snap["first-row-id"]) + added,
                        )
                elif action == "set-snapshot-ref":
                    name = u["ref-name"]
                    sid = int(u["snapshot-id"])
                    refs = dict(md.get("refs") or {})
                    refs[name] = {"snapshot-id": sid,
                                  "type": u.get("type", "branch")}
                    md["refs"] = refs
                    if name == "main":
                        md["current-snapshot-id"] = sid
                        ts = next(
                            int(s["timestamp-ms"])
                            for s in md["snapshots"]
                            if s["snapshot-id"] == sid
                        )
                        md["snapshot-log"] = md.get("snapshot-log", []) + [
                            {"snapshot-id": sid, "timestamp-ms": ts}
                        ]
                elif action == "add-schema":
                    schema = dict(u["schema"])
                    sid = schema.get("schema-id")
                    if sid is None or int(sid) < 0:
                        sid = max(
                            (s["schema-id"] for s in md.get("schemas", [])),
                            default=-1,
                        ) + 1
                        schema["schema-id"] = sid
                    if any(s["schema-id"] == sid
                           for s in md.get("schemas", [])):
                        raise _RequirementFailed(
                            f"schema id {sid} already exists")
                    md["schemas"] = md.get("schemas", []) + [schema]
                    md["last-column-id"] = max(
                        int(md.get("last-column-id", 0)),
                        max((int(f["id"]) for f in schema["fields"]),
                            default=0),
                    )
                    last_added_schema = sid
                elif action == "set-current-schema":
                    sid = int(u["schema-id"])
                    if sid == -1:  # spec: -1 = the schema added in this commit
                        if last_added_schema is None:
                            raise ValueError(
                                "set-current-schema -1 without add-schema")
                        sid = last_added_schema
                    if not any(s["schema-id"] == sid
                               for s in md.get("schemas", [])):
                        raise ValueError(f"no schema with id {sid}")
                    md["current-schema-id"] = sid
                elif action == "add-spec":
                    spec = dict(u["spec"])
                    sid = spec.get("spec-id")
                    if sid is None or int(sid) < 0:
                        sid = max((s["spec-id"]
                                   for s in md.get("partition-specs", [])),
                                  default=-1) + 1
                        spec["spec-id"] = sid
                    if any(s["spec-id"] == sid
                           for s in md.get("partition-specs", [])):
                        raise _RequirementFailed(
                            f"spec id {sid} already exists")
                    md["partition-specs"] = (
                        md.get("partition-specs", []) + [spec])
                    md["last-partition-id"] = max(
                        int(md.get("last-partition-id", 999)),
                        max((int(f["field-id"]) for f in spec["fields"]),
                            default=999),
                    )
                    last_added_spec = sid
                elif action == "set-default-spec":
                    sid = int(u["spec-id"])
                    if sid == -1:  # spec: -1 = the spec added in this commit
                        if last_added_spec is None:
                            raise ValueError(
                                "set-default-spec -1 without add-spec")
                        sid = last_added_spec
                    if not any(s["spec-id"] == sid
                               for s in md.get("partition-specs", [])):
                        raise ValueError(f"no partition spec with id {sid}")
                    md["default-spec-id"] = sid
                elif action == "add-sort-order":
                    order = dict(u["sort-order"])
                    oid = order.get("order-id")
                    if oid is None or int(oid) < 0:
                        oid = max((o["order-id"]
                                   for o in md.get("sort-orders", [])),
                                  default=0) + 1
                        order["order-id"] = oid
                    if any(o["order-id"] == oid
                           for o in md.get("sort-orders", [])):
                        raise _RequirementFailed(
                            f"sort order id {oid} already exists")
                    md["sort-orders"] = md.get("sort-orders", []) + [order]
                    last_added_order = oid
                elif action == "set-default-sort-order":
                    oid = int(u["sort-order-id"])
                    if oid == -1:
                        if last_added_order is None:
                            raise ValueError(
                                "set-default-sort-order -1 without "
                                "add-sort-order")
                        oid = last_added_order
                    if not any(o["order-id"] == oid
                               for o in md.get("sort-orders", [])):
                        raise ValueError(f"no sort order with id {oid}")
                    md["default-sort-order-id"] = oid
                elif action == "set-properties":
                    md["properties"] = {
                        **(md.get("properties") or {}),
                        **{str(k): str(v)
                           for k, v in (u.get("updates") or {}).items()},
                    }
                elif action == "remove-properties":
                    props = dict(md.get("properties") or {})
                    for k in u.get("removals", []):
                        props.pop(k, None)
                    md["properties"] = props
                elif action == "remove-snapshots":
                    from iceberg_meta_spark.sources.iceberg_maintenance import (
                        apply_snapshot_removal,
                    )

                    ids = [int(i) for i in u.get("snapshot-ids", [])]
                    cur = md.get("current-snapshot-id")
                    pinned = {int(r["snapshot-id"])
                              for r in (md.get("refs") or {}).values()}
                    if cur is not None:
                        pinned.add(int(cur))
                    bad = sorted(set(ids) & pinned)
                    if bad:
                        raise _RequirementFailed(
                            f"cannot remove snapshot {bad[0]}: it is the "
                            "current snapshot or pinned by a ref"
                        )
                    apply_snapshot_removal(md, ids)
                elif action == "remove-snapshot-ref":
                    name = u["ref-name"]
                    if name == "main":
                        raise ValueError("cannot remove the main ref")
                    refs = dict(md.get("refs") or {})
                    refs.pop(name, None)
                    md["refs"] = refs
                else:
                    raise ValueError(f"unsupported update {action!r}")

            # persist: the warehouse keeps the metadata file trail (object
            # storage in production), the catalog swaps its pointer; the
            # exclusive-create publish also keeps the directory scannable
            # by the filesystem reader
            meta_dir = os.path.join(entry["dir"], "metadata")
            version = entry["version"]
            md["metadata-log"] = md.get("metadata-log", []) + [
                {"metadata-file": os.path.join(
                    meta_dir, f"v{version}.metadata.json"),
                 "timestamp-ms": int(entry["md"].get("last-updated-ms", 0))}
            ]
            try:
                _publish(meta_dir, version, md)
            except FileExistsError:
                # an external FILESYSTEM writer claimed v(version+1): the
                # catalog's pointer is stale — resync from disk so the
                # client's rebase loads the real current state, and answer
                # 409 like any other CAS loss
                disk_version = _latest_version(meta_dir)
                path = os.path.join(meta_dir, f"v{disk_version}.metadata.json")
                with open(path) as fh:
                    entry["md"] = json.load(fh)
                entry["version"] = disk_version
                entry["location"] = path
                raise _RequirementFailed(
                    "metadata version claimed by an external writer; "
                    "catalog resynced — rebase and retry"
                ) from None
            entry["md"] = md
            entry["version"] = version + 1
            entry["location"] = os.path.join(
                meta_dir, f"v{version + 1}.metadata.json")
            return {"metadata-location": entry["location"], "metadata": md}
