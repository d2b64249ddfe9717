"""Structured Streaming SOURCE for native Iceberg tables (PySpark Python
Data Source API): ``spark.readStream.format("iceberg_native")``.

This is the row-level LIVE twin of the snapshot watch loop (reference
cli.py:980-1023 detects new snapshots and stops there; streaming/watch.py
is its batch/streaming port) and the streaming face of ``scan_changes``:
each micro-batch serves the rows of data files ADDED by snapshots
committed since the last processed offset — exactly the semantics of
Iceberg's own Spark streaming read, which serves append snapshots
incrementally, skips ``replace`` (compaction rewrites no logical rows),
and refuses ``delete``/``overwrite`` unless told to skip them
(spark.apache.org docs: streaming-skip-delete-snapshots).

Offsets are METADATA VERSIONS (``{"version": N}``): monotonic, durable in
the checkpoint, and replayable — vN.metadata.json stays on disk until
expiry, so a restarted query resumes planning from its checkpointed
version with no state beyond the offset. Planning walks the snapshots
added between two versions and decodes ONLY the manifests their
manifest-lists attribute to those snapshots (``added_snapshot_id``) —
O(new files) driver work per batch, the same planning-index scale every
commit path already accepts. Reading is executor-side pyarrow over one
data file per input partition, Arrow RecordBatches straight into Spark
(no Python row loop); identity-partition values are injected as constant
Arrow arrays (Hive-layout files don't carry them), matching scan_table.

Options:
- ``path`` (required): table directory.
- ``starting_version``: metadata version to start AFTER (default ``0`` =
  replay every snapshot from the table's creation; ``latest`` = only new
  commits from query start).
- ``skip_deletes``: ``true`` to skip delete/overwrite snapshots instead
  of failing the query (default ``false``, matching Iceberg's default).

Scope, stated plainly: append-snapshot streaming over filesystem-layout
tables (the native path's documented scope). Merge-on-read point-in-time
reads stay with ``scan_table``; row-level interval diffs with
``scan_changes``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from iceberg_meta_spark.sources.iceberg_scan import _ICEBERG_TO_SPARK


class IcebergNativeStreamError(RuntimeError):
    pass


def _local(p: str) -> str:
    while p.startswith("file:"):
        p = p[len("file:"):]
    return "/" + p.lstrip("/") if p.startswith("/") else p


def _load_md(table_dir: str, version: int) -> dict | None:
    path = os.path.join(table_dir, "metadata", f"v{version}.metadata.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _current_version(table_dir: str) -> int:
    with open(os.path.join(table_dir, "metadata", "version-hint.text")) as fh:
        return int(fh.read().strip())


def _avro_records(path: str) -> list:
    from iceberg_meta_spark.sources.avro_py import read_container

    with open(_local(path), "rb") as fh:
        _, _, records = read_container(fh.read())
    return records


_ARROW_T = {
    "boolean": "bool_", "int": "int32", "long": "int64", "float": "float32",
    "double": "float64", "string": "string", "date": "date32", "binary": "binary",
}


class _FilePartition(InputPartition):
    def __init__(self, file_path: str, part: dict, fields: list, part_cols: list):
        self.file_path = file_path
        self.part = part              # manifest partition tuple (field name -> value)
        self.fields = fields          # [(name, iceberg type)] declared schema
        self.part_cols = part_cols    # identity partition column names to inject


class IcebergNativeStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        if "path" not in options:
            raise IcebergNativeStreamError("option 'path' (table dir) is required")
        self._table = _local(str(options["path"]).rstrip("/"))
        self._skip_deletes = str(options.get("skip_deletes", "false")).lower() in (
            "true", "1", "yes",
        )
        self._start_opt = str(options.get("starting_version", "0"))

    # ---- offsets -------------------------------------------------------
    def initialOffset(self) -> dict:
        if self._start_opt == "latest":
            return {"version": _current_version(self._table)}
        return {"version": int(self._start_opt)}

    def latestOffset(self) -> dict:
        return {"version": _current_version(self._table)}

    def commit(self, end: dict) -> None:
        pass  # offsets are durable metadata versions; nothing to clean up

    # ---- planning (driver, O(new files)) --------------------------------
    def _new_snapshots(self, start_v: int, end_v: int):
        """Snapshots that became MAIN-visible between start_v and end_v, in
        commit order: present at end_v, absent at start_v, and an ANCESTOR
        of end_v's current snapshot — a commit STAGED on a branch
        (write-audit-publish) is not served until its fast-forward publish
        makes it a main ancestor, exactly like the engine's streaming
        read of the main branch."""
        end_md = _load_md(self._table, end_v)
        if end_md is None:
            raise IcebergNativeStreamError(
                f"metadata version v{end_v} missing under {self._table}"
            )
        def main_ancestors(md: dict) -> set[int]:
            by_id = {int(s["snapshot-id"]): s for s in md.get("snapshots", [])}
            out: set[int] = set()
            cur = md.get("current-snapshot-id")
            while cur is not None and int(cur) in by_id and int(cur) not in out:
                out.add(int(cur))
                cur = by_id[int(cur)].get("parent-snapshot-id")
            return out

        if start_v <= 0:
            seen: set[int] = set()
        else:
            start_md = _load_md(self._table, start_v)
            if start_md is None:
                # expired by metadata cleanup: every snapshot still listed
                # at end_v that predates end_v's log is treated as seen
                raise IcebergNativeStreamError(
                    f"checkpointed metadata version v{start_v} no longer "
                    f"exists (expired); restart with starting_version"
                )
            # seen = what was MAIN-visible at start — a snapshot merely
            # STAGED (listed but not an ancestor) at start is served when
            # its publish later makes it an ancestor
            seen = main_ancestors(start_md)
        end_ancestors = main_ancestors(end_md)  # once, not per candidate
        news = [
            s for s in end_md.get("snapshots", [])
            if int(s["snapshot-id"]) not in seen
            and int(s["snapshot-id"]) in end_ancestors
        ]
        news.sort(key=lambda s: (int(s["timestamp-ms"]), int(s["snapshot-id"])))
        return news, end_md

    def partitions(self, start: dict, end: dict):
        start_v, end_v = int(start["version"]), int(end["version"])
        if end_v <= start_v:
            return [  # empty batch: the API requires >= 1 partition
                _FilePartition("", {}, [], [])
            ]
        news, md = self._new_snapshots(start_v, end_v)
        schema = next(
            s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
        )
        fields = [(f["name"], f["type"]) for f in schema["fields"]]
        id_to_name = {f["id"]: f["name"] for f in schema["fields"]}
        spec = next(
            s for s in md["partition-specs"] if s["spec-id"] == md["default-spec-id"]
        )
        part_cols = {
            f["name"]: id_to_name.get(int(f["source-id"]))
            for f in spec.get("fields", [])
            if f.get("transform") == "identity"
        }
        parts: list[_FilePartition] = []
        for snap in news:
            op = (snap.get("summary") or {}).get("operation") or "append"
            if op == "replace":
                continue  # compaction/rewrite: no logical rows added
            if op in ("delete", "overwrite"):
                if self._skip_deletes:
                    continue
                raise IcebergNativeStreamError(
                    f"snapshot {snap['snapshot-id']} is a {op!r} operation; "
                    "streaming reads serve appends only — set "
                    "skip_deletes=true to skip, or use scan_changes for "
                    "row-level diffs"
                )
            snap_id = int(snap["snapshot-id"])
            for m in _avro_records(snap["manifest-list"]):
                if int(m.get("content", 0)) != 0:
                    continue
                if int(m.get("added_snapshot_id", -1)) != snap_id:
                    continue  # carried-forward manifest: already served
                for e in _avro_records(m["manifest_path"]):
                    if int(e.get("status", 0)) != 1:  # ADDED entries only
                        continue
                    dfile = e["data_file"]
                    part = {
                        src: (dfile.get("partition") or {}).get(pname)
                        for pname, src in part_cols.items()
                        if src is not None
                    }
                    parts.append(_FilePartition(
                        _local(dfile["file_path"]), part, fields, list(part),
                    ))
        return parts or [_FilePartition("", {}, [], [])]

    # ---- reading (executors, one data file per partition) ----------------
    def read(self, partition: _FilePartition):
        if not partition.file_path:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.file_path)
        n = tbl.num_rows
        arrays, names = [], []
        for name, typ in partition.fields:
            names.append(name)
            at = getattr(pa, _ARROW_T.get(typ, "string"))()
            if name in tbl.column_names:
                arrays.append(tbl.column(name).cast(at).combine_chunks())
            elif name in partition.part:
                # identity partition value: Hive-layout files don't carry
                # the column; inject the manifest tuple's constant
                arrays.append(pa.array([partition.part[name]] * n, type=at))
            else:
                arrays.append(pa.nulls(n, type=at))
        out = pa.table(arrays, names=names)
        return iter(out.to_batches(max_chunksize=1 << 16))


class _BatchFilePartition(InputPartition):
    def __init__(self, file_path: str, part: dict, fields: list,
                 pos_delete_files: list, seq: int,
                 eq_delete_files: list | None = None,
                 dvs: list | None = None):
        self.file_path = file_path
        self.part = part
        self.fields = fields
        self.pos_delete_files = pos_delete_files  # [(path, delete_seq)]
        self.seq = seq
        # [(path, delete_seq, [eq col names])] with delete_seq > seq
        self.eq_delete_files = eq_delete_files or []
        # v3 deletion vectors REFERENCING this file, applicable by seq:
        # [(puffin path, content_offset, content_size)]
        self.dvs = dvs or []


class IcebergNativeBatchReader(DataSourceReader):
    """Batch face of the source: ``spark.read.format("iceberg_native")``.

    Planning reuses :func:`~iceberg_meta_spark.sources.iceberg_scan.
    plan_scan`'s rules driver-side via the same local decode the stream
    reader uses; each partition reads ONE data file with pyarrow and
    applies BOTH v2 delete shapes executor-side: position deletes
    (delete rows read per partition and filtered to this file — never on
    the driver; data_seq <= delete_seq) and equality deletes (key-tuple
    anti-set from strictly-later delete files, null-safe via python
    tuple equality — the same visibility rules as ``scan_table``, whose
    distributed anti-join remains the mass-delete path).
    Identity-partition values inject as constant arrays, like the stream
    reader."""

    def __init__(self, options: dict):
        self._table = _local(str(options["path"]).rstrip("/"))
        self._snapshot_id = (
            int(options["snapshot_id"]) if "snapshot_id" in options else None
        )
        self._intervals: dict[str, list] = {}  # col -> [lo, hi] closed

    def pushFilters(self, filters):
        """File-skipping pushdown (the Iceberg model): comparison filters
        on a column tighten a per-column closed interval used to PRUNE
        data files in :meth:`partitions` — and every filter is returned
        as residual, so Spark still applies it row-level (pruning is an
        IO optimization layered UNDER an unchanged result, the same
        contract the scan_table gate pins)."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            iv = self._intervals.setdefault(col, [None, None])
            v = getattr(f, "value", None)
            if isinstance(f, EqualTo):
                iv[0] = v if iv[0] is None else max(iv[0], v)
                iv[1] = v if iv[1] is None else min(iv[1], v)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                # strict > prunes with the closed bound (conservative)
                iv[0] = v if iv[0] is None else max(iv[0], v)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                iv[1] = v if iv[1] is None else min(iv[1], v)
        return filters  # ALL residual: Spark re-applies row-level

    def _survives(self, dfile: dict, part: dict, fields: list) -> bool:
        """Zone-map + identity-partition-value prune for one file."""
        if not self._intervals:
            return True
        from iceberg_meta_spark.sources.iceberg_native import (
            _kv_map,
            decode_bound,
        )

        type_by_name = dict(fields)
        fid_by_name = self._fid_by_name  # set by partitions() from the schema
        for col, (lo, hi) in self._intervals.items():
            v = part.get(col)
            if v is not None:
                if lo is not None and v < lo:
                    return False
                if hi is not None and v > hi:
                    return False
                continue
            fid = fid_by_name.get(col)
            typ = type_by_name.get(col, "")
            if fid is None or typ not in (
                "int", "long", "float", "double", "string", "boolean",
            ):
                continue
            lb = _kv_map(dfile.get("lower_bounds"))
            ub = _kv_map(dfile.get("upper_bounds"))
            fmin = decode_bound(bytes(lb[fid]) if fid in lb else None, typ)
            fmax = decode_bound(bytes(ub[fid]) if fid in ub else None, typ)
            if fmin is None or fmax is None:
                continue  # no bounds: conservatively keep
            if lo is not None and fmax < lo:
                return False
            if hi is not None and fmin > hi:
                return False
        return True

    def partitions(self):
        md = _load_md(self._table, _current_version(self._table))
        if md.get("current-snapshot-id") is None and self._snapshot_id is None:
            return [_BatchFilePartition("", {}, [], [], 0)]
        # `is not None`, not truthiness: snapshot-id 0 is legal (random
        # 64-bit ids) and must not silently fall back to current
        snap_id = (
            self._snapshot_id
            if self._snapshot_id is not None
            else int(md["current-snapshot-id"])
        )
        snap = next(
            s for s in md["snapshots"] if int(s["snapshot-id"]) == snap_id
        )
        schema = next(
            s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
        )
        fields = [(f["name"], f["type"]) for f in schema["fields"]]
        id_to_name = {f["id"]: f["name"] for f in schema["fields"]}
        self._fid_by_name = {f["name"]: int(f["id"]) for f in schema["fields"]}
        spec = next(
            s for s in md["partition-specs"]
            if s["spec-id"] == md["default-spec-id"]
        )
        part_cols = {
            f["name"]: id_to_name.get(int(f["source-id"]))
            for f in spec.get("fields", [])
            if f.get("transform") == "identity"
        }
        data, pos_dels, eq_dels, dvs = [], [], [], []
        for m in _avro_records(snap["manifest-list"]):
            mseq = m.get("sequence_number")
            for e in _avro_records(m["manifest_path"]):
                if int(e.get("status", 0)) == 2:
                    continue
                seq = e.get("sequence_number")
                seq = int(seq) if seq is not None else int(mseq or 0)
                dfile = e["data_file"]
                if int(m.get("content", 0)) == 0:
                    part = {
                        src: (dfile.get("partition") or {}).get(pname)
                        for pname, src in part_cols.items()
                        if src is not None
                    }
                    if self._survives(dfile, part, fields):
                        data.append((dfile, part, seq))
                elif dfile.get("equality_ids"):
                    cols = [id_to_name[int(i)] for i in dfile["equality_ids"]]
                    eq_dels.append((_local(dfile["file_path"]), seq, cols))
                elif str(dfile.get("file_format", "")).upper() == "PUFFIN":
                    # v3 deletion vector: (referenced file, puffin, off, len)
                    dvs.append((
                        _local(dfile["referenced_data_file"]),
                        _local(dfile["file_path"]), seq,
                        int(dfile["content_offset"]),
                        int(dfile["content_size_in_bytes"]),
                    ))
                else:
                    pos_dels.append((_local(dfile["file_path"]), seq))
        parts = [
            _BatchFilePartition(
                _local(d["file_path"]), part, fields,
                # spec: a position delete applies when data_seq <= del_seq
                [pd for pd in pos_dels if seq <= pd[1]], seq,
                # spec: an equality delete applies STRICTLY later deletes
                [ed for ed in eq_dels if seq < ed[1]],
                # a DV names its file; position-delete seq rule applies
                [(p, off, ln) for ref, p, dseq, off, ln in dvs
                 if ref == _local(d["file_path"]) and seq <= dseq],
            )
            for d, part, seq in data
        ]
        return parts or [_BatchFilePartition("", {}, [], [], 0)]

    def read(self, partition: _BatchFilePartition):
        if not partition.file_path:
            return iter(())
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.file_path)
        n = tbl.num_rows
        if partition.pos_delete_files or partition.dvs:
            dead: set[int] = set()
            me = partition.file_path
            for dpath, _seq in partition.pos_delete_files:
                dt = pq.read_table(dpath, columns=["file_path", "pos"])
                norm = pc.replace_substring_regex(
                    dt.column("file_path").cast(pa.string()),
                    pattern="^file:/*", replacement="/",
                )
                mask = pc.equal(norm, me)
                dead.update(
                    int(p) for p in dt.column("pos").filter(mask).to_pylist()
                )
            if partition.dvs:
                from iceberg_meta_spark.sources.iceberg_dv import (
                    read_dv_positions,
                )

                for puffin, off, ln in partition.dvs:
                    dead.update(
                        int(p) for p in read_dv_positions(puffin, off, ln)
                    )
            if dead:
                keep = [i for i in range(n) if i not in dead]
                tbl = tbl.take(pa.array(keep, type=pa.int64()))
                n = tbl.num_rows
        arrays, names = [], []
        for name, typ in partition.fields:
            names.append(name)
            at = getattr(pa, _ARROW_T.get(typ, "string"))()
            if name in tbl.column_names:
                arrays.append(tbl.column(name).cast(at).combine_chunks())
            elif name in partition.part:
                arrays.append(pa.array([partition.part[name]] * n, type=at))
            else:
                arrays.append(pa.nulls(n, type=at))
        out = pa.table(arrays, names=names)
        # equality deletes (data_seq < delete_seq, spec-strict): kill rows
        # whose key tuple appears in a later delete file — tuple equality
        # over python scalars IS null-safe (None == None), matching the
        # scan path's eqNullSafe. Delete files are read executor-side per
        # partition; sized for moderate delete sets (mass deletes belong
        # to scan_table's distributed anti-join)
        def _nankey(t):
            # Spark's eqNullSafe treats NaN = NaN as true; Python tuple
            # equality would not, so NaN maps to a sentinel
            return tuple(
                "__nan__" if isinstance(v, float) and v != v else v
                for v in t
            )

        # group delete files by key-column set: the data-side key tuples
        # materialize ONCE per distinct column set (not once per delete
        # file) and the table rebuilds at most once per group
        by_cols: dict[tuple, list] = {}
        for dpath, _seq, cols in partition.eq_delete_files:
            by_cols.setdefault(tuple(cols), []).append(dpath)
        for cols, dpaths in sorted(by_cols.items()):
            dead_keys: set = set()
            for dpath in dpaths:
                dt = pq.read_table(dpath, columns=list(cols))
                dead_keys.update(
                    _nankey(t)
                    for t in zip(*[dt.column(c).to_pylist() for c in cols])
                )
            if not dead_keys:
                continue
            keys = [_nankey(t)
                    for t in zip(*[out.column(c).to_pylist() for c in cols])]
            keep = [i for i, k in enumerate(keys) if k not in dead_keys]
            if len(keep) != out.num_rows:
                out = out.take(pa.array(keep, type=pa.int64()))
        return iter(out.to_batches(max_chunksize=1 << 16))


class IcebergNativeDataSource(DataSource):
    """``spark.dataSource.register(IcebergNativeDataSource)`` then
    ``spark.readStream.format("iceberg_native").option("path", dir)`` for
    incremental streaming, or ``spark.read.format("iceberg_native")`` for
    a batch snapshot read (position AND equality deletes applied per
    file; ``snapshot_id`` option time-travels)."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_native"

    def schema(self) -> str:
        table = _local(str(self.options["path"]).rstrip("/"))
        md = _load_md(table, _current_version(table))
        schema = next(
            s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
        )
        return ", ".join(
            f"`{f['name']}` {_ICEBERG_TO_SPARK.get(f['type'], 'string')}"
            for f in schema["fields"]
        )

    def streamReader(self, schema) -> IcebergNativeStreamReader:
        return IcebergNativeStreamReader(dict(self.options))

    def reader(self, schema) -> IcebergNativeBatchReader:
        return IcebergNativeBatchReader(dict(self.options))


def register_native_source(spark) -> None:
    """Idempotent registration of the 'iceberg_native' streaming format."""
    spark.dataSource.register(IcebergNativeDataSource)
