"""Custom PySpark DataSource: a partitioned snapshot-log reader.

The third source adapter beside parquet fixtures and the jar-gated Iceberg
reader, built on Spark 4's Python DataSource API — the extension point a
deployment uses to ingest metadata that lives OUTSIDE any table format
(a REST catalog's snapshot endpoint, an audit log, a manifest cache).

``SnapshotLogDataSource`` reads newline-delimited JSON snapshot records
from a directory, one InputPartition per file, so the scan parallelizes
across executors exactly like a file-based source (each task opens only
its own file — no driver-side fan-in). Registered under the short name
``snapshot_log``:

    spark.dataSource.register(SnapshotLogDataSource)
    df = spark.read.format("snapshot_log").option("path", dir).load()

The emitted schema matches the ``meta_snapshots`` fixture's core columns,
so every snapshot kernel (recency, expiry, lineage, watch) runs on it
unchanged — the point of the pluggable-source design.

The source is also WRITABLE with table-format commit semantics
(``df.write.format("snapshot_log").mode(...).option("path", dir).save()``):
each task writes its partition to an invisible ``*.tmp`` file and returns a
commit message; only the driver-side ``commit`` publishes them (rename to
``part-*.jsonl`` + a ``_manifest.json`` listing committed files and row
counts) — the same two-phase protocol an Iceberg snapshot commit uses, so a
failed job leaves nothing a reader can observe, and ``overwrite`` retires the
previous file set atomically within the commit.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

SNAPSHOT_LOG_SCHEMA = StructType(
    [
        StructField("snapshot_id", LongType()),
        StructField("parent_id", LongType()),
        StructField("committed_us", LongType()),
        StructField("operation", StringType()),
        StructField("added_records", LongType()),
        StructField("deleted_records", LongType()),
        StructField("total_data_files", LongType()),
        StructField("total_files_size", LongType()),
    ]
)

_COLS = [f.name for f in SNAPSHOT_LOG_SCHEMA.fields]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _SnapshotLogReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("snapshot_log source requires option 'path'")
        # (op, value) bounds on snapshot_id accepted by pushFilters
        self._id_bounds: list[tuple[str, int]] = []

    def pushFilters(self, filters):
        """Accept snapshot_id comparisons; everything else stays in Spark.

        The custom-source half of predicate pushdown: the reader applies
        accepted bounds while scanning, so filtered rows never cross the
        Python->JVM boundary — the same contract PushedFilters gives a
        parquet scan. Per the API, unsupported filters are returned (by
        reference) for Spark to evaluate post-scan.
        """
        from pyspark.sql.datasource import EqualTo, GreaterThan, LessThan

        for f in filters:
            col = f.attribute[0] if f.attribute else None
            if col == "snapshot_id" and isinstance(f, (EqualTo, GreaterThan, LessThan)):
                op = {"EqualTo": "==", "GreaterThan": ">", "LessThan": "<"}[type(f).__name__]
                self._id_bounds.append((op, f.value))
            else:
                yield f  # not pushable: Spark evaluates it after the scan

    def _accept(self, snapshot_id) -> bool:
        if snapshot_id is None:
            return not self._id_bounds
        for op, v in self._id_bounds:
            if op == "==" and snapshot_id != v:
                return False
            if op == ">" and not snapshot_id > v:
                return False
            if op == "<" and not snapshot_id < v:
                return False
        return True

    def partitions(self):
        files = sorted(
            f
            for f in os.listdir(self.dir)
            if f.endswith((".json", ".jsonl")) and not f.startswith(("_", "."))
        )  # _manifest.json and dotfiles are metadata, not log data (Hadoop convention)
        # one partition per log file: tasks read disjoint files in parallel
        return [_FilePartition(os.path.join(self.dir, f)) for f in files]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if not self._accept(rec.get("snapshot_id")):
                    continue
                yield tuple(rec.get(c) for c in _COLS)


class _LogCommit(WriterCommitMessage):
    def __init__(self, tmp_name: str, rows: int):
        self.tmp_name = tmp_name
        self.rows = rows


class _SnapshotLogWriter(DataSourceWriter):
    """Two-phase NDJSON writer: tasks stage ``.tmp`` files, the driver-side
    commit publishes them. Mirrors a table-format commit — no torn output is
    ever visible to ``_SnapshotLogReader`` (which only lists ``*.json[l]``),
    failed/speculative attempts are swept during commit, and abort removes
    every staged file."""

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("snapshot_log sink requires option 'path'")
        self.overwrite = overwrite
        os.makedirs(self.dir, exist_ok=True)

    def write(self, iterator) -> _LogCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp_name = f"part-{pid:05d}-{uuid.uuid4().hex}.tmp"
        rows = 0
        with open(os.path.join(self.dir, tmp_name), "w", encoding="utf-8") as fh:
            for row in iterator:
                rec = {c: row[c] for c in _COLS}
                fh.write(json.dumps(rec, sort_keys=True) + "\n")
                rows += 1
        return _LogCommit(tmp_name, rows)

    def commit(self, messages) -> None:
        committed = [m for m in messages if m is not None]
        staged = {m.tmp_name for m in committed}
        if self.overwrite:  # retire the previous file set inside the commit
            for f in os.listdir(self.dir):
                if f.endswith((".json", ".jsonl")) or f == "_manifest.json":
                    os.remove(os.path.join(self.dir, f))
        manifest = []
        for m in committed:
            final = m.tmp_name[: -len(".tmp")] + ".jsonl"
            os.rename(os.path.join(self.dir, m.tmp_name), os.path.join(self.dir, final))
            manifest.append({"file": final, "rows": m.rows})
        # sweep stray tmp files from failed or speculative attempts
        for f in os.listdir(self.dir):
            if f.endswith(".tmp") and f not in staged:
                os.remove(os.path.join(self.dir, f))
        with open(os.path.join(self.dir, "_manifest.json"), "w", encoding="utf-8") as fh:
            json.dump(
                {"files": sorted(manifest, key=lambda e: e["file"]),
                 "total_rows": sum(e["rows"] for e in manifest)},
                fh,
            )

    def abort(self, messages) -> None:
        for f in os.listdir(self.dir):
            if f.endswith(".tmp"):
                os.remove(os.path.join(self.dir, f))


class _SnapshotLogStreamWriter(DataSourceStreamWriter):
    """Streaming sink half: per-epoch two-phase commit onto the same
    append-only NDJSON log the batch writer produces (so the stream READER
    tails what the stream WRITER emits — the source closes its own loop).

    Tasks stage ``.tmp`` files exactly like the batch writer; the
    driver-side ``commit(messages, batchId)`` renames them to
    ``stream-e{batchId}-*.jsonl`` and appends to ``_manifest.json``, which
    also records the committed epoch ids. A REPLAYED epoch (restart after
    a commit the engine didn't record) is detected there and its staged
    files are discarded instead of re-published — file-level
    exactly-once under at-least-once epoch delivery. ``abort`` removes
    only this attempt's staged files.
    """

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("snapshot_log stream sink requires option 'path'")
        os.makedirs(self.dir, exist_ok=True)

    def write(self, iterator) -> _LogCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp_name = f"stream-part-{pid:05d}-{uuid.uuid4().hex}.tmp"
        rows = 0
        with open(os.path.join(self.dir, tmp_name), "w", encoding="utf-8") as fh:
            for row in iterator:
                rec = {c: row[c] for c in _COLS}
                fh.write(json.dumps(rec, sort_keys=True) + "\n")
                rows += 1
        return _LogCommit(tmp_name, rows)

    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "_manifest.json")

    def _load_manifest(self) -> dict:
        try:
            with open(self._manifest_path(), encoding="utf-8") as fh:
                m = json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            m = {}
        m.setdefault("files", [])
        m.setdefault("epochs", [])
        return m

    def commit(self, messages, batchId: int) -> None:
        committed = [m for m in messages if m is not None]
        manifest = self._load_manifest()
        if batchId in manifest["epochs"]:
            # replayed epoch: already published — drop this attempt's staging
            for m in committed:
                tmp = os.path.join(self.dir, m.tmp_name)
                if os.path.exists(tmp):
                    os.remove(tmp)
            return
        for i, m in enumerate(committed):
            final = f"stream-e{batchId:08d}-{i:05d}.jsonl"
            os.rename(
                os.path.join(self.dir, m.tmp_name), os.path.join(self.dir, final)
            )
            manifest["files"].append({"file": final, "rows": m.rows})
        manifest["epochs"].append(batchId)
        manifest["files"].sort(key=lambda e: e["file"])
        manifest["total_rows"] = sum(e["rows"] for e in manifest["files"])
        with open(self._manifest_path(), "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            tmp = os.path.join(self.dir, m.tmp_name)
            if os.path.exists(tmp):
                os.remove(tmp)


class _SnapshotLogStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source: the directory is an append-only log
    (files are only ever added, each file only ever grows — exactly what the
    writer's two-phase commit produces), so the stream offset is
    ``{filename: lines_consumed}``. Each micro-batch reads every line past
    its file's consumed count; ``readBetweenOffsets`` replays a batch
    deterministically from the same counters during recovery.

    A batch-mode ``mode('overwrite')`` breaks the append-only premise (it
    retires committed part files); readers tolerate files named in the
    offset that have vanished — they are treated as fully consumed — so a
    stream survives it, but rows are only delivered exactly-once while the
    directory stays append-only.

    The simple (driver-side) reader variant is the right fit here: snapshot
    logs are metadata-sized. A data-scale stream would implement the
    partition-planning ``DataSourceStreamReader`` instead — same offset
    model, one partition per (file, line-range)."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("snapshot_log stream requires option 'path'")

    def initialOffset(self) -> dict:
        return {"files": {}}

    def _files(self):
        return sorted(
            f
            for f in os.listdir(self.dir)
            if f.endswith((".json", ".jsonl")) and not f.startswith(("_", "."))
        )

    def _read_rows(self, consumed: dict, limits: dict | None):
        """Rows past ``consumed`` per file (up to ``limits`` if given),
        plus the new per-file line counters."""
        end = dict(consumed)
        rows = []
        names = self._files() if limits is None else sorted(limits)
        for name in names:
            start_line = consumed.get(name, 0)
            stop_line = None if limits is None else limits.get(name, 0)
            n = start_line
            path = os.path.join(self.dir, name)
            if not os.path.exists(path):
                # A file recorded in the offset no longer exists: a
                # batch-mode ``mode('overwrite')`` on the same directory
                # retires committed part files. Its lines were consumed by
                # the batches that recorded them — treat the file as fully
                # consumed instead of crashing recovery replay.
                end[name] = max(start_line, stop_line or start_line)
                continue
            with open(path, encoding="utf-8") as fh:
                for i, line in enumerate(fh):
                    if i < start_line or (stop_line is not None and i >= stop_line):
                        continue
                    line = line.strip()
                    n = i + 1
                    if not line:
                        continue
                    rec = json.loads(line)
                    rows.append(tuple(rec.get(c) for c in _COLS))
            end[name] = max(n, stop_line or 0) if stop_line is not None else n
        return rows, end

    def read(self, start: dict):
        rows, end = self._read_rows(start.get("files", {}), None)
        return iter(rows), {"files": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self._read_rows(start.get("files", {}), end.get("files", {}))
        return iter(rows)


class SnapshotLogDataSource(DataSource):
    """``spark.read.format("snapshot_log").option("path", dir)`` /
    ``df.write.format("snapshot_log").option("path", dir).save()`` /
    ``spark.readStream.format("snapshot_log").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_log"

    def schema(self) -> StructType:
        return SNAPSHOT_LOG_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SnapshotLogReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _SnapshotLogWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _SnapshotLogStreamReader(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        return _SnapshotLogStreamWriter(self.options, overwrite)
