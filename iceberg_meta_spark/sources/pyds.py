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
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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

    def partitions(self):
        files = sorted(
            f for f in os.listdir(self.dir) if f.endswith((".json", ".jsonl"))
        )
        # one partition per log file: tasks read disjoint files in parallel
        return [_FilePartition(os.path.join(self.dir, f)) for f in files]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(c) for c in _COLS)


class SnapshotLogDataSource(DataSource):
    """``spark.read.format("snapshot_log").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_log"

    def schema(self) -> StructType:
        return SNAPSHOT_LOG_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SnapshotLogReader(self.options)
