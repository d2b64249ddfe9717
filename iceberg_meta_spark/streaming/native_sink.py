"""Structured Streaming SINK for native Iceberg tables: exactly-once
micro-batch appends via ``foreachBatch`` -> ``append_dataframe``.

This closes the fourth quadrant on the real table format (batch/stream ×
read/write): the native path already had batch read (``scan_table`` /
``pyds``), batch write (``append_dataframe`` and friends), and a streaming
SOURCE (``streaming/native_source.py``); this module adds the streaming
WRITE — the shape Iceberg's own Spark integration uses for
``writeStream.format("iceberg")`` (a per-epoch append commit, with the
epoch id recorded in the snapshot summary so a replayed epoch publishes
nothing).

Exactly-once contract (the same two-phase idempotence ``sources/pyds.py``'s
NDJSON streamWriter pins):

1. Every committed epoch stamps the snapshot summary with
   ``streaming.sink-id`` (stable identity of this sink, derived from the
   checkpoint location unless given) and ``streaming.epoch-id`` (the
   foreachBatch batch id, monotonic per checkpoint).
2. Before writing, the batch fn scans the table's snapshot summaries for
   that (sink-id, epoch-id) pair; a hit means this epoch ALREADY committed
   (the driver crashed after the table commit but before the checkpoint
   advanced) and the replay publishes NOTHING — the parquet write never
   even starts.
3. A crash BEFORE the table commit leaves at most orphaned data files
   (never a snapshot); the replay re-writes and commits them fresh.
   Orphans are swept by ``remove_orphans``, exactly like a failed batch
   write.
4. The markers also survive snapshot EXPIRY: every commit additionally
   persists ``streaming.sink.<sink-id>.max-epoch`` in the TABLE
   properties (same atomic commit). Summaries vanish when
   ``expire_snapshots`` reclaims old snapshots, but properties live on
   the metadata root — so a checkpoint-lagged epoch replayed after
   expiry still skips (epoch ids are monotonic per checkpoint, making
   the high-water mark a complete replay filter for this sink).

Concurrency: the underlying ``commit_append`` runs the optimistic commit
retry loop, so a streaming sink and a concurrent batch writer (or a second
sink with a different sink-id) serialize cleanly on the same table.

At 100 TB the per-epoch work is the batch INSERT path's: the data write is
a distributed parquet job, per-file stats ride one distributed pass, and
the commit is O(manifest) driver work. The summary scan for idempotence is
O(snapshots) on ALREADY-LOADED metadata JSON — planning-index scale.

Scope: append-mode sinks (the streaming-source counterpart serves appends
only, too). Update/complete output modes need MERGE-per-epoch — compose
``merge_into`` in your own foreachBatch when keys exist.

Reference parity: the reference's streaming story is the read-side watch
loop (cli.py:980-1023); a write-side sink is an extension the table format
makes natural (Iceberg docs § Spark Structured Streaming, commit-per-epoch
with idempotent replay).
"""

from __future__ import annotations

import hashlib
import json
import os

from iceberg_meta_spark.sources.iceberg_write import (
    _latest_version,
    _local_path,
    append_dataframe,
)

_SINK_KEY = "streaming.sink-id"
_EPOCH_KEY = "streaming.epoch-id"


def _committed_epochs(table_dir: str, sink_id: str) -> tuple[set[int], int]:
    """(epoch ids from retained snapshot summaries, high-water epoch from
    table properties) for this sink. Reads the CURRENT metadata JSON only
    — O(snapshots) driver work. The property survives expire_snapshots;
    the summaries are exact for retained history."""
    table_dir = _local_path(table_dir.rstrip("/"))
    meta_dir = os.path.join(table_dir, "metadata")
    version = _latest_version(meta_dir)
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as fh:
        md = json.load(fh)
    out: set[int] = set()
    for s in md.get("snapshots", []):
        summary = s.get("summary") or {}
        if summary.get(_SINK_KEY) == sink_id and _EPOCH_KEY in summary:
            out.add(int(summary[_EPOCH_KEY]))
    max_epoch = int(
        (md.get("properties") or {}).get(_max_epoch_key(sink_id), -1)
    )
    return out, max_epoch


def _max_epoch_key(sink_id: str) -> str:
    return f"streaming.sink.{sink_id}.max-epoch"


def append_epoch(
    batch_df,
    epoch_id: int,
    table_dir: str,
    sink_id: str,
    timestamp_ms: int | None = None,
    committer=None,
) -> dict:
    """The foreachBatch body: commit one micro-batch as one append
    snapshot, exactly once. Returns {"committed": bool, "epoch_id": int,
    "snapshot_id": int | None}; a replayed epoch (or an empty batch)
    commits nothing. ``committer`` routes the epoch commit through
    another catalog face (``RestCommitter`` — the epoch high-water
    property rides the SAME updateTable as a set-properties update, so
    exactly-once holds through the REST catalog too); the replay check
    reads the published metadata either way (the catalog persists it to
    the warehouse directory)."""
    committed, max_epoch = _committed_epochs(table_dir, sink_id)
    if int(epoch_id) in committed or int(epoch_id) <= max_epoch:
        # already committed — found in a retained summary, or at/under the
        # property high-water mark (covers replays after snapshot expiry:
        # epochs commit in order per checkpoint, so <= max-epoch is final)
        return {"committed": False, "epoch_id": int(epoch_id),
                "snapshot_id": None}
    if batch_df.isEmpty():
        return {"committed": False, "epoch_id": int(epoch_id),
                "snapshot_id": None}
    md = append_dataframe(
        batch_df.sparkSession,
        batch_df,
        table_dir,
        timestamp_ms=timestamp_ms,
        extra_summary={_SINK_KEY: sink_id, _EPOCH_KEY: str(int(epoch_id))},
        extra_properties={_max_epoch_key(sink_id): str(int(epoch_id))},
        committer=committer,
    )
    return {"committed": True, "epoch_id": int(epoch_id),
            "snapshot_id": int(md["current-snapshot-id"])}


def write_stream(
    df,
    table_dir: str,
    checkpoint_dir: str,
    sink_id: str | None = None,
    committer=None,
):
    """``df.writeStream`` into a native Iceberg table. Returns the
    DataStreamWriter (caller picks the trigger and calls ``.start()``)::

        q = write_stream(stream_df, table, ckpt).trigger(availableNow=True).start()

    ``sink_id`` defaults to a hash of the checkpoint location: epoch ids
    are monotonic PER CHECKPOINT, so the (sink-id, epoch-id) pair is the
    durable exactly-once key across restarts from the same checkpoint."""
    sid = sink_id or hashlib.md5(
        checkpoint_dir.rstrip("/").encode()
    ).hexdigest()[:16]

    def _batch(batch_df, epoch_id: int) -> None:
        append_epoch(batch_df, epoch_id, table_dir, sid,
                     committer=committer)

    return (
        df.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
