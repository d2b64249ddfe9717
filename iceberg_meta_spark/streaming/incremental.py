"""Continuously-maintained partition stats: the streaming half of
``operators/incremental.py``.

A file-arrival stream (Structured Streaming file source, or any stream of
(part_key, file_path, record_count, file_size_in_bytes) rows) keeps a keyed
parquet stats table current via ``foreachBatch``: each micro-batch's
per-partition deltas merge into the stored per-partition totals — the
materialized-view refresh a 100 TB deployment runs instead of re-aggregating
the table on every query.

Only SUM/COUNT stats, the self-maintainable class (see the batch kernel's
docstring); each micro-batch's work is O(batch + touched groups), never
O(table). The merge-into-parquet idiom (read → union partials → re-aggregate
→ atomic-ish overwrite) matches ``streaming/cdc.upsert_sink``; a production
sink with native upsert (Iceberg MERGE) would replace the overwrite."""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stats_merge_sink(
    state_dir: str,
    group_col: str = "part_key",
    sum_cols: tuple[str, ...] = ("record_count", "file_size_in_bytes"),
):
    """``foreachBatch`` function folding each micro-batch of file rows into
    the per-group running stats at ``state_dir``.

    Commutative + associative merges make the result independent of batch
    boundaries, and the stored high-water ``batch_id`` makes REPLAYS
    idempotent: after a failure between sink commit and checkpoint commit,
    Structured Streaming re-delivers the same (batch_id, rows) — the guard
    sees ``batch_id <= last_batch_id`` and skips, upgrading the sink from
    at-least-once to effectively exactly-once (the standard foreachBatch
    idempotence recipe; the batch id travels as a column of the state
    table, max-aggregated on read, so no side-channel file is needed)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        partial = batch.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("n_files"),
            *[F.sum(c).alias(c) for c in sum_cols],
        ).withColumn("batch_id", F.lit(batch_id).cast("long"))
        try:
            old = spark.read.parquet(state_dir)
        except AnalysisException as exc:
            msg = str(exc)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            merged = partial
        else:
            # max over a zero-row state table (an empty first micro-batch
            # still writes the state dir) is NULL — only a non-NULL high
            # water mark can prove this batch was already folded in.
            old_max = old.agg(F.max("batch_id")).collect()[0][0]
            if old_max is not None and old_max >= batch_id:
                return  # replayed micro-batch: already folded in
            merged = (
                old.unionByName(partial)
                .groupBy(group_col)
                .agg(
                    F.sum("n_files").alias("n_files"),
                    *[F.sum(c).alias(c) for c in sum_cols],
                    F.max("batch_id").alias("batch_id"),
                )
            )
        merged.write.mode("overwrite").parquet(state_dir + "__tmp")
        spark.read.parquet(state_dir + "__tmp").write.mode("overwrite").parquet(state_dir)

    return apply


def maintain_stats(
    files_stream: DataFrame,
    state_dir: str,
    group_col: str = "part_key",
    sum_cols: tuple[str, ...] = ("record_count", "file_size_in_bytes"),
    available_now: bool = False,
):
    """Wire a file-arrival stream into :func:`stats_merge_sink`; returns the
    started StreamingQuery (caller owns stop()).

    ``available_now=True`` runs in backfill mode (``Trigger.AvailableNow``):
    the query drains exactly the backlog present at start — in rate-limited
    micro-batches, each merged idempotently by batch_id — then terminates on
    its own. The catch-up path after an outage or for a first historical
    load, with the same sink code the continuous query runs.
    """
    writer = files_stream.writeStream.outputMode("update").foreachBatch(
        stats_merge_sink(state_dir, group_col, sum_cols)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
