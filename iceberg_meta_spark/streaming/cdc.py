"""Streaming CDC latest-state: the live twin of the batch ``cdc_latest_state``
query (queries/extensions.py).

A change stream (at-least-once, out-of-order within the watermark) keyed by
entity id is continuously compacted to one row per key — the Spark-native
upsert materialization. Two composable pieces:

- ``latest_state_stream``  — streaming ``groupBy(key).max(struct(ts, id,
  payload))`` in update mode: the engine keeps one struct per key in the
  aggregation state (bounded by key cardinality, the same bound any upsert
  table pays), emits a key's row only when its latest value changes, and
  late rows older than a key's current maximum fold in correctly because
  struct-max is order-insensitive.
- ``upsert_sink``          — a ``foreachBatch`` writer applying each
  micro-batch's per-key maxima to a keyed parquet state directory: the
  merge-into-the-sink half of a CDC pipeline for sinks without native
  upsert.

Scale posture: the shuffle carries one struct per (task, key) thanks to
partial aggregation; state is one struct per key. At 10⁹ keys the state
backend (RocksDB in production) holds key→struct, never the change history.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_state_stream(
    changes: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    payload_cols: tuple[str, ...] = ("event_id", "event_type", "value_cents"),
) -> DataFrame:
    """One row per key holding the latest change (update mode).

    Struct-max keyed by (ts, payload...) — order-insensitive, so the
    at-least-once / out-of-order delivery of the same changes converges to
    the same state a batch pass computes.
    """
    latest = changes.groupBy(key_col).agg(
        F.max(F.struct(ts_col, *payload_cols)).alias("s")
    )
    return latest.select(
        key_col,
        F.col(f"s.{ts_col}").alias(f"last_{ts_col}"),
        *[F.col(f"s.{c}").alias(f"last_{c}") for c in payload_cols],
    )


def upsert_sink(state_dir: str, key_col: str = "user_id"):
    """``foreachBatch`` function merging each micro-batch into a keyed
    parquet state directory (read old state, union, keep per-key max again,
    overwrite) — the no-native-upsert sink merge."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            old = spark.read.parquet(state_dir)
        except AnalysisException as exc:
            # Only the first-batch missing-directory case may fall through to
            # "no prior state"; any other read failure (corrupt files,
            # permissions, transient IO) must surface — swallowing it would
            # silently overwrite the accumulated state with one micro-batch.
            msg = str(exc)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            merged = batch
        else:
            merged = old.unionByName(batch)
        cols = [c for c in merged.columns if c != key_col]
        latest = merged.groupBy(key_col).agg(F.max(F.struct(*cols)).alias("s"))
        out = latest.select(key_col, *[F.col(f"s.{c}").alias(c) for c in cols])
        out.write.mode("overwrite").parquet(state_dir + "__tmp")
        spark.read.parquet(state_dir + "__tmp").write.mode("overwrite").parquet(state_dir)

    return apply
