"""TTL-bounded exact dedup at ingest, on Spark 4's transformWithState API.

The third exact-dedup deployment shape, complementing the existing two:
watermark dedup (``streaming/dedup.py``) needs an event-time column and
drops state at the watermark; the LSH signature store (``streaming/lsh.py``)
persists forever for near-dup. This one answers "have I ingested these
exact bytes in the last N days?" with NO event-time requirement: grouping
key = content fingerprint, per-key state is one ValueState carrying the
first-seen wall time, and the state-store TTL (a transformWithState
feature applyInPandasWithState does not offer) evicts idle fingerprints —
bounded memory over an unbounded crawl without a watermark column.

Environment gate: transformWithState's Python worker speaks protobuf to
the state server; containers without ``google.protobuf`` can import this
module and unit-test the processor logic directly (it is plain pandas),
but the live query needs protobuf installed — ``has_tws_runtime`` probes,
and the live test skips with the reason named, the same treatment as the
Iceberg runtime jar.

Emission contract: a fingerprint's FIRST row per TTL window is emitted
with ``is_first=true``; subsequent arrivals while the state lives emit
``is_first=false`` and a running duplicate count (downstream either
filters to firsts or audits dup pressure). After TTL expiry the next
arrival counts as first again — exactly the semantics of a crawl-window
dedup ("re-crawl after N days is fresh content").
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUT_SCHEMA = (
    "fingerprint string, doc_id long, is_first boolean, prior_dups long"
)


class TTLDedupProcessor(StatefulProcessor):
    """One ValueState (first_seen_ms, dup_count) per fingerprint, TTL-evicted."""

    def __init__(self, ttl_ms: int):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", "first_seen_ms long, dups long", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        batch = [pdf for pdf in rows if len(pdf)]
        if not batch:
            return
        pdf = pd.concat(batch).sort_values("doc_id")
        if self._seen.exists():
            first_seen_ms, dups = self._seen.get()
            firsts = 0
        else:
            first_seen_ms, dups = None, 0
            firsts = 1
        n = len(pdf)
        flags = [False] * n
        priors = []
        d = dups
        for i in range(n):
            if firsts and i == 0:
                flags[i] = True
                priors.append(0)
            else:
                d += 1
                priors.append(d)
        now_ms = timerValues.getCurrentProcessingTimeInMs()
        # first_seen is preserved across updates; updating on duplicates
        # refreshes the TTL, making it a sliding INACTIVITY window
        self._seen.update((first_seen_ms if first_seen_ms is not None else now_ms, d))
        yield pd.DataFrame(
            {
                "fingerprint": [key[0]] * n,
                "doc_id": pdf["doc_id"].to_list(),
                "is_first": flags,
                "prior_dups": priors,
            }
        )

    def close(self) -> None:
        pass


def ttl_dedup_stream(docs_stream: DataFrame, ttl_ms: int = 7 * 24 * 3600 * 1000) -> DataFrame:
    """(doc_id, text) stream -> per-row first/duplicate verdicts keyed by
    content fingerprint, with fingerprint state auto-evicted after
    ``ttl_ms`` of inactivity."""
    keyed = docs_stream.select(
        F.md5(F.col("text")).alias("fingerprint"), F.col("doc_id")
    ).groupBy("fingerprint")
    return keyed.transformWithStateInPandas(
        TTLDedupProcessor(ttl_ms),
        outputStructType=OUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


def has_tws_runtime() -> bool:
    """True when transformWithState's protobuf dependency is importable."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
