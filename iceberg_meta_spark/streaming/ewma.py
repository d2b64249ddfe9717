"""Streaming per-key EWMA with spike alarms — O(1) state per key.

Batch twin: ``user_value_ewma`` (queries/extensions.py) folds each user's
full value sequence with exact integer arithmetic — it needs the whole
sequence per key (the collect+sort memory cliff). This operator is the
deployment path: the SAME integer recurrence (``ewma' = (v + 7*ewma) DIV
8``, spike when ``v > 2*ewma`` before the update) applied per micro-batch
with two longs of state per key. Within a batch, rows are folded in
(ts_us, event_id) order, so on an in-order stream the state trajectory is
identical to the batch fold over the same prefix.

Caveat the operator owns: EWMA is sequence-dependent, so exactly matching
the batch fold requires in-order delivery per key (event-time ordered
sources, or an upstream watermark sort). Under out-of-order delivery the
recurrence still converges to the same neighborhood but individual spike
flags can differ — the standard trade of streaming recursive statistics.

State: (ewma long, spikes long, n long) per key, engine-checkpointed;
idle keys expire on a processing-time timeout.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

EWMA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("final_ewma_cents", LongType()),
        StructField("n_spikes", LongType()),
        StructField("batch_spikes", LongType()),
    ]
)

EWMA_STATE = StructType(
    [
        StructField("ewma", LongType()),
        StructField("spikes", LongType()),
        StructField("n", LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    ewma, spikes, n = state.get if state.exists else (None, 0, 0)
    batch_spikes = 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for v in pdf["cents"].astype("int64"):
            v = int(v)
            if ewma is None:
                ewma = v  # seed: first value initializes the mean
            else:
                if v > 2 * ewma:
                    spikes += 1
                    batch_spikes += 1
                ewma = (v + ewma * 7) // 8
            n += 1
    if ewma is None:
        return
    state.update((ewma, spikes, n))
    state.setTimeoutDuration(60 * 60 * 1000)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "final_ewma_cents": [ewma],
            "n_spikes": [spikes],
            "batch_spikes": [batch_spikes],
        }
    )


def user_value_ewma_stream(events_stream: DataFrame) -> DataFrame:
    """Per-user running EWMA + spike counts over a stream of
    (user_id, ts_us, event_id, cents). Update-mode output."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=EWMA_SCHEMA,
        stateStructType=EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
