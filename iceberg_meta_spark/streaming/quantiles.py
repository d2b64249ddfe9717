"""Streaming per-window quantiles from a bounded power-of-2 histogram.

Batch twin: ``events_value_quantiles`` (queries/extensions.py) computes
exact dyadic per-window percentiles — a per-group sort. A stream can't
sort an unbounded window, so this operator keeps the classic fixed-size
histogram sketch: 64 power-of-2 bins per window (bin = bit_length of the
integer cents value), each an int64 counter. Quantile answers are bin
upper bounds — the guarantee is positional (the reported value is >= the
true quantile, < 2× the bin's lower edge), the trade every
histogram/DDSketch-family summary makes for O(1) state.

State: one 64-long array + a count per window key, engine-checkpointed;
idle windows expire on a processing-time timeout, so total state is
O(active_windows × 64) no matter how many events flow through.

Determinism: counts are order-insensitive (pure increments), so unlike
space-saving (streaming/heavy.py) the histogram — and every quantile read
from it — is replay- and partition-order-independent.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

HOUR_US = 3_600_000_000
N_BINS = 64

Q_SCHEMA = StructType(
    [
        StructField("window_start_us", LongType()),
        StructField("n_events", LongType()),
        StructField("p25_ub", LongType()),
        StructField("p50_ub", LongType()),
        StructField("p75_ub", LongType()),
    ]
)

Q_STATE = StructType(
    [
        StructField("bins", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def _bin_of(cents: int) -> int:
    # bin b holds values in [2^(b-1), 2^b); bin 0 holds <= 0
    return min(max(int(cents), 0).bit_length(), N_BINS - 1)


def _quantile_ub(bins: list[int], n: int, q: float) -> int:
    """Upper bound of the bin where the q-quantile position falls."""
    target = q * (n - 1) + 1  # 1-based position, continuous convention
    cum = 0
    for b, c in enumerate(bins):
        cum += c
        if cum >= target:
            return (1 << b) - 1 if b < N_BINS - 1 else (1 << 62)
    return (1 << 62)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    bins, n = (list(state.get[0]), state.get[1]) if state.exists else ([0] * N_BINS, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        for cents, c in pdf.groupby("cents").size().items():
            bins[_bin_of(int(cents))] += int(c)
            n += int(c)
    state.update((bins, n))
    state.setTimeoutDuration(60 * 60 * 1000)
    if n == 0:
        return
    yield pd.DataFrame(
        {
            "window_start_us": [key[0]],
            "n_events": [n],
            "p25_ub": [_quantile_ub(bins, n, 0.25)],
            "p50_ub": [_quantile_ub(bins, n, 0.5)],
            "p75_ub": [_quantile_ub(bins, n, 0.75)],
        }
    )


def window_value_quantiles(
    events_stream: DataFrame, width_us: int = HOUR_US
) -> DataFrame:
    """Per tumbling event-time window, histogram-sketched p25/p50/p75 upper
    bounds over (ts_us, cents). Update-mode output — each micro-batch
    re-emits the refreshed row per touched window."""
    keyed = events_stream.select(
        ((F.col("ts_us") / width_us).cast("long") * width_us).alias("window_start_us"),
        "cents",
    )
    return keyed.groupBy("window_start_us").applyInPandasWithState(
        _update,
        outputStructType=Q_SCHEMA,
        stateStructType=Q_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
