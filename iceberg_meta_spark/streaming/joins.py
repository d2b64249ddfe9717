"""Stream-stream interval join: the streaming twin of the batch as-of join
(operators/asof.py), for live attribution (purchases ⋈ recent clicks).

Structured Streaming's stream-stream join needs BOTH a key equality and a
time interval bound plus watermarks on both sides — the watermark + upper
bound let the engine expire join state, so state size is
O(key cardinality × max_gap window), not unbounded. Without the interval
condition the state grows forever and the job dies at scale; with it, this
is the production-safe shape for joining two infinite streams.

Semantics differ from the batch as-of join deliberately: the batch kernel
picks exactly the LATEST prior click; the stream join emits EVERY click
within ``max_gap`` before the purchase (streaming cannot know "latest"
until the watermark closes the window — consumers take min/max downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_attribution_join(
    purchases: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    watermark: str = "10 seconds",
    max_gap: str = "30 seconds",
) -> DataFrame:
    """Inner stream-stream join: each purchase with every same-key click in
    ``(purchase_time - max_gap, purchase_time]``.

    ``purchases`` needs (key, event_time, purchase_id); ``clicks`` needs
    (key, event_time, click_id). Both must be streaming DataFrames.
    """
    p = purchases.withWatermark("event_time", watermark).select(
        F.col(key).alias("p_key"),
        F.col("event_time").alias("purchase_time"),
        "purchase_id",
    )
    c = clicks.withWatermark("event_time", watermark).select(
        F.col(key).alias("c_key"),
        F.col("event_time").alias("click_time"),
        "click_id",
    )
    cond = (
        (F.col("p_key") == F.col("c_key"))
        & (F.col("click_time") <= F.col("purchase_time"))
        & (F.col("click_time") >= F.col("purchase_time") - F.expr(f"INTERVAL {max_gap}"))
    )
    return p.join(c, cond, "inner").select(
        F.col("p_key").alias(key),
        "purchase_id",
        "purchase_time",
        "click_id",
        "click_time",
    )


def streaming_unattributed_purchases(
    purchases: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    watermark: str = "10 seconds",
    max_gap: str = "30 seconds",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every purchase, with null click
    columns for purchases NO click preceded within ``max_gap`` — the
    "organic conversion" feed.

    Outer results cannot emit eagerly: a purchase might still find a match
    until the watermark passes its interval, so the engine holds it in
    state and emits the null-extended row only once the join window
    provably closed. Same bounded state as the inner variant; the cost of
    outer semantics is emission LATENCY (one watermark delay), not state.
    """
    p = purchases.withWatermark("event_time", watermark).select(
        F.col(key).alias("p_key"),
        F.col("event_time").alias("purchase_time"),
        "purchase_id",
    )
    c = clicks.withWatermark("event_time", watermark).select(
        F.col(key).alias("c_key"),
        F.col("event_time").alias("click_time"),
        "click_id",
    )
    cond = (
        (F.col("p_key") == F.col("c_key"))
        & (F.col("click_time") <= F.col("purchase_time"))
        & (F.col("click_time") >= F.col("purchase_time") - F.expr(f"INTERVAL {max_gap}"))
    )
    return p.join(c, cond, "left_outer").select(
        F.col("p_key").alias(key),
        "purchase_id",
        "purchase_time",
        "click_id",
        "click_time",
    )


def enrich_stream(events_stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream joins
    the STATIC dimension frame (inner, on ``key``).

    Distinct semantics from the stream-stream joins above: the static side
    needs no watermark and holds no join state — Spark re-evaluates it per
    micro-batch (so a dim backed by a table picks up slowly-changing
    updates), and a small dim broadcasts, keeping the stream side
    shuffle-free. The enrichment shape every event pipeline runs before
    aggregating."""
    return events_stream.join(dim, key, "inner")
