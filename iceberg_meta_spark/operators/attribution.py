"""Multi-touch attribution: fractional conversion credit across the touch
path, with integer milli-weights so every credit replays exactly.

`purchase_click_attribution` (operators/asof.py) answers "which single
click gets the credit" (last-touch). This operator answers the marketing
question behind budget allocation: EVERY click inside the lookback window
shares the purchase's value, under

- ``linear``  — equal shares;
- ``u_shape`` — 40% first touch, 40% last touch, 20% split across the
  middle (the standard position-based model; n=1 → 100%, n=2 → 50/50).

Weights are integer millis that sum to EXACTLY 1000 per conversion — the
floor remainder goes to the earliest touch of its tranche — so per-channel
rollups are exact and hash-gate deterministic (no float shares drifting by
accumulation order).

Scale shape: candidate (click, purchase) pairs come from the bucketed
range equi-join (operators/rangejoin.py) — never a per-user cross product;
position/count windows partition by conversion id (parallel per purchase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_meta_spark.operators.rangejoin import bucketed_range_join


def multi_touch_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: int,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value_micro",
) -> DataFrame:
    """Attribute each purchase's value across its lookback clicks.

    ``clicks``: (key, id_col, ts_col). ``purchases``: (key, id_col, ts_col,
    value_col) with ``value_col`` already integer-scaled (micros). Returns
    one row per (purchase, touch): position, n_touches, both models'
    milli-weights, and the exact integer credits ``(value * w) DIV 1000``.
    Purchases with no click in the window emit nothing (roll up unattributed
    spend from the anti-join if needed).
    """
    iv = purchases.select(
        key,
        F.col(id_col).alias("purchase_id"),
        F.col(value_col).alias("value_micro"),
        (F.col(ts_col) - F.lit(lookback)).alias("lo"),
        F.col(ts_col).alias("hi"),
    )
    pt = clicks.select(
        key, F.col(id_col).alias("click_id"), F.col(ts_col).alias("click_ts")
    )
    pairs = bucketed_range_join(
        pt, iv, key, ts_col="click_ts", lo_col="lo", hi_col="hi", width=lookback
    )
    w = Window.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    ranked = pairs.select(
        key,
        "purchase_id",
        "value_micro",
        "click_id",
        "click_ts",
        F.row_number().over(w).alias("position"),
        F.count(F.lit(1)).over(Window.partitionBy("purchase_id")).alias("n_touches"),
    )
    n = F.col("n_touches")
    pos = F.col("position")
    lin_base = F.expr("1000 DIV n_touches")
    linear = F.when(pos == 1, F.lit(1000) - lin_base * (n - 1)).otherwise(lin_base)
    mid_base = F.expr("CASE WHEN n_touches > 2 THEN 200 DIV (n_touches - 2) ELSE 0 END")
    u_shape = (
        F.when(n == 1, F.lit(1000))
        .when(n == 2, F.lit(500))
        .when(pos == 1, F.lit(400))
        .when(pos == n, F.lit(400))
        # first middle touch absorbs the tranche remainder so Σ == 1000
        .when(pos == 2, F.lit(200) - mid_base * (n - 3))
        .otherwise(mid_base)
    )
    weighted = ranked.select(
        key,
        "purchase_id",
        "click_id",
        "click_ts",
        "position",
        "n_touches",
        "value_micro",
        linear.cast("long").alias("w_linear_milli"),
        u_shape.cast("long").alias("w_ushape_milli"),
    )
    # integer DIV (floor), not a double divide + cast: both engines floor
    # the same exact integer product, so credits replay bit-for-bit
    return weighted.select(
        key,
        "purchase_id",
        "click_id",
        "click_ts",
        "position",
        "n_touches",
        "w_linear_milli",
        "w_ushape_milli",
        F.expr("CAST((value_micro * w_linear_milli) DIV 1000 AS BIGINT)").alias(
            "credit_linear_micro"
        ),
        F.expr("CAST((value_micro * w_ushape_milli) DIV 1000 AS BIGINT)").alias(
            "credit_ushape_micro"
        ),
    )
