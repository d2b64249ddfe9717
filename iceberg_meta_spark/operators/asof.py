"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row with the same key whose
timestamp is at-or-before the left row's timestamp (the attribution /
point-in-time-lookup shape: trades→quotes, purchases→clicks, events→the
prevailing dimension version).

Implementation is the union + forward-fill trick, NOT a range join:
tag both sides, union, then one window per key ordered by (ts, side,
tiebreak) forward-fills the last right payload onto every left row.

Scale posture (10⁹ rows/side): exactly ONE shuffle — hash-partition on the
key — and a per-partition sort; no join operator at all. A range-join
formulation (l.ts >= r.ts) explodes to the full per-key cross product
before picking the max, which is quadratic in per-key row count; the
forward-fill is linear after the sort. The right payload travels as a
single struct so a null in one payload column can never mix fields from
different right rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    prefix: str = "r_",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` row per
    ``key`` with ``right.ts <= left.ts`` (inclusive; among equal right
    timestamps the greatest ``tiebreak`` wins — pass one for determinism).

    ``tolerance`` (same unit as ``ts``) bounds the lookback like pandas
    ``merge_asof(tolerance=...)``: a match older than ``left.ts -
    tolerance`` is nulled out. Applied post-fill as a map-side predicate —
    the plan is unchanged (still one shuffle, no join operator).

    Output: all ``left`` columns, then ``{prefix}{ts}`` and
    ``{prefix}{c}`` for each of ``right_cols`` (all NULL when no right row
    precedes the left row).
    """
    payload = F.struct(
        F.col(ts).alias(f"{prefix}{ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    r_type = right.select(payload.alias("x")).schema["x"].dataType
    tb: Column = F.col(tiebreak) if tiebreak else F.lit(0)

    l_tagged = left.select(
        F.col(key).alias("__key"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts AFTER right at equal ts
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    r_tagged = right.select(
        F.col(key).alias("__key"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.cast("long").alias("__tb"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        payload.alias("__r"),
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(F.asc("__ts"), F.asc("__side"), F.asc_nulls_first("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__rf", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        in_window = F.col("__ts") - F.col(f"__rf.{prefix}{ts}") <= F.lit(tolerance)
        filled = filled.withColumn(
            "__rf", F.when(in_window, F.col("__rf"))  # else NULL
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__rf.{prefix}{c}").alias(f"{prefix}{c}") for c in [ts, *right_cols]
    ]
    return filled.select(*out_cols)
