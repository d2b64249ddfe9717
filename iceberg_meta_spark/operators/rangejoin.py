"""Bucketed range join: point-in-interval matching as an EQUI-join.

Spark has no native range-join optimization — a naive ``ts BETWEEN lo AND hi``
join compiles to a broadcast-nested-loop (or worse, a cartesian) that is
quadratic per key. The standard distributed fix, implemented here: bin time
into fixed-width buckets, explode each interval to the buckets it covers,
tag each point with its single bucket, and equi-join on (key, bucket) before
the exact range filter. Candidate count is then O(points + interval-spans /
width), never |points| × |intervals|.

Width is the tuning knob: ~ the typical interval length, so each interval
explodes to O(1) bucket rows. Intervals within a key must be disjoint for
at-most-one-match semantics (gap-based sessions are); overlapping intervals
simply yield one row per containing interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str = "ts",
    lo_col: str = "lo",
    hi_col: str = "hi",
    width: int = 1_800_000_000,
) -> DataFrame:
    """Inner-join each point to the interval(s) of the same ``key`` containing
    its timestamp (inclusive bounds). Returns points columns + interval
    columns. A point occupies exactly one bucket and an interval emits each
    covered bucket once, so the equi-join introduces no duplicate matches.
    """
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / width).cast("long"),
                F.floor(F.col(hi_col) / width).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.col(ts_col) / width).cast("long"))
    return (
        pt.join(iv, [key, "__bucket"])
        .filter((F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) <= F.col(hi_col)))
        .drop("__bucket")
    )


def session_intervals(
    events: DataFrame, key: str = "user_id", ts_col: str = "ts_us", gap: int = 1_800_000_000
) -> DataFrame:
    """Gap-based session intervals per key: (key, session_id, lo, hi).
    The same lag + cumulative-sum sessionization as ``user_sessions``,
    reduced to interval bounds."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts_col)
    delta = F.col(ts_col) - F.lag(ts_col).over(w)
    marked = events.withColumn(
        "__new", F.when(delta.isNull() | (delta > gap), 1).otherwise(0)
    )
    sess = marked.withColumn(
        "session_id", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy(key, "session_id").agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    )
