"""Distributed exact selection (k-th smallest / median) in CONSTANT memory.

The third path through the documented A1 cliff (PLANS.md): Spark's exact
`percentile` buffers every value into one aggregation buffer (the sort-
buffer cliff past ~10⁸ rows), and `percentile_approx` trades exactness
away. Histogram refinement gets EXACT order statistics with bounded
memory: each pass histograms the candidate value range into ``width``
integer buckets (one shrinking aggregate, map-side combined), the driver
walks the ≤``width``-row histogram to find the bucket containing the
k-th value, and the next pass recurses INTO that bucket. Integer ranges
shrink by ×width per pass, so a 2⁶³ domain needs ≤7 passes of one
column-pruned scan each — O(log_width(range)) scans, O(width) driver
memory, no sort anywhere.

This is the classic BigQuery/Hive "exact median at scale" recipe
(iterative range refinement), expressed as plain DataFrame aggregates so
Catalyst fuses the range filter into each scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kth_smallest(df: DataFrame, col: str, k: int, width: int = 1024) -> int:
    """Exact k-th smallest (1-based) of an integer column, by histogram
    refinement. Raises on k out of range. Null values are ignored."""
    vals = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    bounds = vals.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    if bounds.n == 0 or not 1 <= k <= bounds.n:
        raise ValueError(f"k={k} out of range for {bounds.n} non-null rows")
    lo, hi = int(bounds.lo), int(bounds.hi)
    while hi > lo:
        span = hi - lo + 1
        step = max(1, -(-span // width))  # ceil: <= width buckets cover [lo, hi]
        hist = (
            vals.filter((F.col("v") >= lo) & (F.col("v") <= hi))
            # integer DIV, not float division + cast: (v - lo) can exceed
            # 2^53 and a double bucket id would misplace values
            .groupBy(F.expr(f"CAST((v - {lo}) DIV {step} AS BIGINT)").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        counts = {int(r.b): int(r.c) for r in hist}
        for b in range(0, -(-span // step)):
            c = counts.get(b, 0)
            if k <= c:
                lo, hi = lo + b * step, min(hi, lo + b * step + step - 1)
                break
            k -= c
        else:  # pragma: no cover — k validated against n above
            raise AssertionError("k exceeded histogram mass")
        if step == 1:
            return lo
    return lo


def exact_median(df: DataFrame, col: str, width: int = 1024) -> float | None:
    """Exact median of an integer column in O(log_width(range)) scans and
    O(width) driver memory — no per-group sort buffer at any scale. Even
    row counts average the two middle order statistics (the SQL median
    contract), odd counts return the middle one. An empty (or all-null)
    column yields None — SQL ``median`` of no rows is NULL, and the
    DuckDB-oracle gate on ``meta_file_median_bisect`` checks exactly
    that on the empty-partition path."""
    n = df.select(col).filter(F.col(col).isNotNull()).count()
    if n == 0:
        return None
    if n % 2 == 1:
        return float(kth_smallest(df, col, (n + 1) // 2, width))
    a = kth_smallest(df, col, n // 2, width)
    b = kth_smallest(df, col, n // 2 + 1, width)
    return (a + b) / 2.0
