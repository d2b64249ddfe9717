"""File value-range overlap kernels (reference J3/W6) — the reference's
hardest algorithm (formatters.py:606-658, monster-table stress target).

Two regimes, mirroring the reference's cardinality switch (limit const at
formatters.py:341, switch at 632-653):

- exact pair count (<= limit files): interval self-join
  ``a.lo <= b.hi AND b.lo <= a.hi AND a.path < b.path``. Catalyst executes a
  broadcast nested-loop join — acceptable only under the gate, exactly like
  the reference's O(N²) mode. Above the gate we return -1 ("many"), the
  reference's sentinel.
- sweep-line detection (any N): count files whose ``lo`` falls under the
  running max ``hi`` of all predecessors in (lo, path) order. Implemented
  scale-correctly as a two-level running max: a per-bucket window plus a tiny
  bucket-prefix table broadcast back — equivalent to the single global-order
  window but with no single-partition global sort bottleneck at 10⁸ files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OVERLAP_EXACT_LIMIT = 1000  # reference formatters.py:341


def overlap_pair_count(ranges: DataFrame, limit: int = OVERLAP_EXACT_LIMIT) -> DataFrame:
    """J3 exact mode: count of overlapping (unordered) file pairs; above the
    ``limit`` gate, -1 ("many") when the sweep-line detects any overlap and 0
    when none exists (the reference reports -1 only on detected overlap,
    formatters.py:632-642 — a big but overlap-free table reports 0)."""
    n = ranges.count()
    if n > limit:
        sentinel = (
            F.when(F.col("overlapping_files") > 0, F.lit(-1)).otherwise(F.lit(0)).cast("long")
        )
        return overlap_sweepline(ranges).select(
            F.lit(n).cast("long").alias("file_count"),
            sentinel.alias("overlapping_pairs"),
        )
    a, b = ranges.alias("a"), ranges.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lo") <= F.col("b.hi"))
        & (F.col("b.lo") <= F.col("a.hi"))
        & (F.col("a.file_path") < F.col("b.file_path")),
    )
    return pairs.agg(
        F.lit(n).cast("long").alias("file_count"),
        F.count(F.lit(1)).alias("overlapping_pairs"),
    )


def overlap_sweepline(ranges: DataFrame, bucket_width: int = 4096) -> DataFrame:
    """J3 scalable mode (W6): #files overlapping at least one predecessor.

    Semantics: order files by (lo, file_path); a file overlaps iff
    max(hi) over all preceding files >= its lo. Same shape as the reference
    sweep-line (formatters.py:634-642) without materializing pairs.

    Bound semantics — deliberate divergence: lo/hi are INCLUSIVE value
    bounds (Iceberg column bounds are), so touching ranges share a value and
    count as overlapping (``>=``). This matches the exact pair join's
    ``a.lo <= b.hi`` above and both oracles; the reference's sweep compares
    strictly (``lo < max_end``), undercounting exactly-touching ranges
    relative to its own O(N²) mode.
    """
    bucketed = ranges.withColumn("bucket", (F.col("lo") / F.lit(bucket_width)).cast("long"))
    # Running max *within* each bucket (parallel windows, partitioned).
    in_bucket = Window.partitionBy("bucket").orderBy("lo", "file_path").rowsBetween(
        Window.unboundedPreceding, -1
    )
    with_local = bucketed.withColumn("prev_local_max", F.max("hi").over(in_bucket))
    # Max hi of all *earlier* buckets: tiny per-bucket aggregate, prefix-max
    # window over bucket ids (rows ~ #buckets, not #files), broadcast back.
    bucket_stats = bucketed.groupBy("bucket").agg(F.max("hi").alias("bucket_max"))
    prefix = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_prefix = bucket_stats.select(
        "bucket", F.max("bucket_max").over(prefix).alias("prev_bucket_max")
    )
    joined = with_local.join(F.broadcast(bucket_prefix), "bucket", "left")
    prev_max = F.greatest("prev_local_max", "prev_bucket_max")
    flagged = joined.withColumn(
        "overlaps_prev", F.coalesce(prev_max >= F.col("lo"), F.lit(False))
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("file_count"),
        # coalesce: empty input must report 0, not NULL (the all-zero
        # empty-table contract, reference formatters.py:384-414)
        F.coalesce(
            F.sum(F.when(F.col("overlaps_prev"), 1).otherwise(0)).cast("long"), F.lit(0).cast("long")
        ).alias("overlapping_files"),
    )


def clustering_depth(
    stats: DataFrame, bucket_width: int = 1024
) -> DataFrame:
    """Per-column clustering depth from file zone maps: how many files a
    point query must open.

    The layout-quality metric behind z-order/sort-order decisions (Delta
    OPTIMIZE reports the same number as "clustering depth"): sweep each
    field's [lower_bound, upper_bound] intervals as +1/-1 boundary events
    in value order; the running sum at any point is the count of files
    whose range covers that value. ``max_depth`` is the worst-case files-
    per-point (1 = perfectly clustered, N = every file overlaps);
    ``avg_depth_permille`` the mean depth observed at event points ×1000.

    Scale shape — same two-level trick as :func:`overlap_sweepline`, for a
    running SUM: a window partitioned by (field_id, value-bucket) computes
    the local prefix sum, a bucket-grain net-sum table (rows ≈ #buckets,
    not #files) takes a prefix window per field and broadcasts back. No
    global per-field sort funnel at 10⁸ files.

    Determinism: events order by (value, delta DESC) — all +1s before -1s
    at a shared value, matching inclusive Iceberg bounds. Both max and sum
    of prefix sums are invariant to permutations within an equal
    (value, delta) block, so no file tie-break is needed.

    Grouped-event compression (r13): identical (field, v, delta) events are
    collapsed to one weighted row BEFORE the windows (map-side-combined
    groupBy — §2.3 shrink-before-shuffle), so the running-sum machinery
    touches one row per distinct boundary value instead of one per file.
    The per-group depth series is closed-form: a group of ``cnt`` equal
    deltas after prefix ``prev`` contributes depths ``prev+δ .. prev+cnt·δ``,
    whose max is ``cum`` (δ=+1) or ``prev+δ`` (δ=-1) and whose sum is
    ``cnt·prev + δ·cnt(cnt+1)/2`` — exact integer arithmetic, result
    bit-identical to the row-per-event sweep (property-tested against the
    brute force and the DuckDB oracle). The explode also replaces the
    two-scan UNION with ONE pass over the stats.
    """
    ev = stats.select(
        "field_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("lower_bound").alias("v"), F.lit(1).cast("long").alias("delta")
                ),
                F.struct(
                    F.col("upper_bound").alias("v"), F.lit(-1).cast("long").alias("delta")
                ),
            )
        ).alias("e"),
    ).select(
        "field_id",
        F.col("e.v").alias("v"),
        F.col("e.delta").alias("delta"),
        F.expr(f"CAST(e.v DIV {int(bucket_width)} AS BIGINT)").alias("bucket"),
    )
    grouped = ev.groupBy("field_id", "bucket", "v", "delta").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    local = (
        Window.partitionBy("field_id", "bucket")
        .orderBy(F.asc("v"), F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_local = grouped.withColumn(
        "local_run", F.sum(F.col("delta") * F.col("cnt")).over(local)
    )
    bucket_net = grouped.groupBy("field_id", "bucket").agg(
        F.sum(F.col("delta") * F.col("cnt")).alias("net")
    )
    prefix = (
        Window.partitionBy("field_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_prefix = bucket_net.select(
        "field_id", "bucket", F.sum("net").over(prefix).alias("prev_net")
    )
    cum = F.col("local_run") + F.coalesce(F.col("prev_net"), F.lit(0))
    prev = cum - F.col("delta") * F.col("cnt")
    depth = with_local.join(F.broadcast(bucket_prefix), ["field_id", "bucket"]).select(
        "field_id",
        "cnt",
        F.when(F.col("delta") > 0, cum).otherwise(prev + F.col("delta")).alias("gmax"),
        (F.col("cnt") * prev + F.col("delta") * F.expr("(cnt * (cnt + 1)) DIV 2")).alias(
            "gsum"
        ),
    )
    return (
        depth.groupBy("field_id")
        .agg(
            (F.sum("cnt") / 2).cast("long").alias("n_files"),
            F.max("gmax").cast("long").alias("max_depth"),
            F.expr("CAST(sum(gsum) * 1000 DIV sum(cnt) AS BIGINT)").alias(
                "avg_depth_permille"
            ),
        )
        .orderBy("field_id")
    )
