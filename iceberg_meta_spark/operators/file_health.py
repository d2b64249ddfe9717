"""File-level health kernels (reference A1/A2/A8).

Reference: collect_table_health file-size section (formatters.py:416-443),
delete-manifest accumulation (formatters.py:445-462), summary dashboard
totals (formatters.py:940-950). The reference materializes every file row
into Python and loops; here each kernel is ONE hash-aggregate over the scan —
partial aggregation map-side, O(1) result rows, no shuffle beyond the final
single-group reduce. Safe at any file count.

Precision contract (oracle parity): sums/counts are exact BIGINT; averages
are computed as exact-int-sum / count (deterministic double division, never
Spark's accumulate-in-double Average); median is exact, computed by rank
selection with ``F.median``'s own interpolation formula (bit-identical —
see :func:`_exact_median_frame`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iceberg_meta_spark.sources.fixtures import SMALL_FILE_THRESHOLD


def _exact_median_frame(files: DataFrame, col: str) -> DataFrame:
    """One-row frame (median_size double): EXACT median by rank selection —
    global sort + row_number keeps only the middle one/two rows, then
    Spark's own percentile interpolation formula
    ``(higher - pos)·lower + (pos - lower_idx)·higher`` reproduces
    ``F.median`` BIT FOR BIT (randomized A/B across odd/even/negative/1e12
    inputs, NULLs, empty). Replaces the interpreted ObjectHashAggregate
    ``median``, whose per-row boxed buffer updates cost ~4× the codegen'd
    sort at sf0.1 (1.3 s of meta_file_health's 1.5 s, measured r12).

    r13: the total row count is a COUNT window over the same sort (one
    Window node evaluates both frames), replacing the separate whole-input
    count pass + 1×1 broadcast cross join of the r12 shape; NULLs are
    excluded before ranking and counting, so the helper matches
    ``F.median`` (which ignores NULLs) for ANY column, not just the
    spec-non-null file sizes.

    Scale posture, stated plainly: the unpartitioned rank window funnels
    through one task — the SAME single-reducer funnel the exact
    ``median``'s merge phase already had (every value reaches one
    ObjectHashAggregate buffer), so this trades an interpreted funnel for
    a codegen'd one without changing asymptotics. A funnel-FREE two-level
    form (rank windows partitioned by ``v DIV 2²⁰`` + a broadcast
    bucket-offset table, overlap_sweepline's trick) was built and measured
    in r13: bit-identical, no single-partition Exchange — and 2.3× SLOWER
    at sf0.1 (meta_file_health 0.95 → 2.19 s, 6 → 9 jobs: the extra
    aggregate pass, tiny-table windows and broadcast join all bill ~150 ms
    of stage latency each, far more than the 600k-row codegen'd sort they
    avoid). Rejected on measurement; the documented deployment path for
    >10⁸ files remains :func:`file_size_stats_approx` (mergeable sketch),
    and tools/plan_lint.py allowlists the exact twin with that reason."""
    w = Window.orderBy("__v")
    whole = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        files.select(F.col(col).alias("__v"))
        .where(F.col("__v").isNotNull())
        .select(
            "__v",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(whole).alias("__n"),
        )
    )
    pos = F.lit(0.5) * (F.col("__n") - 1).cast("double")
    lo_i, hi_i = F.floor(pos), F.ceil(pos)
    keep = ranked.where((F.col("__rn") - 1 == lo_i) | (F.col("__rn") - 1 == hi_i))
    return keep.agg(
        F.coalesce(
            F.when(F.first(lo_i) == F.first(hi_i), F.min("__v").cast("double"))
            .otherwise(
                (F.first(hi_i).cast("double") - F.first(pos)) * F.min("__v").cast("double")
                + (F.first(pos) - F.first(lo_i).cast("double")) * F.max("__v").cast("double")
            ),
            F.lit(0.0),  # empty input: the reference's all-zero report
        ).alias("median_size")
    )


def _one_evaluation(files: DataFrame) -> DataFrame:
    """The stats + median split below consumes ``files`` TWICE; when the
    input is anything but an in-memory LocalRelation (a fixture-derivation
    query, a distributed manifest decode at scale), that re-runs the whole
    upstream pipeline per consumer. Lazily checkpoint those so the input
    computes once (ADVICE r12); LocalRelations — the driver-decoded
    metadata path, the common case locally — are free to re-consume and
    skip the checkpoint job."""
    plan = files._jdf.queryExecution().optimizedPlan()
    if plan.getClass().getSimpleName() == "LocalRelation":
        return files
    return files.localCheckpoint(eager=False)


def file_size_stats(files: DataFrame, threshold: int = SMALL_FILE_THRESHOLD) -> DataFrame:
    """A1: count/min/max/avg/median/sum + small-file count & pct — one
    hash-aggregate pass plus the rank-selection exact median
    (:func:`_exact_median_frame`), glued by a 1×1 broadcast cross join.

    Every aggregate here reads ONLY file_size_in_bytes, so the input is
    projected to that column BEFORE the one-evaluation checkpoint: column
    pruning reaches the upstream scan inside the checkpointed plan, and
    the materialized RDD is one narrow column, not the full file row."""
    files = _one_evaluation(files.select("file_size_in_bytes"))
    size = F.col("file_size_in_bytes")
    small = F.coalesce(F.sum(F.when(size < F.lit(threshold), 1).otherwise(0)).cast("long"), F.lit(0))
    n = F.count(F.lit(1))
    # Zero-guards mirror the reference's all-zero empty-table report
    # (formatters.py:384-414) and keep ANSI mode from erroring on 0/0.
    aggs = files.agg(
        n.alias("file_count"),
        F.coalesce(F.sum(size), F.lit(0)).alias("total_size"),
        F.coalesce(F.min(size), F.lit(0)).alias("min_size"),
        F.coalesce(F.max(size), F.lit(0)).alias("max_size"),
        F.when(n == 0, F.lit(0.0)).otherwise(F.sum(size).cast("double") / n).alias("avg_size"),
        small.alias("small_files"),
        F.when(n == 0, F.lit(0.0)).otherwise(F.round(F.lit(100.0) * small / n, 4)).alias("small_pct"),
    )
    med = _exact_median_frame(files, "file_size_in_bytes")
    return aggs.crossJoin(F.broadcast(med)).select(
        "file_count", "total_size", "min_size", "max_size", "avg_size",
        "median_size", "small_files", "small_pct",
    )


def file_size_stats_approx(
    files: DataFrame, threshold: int = SMALL_FILE_THRESHOLD, accuracy: int = 10000
) -> DataFrame:
    """A1 at >10⁸ files: exact aggregates + APPROX median.

    The exact median funnels every value through one task (rank selection
    or aggregate buffer alike — see :func:`_exact_median_frame`), memory
    growing with file count — the engine's one documented scale cliff.
    This variant swaps in ``percentile_approx`` (mergeable quantile
    sketch: constant memory per partition, map-side combinable, error ≤
    1/accuracy of rank), keeping every other column bit-identical with
    :func:`file_size_stats`.
    """
    size = F.col("file_size_in_bytes")
    small = F.coalesce(F.sum(F.when(size < F.lit(threshold), 1).otherwise(0)).cast("long"), F.lit(0))
    n = F.count(F.lit(1))
    return files.agg(
        n.alias("file_count"),
        F.coalesce(F.sum(size), F.lit(0)).alias("total_size"),
        F.coalesce(F.min(size), F.lit(0)).alias("min_size"),
        F.coalesce(F.max(size), F.lit(0)).alias("max_size"),
        F.when(n == 0, F.lit(0.0)).otherwise(F.sum(size).cast("double") / n).alias("avg_size"),
        F.coalesce(
            F.percentile_approx(size, 0.5, accuracy).cast("double"), F.lit(0.0)
        ).alias("median_size"),
        small.alias("small_files"),
        F.when(n == 0, F.lit(0.0)).otherwise(F.round(F.lit(100.0) * small / n, 4)).alias("small_pct"),
    )


def summary_totals(files: DataFrame) -> DataFrame:
    """A8: dashboard totals — file count, total bytes, total rows, partitions."""
    return files.agg(
        F.count(F.lit(1)).alias("file_count"),
        F.sum("file_size_in_bytes").alias("total_size"),
        F.sum("record_count").alias("total_records"),
        F.countDistinct("part_key").alias("partition_count"),
    )


def manifest_counts(manifests: DataFrame) -> DataFrame:
    """A2: conditional counts of data vs delete manifests (content 0=data).

    ``compaction_recommended`` mirrors formatters.py:445-462
    (delete manifests present -> recommend compaction).
    """
    is_delete = F.col("content") != 0
    delete_count = F.sum(F.when(is_delete, 1).otherwise(0)).cast("long")
    return manifests.agg(
        F.sum(F.when(~is_delete, 1).otherwise(0)).cast("long").alias("data_manifests"),
        delete_count.alias("delete_manifests"),
        F.sum("manifest_length").alias("total_manifest_bytes"),
        F.sum(F.col("deleted_files_count").cast("long")).alias("deleted_files"),
        (delete_count > 0).alias("compaction_recommended"),
    )
