"""Table-maintenance planning kernels: compaction, snapshot expiry, orphans.

The reference stops at *detecting* maintenance debt — the small-file count
and ``compaction_recommended`` flag (formatters.py:416-462) and the snapshot-
count alert (tui/widgets.py:791). These kernels take the next step a real
deployment needs and *plan* the maintenance action, staying pure
DataFrame -> DataFrame:

- ``compaction_plan``   — greedy bin-packing of small files into
  target-size rewrite groups, per (snapshot, partition).
- ``snapshot_expiry``   — retention policy (keep last N, expire older than
  a cutoff) over the snapshot log.
- ``orphan_files``      — storage listing minus metadata-tracked files
  (the classic `remove_orphan_files` scan), as one anti-join.

Scale notes (100 TB):
- The compaction window partitions by (snapshot_id, partition): cumulative
  sums never cross partition boundaries, so no global-ordering funnel; the
  per-partition file list is exactly what one rewrite task would handle.
- Snapshot expiry ranks the snapshot log, which is metadata-sized
  (O(snapshots-per-table), thousands — the reference holds the same list in
  process memory, formatters.py:156-173). In a multi-table deployment the
  window partitions by table.
- Orphan detection is a single LEFT ANTI equi-join on file_path — the
  metadata side is the smaller one at any scale (listing >= tracked), and
  AQE picks broadcast when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Default rewrite target: 128 MiB (a common data-file target size; the
# reference's small-file threshold of 32 MiB marks candidates,
# formatters.py:340).
DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def compaction_plan(
    files: DataFrame,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    small_threshold: int = 32 * 1024 * 1024,
) -> DataFrame:
    """Bin-pack small files into compaction groups of ~``target_bytes``.

    Greedy first-fit in file_path order (deterministic): a file joins the
    current group while the group's start offset stays below ``target_bytes``
    — i.e. ``group_id = (running_sum_before_this_file) DIV target_bytes``.
    One window partitioned by (snapshot_id, part_key), one hash aggregate.

    The window orders by (file_path, file_size_in_bytes, record_count):
    file_path alone can tie (fixture paths collide), and the extra keys make
    the running sum order-deterministic — rows identical on all three are
    interchangeable under a cumulative sum.
    """
    w = (
        Window.partitionBy("snapshot_id", "part_key")
        .orderBy("file_path", "file_size_in_bytes", "record_count")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    small = files.filter(F.col("file_size_in_bytes") < F.lit(small_threshold))
    offs = small.withColumn("end_off", F.sum("file_size_in_bytes").over(w))
    grouped = offs.withColumn(
        "group_id",
        F.expr(f"(end_off - file_size_in_bytes) DIV {int(target_bytes)}"),
    )
    return (
        grouped.groupBy("snapshot_id", "part_key", "group_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("file_size_in_bytes").alias("group_bytes"),
            F.sum("record_count").alias("group_records"),
        )
        .orderBy("snapshot_id", "part_key", "group_id")
    )


def snapshot_expiry(
    snapshots: DataFrame,
    keep_last: int = 5,
    max_age_us: int = 30 * 86400 * 1_000_000,
    *,
    now_us: int,
) -> DataFrame:
    """Expiry candidates under "keep last N AND keep newer than cutoff".

    A snapshot expires when it is neither among the ``keep_last`` most recent
    nor newer than ``now_us - max_age_us`` — the standard retention contract.
    ``now_us`` is required: the kernel is deterministic (no wall-clock read),
    and a zero/negative clock would make the cutoff negative and silently
    return an empty plan, so it is rejected here.
    The rank window runs over the metadata-sized snapshot log (see module
    docstring); ties break on snapshot_id for determinism.
    """
    if now_us <= 0:
        raise ValueError(f"now_us must be a positive epoch-microsecond clock, got {now_us}")
    w = Window.orderBy(F.desc("committed_us"), F.desc("snapshot_id"))
    ranked = snapshots.withColumn("recency_rank", F.row_number().over(w))
    cutoff_us = now_us - max_age_us
    return (
        ranked.filter(
            (F.col("recency_rank") > F.lit(keep_last))
            & (F.col("committed_us") < F.lit(cutoff_us))
        )
        .select(
            "snapshot_id",
            "committed_us",
            "recency_rank",
            "operation",
            "total_data_files",
            "total_files_size",
        )
        .orderBy("recency_rank")
    )


def orphan_files(storage: DataFrame, metadata_files: DataFrame) -> DataFrame:
    """Files present in the object-store listing but tracked by no snapshot.

    One LEFT ANTI equi-join on file_path (U1's set-difference idiom,
    reference formatters.py:1066-1069, pointed at the storage listing).
    """
    tracked = metadata_files.select("file_path")
    return (
        storage.join(tracked, "file_path", "left_anti")
        .select("file_path", "file_size_in_bytes")
        .orderBy("file_path")
    )


def scan_task_plan(
    files: DataFrame,
    target_bytes: int = 32 * 1024 * 1024,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read-side split planning: per-partition scan-task statistics.

    Mirrors Iceberg's ``TableScan.planFiles`` split step (read.split
    target size): each data file yields ``ceil(size / target)`` splits,
    each at most ``target_bytes``. The per-file split count and split
    sizes are closed-form column arithmetic — NO row explosion — so the
    whole plan is one scan + one hash aggregate at any file count:

    - ``n_splits``       total read tasks the partition produces
    - ``ideal_tasks``    ``ceil(partition_bytes / target)`` — the lower
      bound a perfect packing would reach
    - ``overhead_splits`` ``n_splits - ideal_tasks`` — extra tasks paid
      to file boundaries (many small files => high overhead; the signal
      that feeds :func:`compaction_plan`)
    - ``max_split_bytes`` the largest single task in the partition (the
      straggler bound for the scan stage)

    Reference parity note: the reference reports per-file sizes only
    (formatters.py:263-281); it never plans the read. Split-count math
    uses integer ``(size + target - 1) DIV target`` so both engines stay
    BIGINT-exact.
    """
    t = int(target_bytes)
    if snapshot_id is not None:
        files = files.filter(F.col("snapshot_id") == snapshot_id)
    per_file = files.select(
        "part_key",
        "file_size_in_bytes",
        F.expr(
            f"GREATEST(CAST(1 AS BIGINT), (file_size_in_bytes + {t - 1}) DIV {t})"
        ).alias("n_splits"),
        F.expr(f"LEAST(file_size_in_bytes, CAST({t} AS BIGINT))").alias(
            "first_split_bytes"
        ),
    )
    return (
        per_file.groupBy("part_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("file_size_in_bytes").cast("long").alias("total_bytes"),
            F.sum("n_splits").cast("long").alias("n_splits"),
            F.max("first_split_bytes").cast("long").alias("max_split_bytes"),
        )
        .select(
            "part_key",
            "n_files",
            "total_bytes",
            "n_splits",
            F.expr(f"(total_bytes + {t - 1}) DIV {t}").alias("ideal_tasks"),
            F.expr(f"n_splits - ((total_bytes + {t - 1}) DIV {t})").alias(
                "overhead_splits"
            ),
            "max_split_bytes",
        )
        .orderBy("part_key")
    )


def _interleave_expr(xcol: str, ycol: str, bits: int) -> str:
    """SQL text for bit-interleaving two ``bits``-wide ints (Morton/Z code):
    x occupies even bit positions, y odd. Pure integer arithmetic — the same
    expression text is valid Spark SQL and DuckDB SQL (mirrored in the
    oracle)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_layout(
    ranges: DataFrame, bits: int = 16, n_buckets: int = 16
) -> DataFrame:
    """Z-order clustering plan over per-file value ranges.

    Lakehouse data-clustering (the OPTIMIZE ... ZORDER BY shape): map each
    file's (lo, span) to a Morton code on min-max-normalized ``bits``-wide
    coordinates, then bucket by the code's high bits — files in one bucket
    are range-local in BOTH dimensions, which is what makes multi-column
    min/max pruning effective after a rewrite.

    Plan: one 1-row global aggregate for the normalization bounds
    (broadcast back — same idiom as partition_skew), then pure map-side
    integer arithmetic. No window, no join shuffle of the big side.
    """
    span = (F.col("hi") - F.col("lo")).alias("span")
    stats = ranges.select(F.col("lo"), span).agg(
        F.min("lo").alias("lo_min"),
        F.max("lo").alias("lo_max"),
        F.min("span").alias("sp_min"),
        F.max("span").alias("sp_max"),
    )
    top = (1 << bits) - 1
    scaled = (
        ranges.withColumn("span", F.col("hi") - F.col("lo"))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "x",
            F.expr(f"CAST((lo - lo_min) * {top} DIV greatest(lo_max - lo_min, 1) AS BIGINT)"),
        )
        .withColumn(
            "y",
            F.expr(f"CAST((span - sp_min) * {top} DIV greatest(sp_max - sp_min, 1) AS BIGINT)"),
        )
    )
    shift = 2 * bits - (n_buckets - 1).bit_length()
    return scaled.select(
        "file_path",
        F.expr(_interleave_expr("x", "y", bits)).alias("zvalue"),
        F.expr(f"({_interleave_expr('x', 'y', bits)}) >> {shift}").alias("zbucket"),
    ).orderBy("zvalue", "file_path")


def hilbert_step_exprs(level: int, xcol: str, ycol: str, dcol: str) -> tuple[str, str, str]:
    """SQL text for one Hilbert xy2d level (high bit -> low): returns
    (d', x', y') expressions over the previous level's columns. Pure integer
    CASE/shift/mask arithmetic — the identical text is valid Spark SQL and
    DuckDB SQL, which is what lets the layout carry a hash-gated oracle.

    Per level ``i`` with quadrant bits rx/ry, the curve visits quadrants in
    the order (3*rx) XOR ry (written arithmetically as 3*rx + ry - 2*rx*ry)
    and rotates the frame: ry=1 keeps (x,y); ry=0 swaps after an rx=1
    reflection. Unrolling keeps state linear — one projection per level,
    all fused by whole-stage codegen.
    """
    s = 1 << level
    rx = f"(({xcol} >> {level}) & 1)"
    ry = f"(({ycol} >> {level}) & 1)"
    d_next = f"{dcol} + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
    x_next = f"CASE WHEN {ry} = 1 THEN {xcol} WHEN {rx} = 1 THEN {s - 1} - {ycol} ELSE {ycol} END"
    y_next = f"CASE WHEN {ry} = 1 THEN {ycol} WHEN {rx} = 1 THEN {s - 1} - {xcol} ELSE {xcol} END"
    return d_next, x_next, y_next


def hilbert_index(df: DataFrame, bits: int, xcol: str = "x", ycol: str = "y") -> DataFrame:
    """Append ``hvalue`` — the Hilbert-curve index of (xcol, ycol) on a
    2^bits x 2^bits grid — via ``bits`` chained integer projections."""
    out = df.withColumn("__hx", F.col(xcol)).withColumn("__hy", F.col(ycol)).withColumn(
        "__hd", F.lit(0).cast("long")
    )
    for level in range(bits - 1, -1, -1):
        d_e, x_e, y_e = hilbert_step_exprs(level, "__hx", "__hy", "__hd")
        out = out.withColumns(
            {"__hd": F.expr(d_e), "__hx": F.expr(x_e), "__hy": F.expr(y_e)}
        )
    return out.withColumn("hvalue", F.col("__hd")).drop("__hx", "__hy", "__hd")


def hilbert_layout(
    ranges: DataFrame, bits: int = 8, n_buckets: int = 16
) -> DataFrame:
    """Hilbert-curve clustering plan over per-file value ranges.

    The locality-preserving alternative to :func:`zorder_layout`: the
    Hilbert index's consecutive codes are always grid-adjacent (no Morton
    "seam jumps" across quadrant boundaries), so equal-width code buckets
    have tighter per-bucket bounding boxes — better multi-column min/max
    pruning after the rewrite for the same bucket count.

    Same plan shape as Z-order: one 1-row bounds aggregate broadcast back,
    then ``bits`` fused map-side projections. No window, no shuffle of the
    file list.
    """
    stats = ranges.select(F.col("lo"), (F.col("hi") - F.col("lo")).alias("span")).agg(
        F.min("lo").alias("lo_min"),
        F.max("lo").alias("lo_max"),
        F.min("span").alias("sp_min"),
        F.max("span").alias("sp_max"),
    )
    top = (1 << bits) - 1
    scaled = (
        ranges.withColumn("span", F.col("hi") - F.col("lo"))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "x",
            F.expr(f"CAST((lo - lo_min) * {top} DIV greatest(lo_max - lo_min, 1) AS BIGINT)"),
        )
        .withColumn(
            "y",
            F.expr(f"CAST((span - sp_min) * {top} DIV greatest(sp_max - sp_min, 1) AS BIGINT)"),
        )
    )
    shift = 2 * bits - (n_buckets - 1).bit_length()
    return (
        hilbert_index(scaled, bits)
        .select("file_path", "hvalue", F.expr(f"hvalue >> {shift}").alias("hbucket"))
        .orderBy("hvalue", "file_path")
    )


def manifest_rewrite_plan(
    manifests: DataFrame,
    target_bytes: int = 8 * 1024 * 1024,
    small_threshold: int = 1 * 1024 * 1024,
) -> DataFrame:
    """Bin-pack small DATA manifests into rewrite groups (Iceberg's
    ``rewrite_manifests`` action planned declaratively) — many tiny
    manifests make every scan's metadata phase slow, exactly like small
    data files make the read phase slow.

    Delete manifests (content != 0) are excluded: rewriting them merges
    delete scopes, a different action. Grouping mirrors
    :func:`compaction_plan`: greedy first-fit by deterministic order within
    (snapshot_id, partition_spec_id) — group = running-start DIV target.
    """
    w = (
        Window.partitionBy("snapshot_id", "partition_spec_id")
        .orderBy("manifest_path", "manifest_length")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    small = manifests.filter(
        (F.col("content") == 0) & (F.col("manifest_length") < F.lit(small_threshold))
    )
    offs = small.withColumn("end_off", F.sum("manifest_length").over(w))
    grouped = offs.withColumn(
        "group_id", F.expr(f"(end_off - manifest_length) DIV {int(target_bytes)}")
    )
    return (
        grouped.groupBy("snapshot_id", "partition_spec_id", "group_id")
        .agg(
            F.count(F.lit(1)).alias("n_manifests"),
            F.sum("manifest_length").alias("group_bytes"),
            F.sum(F.col("added_files_count") + F.col("existing_files_count")).alias(
                "group_files"
            ),
        )
        .filter(F.col("n_manifests") > 1)  # singleton groups gain nothing
        .orderBy("snapshot_id", "partition_spec_id", "group_id")
    )


def equality_delete_plan(
    col_stats: DataFrame,
    files: DataFrame,
    field_id: int,
    subject_keys: list[int],
) -> DataFrame:
    """Right-to-be-forgotten planning: which data files COULD contain any of
    ``subject_keys`` in column ``field_id``, judged purely from the per-file
    zone maps (lower/upper bounds) — the file set an equality-delete
    compaction (or GDPR erasure rewrite) must touch, with its cost.

    Per candidate file: how many subject keys land inside its bound
    interval, plus the rewrite cost (bytes, rows-upper-bound). Files whose
    bounds exclude every key are provably clean and never rewritten — the
    same zone-map argument query-side data skipping makes, applied to
    deletes.

    Scale shape: the subject-key set is a deletion batch (thousands at
    most) baked in as an array literal, so the containment check is PURE
    MAP-SIDE array arithmetic over the stats table — no join, no shuffle;
    the only exchange attaches file sizes by file_path equi-join. At 10^9
    files this is one scan of the stats table. For million-key batches,
    swap the literal for a broadcast range-bucketed join without changing
    the output contract.
    """
    keys = F.array(*[F.lit(int(k)).cast("long") for k in sorted(subject_keys)])
    hits = (
        col_stats.where(F.col("field_id") == field_id)
        .select(
            "file_path",
            F.size(
                F.filter(
                    keys,
                    lambda k: (k >= F.col("lower_bound"))
                    & (k <= F.col("upper_bound")),
                )
            )
            .cast("long")
            .alias("n_candidate_keys"),
        )
        .where(F.col("n_candidate_keys") > 0)
    )
    return (
        hits.join(files.select("file_path", "file_size_in_bytes", "record_count"), "file_path")
        .select(
            "file_path",
            "n_candidate_keys",
            F.col("file_size_in_bytes").alias("rewrite_bytes"),
            F.col("record_count").alias("rows_upper_bound"),
        )
        .orderBy("file_path")
    )


def retention_policy(
    snapshots: DataFrame,
    *,
    now_us: int,
    keep_last: int = 5,
    keep_all_hours: int = 24,
    daily_days: int = 30,
    weekly_weeks: int = 12,
) -> DataFrame:
    """GFS (grandfather-father-son) snapshot retention simulation: the
    standard backup-rotation policy applied to the snapshot log, one
    verdict row per snapshot with the reasons it is kept.

    Keep when ANY of: among the ``keep_last`` most recent; younger than
    ``keep_all_hours``; the last snapshot of its UTC day within
    ``daily_days``; the last snapshot of its ISO week within
    ``weekly_weeks``. Everything else expires. This generalizes
    :func:`snapshot_expiry` (keep-last AND max-age) into the tiered
    retention real warehouses run, and shows WHY each snapshot survives —
    the dry-run a user wants before an irreversible expire.

    Windows: the recency rank is global over the metadata-sized snapshot
    log (same bound as snapshot_expiry; multi-table deployments partition
    it by table). The day/week last-of-period windows are partitioned by
    their period key. ``now_us`` is required and validated — no
    wall-clock read, fully deterministic.
    """
    if now_us <= 0:
        raise ValueError(f"now_us must be a positive epoch-microsecond clock, got {now_us}")
    day_us = 86_400_000_000
    week_us = 7 * day_us
    w_recent = Window.orderBy(F.desc("committed_us"), F.desc("snapshot_id"))
    w_day = Window.partitionBy("day_idx").orderBy(
        F.desc("committed_us"), F.desc("snapshot_id")
    )
    w_week = Window.partitionBy("week_idx").orderBy(
        F.desc("committed_us"), F.desc("snapshot_id")
    )
    keyed = snapshots.select(
        "snapshot_id",
        "committed_us",
        F.expr(f"committed_us DIV {day_us}").alias("day_idx"),
        F.expr(f"committed_us DIV {week_us}").alias("week_idx"),
    )
    flagged = (
        keyed.withColumn("recency_rank", F.row_number().over(w_recent))
        .withColumn("day_rank", F.row_number().over(w_day))
        .withColumn("week_rank", F.row_number().over(w_week))
        .select(
            "snapshot_id",
            "committed_us",
            "recency_rank",
            (F.col("recency_rank") <= keep_last).alias("keep_lastk"),
            (
                F.col("committed_us") >= now_us - keep_all_hours * 3_600_000_000
            ).alias("keep_recent"),
            (
                (F.col("day_rank") == 1)
                & (F.col("day_idx") >= now_us // day_us - daily_days)
            ).alias("keep_daily"),
            (
                (F.col("week_rank") == 1)
                & (F.col("week_idx") >= now_us // week_us - weekly_weeks)
            ).alias("keep_weekly"),
        )
    )
    reasons = F.concat_ws(
        ",",
        F.when(F.col("keep_lastk"), F.lit("last-k")),
        F.when(F.col("keep_recent"), F.lit("recent")),
        F.when(F.col("keep_daily"), F.lit("daily")),
        F.when(F.col("keep_weekly"), F.lit("weekly")),
    )
    keep = (
        F.col("keep_lastk")
        | F.col("keep_recent")
        | F.col("keep_daily")
        | F.col("keep_weekly")
    )
    return flagged.select(
        "snapshot_id",
        "committed_us",
        "recency_rank",
        keep.alias("keep"),
        F.when(keep, reasons).otherwise(F.lit("expire")).alias("reasons"),
    )
