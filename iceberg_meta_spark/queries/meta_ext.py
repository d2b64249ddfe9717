"""Iceberg-metadata maintenance & layout planning queries: compaction,
expiry, orphan sweep, z-order/Hilbert layout, pruning previews, schema
compatibility, rollback, spec migration, retention, commit cadence.

Split from the former monolithic queries/extensions.py (round 7); the
registration order of the full extension family is pinned by
queries/extensions.py::_CANONICAL_ORDER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.parquet import load_table


from iceberg_meta_spark.pipeline import graph, quality  # noqa: E402

from iceberg_meta_spark import operators as ops  # noqa: E402

from iceberg_meta_spark.sources.fixtures import (  # noqa: E402
    NOW_MS,
    SMALL_FILE_THRESHOLD,
    derive,
    oracle_query,
)

_COMPACT_TARGET = 128 * 1024 * 1024

_EXPIRY_KEEP = 5

_EXPIRY_MAX_AGE_US = 80 * 86400 * 1_000_000

_EXPIRY_NOW_US = NOW_MS * 1000

@register(
    "meta_compaction_plan",
    oracle=oracle_query(
        f"""
        , small AS (SELECT * FROM meta_files
                    WHERE file_size_in_bytes < {SMALL_FILE_THRESHOLD}),
        offs AS (SELECT snapshot_id, part_key, file_size_in_bytes, record_count,
                        sum(file_size_in_bytes) OVER (
                            PARTITION BY snapshot_id, part_key
                            ORDER BY file_path, file_size_in_bytes, record_count
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
                 FROM small)
        SELECT snapshot_id, part_key,
               CAST((end_off - file_size_in_bytes) // {_COMPACT_TARGET}
                    AS BIGINT) AS group_id,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(file_size_in_bytes) AS BIGINT) AS group_bytes,
               CAST(sum(record_count) AS BIGINT) AS group_records
        FROM offs GROUP BY snapshot_id, part_key, group_id
        ORDER BY snapshot_id, part_key, group_id
        """,
        "meta_files",
    ),
    tags=("maintenance", "bench"),
    doc="Compaction planning: greedy bin-packing of small files (reference "
    "detects them at formatters.py:416-443 but plans nothing) into ~128 MiB "
    "rewrite groups. One window partitioned by (snapshot, partition) — the "
    "cumulative sum never crosses a partition, so no global funnel — then "
    "one hash aggregate; each output group is exactly one rewrite task",
)
def meta_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.compaction_plan(
        derive(spark, sf_dir, "meta_files"),
        target_bytes=_COMPACT_TARGET,
        small_threshold=SMALL_FILE_THRESHOLD,
    )

@register(
    "meta_snapshot_expiry",
    oracle=oracle_query(
        f"""
        , ranked AS (
            SELECT *, row_number() OVER (
                ORDER BY committed_us DESC, snapshot_id DESC) AS recency_rank
            FROM meta_snapshots)
        SELECT snapshot_id, committed_us, recency_rank, operation,
               total_data_files, total_files_size
        FROM ranked
        WHERE recency_rank > {_EXPIRY_KEEP}
          AND committed_us < {_EXPIRY_NOW_US - _EXPIRY_MAX_AGE_US}
        ORDER BY recency_rank
        """,
        "meta_snapshots",
    ),
    tags=("maintenance",),
    doc="Snapshot-retention planning (keep last 5 AND keep 80 days): expiry "
    "candidates from one rank window over the metadata-sized snapshot log "
    "(the reference holds the same list in memory, formatters.py:156-173; "
    "its only retention signal is the snapshot-count alert, "
    "tui/widgets.py:791). Multi-table deployments partition the window by "
    "table",
)
def meta_snapshot_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.snapshot_expiry(
        derive(spark, sf_dir, "meta_snapshots"),
        keep_last=_EXPIRY_KEEP,
        max_age_us=_EXPIRY_MAX_AGE_US,
        now_us=_EXPIRY_NOW_US,
    )

@register(
    "meta_orphan_files",
    oracle=oracle_query(
        """
        SELECT s.file_path, s.file_size_in_bytes
        FROM storage_files s
        WHERE NOT EXISTS (SELECT 1 FROM meta_files m
                          WHERE m.file_path = s.file_path)
        ORDER BY s.file_path
        """,
        "storage_files",
        "meta_files",
    ),
    tags=("maintenance",),
    doc="Orphan-file detection (remove_orphan_files scan): object-store "
    "listing LEFT ANTI metadata-tracked paths — U1's set-difference idiom "
    "(reference formatters.py:1066-1069) pointed at the storage listing; "
    "one equi-anti-join, AQE broadcasts the smaller side",
)
def meta_orphan_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.orphan_files(
        derive(spark, sf_dir, "storage_files"),
        derive(spark, sf_dir, "meta_files"),
    )

from iceberg_meta_spark.operators.maintenance import _interleave_expr  # noqa: E402

_Z_BITS, _Z_BUCKETS = 16, 16

_Z_SHIFT = 2 * _Z_BITS - (_Z_BUCKETS - 1).bit_length()

_Z_TOP = (1 << _Z_BITS) - 1

@register(
    "meta_zorder_layout",
    oracle=oracle_query(
        f"""
        , stats AS (SELECT min(lo) AS lo_min, max(lo) AS lo_max,
                           min(hi - lo) AS sp_min, max(hi - lo) AS sp_max
                    FROM file_ranges),
        scaled AS (SELECT file_path,
                          CAST((lo - lo_min) * {_Z_TOP} // greatest(lo_max - lo_min, 1) AS BIGINT) AS x,
                          CAST((hi - lo - sp_min) * {_Z_TOP} // greatest(sp_max - sp_min, 1) AS BIGINT) AS y
                   FROM file_ranges, stats)
        SELECT file_path,
               {_interleave_expr('x', 'y', _Z_BITS)} AS zvalue,
               ({_interleave_expr('x', 'y', _Z_BITS)}) >> {_Z_SHIFT} AS zbucket
        FROM scaled ORDER BY zvalue, file_path
        """,
        "file_ranges",
    ),
    tags=("maintenance", "bench"),
    doc="Z-order clustering plan (OPTIMIZE ... ZORDER BY shape): Morton "
    "code over min-max-normalized (lo, span) per file, bucketed by the "
    "code's high bits — files in one bucket are range-local in both "
    "dimensions, the precondition for effective multi-column min/max "
    "pruning. One 1-row bounds aggregate broadcast back, then pure "
    "map-side bit arithmetic; no window, no shuffle of the file list",
)
def meta_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.zorder_layout(
        derive(spark, sf_dir, "file_ranges"), bits=_Z_BITS, n_buckets=_Z_BUCKETS
    )

from iceberg_meta_spark.operators.lineage import ancestry  # noqa: E402

@register(
    "snapshot_ancestry",
    oracle="""
        WITH RECURSIVE nodes AS (
            SELECT event_id AS snapshot_id,
                   CASE WHEN event_id % 64 = 0 THEN NULL
                        ELSE event_id - 1 END AS parent_id
            FROM events),
        walk AS (
            SELECT snapshot_id, snapshot_id AS cur, 0 AS depth FROM nodes
            UNION ALL
            SELECT w.snapshot_id, n.parent_id, w.depth + 1
            FROM walk w JOIN nodes n ON n.snapshot_id = w.cur
            WHERE n.parent_id IS NOT NULL)
        SELECT w.snapshot_id, w.cur AS root_id, CAST(w.depth AS BIGINT) AS depth
        FROM walk w JOIN nodes n ON n.snapshot_id = w.cur
        WHERE n.parent_id IS NULL
        ORDER BY w.snapshot_id
    """,
    doc="Snapshot-lineage ancestry (reference walks parent_snapshot_id one "
    "hop at a time, formatters.py:886-934): pointer doubling resolves every "
    "node's root + depth in ceil(log2(depth)) self-joins — 6 rounds for "
    "this forest of 64-deep chains vs 64 sequential hops; rows stay "
    "one-per-node through every round, localCheckpoint caps lineage. The "
    "oracle is the recursive-CTE formulation of the same walk",
)
def snapshot_ancestry(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("snapshot_id"),
        F.when(F.col("event_id") % 64 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("event_id") - 1)
        .alias("parent_id"),
    )
    return ancestry(nodes, max_depth=64)

from iceberg_meta_spark.operators.maintenance import hilbert_step_exprs  # noqa: E402

_H_BITS, _H_BUCKETS = 8, 16

_H_TOP = (1 << _H_BITS) - 1

_H_SHIFT = 2 * _H_BITS - (_H_BUCKETS - 1).bit_length()

def _hilbert_oracle() -> str:
    ctes = [
        f"""stats AS (SELECT min(lo) AS lo_min, max(lo) AS lo_max,
                           min(hi - lo) AS sp_min, max(hi - lo) AS sp_max
                    FROM file_ranges),
        h{_H_BITS} AS (SELECT file_path,
                          CAST(0 AS BIGINT) AS d,
                          CAST((lo - lo_min) * {_H_TOP} // greatest(lo_max - lo_min, 1) AS BIGINT) AS x,
                          CAST((hi - lo - sp_min) * {_H_TOP} // greatest(sp_max - sp_min, 1) AS BIGINT) AS y
                   FROM file_ranges, stats)"""
    ]
    for level in range(_H_BITS - 1, -1, -1):
        d_e, x_e, y_e = hilbert_step_exprs(level, "x", "y", "d")
        ctes.append(
            f"h{level} AS (SELECT file_path, {d_e} AS d, {x_e} AS x, {y_e} AS y FROM h{level + 1})"
        )
    body = (
        ", " + ",\n        ".join(ctes)
        + f"""
        SELECT file_path, d AS hvalue, d >> {_H_SHIFT} AS hbucket
        FROM h0 ORDER BY hvalue, file_path"""
    )
    return oracle_query(body, "file_ranges")

@register(
    "meta_hilbert_layout",
    oracle=_hilbert_oracle(),
    tags=("maintenance", "bench"),
    doc="Hilbert-curve clustering plan: the locality-preserving alternative "
    "to meta_zorder_layout — consecutive codes are always grid-adjacent "
    "(no Morton seam jumps), so equal-width code buckets have tighter "
    "bounding boxes for the same bucket count. Same plan shape: one 1-row "
    "bounds aggregate broadcast back, then 8 fused map-side integer "
    "projections (one per curve level); the oracle unrolls the identical "
    "per-level arithmetic as chained CTEs",
)
def meta_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.hilbert_layout(
        derive(spark, sf_dir, "file_ranges"), bits=_H_BITS, n_buckets=_H_BUCKETS
    )

@register(
    "meta_pruning_preview",
    oracle=oracle_query(
        """
        SELECT (hi < 1200 OR lo > 1500) AS skippable,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(hi - lo) AS BIGINT) AS total_span
        FROM file_ranges
        GROUP BY skippable ORDER BY skippable
        """,
        "file_ranges",
    ),
    tags=("maintenance",),
    doc="Data-skipping preview for a predicate interval [1200, 1500]: a "
    "file is skippable iff its min/max range misses the query interval — "
    "the planning-time estimate of how much IO zone-map pruning saves, "
    "and the metric a zorder/hilbert rewrite should improve; pure "
    "map-side flag + 2-group aggregate",
)
def meta_pruning_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = derive(spark, sf_dir, "file_ranges")
    return (
        fr.withColumn("skippable", (F.col("hi") < 1200) | (F.col("lo") > 1500))
        .groupBy("skippable")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.col("hi") - F.col("lo")).alias("total_span"),
        )
        .orderBy("skippable")
    )

_WIDEN_SQL = " OR ".join(
    f"(old_type = '{o}' AND new_type = '{n}')"
    for o, n in (
        ("int", "long"), ("int", "bigint"), ("float", "double"),
        ("decimal(9,2)", "decimal(18,2)"), ("decimal(18,2)", "decimal(38,2)"),
    )
)

@register(
    "meta_schema_compat",
    oracle=oracle_query(
        f"""
        , o AS (SELECT table_name, field_id, name AS old_name, type AS old_type, required AS old_required
                FROM meta_schema_fields WHERE schema_id = 1),
        n AS (SELECT table_name, field_id, name AS new_name, type AS new_type, required AS new_required
              FROM meta_schema_fields WHERE schema_id = 2),
        j AS (SELECT coalesce(o.table_name, n.table_name) AS table_name,
                     old_name, new_name, old_type, new_type, old_required, new_required
              FROM o FULL OUTER JOIN n ON o.table_name = n.table_name AND o.field_id = n.field_id
              WHERE old_name IS NULL OR new_name IS NULL
                 OR old_name <> new_name OR old_type <> new_type OR old_required <> new_required),
        cls AS (SELECT table_name,
                  CASE WHEN old_name IS NULL THEN 'added'
                       WHEN new_name IS NULL THEN 'removed'
                       WHEN old_type <> new_type THEN
                         CASE WHEN {_WIDEN_SQL} THEN 'widened' ELSE 'incompatible' END
                       WHEN old_required = false AND new_required = true THEN 'tightened'
                       ELSE 'renamed' END AS compat
                FROM j)
        SELECT table_name, compat, CAST(count(*) AS BIGINT) AS n_fields
        FROM cls GROUP BY table_name, compat ORDER BY table_name, compat
        """,
        "meta_schema_fields",
    ),
    doc="Schema-evolution safety classes per table: each J2 diff row "
    "classifies as widened (Iceberg's legal promotions — int->long, "
    "float->double, decimal growth: old files stay readable), renamed "
    "(safe — field IDs, not names, bind columns), tightened "
    "(optional->required: existing nulls may violate), or incompatible "
    "(rewrite required); added/removed pass through. The "
    "can-readers-upgrade check run before committing a schema change",
)
def meta_schema_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.schema_compat(derive(spark, sf_dir, "meta_schema_fields"), old_id=1, new_id=2)

@register(
    "meta_rollback_plan",
    oracle=oracle_query(
        """
        , cur AS (SELECT file_path, sum(record_count) AS rc,
                    sum(file_size_in_bytes) AS sz
                  FROM meta_files WHERE snapshot_id = 2 GROUP BY file_path),
        tgt AS (SELECT file_path, sum(record_count) AS rc,
                  sum(file_size_in_bytes) AS sz
                FROM meta_files WHERE snapshot_id = 1 GROUP BY file_path),
        d AS (SELECT CASE WHEN cur.file_path IS NULL THEN 'restore'
                          ELSE 'remove' END AS action,
                coalesce(tgt.rc, cur.rc) AS rc, coalesce(tgt.sz, cur.sz) AS sz
              FROM cur FULL JOIN tgt USING (file_path)
              WHERE cur.file_path IS NULL OR tgt.file_path IS NULL)
        SELECT action, CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(rc) AS BIGINT) AS records,
               CAST(sum(sz) AS BIGINT) AS bytes
        FROM d GROUP BY action ORDER BY action
    """,
        "meta_files",
    ),
    tags=("maintenance",),
    doc="Rollback plan to a target snapshot: the files to RESTORE (in "
    "target, not current) and REMOVE (in current, not target) with "
    "record/byte totals — J1's one-full-outer-join diff pointed backwards, "
    "summarized as the action list `rollback_to_snapshot` would execute; "
    "per-path contributions pre-aggregated so duplicate paths can't "
    "double-classify",
)
def meta_rollback_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark import api

    return api.rollback_plan(
        api.FixtureSource(spark, sf_dir), current=2, target=1
    )

@register(
    "meta_pruning_after_zorder",
    oracle=oracle_query(
        f"""
        , stats AS (SELECT min(lo) AS lo_min, max(lo) AS lo_max,
                           min(hi - lo) AS sp_min, max(hi - lo) AS sp_max
                    FROM file_ranges),
        scaled AS (SELECT file_path, lo, hi,
                          CAST((lo - lo_min) * {_Z_TOP} // greatest(lo_max - lo_min, 1) AS BIGINT) AS x,
                          CAST((hi - lo - sp_min) * {_Z_TOP} // greatest(sp_max - sp_min, 1) AS BIGINT) AS y
                   FROM file_ranges, stats),
        rewritten AS (SELECT ({{INTERLEAVE}}) >> {_Z_SHIFT} AS zbucket,
                             CAST(min(lo) AS BIGINT) AS lo, CAST(max(hi) AS BIGINT) AS hi,
                             CAST(count(*) AS BIGINT) AS n_files
                      FROM scaled GROUP BY zbucket)
        SELECT (hi < 1200 OR lo > 1500) AS skippable,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(n_files) AS BIGINT) AS n_files,
               CAST(sum(hi - lo) AS BIGINT) AS total_span
        FROM rewritten GROUP BY skippable ORDER BY skippable
        """,
        "file_ranges",
    ).replace("{INTERLEAVE}", _interleave_expr("x", "y", _Z_BITS)),
    tags=("maintenance",),
    doc="Pruning effectiveness AFTER a Z-order rewrite: each zbucket "
    "becomes one rewritten file whose zone map is the bucket-wide "
    "[min lo, max hi]; the same [1200, 1500] predicate's skippability "
    "over the rewritten layout is directly comparable to "
    "meta_pruning_preview's before-picture — the measurable WHY of the "
    "clustering planners; one bounds aggregate + map-side codes + "
    "bucket-grain aggregates",
)
def meta_pruning_after_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = derive(spark, sf_dir, "file_ranges")
    stats = fr.select(F.col("lo"), (F.col("hi") - F.col("lo")).alias("span")).agg(
        F.min("lo").alias("lo_min"),
        F.max("lo").alias("lo_max"),
        F.min("span").alias("sp_min"),
        F.max("span").alias("sp_max"),
    )
    scaled = (
        fr.crossJoin(F.broadcast(stats))
        .withColumn(
            "x",
            F.expr(f"CAST((lo - lo_min) * {_Z_TOP} DIV greatest(lo_max - lo_min, 1) AS BIGINT)"),
        )
        .withColumn(
            "y",
            F.expr(
                f"CAST((hi - lo - sp_min) * {_Z_TOP} DIV greatest(sp_max - sp_min, 1) AS BIGINT)"
            ),
        )
    )
    rewritten = (
        scaled.withColumn(
            "zbucket", F.expr(f"({_interleave_expr('x', 'y', _Z_BITS)}) >> {_Z_SHIFT}")
        )
        .groupBy("zbucket")
        .agg(
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.count(F.lit(1)).alias("n_files"),
        )
    )
    return (
        rewritten.withColumn("skippable", (F.col("hi") < 1200) | (F.col("lo") > 1500))
        .groupBy("skippable")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("n_files").alias("n_files"),
            F.sum(F.col("hi") - F.col("lo")).alias("total_span"),
        )
        .orderBy("skippable")
    )

@register(
    "meta_incremental_partition_stats",
    oracle=oracle_query(
        """
        , c1 AS (SELECT part_key, file_path, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(record_count) AS BIGINT) AS record_count,
                   CAST(sum(file_size_in_bytes) AS BIGINT) AS file_size_in_bytes
                 FROM meta_files WHERE snapshot_id = 1 GROUP BY part_key, file_path),
        c2 AS (SELECT part_key, file_path, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(record_count) AS BIGINT) AS record_count,
                 CAST(sum(file_size_in_bytes) AS BIGINT) AS file_size_in_bytes
               FROM meta_files WHERE snapshot_id = 2 GROUP BY part_key, file_path),
        d AS (SELECT part_key,
                coalesce(c2.n, 0) - coalesce(c1.n, 0) AS d_n,
                coalesce(c2.record_count, 0) - coalesce(c1.record_count, 0) AS d_record_count,
                coalesce(c2.file_size_in_bytes, 0) - coalesce(c1.file_size_in_bytes, 0) AS d_file_size_in_bytes
              FROM c2 FULL JOIN c1 USING (part_key, file_path)
              WHERE coalesce(c2.n, 0) <> coalesce(c1.n, 0)
                 OR coalesce(c2.record_count, 0) <> coalesce(c1.record_count, 0)
                 OR coalesce(c2.file_size_in_bytes, 0) <> coalesce(c1.file_size_in_bytes, 0)),
        dg AS (SELECT part_key, CAST(sum(d_n) AS BIGINT) AS d_n,
                 CAST(sum(d_record_count) AS BIGINT) AS d_record_count,
                 CAST(sum(d_file_size_in_bytes) AS BIGINT) AS d_file_size_in_bytes
               FROM d GROUP BY part_key),
        og AS (SELECT part_key, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(record_count) AS BIGINT) AS record_count,
                 CAST(sum(file_size_in_bytes) AS BIGINT) AS file_size_in_bytes
               FROM meta_files WHERE snapshot_id = 1 GROUP BY part_key)
        SELECT part_key,
               CAST(coalesce(og.n, 0) + coalesce(dg.d_n, 0) AS BIGINT) AS n_files,
               CAST(coalesce(og.record_count, 0) + coalesce(dg.d_record_count, 0) AS BIGINT) AS records,
               CAST(coalesce(og.file_size_in_bytes, 0) + coalesce(dg.d_file_size_in_bytes, 0) AS BIGINT) AS bytes,
               CAST(coalesce(dg.d_n, 0) AS BIGINT) AS d_files,
               CAST(coalesce(dg.d_record_count, 0) AS BIGINT) AS d_records,
               CAST(coalesce(dg.d_file_size_in_bytes, 0) AS BIGINT) AS d_bytes
        FROM og FULL JOIN dg USING (part_key)
        ORDER BY part_key
        """,
        "meta_files",
    ),
    tags=("maintenance",),
    doc="Incremental view maintenance of per-partition stats: the new "
    "snapshot's numbers computed as old stats + the signed delta of "
    "changed (partition, file) contributions — the refresh touches only "
    "the delta frontier (at deployment scale Iceberg hands you exactly the "
    "new snapshot's manifests), never rescans the old snapshot's wide "
    "data. SUM/COUNT aggregates only (the self-maintainable class); the "
    "d_* columns expose how much work the refresh applied. The oracle "
    "replays the identical algebra, and the unit test pins the result "
    "equal to a full recompute at the new snapshot",
)
def meta_incremental_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.incremental import incremental_group_stats

    files = derive(spark, sf_dir, "meta_files")
    old = files.filter(F.col("snapshot_id") == 1)
    new = files.filter(F.col("snapshot_id") == 2)
    out = incremental_group_stats(
        old, new, "part_key", "file_path", ("record_count", "file_size_in_bytes")
    )
    return out.select(
        "part_key",
        F.col("n").alias("n_files"),
        F.col("record_count").alias("records"),
        F.col("file_size_in_bytes").alias("bytes"),
        F.col("d_n").alias("d_files"),
        F.col("d_record_count").alias("d_records"),
        F.col("d_file_size_in_bytes").alias("d_bytes"),
    ).orderBy("part_key")

from iceberg_meta_spark.operators.lineage import files_asof  # noqa: E402

from iceberg_meta_spark.sources.fixtures import cte_sql, derive  # noqa: E402

@register(
    "meta_files_asof",
    oracle="WITH RECURSIVE meta_files AS ("
    + cte_sql("meta_files", "duckdb")
    + """),
        nodes AS (
            SELECT event_id AS snapshot_id,
                   CASE WHEN event_id % 64 = 0 THEN NULL
                        ELSE event_id - 1 END AS parent_id
            FROM events),
        walk AS (
            SELECT snapshot_id, snapshot_id AS cur, 0 AS depth FROM nodes
            UNION ALL
            SELECT w.snapshot_id, n.parent_id, w.depth + 1
            FROM walk w JOIN nodes n ON n.snapshot_id = w.cur
            WHERE n.parent_id IS NOT NULL),
        anc AS (SELECT w.snapshot_id, w.cur AS root_id, w.depth
                FROM walk w JOIN nodes n ON n.snapshot_id = w.cur
                WHERE n.parent_id IS NULL),
        anchor AS (SELECT root_id AS as_of_root, depth AS as_of_depth
                   FROM anc WHERE snapshot_id = 1),
        visible AS (SELECT a.snapshot_id FROM anc a, anchor
                    WHERE a.root_id = anchor.as_of_root
                      AND a.depth <= anchor.as_of_depth)
        SELECT part_key, CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(file_size_in_bytes) AS BIGINT) AS total_bytes,
               CAST(sum(record_count) AS BIGINT) AS total_records
        FROM meta_files JOIN visible USING (snapshot_id)
        GROUP BY part_key ORDER BY part_key
    """,
    doc="Time-travel state reconstruction: the per-partition file inventory "
    "visible AS OF snapshot 1 — visibility from the pointer-doubled lineage "
    "frame (ancestor iff same root and depth <= as-of depth; exact for "
    "chain forests), the file table scanned ONCE and semi-filtered by the "
    "broadcast visible-snapshot set; the oracle replays the walk with a "
    "recursive CTE",
)
def meta_files_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = derive(spark, sf_dir, "meta_files")
    nodes = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("snapshot_id"),
        F.when(F.col("event_id") % 64 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("event_id") - 1)
        .alias("parent_id"),
    )
    return files_asof(files, nodes, as_of=1)

from iceberg_meta_spark.operators.snapshots import snapshot_growth  # noqa: E402

@register(
    "meta_snapshot_growth",
    oracle="WITH meta_snapshots AS ("
    + cte_sql("meta_snapshots", "duckdb")
    + """),
        child AS (SELECT snapshot_id, parent_id, operation,
                    total_files_size AS size_now,
                    total_data_files AS files_now,
                    total_records AS records_now
                  FROM meta_snapshots),
        parent AS (SELECT snapshot_id AS parent_id,
                     total_files_size AS size_prev,
                     total_data_files AS files_prev,
                     total_records AS records_prev
                   FROM meta_snapshots)
        SELECT c.snapshot_id, c.operation,
               CAST(c.size_now - p.size_prev AS BIGINT) AS size_delta,
               CAST(c.files_now - p.files_prev AS BIGINT) AS files_delta,
               CAST(c.records_now - p.records_prev AS BIGINT) AS records_delta
        FROM child c JOIN parent p USING (parent_id)
        ORDER BY abs(c.size_now - p.size_prev) DESC, c.snapshot_id
        LIMIT 20
    """,
    doc="Per-commit storage growth: each snapshot's size/files/records "
    "delta vs its parent via ONE self-equi-join on the parent pointer — "
    "deliberately not a cumulative window (a 10^6-commit chain would "
    "funnel); top-20 largest commits by absolute size delta",
)
def meta_snapshot_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return snapshot_growth(derive(spark, sf_dir, "meta_snapshots"), k=20)

from iceberg_meta_spark.operators.maintenance import manifest_rewrite_plan  # noqa: E402

@register(
    "meta_manifest_rewrite",
    oracle="WITH meta_manifests AS ("
    + cte_sql("meta_manifests", "duckdb")
    + """),
        small AS (SELECT * FROM meta_manifests
                  WHERE content = 0 AND manifest_length < 1048576),
        offs AS (SELECT snapshot_id, partition_spec_id, manifest_length,
                   added_files_count, existing_files_count,
                   sum(manifest_length) OVER (
                     PARTITION BY snapshot_id, partition_spec_id
                     ORDER BY manifest_path, manifest_length
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
                 FROM small),
        grouped AS (SELECT snapshot_id, partition_spec_id,
                      (end_off - manifest_length) // 8388608 AS group_id,
                      manifest_length, added_files_count, existing_files_count
                    FROM offs)
        SELECT snapshot_id, partition_spec_id, CAST(group_id AS BIGINT) AS group_id,
               CAST(count(*) AS BIGINT) AS n_manifests,
               CAST(sum(manifest_length) AS BIGINT) AS group_bytes,
               CAST(sum(added_files_count + existing_files_count) AS BIGINT) AS group_files
        FROM grouped
        GROUP BY snapshot_id, partition_spec_id, group_id
        HAVING count(*) > 1
        ORDER BY snapshot_id, partition_spec_id, group_id
    """,
    tags=("maintenance",),
    doc="Manifest rewrite planning (Iceberg rewrite_manifests): bin-pack "
    "small data manifests into ~8 MiB rewrite groups per (snapshot, spec) "
    "— greedy first-fit via one partitioned cumulative-sum window, "
    "delete manifests excluded, singleton groups dropped",
)
def meta_manifest_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return manifest_rewrite_plan(derive(spark, sf_dir, "meta_manifests"))

@register(
    "meta_spec_migration",
    oracle="WITH meta_manifests AS ("
    + cte_sql("meta_manifests", "duckdb")
    + """),
        per AS (SELECT snapshot_id, partition_spec_id,
                  CAST(count(*) AS BIGINT) AS n_manifests
                FROM meta_manifests GROUP BY 1, 2),
        tot AS (SELECT snapshot_id, CAST(sum(n_manifests) AS BIGINT) AS total
                FROM per GROUP BY 1)
        SELECT p.snapshot_id, p.partition_spec_id, p.n_manifests,
               CAST((p.n_manifests * 1000) // t.total AS BIGINT) AS share_permille
        FROM per p JOIN tot t USING (snapshot_id)
        ORDER BY snapshot_id, partition_spec_id
    """,
    doc="Partition-evolution rollout tracking: per snapshot, each partition "
    "spec's manifest count and permille share — the migration-progress "
    "view after an ALTER TABLE partition change; two shrinking aggregates "
    "plus an equi-join on the snapshot key, no window",
)
def meta_spec_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    mans = derive(spark, sf_dir, "meta_manifests")
    per = mans.groupBy("snapshot_id", "partition_spec_id").agg(
        F.count(F.lit(1)).alias("n_manifests")
    )
    tot = per.groupBy("snapshot_id").agg(F.sum("n_manifests").alias("total"))
    return (
        per.join(tot, "snapshot_id")
        .select(
            "snapshot_id",
            "partition_spec_id",
            "n_manifests",
            F.expr("CAST((n_manifests * 1000) DIV total AS BIGINT)").alias("share_permille"),
        )
        .orderBy("snapshot_id", "partition_spec_id")
    )

_SIZE_BUCKETS = (
    ("lt_1MiB", 0, 1 << 20),
    ("1_4MiB", 1 << 20, 4 << 20),
    ("4_16MiB", 4 << 20, 16 << 20),
    ("16_64MiB", 16 << 20, 64 << 20),
    ("64_256MiB", 64 << 20, 256 << 20),
    ("ge_256MiB", 256 << 20, 1 << 62),
)

def _bucket_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} >= {lo} AND {col} < {hi} THEN '{name}'"
        for name, lo, hi in _SIZE_BUCKETS
    )
    return f"CASE {whens} END"

@register(
    "meta_file_size_histogram",
    oracle="WITH meta_files AS ("
    + cte_sql("meta_files", "duckdb")
    + f"""),
        b AS (SELECT {_bucket_case('file_size_in_bytes')} AS bucket,
                     file_size_in_bytes FROM meta_files),
        cnt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_files,
                  CAST(sum(file_size_in_bytes) AS BIGINT) AS bucket_bytes
                FROM b GROUP BY bucket),
        tot AS (SELECT CAST(sum(n_files) AS BIGINT) AS total FROM cnt)
        SELECT bucket, n_files, bucket_bytes,
               CAST((n_files * 1000) // total AS BIGINT) AS share_permille
        FROM cnt, tot ORDER BY bucket
    """,
    doc="File-size distribution in fixed power-of-4 buckets (the files "
    "dashboard's histogram; small-file pressure at a glance): pure CASE "
    "bucketing, one shrinking aggregate, broadcast 1-row total",
)
def meta_file_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = derive(spark, sf_dir, "meta_files")
    b = files.select(
        F.expr(_bucket_case("file_size_in_bytes")).alias("bucket"),
        "file_size_in_bytes",
    )
    cnt = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("file_size_in_bytes").alias("bucket_bytes"),
    )
    tot = cnt.agg(F.sum("n_files").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_files",
            "bucket_bytes",
            F.expr("CAST((n_files * 1000) DIV total AS BIGINT)").alias("share_permille"),
        )
        .orderBy("bucket")
    )

@register(
    "meta_partition_fragmentation",
    oracle="WITH meta_files AS ("
    + cte_sql("meta_files", "duckdb")
    + """),
        per AS (SELECT part_key, CAST(count(*) AS BIGINT) AS n_files,
                  CAST(sum(file_size_in_bytes) AS BIGINT) AS total_bytes
                FROM meta_files GROUP BY part_key)
        SELECT part_key, n_files, total_bytes,
               CAST(greatest(total_bytes // 134217728, 1) AS BIGINT) AS ideal_files,
               CAST((n_files * 1000) // greatest(total_bytes // 134217728, 1) AS BIGINT)
                 AS fragmentation_permille
        FROM per ORDER BY fragmentation_permille DESC, part_key
    """,
    tags=("maintenance",),
    doc="Partition fragmentation score: actual file count vs the ideal at "
    "a 128 MiB target (1000 = perfectly sized; higher = small-file "
    "pressure, the compaction trigger metric); one shrinking aggregate",
)
def meta_partition_fragmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = derive(spark, sf_dir, "meta_files")
    per = files.groupBy("part_key").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("file_size_in_bytes").alias("total_bytes"),
    )
    return per.select(
        "part_key",
        "n_files",
        "total_bytes",
        F.expr("CAST(greatest(total_bytes DIV 134217728, 1) AS BIGINT)").alias("ideal_files"),
        F.expr(
            "CAST((n_files * 1000) DIV greatest(total_bytes DIV 134217728, 1) AS BIGINT)"
        ).alias("fragmentation_permille"),
    ).orderBy(F.desc("fragmentation_permille"), "part_key")

@register(
    "meta_commit_cadence",
    oracle="WITH meta_snapshots AS ("
    + cte_sql("meta_snapshots", "duckdb")
    + """),
        keyed AS (SELECT (committed_us // 3600000000) % 24 AS hod
                  FROM meta_snapshots),
        cnt AS (SELECT hod, CAST(count(*) AS BIGINT) AS n_commits
                FROM keyed GROUP BY hod),
        tot AS (SELECT CAST(sum(n_commits) AS BIGINT) AS total FROM cnt)
        SELECT CAST(hod AS BIGINT) AS hod, n_commits,
               CAST((n_commits * 1000) // total AS BIGINT) AS share_permille
        FROM cnt, tot ORDER BY hod
    """,
    doc="Commit cadence by hour of day over the snapshot log — the ops "
    "view for scheduling maintenance into quiet windows; integer epoch "
    "math, one shrinking aggregate",
)
def meta_commit_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    snaps = derive(spark, sf_dir, "meta_snapshots")
    keyed = snaps.select(F.expr("(committed_us DIV 3600000000) % 24").alias("hod"))
    cnt = keyed.groupBy("hod").agg(F.count(F.lit(1)).alias("n_commits"))
    tot = cnt.agg(F.sum("n_commits").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            F.col("hod").cast("long").alias("hod"),
            "n_commits",
            F.expr("CAST((n_commits * 1000) DIV total AS BIGINT)").alias("share_permille"),
        )
        .orderBy("hod")
    )

from iceberg_meta_spark.operators.maintenance import equality_delete_plan  # noqa: E402

_DELETE_FIELD = 3

_DELETE_KEYS = [40, 750, 1500, 999999]  # one key beyond every bound: provably clean

@register(
    "meta_delete_plan",
    oracle=oracle_query(
        f"""
        , hits AS (
            SELECT file_path,
                   CAST(len(list_filter([{", ".join(map(str, _DELETE_KEYS))}],
                        k -> k >= lower_bound AND k <= upper_bound)) AS BIGINT)
                     AS n_candidate_keys
            FROM meta_column_stats WHERE field_id = {_DELETE_FIELD})
        SELECT h.file_path, h.n_candidate_keys,
               CAST(f.file_size_in_bytes AS BIGINT) AS rewrite_bytes,
               CAST(f.record_count AS BIGINT) AS rows_upper_bound
        FROM hits h JOIN meta_files f USING (file_path)
        WHERE h.n_candidate_keys > 0
        ORDER BY h.file_path
        """,
        "meta_files",
        "meta_column_stats",
    ),
    tags=("maintenance",),
    doc="Right-to-be-forgotten / equality-delete planning: the file set a "
    "GDPR erasure of the subject keys must rewrite, judged purely from "
    "per-file zone maps (lower/upper bounds) — files whose bounds exclude "
    "every key are provably clean and skipped, the same zone-map argument "
    "data skipping makes query-side. The deletion batch is an array "
    "literal, so containment is pure map-side array arithmetic over the "
    "stats table (no join, no shuffle); the only exchange attaches "
    "rewrite costs by file_path. One stats-table scan at any file count",
)
def meta_delete_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return equality_delete_plan(
        derive(spark, sf_dir, "meta_column_stats"),
        derive(spark, sf_dir, "meta_files"),
        field_id=_DELETE_FIELD,
        subject_keys=_DELETE_KEYS,
    )

_SPLIT_TARGET = 32 * 1024 * 1024  # Iceberg read.split target-size

@register(
    "meta_scan_tasks",
    tags=("maintenance",),
    oracle=oracle_query(
        f"""
        , per_file AS (
            SELECT part_key, file_size_in_bytes,
                   greatest(CAST(1 AS BIGINT),
                            (file_size_in_bytes + {_SPLIT_TARGET - 1}) // {_SPLIT_TARGET})
                       AS n_splits,
                   least(file_size_in_bytes, CAST({_SPLIT_TARGET} AS BIGINT))
                       AS first_split_bytes
            FROM meta_files WHERE snapshot_id = 2),
        agg AS (
            SELECT part_key,
                   CAST(count(*) AS BIGINT) AS n_files,
                   CAST(sum(file_size_in_bytes) AS BIGINT) AS total_bytes,
                   CAST(sum(n_splits) AS BIGINT) AS n_splits,
                   CAST(max(first_split_bytes) AS BIGINT) AS max_split_bytes
            FROM per_file GROUP BY part_key)
        SELECT part_key, n_files, total_bytes, n_splits,
               CAST((total_bytes + {_SPLIT_TARGET - 1}) // {_SPLIT_TARGET} AS BIGINT)
                   AS ideal_tasks,
               CAST(n_splits - ((total_bytes + {_SPLIT_TARGET - 1}) // {_SPLIT_TARGET})
                    AS BIGINT) AS overhead_splits,
               max_split_bytes
        FROM agg ORDER BY part_key
        """,
        "meta_files",
    ),
    doc="Read-side split planning (Iceberg TableScan.planFiles semantics, "
    "read.split target-size 32 MiB): per-partition scan-task counts for "
    "the current snapshot — total splits, the ceil(bytes/target) ideal, "
    "the overhead paid to file boundaries (the read-amplification signal "
    "that feeds meta_compaction_plan), and the straggler-bounding max "
    "split. Split math is closed-form integer column arithmetic (no row "
    "explosion): one scan + one hash aggregate at any file count. The "
    "reference lists per-file sizes (formatters.py:263-281) but never "
    "plans the read",
)
def meta_scan_tasks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.scan_task_plan(
        derive(spark, sf_dir, "meta_files"),
        target_bytes=_SPLIT_TARGET,
        snapshot_id=2,
    )

@register(
    "meta_clustering_depth",
    tags=("maintenance", "bench"),
    oracle=oracle_query(
        """
        , ev AS (SELECT field_id, lower_bound AS v, CAST(1 AS BIGINT) AS delta
                 FROM meta_column_stats
                 UNION ALL
                 SELECT field_id, upper_bound, CAST(-1 AS BIGINT)
                 FROM meta_column_stats),
        d AS (SELECT field_id,
                     sum(delta) OVER (PARTITION BY field_id ORDER BY v, delta DESC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS depth
              FROM ev)
        SELECT field_id,
               CAST(count(*) // 2 AS BIGINT) AS n_files,
               CAST(max(depth) AS BIGINT) AS max_depth,
               CAST(sum(depth) * 1000 // count(*) AS BIGINT) AS avg_depth_permille
        FROM d GROUP BY field_id ORDER BY field_id
    """,
        "meta_column_stats",
    ),
    doc="Per-column clustering depth from file zone maps — the layout-"
    "quality metric behind sort/z-order decisions (Delta OPTIMIZE ZORDER "
    "reports the same number): sweep each field's [lower,upper] bounds as "
    "+1/-1 events; the running sum is how many files a point query on "
    "that value must open (max = worst case, 1 = perfectly clustered). "
    "Scale shape: bucketed two-level running SUM — local prefix sums in "
    "(field, value-bucket) window partitions plus a bucket-grain net "
    "prefix broadcast back (the overlap_sweepline trick) — so no field "
    "ever funnels its full event list through one sort task. The "
    "reference reads the same bounds (formatters.py:522-540) but never "
    "derives a layout metric",
)
def meta_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.clustering_depth(derive(spark, sf_dir, "meta_column_stats"))

_RET_KEEP_LAST = 5

_RET_ALL_HOURS = 24

_RET_DAILY_DAYS = 30

_RET_WEEKLY_WEEKS = 12

_DAY_US = 86_400_000_000

_WEEK_US = 7 * _DAY_US

@register(
    "meta_retention_policy",
    oracle=oracle_query(
        f"""
        , keyed AS (
            SELECT snapshot_id, committed_us,
                   committed_us // {_DAY_US} AS day_idx,
                   committed_us // {_WEEK_US} AS week_idx
            FROM meta_snapshots),
        ranked AS (
            SELECT *,
                   row_number() OVER (ORDER BY committed_us DESC, snapshot_id DESC)
                       AS recency_rank,
                   row_number() OVER (PARTITION BY day_idx
                       ORDER BY committed_us DESC, snapshot_id DESC) AS day_rank,
                   row_number() OVER (PARTITION BY week_idx
                       ORDER BY committed_us DESC, snapshot_id DESC) AS week_rank
            FROM keyed),
        flagged AS (
            SELECT snapshot_id, committed_us,
                   CAST(recency_rank AS BIGINT) AS recency_rank,
                   recency_rank <= {_RET_KEEP_LAST} AS keep_lastk,
                   committed_us >= {_EXPIRY_NOW_US - _RET_ALL_HOURS * 3_600_000_000}
                       AS keep_recent,
                   day_rank = 1 AND day_idx >= {_EXPIRY_NOW_US // _DAY_US - _RET_DAILY_DAYS}
                       AS keep_daily,
                   week_rank = 1 AND week_idx >= {_EXPIRY_NOW_US // _WEEK_US - _RET_WEEKLY_WEEKS}
                       AS keep_weekly
            FROM ranked)
        SELECT snapshot_id, committed_us, recency_rank,
               (keep_lastk OR keep_recent OR keep_daily OR keep_weekly) AS keep,
               CASE WHEN (keep_lastk OR keep_recent OR keep_daily OR keep_weekly)
                    THEN concat_ws(',',
                         CASE WHEN keep_lastk THEN 'last-k' END,
                         CASE WHEN keep_recent THEN 'recent' END,
                         CASE WHEN keep_daily THEN 'daily' END,
                         CASE WHEN keep_weekly THEN 'weekly' END)
                    ELSE 'expire' END AS reasons
        FROM flagged
        ORDER BY recency_rank
        """,
        "meta_snapshots",
    ),
    tags=("maintenance",),
    doc="GFS (grandfather-father-son) retention simulation over the "
    "snapshot log (operators/maintenance.py:retention_policy): keep the "
    "last 5, everything younger than 24h, the last snapshot of each UTC "
    "day for 30 days, and the last of each week for 12 weeks — one "
    "verdict row per snapshot with the reasons it survives. The dry-run "
    "before an irreversible expireSnapshots; generalizes "
    "meta_snapshot_expiry's keep-last-AND-max-age into tiered retention. "
    "Day/week last-of-period windows are period-partitioned; the recency "
    "rank is the same metadata-sized global window snapshot_expiry uses",
)
def meta_retention_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.maintenance import retention_policy

    return retention_policy(
        derive(spark, sf_dir, "meta_snapshots"),
        now_us=_EXPIRY_NOW_US,
        keep_last=_RET_KEEP_LAST,
        keep_all_hours=_RET_ALL_HOURS,
        daily_days=_RET_DAILY_DAYS,
        weekly_weeks=_RET_WEEKLY_WEEKS,
    ).orderBy("recency_rank")

_SYNC_DRIFT_MS = 14 * 86_400_000  # tables of one pipeline should commit within 2 weeks

@register(
    "meta_namespace_sync_drift",
    oracle=oracle_query(
        f"""
        , agg AS (
            SELECT namespace,
                   CAST(count(*) AS BIGINT) AS n_tables,
                   CAST(max(last_updated_ms) AS BIGINT) AS newest_ms,
                   CAST(min(last_updated_ms) AS BIGINT) AS oldest_ms
            FROM meta_tables GROUP BY namespace),
        lag AS (
            SELECT namespace,
                   (SELECT t.table_name FROM meta_tables t
                    WHERE t.namespace = agg.namespace
                    ORDER BY t.last_updated_ms ASC, t.table_name DESC LIMIT 1)
                       AS laggard_table
            FROM agg)
        SELECT agg.namespace, n_tables, newest_ms, oldest_ms,
               CAST(newest_ms - oldest_ms AS BIGINT) AS drift_ms,
               lag.laggard_table,
               newest_ms - oldest_ms > {_SYNC_DRIFT_MS} AS out_of_sync
        FROM agg JOIN lag USING (namespace)
        ORDER BY drift_ms DESC, namespace
        """,
        "meta_tables",
    ),
    tags=("maintenance",),
    doc="Multi-table sync-drift audit: tables written by one pipeline "
    "(sharing a namespace) should commit together — the spread between a "
    "namespace's newest and oldest last-commit, the laggard table by name, "
    "and an out-of-sync flag. The cross-table consistency check "
    "meta_stalest_tables (per-table freshness) cannot express; one tiny "
    "groupBy + a min-struct laggard pick, no window",
)
def meta_namespace_sync_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = derive(spark, sf_dir, "meta_tables")
    agg = t.groupBy("namespace").agg(
        F.count(F.lit(1)).alias("n_tables"),
        F.max("last_updated_ms").alias("newest_ms"),
        F.min("last_updated_ms").alias("oldest_ms"),
        # laggard = oldest commit; ties broken toward the GREATER name to
        # mirror ORDER BY ts ASC, name DESC (min-struct on (ts, neg-name)
        # is not expressible — use max(struct(-ts, name)) instead)
        F.max(F.struct((-F.col("last_updated_ms")).alias("neg_ts"), F.col("table_name")))
        .getField("table_name")
        .alias("laggard_table"),
    )
    return agg.select(
        "namespace",
        "n_tables",
        "newest_ms",
        "oldest_ms",
        (F.col("newest_ms") - F.col("oldest_ms")).alias("drift_ms"),
        "laggard_table",
        ((F.col("newest_ms") - F.col("oldest_ms")) > _SYNC_DRIFT_MS).alias("out_of_sync"),
    ).orderBy(F.desc("drift_ms"), "namespace")

@register(
    "meta_file_median_bisect",
    oracle=oracle_query(
        """
        SELECT CAST(count(*) AS BIGINT) AS n_files,
               CAST(median(file_size_in_bytes) AS DOUBLE) AS median_size
        FROM meta_files
        """,
        "meta_files",
    ),
    doc="EXACT file-size median by histogram refinement (operators/"
    "selection.py): the third path through the A1 percentile-buffer "
    "cliff — O(log_1024(range)) column-pruned scans and O(1024) driver "
    "memory instead of buffering every value (exact twin) or giving up "
    "exactness (approx twin). Bit-equal to SQL median at any scale; the "
    "even-count contract averages the two middle order statistics",
)
def meta_file_median_bisect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.selection import exact_median

    files = derive(spark, sf_dir, "meta_files")
    n = files.filter(F.col("file_size_in_bytes").isNotNull()).count()
    med = exact_median(files, "file_size_in_bytes")
    return spark.createDataFrame(
        [(n, med)], "n_files long, median_size double"
    )
