"""User-facing command API: the reference's CLI surface as DataFrame-returning
functions (reference cli.py commands -> §2.11 kernel DAGs).

A user of the reference runs ``iceberg-meta summary|health|diff|tree|
snapshot-detail|schema --history|namespaces|warehouse|snapshots --watch``;
each has a function here with the same output columns, composed from the
source-agnostic kernels in ``operators/``. Rendering (Rich tables, JSON/CSV)
is presentation-side: collect the returned DataFrame or pass it to
``sources.sinks`` — every function below stays lazy and distributed.

Sources implement the small ``MetadataSource`` protocol. ``FixtureSource``
derives metadata shapes from the driver's parquet testdata;
``IcebergTableSource`` reads a real table's metadata tree through
``sources/iceberg.py`` when the Iceberg Spark runtime is present;
``NativeTableSource`` reads the same tree with NO jar and NO pyiceberg —
spec-derived metadata-JSON + Avro-manifest parsing (``sources/
iceberg_native.py``), manifests decoded distributed via binaryFile +
mapInPandas.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark import operators as ops
from iceberg_meta_spark.functions import display
from iceberg_meta_spark.plans.health import health_report_df
from iceberg_meta_spark.sources import fixtures
from iceberg_meta_spark.sources import iceberg as ice


class MetadataSource(Protocol):
    """One inspected table's metadata tree as DataFrames (SURVEY §1.1)."""

    def files(self, snapshot_id: int | None = None) -> DataFrame: ...
    def snapshots(self) -> DataFrame: ...
    def manifests(self) -> DataFrame: ...
    def column_stats(self) -> DataFrame: ...
    def file_ranges(self) -> DataFrame: ...
    def schema_fields(self) -> DataFrame: ...


@dataclass
class FixtureSource:
    """Metadata shapes derived from the driver's parquet testdata."""

    spark: SparkSession
    sf_dir: str

    def files(self, snapshot_id: int | None = None) -> DataFrame:
        f = fixtures.derive(self.spark, self.sf_dir, "meta_files")
        return f if snapshot_id is None else f.filter(F.col("snapshot_id") == snapshot_id)

    def snapshots(self) -> DataFrame:
        return fixtures.derive(self.spark, self.sf_dir, "meta_snapshots")

    def manifests(self) -> DataFrame:
        return fixtures.derive(self.spark, self.sf_dir, "meta_manifests")

    def column_stats(self) -> DataFrame:
        return fixtures.derive(self.spark, self.sf_dir, "meta_column_stats")

    def file_ranges(self) -> DataFrame:
        return fixtures.derive(self.spark, self.sf_dir, "file_ranges")

    def schema_fields(self) -> DataFrame:
        return fixtures.derive(self.spark, self.sf_dir, "meta_schema_fields")


@dataclass
class IcebergTableSource:
    """A real Iceberg table's metadata tree (requires the runtime jar).

    ``range_column`` names the column whose ``readable_metrics`` bounds feed
    the overlap kernels (the reference uses the first partition column,
    formatters.py:606-658). ``metadata_location`` points at the table-metadata
    JSON for schema-version queries (from the catalog's
    ``.metadata_log_entries`` or a REST catalog response).
    """

    spark: SparkSession
    table: str
    range_column: str | None = None
    metadata_location: str | None = None

    def files(self, snapshot_id: int | None = None) -> DataFrame:
        return ice.files_frame(self.spark, self.table, snapshot_id)

    def snapshots(self) -> DataFrame:
        return ice.snapshots_frame(self.spark, self.table)

    def manifests(self) -> DataFrame:
        return ice.manifests_frame(self.spark, self.table)

    def column_stats(self) -> DataFrame:
        return ice.column_stats_frame(self.spark, self.table)

    def file_ranges(self) -> DataFrame:
        if not self.range_column:
            raise ValueError(
                "IcebergTableSource needs range_column=<col> to derive file "
                "ranges from readable_metrics.<col>.lower_bound/upper_bound"
            )
        return ice.file_ranges_frame(self.spark, self.table, self.range_column)

    def schema_fields(self) -> DataFrame:
        if not self.metadata_location:
            raise ValueError(
                "IcebergTableSource needs metadata_location=<table-metadata "
                "JSON path> to enumerate schema versions"
            )
        meta = ice.load_table_metadata(self.spark, self.metadata_location)
        return ice.schema_fields_from_metadata(self.spark, meta, self.table)


@dataclass
class NativeTableSource:
    """A real Iceberg table's metadata tree WITHOUT the runtime jar:
    spec-derived parsing of the metadata JSON + Avro manifests
    (sources/iceberg_native.py). ``table_dir`` is the table root (the
    directory holding ``metadata/``); ``range_field_id`` names the int/long
    field whose bounds feed the overlap kernels (J3/W6)."""

    spark: SparkSession
    table_dir: str
    range_field_id: int | None = None
    range_type: str = "long"

    def _md(self) -> dict:
        if not hasattr(self, "_md_cache"):
            from iceberg_meta_spark.sources import iceberg_native as nat

            self._md_cache = nat.load_table_metadata(self.spark, self.table_dir)
        return self._md_cache

    def files(self, snapshot_id: int | None = None) -> DataFrame:
        from iceberg_meta_spark.sources import iceberg_native as nat

        return nat.native_files_frame(self.spark, self.table_dir, snapshot_id, self._md())

    def snapshots(self) -> DataFrame:
        from iceberg_meta_spark.sources import iceberg_native as nat

        return nat.native_snapshots_frame(self.spark, self.table_dir, self._md())

    def manifests(self) -> DataFrame:
        from iceberg_meta_spark.sources import iceberg_native as nat

        return nat.native_manifests_frame(self.spark, self.table_dir, metadata=self._md())

    def column_stats(self) -> DataFrame:
        from iceberg_meta_spark.sources import iceberg_native as nat

        return nat.native_column_stats_typed(self.spark, self.table_dir, metadata=self._md())

    def file_ranges(self) -> DataFrame:
        from iceberg_meta_spark.sources import iceberg_native as nat

        if self.range_field_id is None:
            raise ValueError(
                "NativeTableSource needs range_field_id=<field id> to derive "
                "file ranges from the manifest bound maps"
            )
        return nat.native_file_ranges(
            self.spark, self.table_dir, self.range_field_id, self.range_type
        )

    def schema_fields(self) -> DataFrame:
        name = self.table_dir.rstrip("/").rsplit("/", 1)[-1]
        return ice.schema_fields_from_metadata(self.spark, self._md(), name)


# ---------------------------------------------------------------------------
# Commands (reference cli.py -> §2.11 DAGs)
# ---------------------------------------------------------------------------

def summary(src: MetadataSource) -> DataFrame:
    """`iceberg-meta summary` (cli.py:1194-1207): dashboard totals.

    One row: file/record/size totals (A8) + partition count + snapshot count.
    """
    totals = ops.summary_totals(src.files())
    snap_count = src.snapshots().agg(F.count(F.lit(1)).alias("snapshot_count"))
    return totals.crossJoin(F.broadcast(snap_count)).select(
        "file_count",
        "total_size",
        display.format_bytes(F.col("total_size")).alias("total_size_h"),
        "total_records",
        "partition_count",
        "snapshot_count",
    )


def recent_operations(src: MetadataSource, k: int = 5) -> DataFrame:
    """`summary` section 2 (O1/S8): last-k snapshots, newest first."""
    return ops.recent_snapshots(src.snapshots(), k=k)


def health(src: MetadataSource) -> DataFrame:
    """`iceberg-meta health` (cli.py:1114-1168): the composite report."""
    return health_report_df(src.files(), src.column_stats(), src.manifests(), src.file_ranges())


def namespace_health(sources: dict[str, MetadataSource]) -> DataFrame:
    """`iceberg-meta health --namespace` (cli.py:1130-1163): per-table health
    fan-out with per-table error tolerance.

    The reference scans every table in the namespace, collecting per-table
    failures and continuing (formatters.py:1412-1417 renders them as error
    rows). Same contract here: a table whose metadata can't be read or whose
    plan can't be built contributes ONE ``section='error'`` row instead of
    aborting the scan; healthy tables union into a single lazy DataFrame
    (section, metric, value, table_name, error).
    """
    frames: list[DataFrame] = []
    for name, src in sources.items():
        try:
            h = health(src)
            frames.append(
                h.select(
                    "section",
                    "metric",
                    "value",
                    F.lit(name).alias("table_name"),
                    F.lit(None).cast("string").alias("error"),
                )
            )
        except Exception as exc:  # per-table tolerance: capture, continue
            spark = getattr(src, "spark", None) or SparkSession.active()
            frames.append(
                spark.createDataFrame(
                    [("error", type(exc).__name__, None, name, str(exc)[:500])],
                    "section string, metric string, value double, table_name string, error string",
                )
            )
    if not frames:
        raise ValueError("namespace_health needs at least one source")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def file_health(src: MetadataSource) -> DataFrame:
    """`health` file section (A1): size stats + small-file counts."""
    return ops.file_size_stats(src.files())


def partition_health(src: MetadataSource) -> DataFrame:
    """`health` partition section (A3+A4): distribution + skew flags."""
    return ops.partition_skew(src.files())


def column_health(src: MetadataSource) -> DataFrame:
    """`health` column section (A5+A6+A7): nulls, storage, bounds."""
    return ops.column_health(src.column_stats())


def diff(src: MetadataSource, old_snapshot: int, new_snapshot: int) -> DataFrame:
    """`iceberg-meta diff A B` (cli.py:1213-1228): per-file changes (J1)."""
    return ops.snapshot_diff(src.files(old_snapshot), src.files(new_snapshot))


def diff_summary(src: MetadataSource, old_snapshot: int, new_snapshot: int) -> DataFrame:
    """`diff` totals: added/deleted files, bytes, rows + signed nets."""
    return ops.snapshot_diff_summary(src.files(old_snapshot), src.files(new_snapshot))


def snapshot_detail(src: MetadataSource, snapshot_id: int) -> DataFrame:
    """`iceberg-meta snapshot-detail` (cli.py:1174-1188): P1+S5+A8 —
    the snapshot's file totals (manifest listing via ``tree``)."""
    return ops.summary_totals(src.files(snapshot_id)).select(
        F.lit(snapshot_id).cast("long").alias("snapshot_id"),
        "file_count",
        "total_size",
        "total_records",
        "partition_count",
    )


def tree(src: MetadataSource, max_files: int = 10) -> DataFrame:
    """`iceberg-meta tree` (cli.py:1251-1281): per-file entry rows under each
    manifest, capped at ``max_files`` largest files per manifest (W5,
    reference cap at formatters.py:1296), each row carrying its manifest's
    row-share stats (J5/W1/W2).

    Needs a source whose ``files()`` carries ``manifest_path``. Iceberg's
    public ``.files``/``.entries`` metadata tables expose no file->manifest
    edge (the reference reads manifest Avro directly to get it), so
    ``IcebergTableSource`` raises here rather than fabricating a linkage.
    """
    from pyspark.sql import Window

    files = src.files()
    if "manifest_path" not in files.columns:
        raise NotImplementedError(
            "tree() needs files() to carry manifest_path; Iceberg metadata "
            "tables expose no file->manifest linkage — use manifest_row_share "
            "(per-manifest totals) or top_files (per-partition cap) instead"
        )
    share = ops.manifest_row_share(files)
    w = Window.partitionBy("snapshot_id", "manifest_path").orderBy(
        F.desc("file_size_in_bytes"), F.asc("file_path")
    )
    entries = files.withColumn("entry_rank", F.row_number().over(w)).filter(
        F.col("entry_rank") <= max_files
    )
    return entries.join(share, ["snapshot_id", "manifest_path"]).select(
        "snapshot_id",
        "manifest_path",
        "entry_rank",
        "file_path",
        "file_size_in_bytes",
        "record_count",
        "file_count",
        "row_count",
        "pct_of_snapshot_rows",
    )


def top_files(src: MetadataSource, k: int = 10) -> DataFrame:
    """`tree`/`files` display cap (W5/O7): k largest files per partition."""
    return ops.top_files_per_partition(src.files(), k=k)


def schema_history(src: MetadataSource) -> DataFrame:
    """`iceberg-meta schema --history` (cli.py:1029-1045): per-version field
    changes via lag() (J2 generalized)."""
    return ops.schema_field_history(src.schema_fields())


def schema_version_diff(src: MetadataSource, old_id: int, new_id: int) -> DataFrame:
    """TUI schema diff (J2): full-outer field diff of two versions."""
    return ops.schema_diff(src.schema_fields(), old_id=old_id, new_id=new_id)


def schema_compat(src: MetadataSource, old_id: int, new_id: int) -> DataFrame:
    """Schema-evolution safety classes (widened / renamed / tightened /
    incompatible / added / removed) — the can-readers-upgrade check."""
    return ops.schema_compat(src.schema_fields(), old_id=old_id, new_id=new_id)


def rollback_plan(src: MetadataSource, current: int, target: int) -> DataFrame:
    """Restore/remove action list returning the table to ``target`` — the
    backwards diff, per-path contributions pre-aggregated."""

    def contrib(snap: int) -> DataFrame:
        return (
            src.files(snap)
            .groupBy("file_path")
            .agg(
                F.sum("record_count").alias("rc"),
                F.sum("file_size_in_bytes").alias("sz"),
            )
        )

    cur = contrib(current).select("file_path", F.col("rc").alias("c_rc"), F.col("sz").alias("c_sz"))
    tgt = contrib(target).select("file_path", F.col("rc").alias("t_rc"), F.col("sz").alias("t_sz"))
    d = (
        cur.join(tgt, "file_path", "full_outer")
        .filter(F.col("c_rc").isNull() | F.col("t_rc").isNull())
        .select(
            F.when(F.col("c_rc").isNull(), F.lit("restore")).otherwise(F.lit("remove")).alias("action"),
            F.coalesce("t_rc", "c_rc").alias("rc"),
            F.coalesce("t_sz", "c_sz").alias("sz"),
        )
    )
    return (
        d.groupBy("action")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("rc").alias("records"),
            F.sum("sz").alias("bytes"),
        )
        .orderBy("action")
    )


def namespace_overview(tables: DataFrame) -> DataFrame:
    """TUI namespace panel (A9+O6): rollup sorted by size desc."""
    return ops.namespace_rollup(tables).orderBy(F.desc("total_size"))


def warehouse_overview(tables: DataFrame) -> DataFrame:
    """TUI warehouse panel (A10): rollup grouping sets incl. grand total."""
    return ops.warehouse_rollup(tables)


def alerts(tables: DataFrame) -> DataFrame:
    """TUI alert badges (P7-P9): stale / snapshot-count / v1-format flags."""
    return ops.table_alerts(tables)


def watch(src: MetadataSource, seen: DataFrame) -> DataFrame:
    """`snapshots --watch` one poll tick (A12/U2/ST1): snapshots not yet
    seen. Drive in a loop via ``streaming.watch.poll_watch`` or as a
    Structured Streaming query via ``streaming.watch.watch_stream``."""
    return ops.new_snapshots(src.snapshots(), seen)


# ---------------------------------------------------------------------------
# Maintenance planning (beyond the reference's detection-only surface).
# ---------------------------------------------------------------------------

def compaction_plan(src: MetadataSource, target_bytes: int | None = None) -> DataFrame:
    """Small-file rewrite groups per (snapshot, partition): the action plan
    behind the reference's ``compaction_recommended`` flag."""
    kwargs = {} if target_bytes is None else {"target_bytes": target_bytes}
    return ops.compaction_plan(src.files(), **kwargs)


def snapshot_expiry(
    src: MetadataSource, keep_last: int = 5, max_age_us: int = 30 * 86400 * 1_000_000,
    *, now_us: int,
) -> DataFrame:
    """Retention-policy expiry candidates over the snapshot log.

    ``now_us`` is required (deterministic kernels take the clock as input)."""
    return ops.snapshot_expiry(
        src.snapshots(), keep_last=keep_last, max_age_us=max_age_us, now_us=now_us
    )


def retention_plan(
    src: MetadataSource,
    *,
    now_us: int,
    keep_last: int = 5,
    keep_all_hours: int = 24,
    daily_days: int = 30,
    weekly_weeks: int = 12,
) -> DataFrame:
    """GFS tiered-retention dry run: per-snapshot keep/expire verdicts with
    the reasons each snapshot survives (last-k / recent / daily / weekly).
    The preview to read before an irreversible expireSnapshots."""
    from iceberg_meta_spark.operators.maintenance import retention_policy

    return retention_policy(
        src.snapshots(),
        now_us=now_us,
        keep_last=keep_last,
        keep_all_hours=keep_all_hours,
        daily_days=daily_days,
        weekly_weeks=weekly_weeks,
    )


def orphan_files(src: MetadataSource, storage_listing: DataFrame) -> DataFrame:
    """Files in the object-store listing no snapshot tracks."""
    return ops.orphan_files(storage_listing, src.files())


def zorder_plan(src: MetadataSource, n_buckets: int = 16) -> DataFrame:
    """Z-order rewrite buckets from per-file value ranges."""
    return ops.zorder_layout(src.file_ranges(), n_buckets=n_buckets)


def hilbert_plan(src: MetadataSource, n_buckets: int = 16) -> DataFrame:
    """Hilbert-curve rewrite buckets: the locality-preserving alternative
    to :func:`zorder_plan` (consecutive codes are always grid-adjacent)."""
    return ops.hilbert_layout(src.file_ranges(), n_buckets=n_buckets)


def files_asof(src: MetadataSource, as_of: int) -> DataFrame:
    """Time-travel reconstruction: the per-partition file inventory visible
    at snapshot ``as_of`` (lineage-driven visibility — see
    operators/lineage.files_asof). The reference reads only the CURRENT
    snapshot's file list; this is the as-of generalization its users ask
    for first."""
    from iceberg_meta_spark.operators.lineage import files_asof as _fa

    nodes = src.snapshots().select("snapshot_id", "parent_id")
    return _fa(src.files(), nodes, as_of=as_of)


def manifest_rewrite(src: MetadataSource, target_bytes: int = 8 * 1024 * 1024) -> DataFrame:
    """Manifest rewrite groups (Iceberg rewrite_manifests planning) —
    the metadata-side sibling of :func:`compaction_plan`."""
    from iceberg_meta_spark.operators.maintenance import manifest_rewrite_plan

    return manifest_rewrite_plan(src.manifests(), target_bytes=target_bytes)


def delete_plan(
    src: MetadataSource, field_id: int, subject_keys: list[int]
) -> DataFrame:
    """Right-to-be-forgotten planning: the files an equality-delete of
    ``subject_keys`` in column ``field_id`` must rewrite, judged from
    per-file zone maps — with per-file rewrite cost. Files whose bounds
    exclude every key are provably clean and skipped."""
    from iceberg_meta_spark.operators.maintenance import equality_delete_plan

    return equality_delete_plan(
        src.column_stats(), src.files(), field_id=field_id, subject_keys=subject_keys
    )


def scan_tasks(
    src: MetadataSource,
    target_bytes: int = 32 * 1024 * 1024,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read-side split planning (Iceberg TableScan.planFiles semantics):
    per-partition scan-task counts, the ceil(bytes/target) ideal, the
    overhead paid to file boundaries, and the max-split straggler bound."""
    from iceberg_meta_spark.operators.maintenance import scan_task_plan

    return scan_task_plan(
        src.files(snapshot_id), target_bytes=target_bytes
    )


def clustering_report(src: MetadataSource) -> DataFrame:
    """Per-column clustering depth from zone maps (the OPTIMIZE ZORDER
    metric): max/avg files a point query must open per field — the
    signal that decides whether :func:`zorder_plan` is worth running."""
    from iceberg_meta_spark.operators.overlap import clustering_depth

    return clustering_depth(src.column_stats())


def doctor(
    spark: SparkSession | None = None,
    *,
    catalog: str = "local",
    catalog_type: str = "rest",
    file_props: dict | None = None,
    env: dict | None = None,
) -> DataFrame:
    """`iceberg-meta doctor` (reference cli.py:453-570): config /
    environment / connectivity diagnostics as a DataFrame of
    (section, check, status, detail) rows plus the one-line verdict in
    ``df.attrs``-style via a final ('summary', 'verdict', ...) row.

    The checklist itself is a pure function (``sources.iceberg.
    doctor_checks``); this wrapper only lifts the handful of rows into a
    DataFrame — diagnostics are driver-sized by nature.
    """
    checks = ice.doctor_checks(
        catalog=catalog,
        catalog_type=catalog_type,
        file_props=file_props,
        env=env,
        spark=spark,
    )
    checks = checks + [("summary", "verdict", "info", ice.doctor_summary(checks))]
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("doctor needs a SparkSession to build the report frame")
    return spark.createDataFrame(checks, "section string, check string, status string, detail string")


# ---------------------------------------------------------------------------
# Table lifecycle (r8): DDL, merge-on-read scan, maintenance EXECUTION —
# the verbs a real deployment runs against filesystem (HadoopTables) trees,
# all jar-free. Each wraps sources/iceberg_write.py, iceberg_scan.py or
# iceberg_maintenance.py; see those modules for semantics and spec refs.
# ---------------------------------------------------------------------------


def create_table(table_dir: str, fields, partition_fields=None) -> dict:
    """CREATE TABLE: fresh v1 metadata + version hint (iceberg_write.py)."""
    from iceberg_meta_spark.sources.iceberg_write import create_table as _ct

    return _ct(table_dir, fields, partition_fields)


def scan(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    version: int | None = None,
    predicate: tuple | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Merge-on-read DATA scan with partition + zone-map file pruning
    (iceberg_scan.py): position + equality deletes applied, time travel by
    snapshot id, metadata version, or branch/tag name."""
    from iceberg_meta_spark.sources.iceberg_scan import scan_table

    return scan_table(spark, table_dir, snapshot_id, version, predicate, ref)


def alter_schema(table_dir: str, add=None, drop=None, rename=None) -> dict:
    """ALTER TABLE schema evolution: fresh ids on add, id-stable rename,
    history-preserving drop (iceberg_write.py:update_schema)."""
    from iceberg_meta_spark.sources.iceberg_write import update_schema

    return update_schema(table_dir, add=add, drop=drop, rename=rename)


def rollback(table_dir: str, snapshot_id: int) -> dict:
    """Point current (and main) back at an existing snapshot without
    rewriting history (iceberg_write.py:rollback_to_snapshot)."""
    from iceberg_meta_spark.sources.iceberg_write import rollback_to_snapshot

    return rollback_to_snapshot(table_dir, snapshot_id)


def expire(table_dir: str, keep_last: int | None = None,
           older_than_ms: int | None = None) -> dict:
    """EXECUTE snapshot expiry (ref-pinned snapshots always retained);
    returns expired ids + the now-unreferenced files
    (iceberg_maintenance.py:expire_snapshots)."""
    from iceberg_meta_spark.sources.iceberg_maintenance import expire_snapshots

    return expire_snapshots(table_dir, keep_last=keep_last,
                            older_than_ms=older_than_ms)


def orphan_scan(spark: SparkSession, table_dir: str) -> DataFrame:
    """remove_orphan_files detection: one listing scan anti-joined against
    every reachable path (iceberg_maintenance.py:orphan_files_frame)."""
    from iceberg_meta_spark.sources.iceberg_maintenance import orphan_files_frame

    return orphan_files_frame(spark, table_dir)


def rewrite_small_manifests(table_dir: str, target_bytes: int = 8 << 20) -> dict:
    """EXECUTE the manifest bin-pack: merge small data manifests and publish
    a replace snapshot (iceberg_maintenance.py:rewrite_manifests)."""
    from iceberg_meta_spark.sources.iceberg_maintenance import rewrite_manifests

    return rewrite_manifests(table_dir, target_bytes=target_bytes)


def insert_into(spark: SparkSession, df: DataFrame, table_dir: str,
                branch: str | None = None) -> dict:
    """INSERT INTO: write + commit with auto-computed per-file stats/bounds
    (iceberg_write.py:append_dataframe) — the committed bounds immediately
    feed scan()'s zone-map pruning. ``branch=`` stages the commit on a
    named branch (write-audit-publish); publish with :func:`publish`."""
    from iceberg_meta_spark.sources.iceberg_write import append_dataframe

    return append_dataframe(spark, df, table_dir, branch=branch)


def publish(table_dir: str, from_ref: str, to: str = "main",
            timestamp_ms: int | None = None) -> dict:
    """PUBLISH a staged branch (write-audit-publish): fast-forward ``to``
    onto ``from_ref``'s head — atomic, metadata-only, refused if the
    target diverged (iceberg_write.py:fast_forward)."""
    from iceberg_meta_spark.sources.iceberg_write import fast_forward

    return fast_forward(table_dir, to, from_ref, timestamp_ms=timestamp_ms)


def evolve_partitioning(
    table_dir: str,
    add_identity: list[str] | None = None,
    add_fields: list[tuple[str, str, str]] | None = None,
) -> dict:
    """Partition evolution: new default spec with added identity fields
    and/or transformed fields — ``add_fields`` tuples are (field_name,
    transform, source_column), e.g. ``("id_bucket", "bucket[8]", "id")``
    or ``("ts_month", "month", "event_date")``. Old files keep their
    layout (iceberg_write.py:update_partition_spec)."""
    from iceberg_meta_spark.sources.iceberg_write import update_partition_spec

    return update_partition_spec(table_dir, add_identity, add_fields=add_fields)


def remove_orphans(spark: SparkSession, table_dir: str, older_than_ms: int,
                   dry_run: bool = True) -> dict:
    """EXECUTE orphan cleanup with the age guard (dry_run by default, like
    the engine action) — iceberg_maintenance.py:remove_orphans."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        remove_orphans as _ro,
    )

    return _ro(spark, table_dir, older_than_ms, dry_run=dry_run)


def set_table_properties(table_dir: str, set_props: dict | None = None,
                         unset: list | None = None) -> dict:
    """ALTER TABLE SET/UNSET TBLPROPERTIES (iceberg_write.py:set_properties)."""
    from iceberg_meta_spark.sources.iceberg_write import set_properties

    return set_properties(table_dir, set_props, unset)


def tag(table_dir: str, name: str, snapshot_id: int | None = None) -> dict:
    """Create/replace a tag pinned at a snapshot (default: current) —
    iceberg_write.py:manage_ref. Tags gate expiry and address scan(ref=)."""
    from iceberg_meta_spark.sources.iceberg_write import manage_ref

    return manage_ref(table_dir, name, snapshot_id, ref_type="tag")


def branch(table_dir: str, name: str, snapshot_id: int | None = None) -> dict:
    """Create/replace a branch ref (iceberg_write.py:manage_ref)."""
    from iceberg_meta_spark.sources.iceberg_write import manage_ref

    return manage_ref(table_dir, name, snapshot_id, ref_type="branch")


def drop_ref(table_dir: str, name: str) -> dict:
    """Drop a branch/tag (never main) — iceberg_write.py:manage_ref."""
    from iceberg_meta_spark.sources.iceberg_write import manage_ref

    return manage_ref(table_dir, name, drop=True)


def merge(spark: SparkSession, df: DataFrame, table_dir: str,
          key_cols: list[str]) -> dict:
    """MERGE INTO (upsert): equality-delete on key_cols + new data files in
    ONE published snapshot (iceberg_write.py:merge_into)."""
    from iceberg_meta_spark.sources.iceberg_write import merge_into

    return merge_into(spark, df, table_dir, key_cols)


def compact(spark: SparkSession, table_dir: str,
            small_threshold: int = 1 << 27, target_bytes: int = 1 << 29) -> dict:
    """EXECUTE data-file compaction: bin-pack small/delete-affected files,
    absorb pending deletes, publish one replace snapshot
    (iceberg_maintenance.py:rewrite_data_files) — the action half of
    compaction_plan()."""
    from iceberg_meta_spark.sources.iceberg_maintenance import rewrite_data_files

    return rewrite_data_files(spark, table_dir,
                              small_threshold=small_threshold,
                              target_bytes=target_bytes)


def changes(spark: SparkSession, table_dir: str,
            from_snapshot_id: int | None = None,
            to_snapshot_id: int | None = None) -> DataFrame:
    """Native changelog read: row-level (insert | delete) changes between
    two snapshots (iceberg_scan.py:scan_changes)."""
    from iceberg_meta_spark.sources.iceberg_scan import scan_changes

    return scan_changes(spark, table_dir,
                        from_snapshot_id=from_snapshot_id,
                        to_snapshot_id=to_snapshot_id)


def delete_where(spark: SparkSession, table_dir: str,
                 predicate: tuple) -> dict:
    """DELETE FROM ... WHERE col BETWEEN lo AND hi: matching rows resolve
    to (file, pos) through the merge-on-read scan and publish as one
    position-delete commit (iceberg_write.py:delete_where)."""
    from iceberg_meta_spark.sources.iceberg_write import delete_where as _dw

    return _dw(spark, table_dir, predicate)


def rewrite_deletes(spark: SparkSession, table_dir: str) -> dict:
    """EXECUTE rewrite_position_delete_files: drop dangling position-delete
    files, shrink partially-dangling ones, one replace snapshot
    (iceberg_maintenance.py:rewrite_position_deletes)."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_position_deletes,
    )

    return rewrite_position_deletes(spark, table_dir)


def rewrite_dvs(spark: SparkSession, table_dir: str) -> dict:
    """EXECUTE the v3 sibling of rewrite_deletes: drop DANGLING deletion
    vectors (their referenced data file is no longer live) in one replace
    snapshot (iceberg_maintenance.py:rewrite_deletion_vectors)."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        rewrite_deletion_vectors,
    )

    return rewrite_deletion_vectors(spark, table_dir)


def analyze(spark: SparkSession, table_dir: str,
            columns: list[str] | None = None, exact: bool = False,
            timestamp_ms: int | None = None) -> dict:
    """ANALYZE TABLE: per-column NDV over the current snapshot (MoR
    correct) -> Puffin statistics file -> metadata 'statistics' entry
    (iceberg_stats.py:analyze_table). approx (HLL++) by default — the
    100-TB path; exact=True for closed-form verification."""
    from iceberg_meta_spark.sources.iceberg_stats import analyze_table

    return analyze_table(spark, table_dir, columns=columns, exact=exact,
                         timestamp_ms=timestamp_ms)


def table_stats(spark: SparkSession, table_dir: str,
                snapshot_id: int | None = None) -> DataFrame:
    """Published statistics as a frame (one row per column blob) — the
    cost-model read side (iceberg_stats.py:statistics_frame)."""
    from iceberg_meta_spark.sources.iceberg_stats import statistics_frame

    return statistics_frame(spark, table_dir, snapshot_id=snapshot_id)


def set_sort_order(table_dir: str, sort_by: list,
                   timestamp_ms: int | None = None) -> dict:
    """ALTER TABLE WRITE ORDERED BY: publish a new default sort order
    (column names or (column, 'asc'|'desc') tuples). Inserts sort within
    write tasks; compaction defaults to the SORT strategy
    (iceberg_write.py:update_sort_order)."""
    from iceberg_meta_spark.sources.iceberg_write import update_sort_order

    return update_sort_order(table_dir, sort_by, timestamp_ms=timestamp_ms)


def expire_by_policy(table_dir: str, now_ms: int,
                     timestamp_ms: int | None = None) -> dict:
    """Property-driven retention: history.expire.max-snapshot-age-ms /
    min-snapshots-to-keep / max-ref-age-ms applied in one pass
    (iceberg_maintenance.py:expire_by_policy). now_ms is explicit — no
    wall clock inside the engine."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        expire_by_policy as _ebp,
    )

    return _ebp(table_dir, now_ms, timestamp_ms=timestamp_ms)


def expire_metadata(table_dir: str, timestamp_ms: int | None = None,
                    force_keep: int | None = None) -> dict:
    """Metadata-file cleanup per write.metadata.delete-after-commit
    properties (iceberg_maintenance.py:expire_metadata_versions)."""
    from iceberg_meta_spark.sources.iceberg_maintenance import (
        expire_metadata_versions,
    )

    return expire_metadata_versions(table_dir, timestamp_ms=timestamp_ms,
                                    force_keep=force_keep)


def write_partition_stats(spark: SparkSession, table_dir: str,
                          timestamp_ms: int | None = None) -> dict:
    """Write the partition statistics file for the current snapshot and
    register it (iceberg_stats.py:write_partition_statistics)."""
    from iceberg_meta_spark.sources.iceberg_stats import (
        write_partition_statistics,
    )

    return write_partition_statistics(spark, table_dir,
                                      timestamp_ms=timestamp_ms)


def partition_stats(spark: SparkSession, table_dir: str,
                    snapshot_id: int | None = None) -> DataFrame:
    """Read back a snapshot's registered partition statistics file
    (iceberg_stats.py:partition_statistics_frame)."""
    from iceberg_meta_spark.sources.iceberg_stats import (
        partition_statistics_frame,
    )

    return partition_statistics_frame(spark, table_dir,
                                      snapshot_id=snapshot_id)


# name -> table_dir for views registered via register_table; sql() routes
# DML statements on these names to the native writers
_SQL_TABLES: dict[str, str] = {}

# name -> (RestCatalog, ident) for views registered via register_rest_table;
# sql() routes every COMMIT on these names through the REST catalog's
# updateTable CAS instead of the filesystem version-hint swap
_SQL_REST: dict[str, tuple] = {}


def register_table(spark: SparkSession, table_dir: str, name: str,
                   snapshot_id: int | None = None,
                   version: int | None = None,
                   ref: str | None = None) -> DataFrame:
    """Expose a native table to Spark SQL: creates (or replaces) a temp
    view ``name`` over the merge-on-read scan, so ``spark.sql("SELECT ...
    FROM name")`` queries it with plain SQL; time travel via
    snapshot_id=/version=/ref= pins the view to that state. The view is
    SNAPSHOT-PINNED at registration (scan planning resolves the file
    list eagerly, like a database materialized view's frozen plan):
    commits AFTER register_table are not visible until you re-register —
    call register_table again after writes, exactly as you would refresh
    (:func:`sql` DML statements refresh the view automatically).
    Row-level execution stays lazy: Catalyst pushes column pruning and
    filters into the underlying parquet scan as usual."""
    from iceberg_meta_spark.sources.iceberg_scan import scan_table

    df = scan_table(spark, table_dir, snapshot_id=snapshot_id,
                    version=version, ref=ref)
    df.createOrReplaceTempView(name)
    _SQL_TABLES[name] = table_dir
    _SQL_REST.pop(name, None)  # a plain registration clears a REST binding
    return df


def register_rest_table(spark: SparkSession, catalog, ident: str,
                        name: str) -> DataFrame:
    """Expose a REST-catalog table to Spark SQL: loadTable resolves the
    storage location, the view registers over the merge-on-read scan like
    :func:`register_table`, and — the difference — EVERY ``sql()`` DML /
    CALL / ALTER on ``name`` commits through the catalog's updateTable
    CAS (``RestCommitter`` / the rest_* DDL verbs) instead of the
    filesystem version-hint swap, as a production REST deployment
    requires. ``catalog`` is a ``sources.iceberg_rest.RestCatalog``;
    ``ident`` is ``"namespace.table"``."""
    from iceberg_meta_spark.sources.iceberg_write import _local_path

    _, md = catalog.load_table(ident)
    table_dir = _local_path(md["location"].rstrip("/"))
    df = register_table(spark, table_dir, name)
    _SQL_REST[name] = (catalog, ident)
    return df


def sql(spark: SparkSession, statement: str) -> DataFrame:
    """SQL over registered native tables, DML included: a thin dispatcher
    that routes the three write verbs to the native writers and refreshes
    the table's temp view afterwards, so the next ``spark.sql`` sees the
    new snapshot. Everything else passes through to ``spark.sql``
    verbatim (reads over the registered views are plain Catalyst plans).

    Supported DML dialect (stated plainly — a deliberate subset, no
    Catalyst extension; the writers underneath are the full engine):

    - ``INSERT INTO t VALUES (1, 'a'), (2, 'b')`` — positional against the
      table schema; also ``INSERT INTO t SELECT ...``.
    - ``DELETE FROM t WHERE <expr>`` — ``<expr>`` is ANY Spark SQL
      boolean expression (``OR``, ``IN``, ``!=``, functions,
      cross-column predicates included). Interval conjuncts
      (``col =/>=/<=/>/< literal``, ``BETWEEN``) drive zone-map FILE
      pruning; everything else runs as the residual row filter over the
      merge-on-read scan. One row-level delete commit (position deletes
      on v2 tables, deletion vectors on v3).
    - ``UPDATE t SET col = <expr>[, col2 = <expr>] WHERE <expr>`` — SET
      expressions are Spark SQL over the row's columns; the WHERE takes
      the same arbitrary-expression dialect as DELETE. Matched rows are
      rewritten and the old versions hidden in ONE atomic snapshot
      (position deletes + data on v2, deletion vectors + data on v3).
    - ``MERGE INTO t USING src ON k1[, k2...]`` — upsert whole rows of the
      registered view/table ``src`` keyed on the named columns: matched
      keys replace, new keys insert, one snapshot. Optional clauses:
      ``WHEN MATCHED [AND <cond>] THEN UPDATE`` / ``WHEN MATCHED
      [AND <cond>] THEN DELETE`` (``<cond>`` is a Spark SQL expression;
      bare or ``s.``-qualified columns read the SOURCE row, ``t.<col>``
      reads the matched TARGET row — e.g. ``WHEN MATCHED AND
      t.updated_at < s.updated_at THEN UPDATE``) and ``WHEN NOT MATCHED
      THEN INSERT``;
      giving any WHEN clause makes the merge exactly those clauses (e.g.
      a lone ``WHEN MATCHED THEN DELETE`` never inserts).
    - ``CALL <procedure>('t'[, name => value ...])`` — maintenance
      procedures, mirroring Iceberg's Spark procedures:
      ``rewrite_data_files``, ``rewrite_manifests``,
      ``rewrite_position_deletes``, ``rewrite_deletion_vectors``,
      ``expire_snapshots`` (``keep_last``/``older_than_ms``),
      ``remove_orphans``, ``rollback_to_snapshot`` (``snapshot_id``),
      ``create_branch``/``create_tag``/``drop_ref`` (``name``, optional
      ``snapshot_id``), ``fast_forward`` (``to``, optional ``branch`` —
      the write-audit-publish publish step).
    - ``ALTER TABLE t ADD COLUMN c type [DEFAULT lit]`` / ``DROP COLUMN``
      / ``RENAME COLUMN a TO b`` / ``SET``/``UNSET TBLPROPERTIES (...)``
      — schema evolution and property DDL over the native writers.

    Each DML/CALL returns a 1-row DataFrame of commit metrics instead of
    rows.
    """
    import re

    from iceberg_meta_spark.sources.iceberg_write import (
        append_dataframe,
        delete_where,
        merge_into,
    )

    stmt = statement.strip().rstrip(";").strip()

    def _table_dir(name: str) -> str:
        if name not in _SQL_TABLES:
            raise KeyError(
                f"{name!r} is not a registered native table — call "
                "register_table(spark, table_dir, name) first"
            )
        return _SQL_TABLES[name]

    def _refresh(name: str) -> None:
        rest = _SQL_REST.get(name)
        register_table(spark, _SQL_TABLES[name], name)
        if rest is not None:  # register_table clears REST bindings
            _SQL_REST[name] = rest

    def _committer(name: str):
        """REST-registered tables commit through the catalog's CAS."""
        if name in _SQL_REST:
            from iceberg_meta_spark.sources.iceberg_rest import RestCommitter

            return RestCommitter(*_SQL_REST[name])
        return None

    def _metrics(**kv) -> DataFrame:
        cols = ", ".join(f"`{k}` string" for k in kv)
        return spark.createDataFrame([tuple(str(v) for v in kv.values())], cols)

    m = re.fullmatch(
        r"INSERT\s+INTO\s+(\w+)\s+(VALUES\s+.+|SELECT\s+.+)",
        stmt, re.IGNORECASE | re.DOTALL,
    )
    if m:
        name, rest = m.group(1), m.group(2)
        table_dir = _table_dir(name)
        src = spark.sql(rest)  # both VALUES and SELECT parse directly
        # positional column mapping against the view's schema (the SQL
        # INSERT contract); spark.sql("VALUES ...") names columns col1..N.
        # Values also CAST to the declared column types — a literal 1 is
        # INT while the table declares long, and mixed-width parquet
        # batches would fail the scan's mergeSchema read
        target = spark.table(name).schema
        if len(src.columns) != len(target.fields):
            raise ValueError(
                f"INSERT arity mismatch: {len(src.columns)} values vs "
                f"{len(target.fields)} columns {target.fieldNames()}"
            )
        src = src.toDF(*target.fieldNames()).select(
            *[F.col(f.name).cast(f.dataType) for f in target.fields]
        )
        md = append_dataframe(spark, src, table_dir,
                              committer=_committer(name))
        _refresh(name)
        return _metrics(operation="insert",
                        snapshot_id=md["current-snapshot-id"],
                        rows_inserted=md["snapshots"][-1]["summary"]
                        ["added-records"])

    m = re.fullmatch(
        r"DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+)",
        stmt, re.IGNORECASE | re.DOTALL,
    )
    if m:
        name, clause = m.group(1), m.group(2)
        table_dir = _table_dir(name)
        out = delete_where(spark, table_dir, _sql_predicate(clause),
                           committer=_committer(name))
        _refresh(name)
        return _metrics(operation="delete",
                        snapshot_id=out["snapshot_id"],
                        rows_deleted=out["rows_deleted"])

    m = re.fullmatch(
        r"UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+)",
        stmt, re.IGNORECASE | re.DOTALL,
    )
    if m:
        from iceberg_meta_spark.sources.iceberg_write import update_where

        name, set_clause, where = m.group(1), m.group(2), m.group(3)
        table_dir = _table_dir(name)
        set_exprs = {}
        for part in _split_top_level(set_clause):
            sm = re.fullmatch(r"(\w+)\s*=\s*(.+)", part.strip(), re.DOTALL)
            if not sm:
                raise ValueError(f"UPDATE SET needs col = expr, got {part!r}")
            set_exprs[sm.group(1)] = sm.group(2).strip()
        out = update_where(spark, table_dir, set_exprs, _sql_predicate(where),
                           committer=_committer(name))
        _refresh(name)
        return _metrics(operation="update",
                        snapshot_id=out["snapshot_id"],
                        rows_updated=out["rows_updated"])

    m = re.fullmatch(
        r"MERGE\s+INTO\s+(\w+)\s+USING\s+(\w+)\s+ON\s+([\w\s,]+?)"
        r"(\s+WHEN\s+MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+(UPDATE|DELETE))?"
        r"(\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT)?",
        stmt, re.IGNORECASE | re.DOTALL,
    )
    if m:
        name, src_name, keys = m.group(1), m.group(2), m.group(3)
        matched_clause, matched_cond, matched_action = m.group(4), m.group(5), m.group(6)
        insert_clause = m.group(7)
        table_dir = _table_dir(name)
        key_cols = [k.strip() for k in keys.split(",") if k.strip()]
        if matched_clause is None and insert_clause is None:
            # bare MERGE: the classic upsert (update matched, insert new)
            when_matched, when_not_matched = "update", "insert"
        else:
            when_matched = matched_action.lower() if matched_action else None
            when_not_matched = "insert" if insert_clause else None
        md = merge_into(
            spark, spark.table(src_name), table_dir, key_cols,
            when_matched=when_matched,
            matched_condition=matched_cond,
            when_not_matched=when_not_matched,
            committer=_committer(name),
        )
        _refresh(name)
        return _metrics(operation="merge",
                        snapshot_id=md.get("current-snapshot-id"),
                        merge_keys=",".join(key_cols))

    m = re.fullmatch(r"CALL\s+(\w+)\s*\((.*)\)", stmt, re.IGNORECASE | re.DOTALL)
    if m:
        return _call_procedure(spark, m.group(1).lower(), m.group(2),
                               _table_dir, _refresh, _metrics,
                               _committer=_committer)

    m = re.fullmatch(r"ALTER\s+TABLE\s+(\w+)\s+(.+)", stmt,
                     re.IGNORECASE | re.DOTALL)
    if m:
        return _alter_table(spark, m.group(1), m.group(2),
                            _table_dir, _refresh, _metrics)

    return spark.sql(stmt)


def _alter_table(spark, name: str, clause: str,
                 _table_dir, _refresh, _metrics):
    """``ALTER TABLE t ...`` — the DDL verbs, routed to the native schema/
    property writers (each publishes a new metadata version, no snapshot):

    - ``ADD COLUMN <name> <type> [DEFAULT <literal>]`` (DEFAULT is the v3
      initial-default: pre-column files serve it, spec § Default values)
    - ``ALTER COLUMN <name> TYPE <type>`` — the spec's legal promotions
      only (int -> long/bigint, float -> double)
    - ``DROP COLUMN <name>``
    - ``RENAME COLUMN <old> TO <new>``
    - ``ADD PARTITION FIELD col | identity(col) | bucket(N, col) |
      truncate(W, col) | year/month/day/hour(col)`` / ``DROP PARTITION
      FIELD <name>`` — partition evolution both ways (old files keep
      their spec; dropped identity values still inject from each file's
      own partition tuple)
    - ``WRITE ORDERED BY col [ASC|DESC][, ...]`` — sort-order evolution
    - ``SET TBLPROPERTIES ('k' = 'v'[, ...])`` / ``UNSET TBLPROPERTIES
      ('k'[, ...])``
    """
    import re

    from iceberg_meta_spark.sources.iceberg_write import (
        set_properties,
        update_partition_spec,
        update_schema,
        update_sort_order,
    )

    table_dir = _table_dir(name)
    clause = clause.strip()
    rest = _SQL_REST.get(name)
    if rest is not None:
        # a REST-registered table commits its DDL through the catalog's
        # updateTable (add-schema / add-spec / add-sort-order /
        # set-properties updates) — same shared builders, CAS publish
        from iceberg_meta_spark.sources.iceberg_rest import (
            rest_set_properties,
            rest_update_partition_spec,
            rest_update_schema,
            rest_update_sort_order,
        )

        def update_schema(_td, **kw):  # noqa: F811 - REST twin
            kw.pop("timestamp_ms", None)
            return rest_update_schema(*rest, **kw)

        def set_properties(_td, set_props=None, unset=None):  # noqa: F811
            return rest_set_properties(*rest, set_props, unset)

        def update_partition_spec(_td, add_identity=None,  # noqa: F811
                                  add_fields=None, drop_fields=None, **kw):
            kw.pop("timestamp_ms", None)
            return rest_update_partition_spec(
                *rest, add_identity=add_identity, add_fields=add_fields,
                drop_fields=drop_fields)

        def update_sort_order(_td, sort_by, **kw):  # noqa: F811 - REST twin
            kw.pop("timestamp_ms", None)
            return rest_update_sort_order(*rest, sort_by)

    m = re.fullmatch(
        r"ADD\s+COLUMN\s+(\w+)\s+(\w+)(?:\s+DEFAULT\s+(.+))?",
        clause, re.IGNORECASE | re.DOTALL,
    )
    if m:
        col, typ, default = m.group(1), m.group(2).lower(), m.group(3)
        add = (col, typ) if default is None else (
            col, typ, _parse_literal(default))
        update_schema(table_dir, add=[add])
        _refresh(name)
        return _metrics(operation="add_column", column=col, type=typ,
                        **({"default": str(_parse_literal(default))}
                           if default is not None else {}))

    m = re.fullmatch(r"ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(\w+)",
                     clause, re.IGNORECASE)
    if m:
        col, typ = m.group(1), m.group(2).lower()
        typ = {"bigint": "long"}.get(typ, typ)  # SQL name -> Iceberg name
        update_schema(table_dir, widen={col: typ})
        _refresh(name)
        return _metrics(operation="widen_column", column=col, type=typ)

    m = re.fullmatch(r"DROP\s+COLUMN\s+(\w+)", clause, re.IGNORECASE)
    if m:
        update_schema(table_dir, drop=[m.group(1)])
        _refresh(name)
        return _metrics(operation="drop_column", column=m.group(1))

    m = re.fullmatch(r"RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)",
                     clause, re.IGNORECASE)
    if m:
        update_schema(table_dir, rename={m.group(1): m.group(2)})
        _refresh(name)
        return _metrics(operation="rename_column",
                        renamed=f"{m.group(1)}->{m.group(2)}")

    m = re.fullmatch(r"ADD\s+PARTITION\s+FIELD\s+(.+)", clause, re.IGNORECASE)
    if m:
        spec = m.group(1).strip()
        fm = re.fullmatch(
            r"(?:(identity|bucket|truncate|year|month|day|hour)\s*\(\s*"
            r"(?:(\d+)\s*,\s*)?(\w+)\s*\)|(\w+))",
            spec, re.IGNORECASE,
        )
        if not fm:
            raise ValueError(
                f"unsupported partition transform {spec!r}: use col, "
                "identity(col), bucket(N, col), truncate(W, col), or "
                "year/month/day/hour(col)"
            )
        fn, n, col, bare = (fm.group(1) or "").lower(), fm.group(2), \
            fm.group(3), fm.group(4)
        if bare or fn == "identity":
            src = bare or col
            update_partition_spec(table_dir, add_identity=[src])
            _refresh(name)
            return _metrics(operation="add_partition_field",
                            field=src, transform="identity")
        if fn in ("bucket", "truncate"):
            if n is None:
                raise ValueError(f"{fn} needs (N, col)")
            transform = f"{fn}[{int(n)}]"
            fname = f"{col}_{fn}"
        else:
            transform = fn
            fname = f"{col}_{fn}"
        update_partition_spec(table_dir,
                              add_fields=[(fname, transform, col)])
        _refresh(name)
        return _metrics(operation="add_partition_field",
                        field=fname, transform=transform)

    m = re.fullmatch(r"DROP\s+PARTITION\s+FIELD\s+(\w+)", clause,
                     re.IGNORECASE)
    if m:
        update_partition_spec(table_dir, drop_fields=[m.group(1)])
        _refresh(name)
        return _metrics(operation="drop_partition_field", field=m.group(1))

    m = re.fullmatch(r"WRITE\s+ORDERED\s+BY\s+(.+)", clause, re.IGNORECASE)
    if m:
        sort_by = []
        for part in _split_top_level(m.group(1)):
            sm = re.fullmatch(r"(\w+)(?:\s+(ASC|DESC))?", part.strip(),
                              re.IGNORECASE)
            if not sm:
                raise ValueError(f"WRITE ORDERED BY needs col [ASC|DESC], "
                                 f"got {part!r}")
            sort_by.append((sm.group(1), (sm.group(2) or "asc").lower()))
        update_sort_order(table_dir, sort_by)
        _refresh(name)
        return _metrics(operation="write_ordered_by",
                        order=",".join(f"{c} {d}" for c, d in sort_by))

    m = re.fullmatch(r"(UN)?SET\s+TBLPROPERTIES\s*\((.+)\)",
                     clause, re.IGNORECASE | re.DOTALL)
    if m:
        unset, body = m.group(1) is not None, m.group(2)
        if unset:
            keys = [str(_parse_literal(p.strip()))
                    for p in _split_top_level(body)]
            set_properties(table_dir, unset=keys)
            _refresh(name)
            return _metrics(operation="unset_properties",
                            keys=",".join(keys))
        props = {}
        for p in _split_top_level(body):
            kv = re.fullmatch(r"\s*('[^']*')\s*=\s*(.+)", p, re.DOTALL)
            if not kv:
                raise ValueError(
                    f"SET TBLPROPERTIES needs 'key' = 'value', got {p!r}")
            props[str(_parse_literal(kv.group(1)))] = str(
                _parse_literal(kv.group(2).strip()))
        set_properties(table_dir, set_props=props)
        _refresh(name)
        return _metrics(operation="set_properties",
                        keys=",".join(sorted(props)))

    raise ValueError(
        f"unsupported ALTER TABLE clause: {clause!r} (use ADD COLUMN, "
        "DROP COLUMN, RENAME COLUMN ... TO ..., SET/UNSET TBLPROPERTIES)"
    )


def _split_top_level(s: str) -> list[str]:
    """Split a comma list at paren depth 0 outside string literals — so
    ``a = concat(x, 'b,c'), d = d + 1`` yields two assignments."""
    out, buf, depth, in_str = [], [], 0, False
    for ch in s:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append("".join(buf))
                buf = []
                continue
        buf.append(ch)
    if buf:
        out.append("".join(buf))
    return [p for p in out if p.strip()]


def _parse_literal(tok: str):
    from iceberg_meta_spark.sources.iceberg_write import parse_sql_literal

    return parse_sql_literal(tok)


def _sql_predicate(clause: str):
    """DELETE/UPDATE WHERE dialect (r12 — the clause is ANY Spark SQL
    boolean expression): an AND-composed interval conjunction parses into
    the engine's 5-tuples (file pruning + row filter in one shape);
    anything else — ``OR``, ``IN``, ``!=``, functions, cross-column
    predicates — passes through as the expression STRING, which the
    engine runs as the residual row filter while still pruning files on
    any extractable interval conjunct (iceberg_write._predicate_plan)."""
    from iceberg_meta_spark.sources.iceberg_write import parse_where_intervals

    try:
        return parse_where_intervals(clause)
    except ValueError:
        return clause.strip()


def _call_procedure(spark, proc: str, arg_str: str,
                    _table_dir, _refresh, _metrics, _committer=None):
    """``CALL proc('t'[, name => value ...])`` — route to the maintenance
    executors (Iceberg's Spark-procedure surface, jar-free). The first
    argument is the registered table name; named args use the ``name =>
    value`` arrow syntax like Iceberg's procedures. On a REST-registered
    table every procedure that commits routes through the catalog: the
    rewrites take ``committer=RestCommitter``, and expiry / rollback /
    ref management use their rest_* twins (remove-snapshots /
    set-snapshot-ref updates)."""
    import re

    from iceberg_meta_spark.sources import iceberg_maintenance as maint
    from iceberg_meta_spark.sources.iceberg_write import rollback_to_snapshot

    # _split_top_level is string-literal aware: a quoted value containing a
    # comma (name => 'a,b') stays one argument instead of splitting mid-literal
    parts = [p.strip() for p in _split_top_level(arg_str) if p.strip()]
    if not parts:
        raise ValueError(f"CALL {proc} needs a registered table name argument")
    name = _parse_literal(parts[0]) if parts[0].startswith("'") else parts[0]
    table_dir = _table_dir(str(name))
    committer = _committer(str(name)) if _committer is not None else None
    rest = _SQL_REST.get(str(name))
    kwargs = {}
    for p in parts[1:]:
        m = re.fullmatch(r"(\w+)\s*=>\s*(.+)", p, re.DOTALL)
        if not m:
            raise ValueError(f"CALL named arguments use name => value, got {p!r}")
        kwargs[m.group(1).lower()] = _parse_literal(m.group(2))

    if proc == "rewrite_data_files":
        out = maint.rewrite_data_files(spark, table_dir, committer=committer,
                                       **kwargs)
    elif proc == "rewrite_manifests":
        out = maint.rewrite_manifests(table_dir, committer=committer, **kwargs)
    elif proc == "rewrite_position_deletes":
        out = maint.rewrite_position_deletes(spark, table_dir,
                                             committer=committer, **kwargs)
    elif proc == "rewrite_deletion_vectors":
        out = maint.rewrite_deletion_vectors(spark, table_dir,
                                             committer=committer, **kwargs)
    elif proc == "expire_snapshots":
        if rest is not None:
            from iceberg_meta_spark.sources.iceberg_rest import (
                rest_expire_snapshots,
            )

            res = rest_expire_snapshots(*rest, **kwargs)
        else:
            res = maint.expire_snapshots(table_dir, **kwargs)
        out = {"expired_snapshots": len(res["expired_snapshot_ids"]),
               "removable_files": len(res["removable_files"])}
    elif proc == "remove_orphans":
        if "older_than_ms" not in kwargs:
            raise ValueError(
                "remove_orphans needs older_than_ms => <epoch millis> "
                "(the grace period guarding in-flight writes)")
        res = maint.remove_orphans(spark, table_dir, **kwargs)
        out = {"deleted": len(res["deleted"]),
               "skipped_recent": res["skipped_recent"]}
    elif proc == "rollback_to_snapshot":
        sid = kwargs.pop("snapshot_id", None)
        if sid is None:
            raise ValueError(
                "rollback_to_snapshot needs snapshot_id => <id>")
        if rest is not None:
            from iceberg_meta_spark.sources.iceberg_rest import rest_rollback

            md = rest_rollback(*rest, int(sid))
        else:
            md = rollback_to_snapshot(table_dir, int(sid), **kwargs)
        out = {"current_snapshot_id": md["current-snapshot-id"]}
    elif proc in ("create_branch", "create_tag", "drop_ref"):
        from iceberg_meta_spark.sources.iceberg_write import manage_ref

        ref = kwargs.pop("name", None)
        if ref is None:
            raise ValueError(f"{proc} needs name => '<ref>'")
        if rest is not None:
            from iceberg_meta_spark.sources.iceberg_rest import (
                rest_manage_ref,
            )

            def manage_ref(_td, *a, **kw):  # noqa: F811 - REST twin
                kw.pop("timestamp_ms", None)
                return rest_manage_ref(*rest, *a, **kw)
        if proc == "drop_ref":
            manage_ref(table_dir, str(ref), drop=True, **kwargs)
            out = {"dropped": ref}
        else:
            sid = kwargs.pop("snapshot_id", None)
            manage_ref(table_dir, str(ref),
                       snapshot_id=int(sid) if sid is not None else None,
                       ref_type="branch" if proc == "create_branch" else "tag",
                       **kwargs)
            out = {"ref": ref,
                   "type": "branch" if proc == "create_branch" else "tag"}
    elif proc == "fast_forward":
        from iceberg_meta_spark.sources.iceberg_write import fast_forward

        branch = kwargs.pop("branch", "main")
        source = kwargs.pop("to", None)
        if source is None:
            raise ValueError(
                "fast_forward needs to => '<source ref>' (and optional "
                "branch => '<target>', default main)")
        if rest is not None:
            from iceberg_meta_spark.sources.iceberg_rest import (
                rest_fast_forward,
            )

            out = rest_fast_forward(*rest, str(branch), str(source))
        else:
            out = fast_forward(table_dir, str(branch), str(source), **kwargs)
    else:
        raise ValueError(
            f"unknown procedure {proc!r}; supported: rewrite_data_files, "
            "rewrite_manifests, rewrite_position_deletes, "
            "rewrite_deletion_vectors, expire_snapshots, remove_orphans, "
            "rollback_to_snapshot, create_branch, create_tag, drop_ref, "
            "fast_forward"
        )
    _refresh(str(name))
    return _metrics(operation=proc, **{k: str(v) for k, v in out.items()})
