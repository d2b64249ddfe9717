"""Pure DataFrame -> DataFrame kernels (no I/O, no collect, no UDFs).

Each kernel re-expresses one operator from the reference inventory
(SURVEY.md §2) as a declarative Spark plan; Catalyst/Tungsten pick the
physical strategy. Scale posture documented per kernel.
"""

from iceberg_meta_spark.operators.asof import asof_join
from iceberg_meta_spark.operators.file_health import (
    file_size_stats,
    file_size_stats_approx,
    manifest_counts,
    summary_totals,
)
from iceberg_meta_spark.operators.partitions import partition_distribution, partition_skew
from iceberg_meta_spark.operators.diff import snapshot_diff, snapshot_diff_summary
from iceberg_meta_spark.operators.column_stats import column_health, column_health_named
from iceberg_meta_spark.operators.overlap import (
    clustering_depth,
    overlap_pair_count,
    overlap_sweepline,
)
from iceberg_meta_spark.operators.schema import (
    schema_compat,
    schema_conflicts,
    schema_diff,
    schema_field_history,
)
from iceberg_meta_spark.operators.rollups import (
    format_version_histogram,
    freshness_histogram,
    most_snapshots,
    namespace_rollup,
    stalest_tables,
    table_alerts,
    warehouse_cube,
    warehouse_rollup,
)
from iceberg_meta_spark.operators.manifests import manifest_row_share, top_files_per_partition
from iceberg_meta_spark.operators.snapshots import latest_snapshot_summary, new_snapshots, recent_snapshots
from iceberg_meta_spark.operators.maintenance import (
    compaction_plan,
    hilbert_index,
    hilbert_layout,
    orphan_files,
    scan_task_plan,
    snapshot_expiry,
    zorder_layout,
)
