"""End-to-end demo: drive the command API the way a reference-CLI user would.

    python tools/demo.py [sf_dir]

Walks the full command surface — summary, health, file/partition/column
health, diff, tree, schema history, maintenance planners, watch tick — over
the fixture source and prints each result's head. Everything stays lazy
until the final show(); this is the "a user of the reference could switch"
path, exercised.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_meta_spark import api  # noqa: E402
from iceberg_meta_spark.session import get_spark  # noqa: E402
from iceberg_meta_spark.sources.fixtures import derive  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("iceberg-meta-spark-demo")
    src = api.FixtureSource(spark, sf_dir)

    def show(title: str, df, n: int = 5) -> None:
        print(f"\n== {title} ==")
        df.show(n, truncate=False)

    # doctor first, the way the reference CLI onboards a user: config /
    # env / connectivity checks with a one-line verdict
    show(
        "doctor",
        api.doctor(
            spark, file_props={"uri": "http://rest:8181", "warehouse": "s3://wh"}, env={}
        ),
        n=10,
    )
    show("summary", api.summary(src))
    show("recent operations", api.recent_operations(src))
    show("health", api.health(src), n=10)
    show("file health", api.file_health(src))
    show("partition health", api.partition_health(src))
    show("column health", api.column_health(src))
    show("diff 1 -> 2", api.diff_summary(src, old_snapshot=1, new_snapshot=2))
    show("tree", api.tree(src, max_files=3))
    show("schema history", api.schema_history(src))
    show("compaction plan", api.compaction_plan(src))
    show("snapshot expiry", api.snapshot_expiry(src, now_us=1713139200000000))
    show("retention plan (GFS tiers)", api.retention_plan(src, now_us=1713139200000000))
    show("orphan files", api.orphan_files(src, derive(spark, sf_dir, "storage_files")))
    show("z-order plan", api.zorder_plan(src))
    show("hilbert plan", api.hilbert_plan(src))
    show("manifest rewrite plan", api.manifest_rewrite(src))
    show("files as of snapshot 1", api.files_asof(src, as_of=1))
    show(
        "GDPR delete plan (field 3, 3 subject keys)",
        api.delete_plan(src, field_id=3, subject_keys=[40, 750, 1500]),
    )
    show("scan tasks (read-side split plan)", api.scan_tasks(src, snapshot_id=2))
    from iceberg_meta_spark.functions import render

    print("\n== partition sizes, rendered (F12 chrome) ==")
    print(
        render.render_table(
            api.partition_health(src), max_rows=5, bar_col="total_size"
        )
    )
    show("clustering depth (zone-map layout audit)", api.clustering_report(src))
    seen = src.snapshots().select("snapshot_id").limit(5)
    show("watch tick (new snapshots)", api.watch(src, seen))

    # -- the jar-free native Iceberg path: write a real v2 metadata tree,
    # run the same commands on it, append a commit, watch it appear --
    import tempfile

    from iceberg_meta_spark.sources.iceberg_fixture import write_fixture_table
    from iceberg_meta_spark.sources.iceberg_write import commit_append

    table = write_fixture_table(tempfile.mkdtemp(prefix="demo_iceberg_"))
    nat = api.NativeTableSource(spark, table, range_field_id=2)
    show("NATIVE iceberg table: summary (no jar, no pyiceberg)", api.summary(nat))
    show("NATIVE iceberg table: file health", api.file_health(nat))
    seen_nat = nat.snapshots().select("snapshot_id")
    commit_append(table, [{
        "file_path": f"{table}/data/apac/demo.parquet",
        "partition": {"region": "apac"},
        "record_count": 42, "file_size_in_bytes": 1 << 20,
    }])
    nat2 = api.NativeTableSource(spark, table)
    show("NATIVE iceberg table: watch sees the commit_append", api.watch(nat2, seen_nat))
    spark.stop()


if __name__ == "__main__":
    main()
