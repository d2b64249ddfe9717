"""Maintenance-planning kernels: compaction, snapshot expiry, orphan files."""

from __future__ import annotations

import contextlib
import io

from iceberg_meta_spark.operators.maintenance import (
    compaction_plan,
    orphan_files,
    snapshot_expiry,
)
from iceberg_meta_spark.sources.fixtures import SMALL_FILE_THRESHOLD, derive

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_compaction_plan_conserves_bytes_and_bounds_groups(spark):
    files = derive(spark, SF, "meta_files")
    small = files.filter(f"file_size_in_bytes < {SMALL_FILE_THRESHOLD}")
    total_small = small.groupBy().sum("file_size_in_bytes").collect()[0][0]
    target = 128 * 1024 * 1024
    groups = compaction_plan(files, target_bytes=target).collect()
    assert sum(g.group_bytes for g in groups) == total_small  # nothing lost
    for g in groups:
        assert g.n_files >= 1
        # group start offset < target and every member < small threshold
        assert g.group_bytes < target + SMALL_FILE_THRESHOLD
    # group ids start at 0 within each (snapshot, partition)
    firsts = {}
    for g in groups:
        key = (g.snapshot_id, g.part_key)
        firsts[key] = min(firsts.get(key, g.group_id), g.group_id)
    assert all(v == 0 for v in firsts.values())


def test_compaction_window_stays_partitioned(spark):
    p = plan(compaction_plan(derive(spark, SF, "meta_files")))
    assert "Window" in p, p
    assert "hashpartitioning(snapshot_id" in p, p


def test_snapshot_expiry_policy(spark):
    rows = [
        # (snapshot_id, committed_us, operation, total_data_files, total_files_size)
        (1, 100, "append", 1, 10),
        (2, 200, "append", 2, 20),
        (3, 300, "overwrite", 3, 30),
        (4, 400, "append", 4, 40),
        (5, 500, "append", 5, 50),
    ]
    snaps = spark.createDataFrame(
        rows,
        "snapshot_id long, committed_us long, operation string, "
        "total_data_files long, total_files_size long",
    )
    # keep last 2; cutoff at 350 (now=1000, max_age=650): snapshots 4,5 are
    # rank-protected; 3 is older than... no — 3 (300 < 350) expires; 1,2 expire.
    out = snapshot_expiry(snaps, keep_last=2, max_age_us=650, now_us=1000).collect()
    assert [r.snapshot_id for r in out] == [3, 2, 1]
    assert [r.recency_rank for r in out] == [3, 4, 5]
    # widen retention age -> cutoff 150: only snapshot 1 expires
    out2 = snapshot_expiry(snaps, keep_last=2, max_age_us=850, now_us=1000).collect()
    assert [r.snapshot_id for r in out2] == [1]
    # a zero/negative clock would make the cutoff negative and silently plan
    # nothing — rejected rather than returning 'nothing to expire'
    import pytest

    with pytest.raises(ValueError, match="now_us"):
        snapshot_expiry(snaps, now_us=0)


def test_orphan_files_is_anti_join(spark):
    storage = spark.createDataFrame(
        [("a", 10), ("b", 20), ("tmp_1", 5), ("tmp_2", 7)],
        "file_path string, file_size_in_bytes long",
    )
    meta = spark.createDataFrame([("a",), ("b",)], "file_path string")
    df = orphan_files(storage, meta)
    assert [(r.file_path, r.file_size_in_bytes) for r in df.collect()] == [
        ("tmp_1", 5),
        ("tmp_2", 7),
    ]
    assert "LeftAnti" in plan(df)


def test_orphan_fixture_only_tmp_paths(spark):
    out = orphan_files(
        derive(spark, SF, "storage_files"), derive(spark, SF, "meta_files")
    ).collect()
    assert out and all(r.file_path.startswith("tmp_") for r in out)


def test_zorder_interleave_known_values(spark):
    from iceberg_meta_spark.operators.maintenance import _interleave_expr

    row = spark.sql(
        f"SELECT {_interleave_expr('3', '1', 4)} AS z1, "
        f"{_interleave_expr('0', '15', 4)} AS z2, "
        f"{_interleave_expr('15', '0', 4)} AS z3"
    ).collect()[0]
    assert row.z1 == 0b0111  # x=11b even bits, y=01b odd bits
    assert row.z2 == 0b10101010  # y fills odd bits
    assert row.z3 == 0b01010101  # x fills even bits


def test_zorder_layout_invariants_and_plan(spark):
    from iceberg_meta_spark.operators.maintenance import zorder_layout

    df = zorder_layout(derive(spark, SF, "file_ranges"), bits=16, n_buckets=16)
    p = plan(df)
    assert "Window" not in p, p
    assert "BroadcastNestedLoopJoin" in p or "Broadcast" in p, p  # 1-row bounds
    rows = df.collect()
    assert len(rows) == len(set(r.file_path for r in rows))
    assert all(0 <= r.zvalue < (1 << 32) for r in rows)
    assert all(r.zbucket == r.zvalue >> 28 for r in rows)
    assert 1 <= len({r.zbucket for r in rows}) <= 16
    # z-order output is sorted by code: adjacent files are range-local
    zs = [r.zvalue for r in rows]
    assert zs == sorted(zs)


def test_hilbert_index_is_a_hilbert_curve(spark):
    """Bijection + the defining locality property: consecutive codes on a
    2^b x 2^b grid are ALWAYS grid-adjacent (Manhattan distance 1) — the
    property Morton/Z-order lacks (its quadrant seams jump)."""
    from iceberg_meta_spark.operators.maintenance import hilbert_index

    bits, n = 3, 8
    cells = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    rows = hilbert_index(cells, bits).collect()
    pos = {r.hvalue: (r.x, r.y) for r in rows}
    assert sorted(pos) == list(range(n * n))  # bijection onto 0..63
    assert all(
        abs(pos[d][0] - pos[d + 1][0]) + abs(pos[d][1] - pos[d + 1][1]) == 1
        for d in range(n * n - 1)
    )


def test_hilbert_layout_invariants_and_plan(spark):
    from iceberg_meta_spark.operators.maintenance import hilbert_layout, zorder_layout

    df = hilbert_layout(derive(spark, SF, "file_ranges"), bits=8, n_buckets=16)
    p = plan(df)
    assert "Window" not in p, p
    assert "Broadcast" in p, p  # 1-row bounds aggregate broadcast back
    rows = df.collect()
    assert len(rows) == len(set(r.file_path for r in rows))
    assert all(0 <= r.hvalue < (1 << 16) for r in rows)
    assert all(r.hbucket == r.hvalue >> 12 for r in rows)
    hs = [r.hvalue for r in rows]
    assert hs == sorted(hs)
    # locality: bucketing the FULL 16x16 grid by high code bits, Hilbert
    # buckets have no-worse summed bounding-box semi-perimeter in (x, y)
    # space than Morton buckets — the min/max pruning proxy a rewrite
    # optimizes. (Morton's quadrant seams inflate some bucket boxes.)
    from collections import defaultdict

    from iceberg_meta_spark.operators.maintenance import _interleave_expr, hilbert_index
    from pyspark.sql import functions as F

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    hv = hilbert_index(grid, 4).select("x", "y", F.expr("hvalue >> 4").alias("b")).collect()
    zv = grid.select(
        "x", "y", F.expr(f"({_interleave_expr('x', 'y', 4)}) >> 4").alias("b")
    ).collect()

    def semi_perimeter(rows_):
        by = defaultdict(list)
        for r in rows_:
            by[r.b].append((r.x, r.y))
        return sum(
            max(x for x, _ in v) - min(x for x, _ in v)
            + max(y for _, y in v) - min(y for _, y in v)
            for v in by.values()
        )

    assert semi_perimeter(hv) <= semi_perimeter(zv)


def test_cdc_latest_state_struct_max_matches_window(spark):
    changes = spark.createDataFrame(
        [(1, 10, 100, "a", 5), (1, 20, 101, "b", 6), (1, 20, 99, "c", 7),
         (2, 5, 50, "d", 8)],
        "user_id long, ts_us long, event_id long, event_type string, value_cents long",
    )
    from pyspark.sql import functions as F

    latest = (
        changes.groupBy("user_id")
        .agg(F.max(F.struct("ts_us", "event_id", "event_type", "value_cents")).alias("s"))
        .select("user_id", "s.ts_us", "s.event_id")
        .orderBy("user_id")
        .collect()
    )
    # ties on ts_us resolve by the higher event_id (101 beats 99)
    assert [(r.user_id, r.ts_us, r.event_id) for r in latest] == [
        (1, 20, 101), (2, 5, 50),
    ]


def test_ancestry_chain_and_tree(spark):
    from iceberg_meta_spark.operators.lineage import ancestry

    # chain 0 <- 1 <- 2 <- 3 plus a binary tree rooted at 10
    rows = [(0, None), (1, 0), (2, 1), (3, 2),
            (10, None), (11, 10), (12, 10), (13, 11), (14, 11)]
    nodes = spark.createDataFrame(rows, "snapshot_id long, parent_id long")
    got = {(r.snapshot_id, r.root_id, r.depth) for r in ancestry(nodes, 16).collect()}
    assert got == {
        (0, 0, 0), (1, 0, 1), (2, 0, 2), (3, 0, 3),
        (10, 10, 0), (11, 10, 1), (12, 10, 1), (13, 10, 2), (14, 10, 2),
    }


def test_ancestry_dangling_parent_is_root(spark):
    from iceberg_meta_spark.operators.lineage import ancestry

    nodes = spark.createDataFrame(
        [(5, 99), (6, 5)], "snapshot_id long, parent_id long"
    )  # 99 does not exist
    got = {(r.snapshot_id, r.root_id, r.depth) for r in ancestry(nodes, 8).collect()}
    assert got == {(5, 99, 1), (6, 99, 2)}


def test_ancestry_random_forest_matches_python(spark):
    import random

    from iceberg_meta_spark.operators.lineage import ancestry

    rng = random.Random(7)
    rows = [(0, None)]
    for i in range(1, 60):
        rows.append((i, rng.randrange(i) if rng.random() < 0.9 else None))
    parent = {i: p for i, p in rows}

    def walk(i):
        d = 0
        while parent[i] is not None:
            i, d = parent[i], d + 1
        return i, d

    expect = {(i, *walk(i)) for i, _ in rows}
    nodes = spark.createDataFrame(rows, "snapshot_id long, parent_id long")
    got = {(r.snapshot_id, r.root_id, r.depth) for r in ancestry(nodes, 64).collect()}
    assert got == expect


def test_incremental_stats_equal_full_recompute(spark):
    """The incremental-maintenance contract: old stats + delta == full
    recompute at the new snapshot, including groups that appear/disappear
    and ids whose contribution CHANGES between snapshots."""
    from pyspark.sql import functions as F

    from iceberg_meta_spark.operators.incremental import incremental_group_stats

    old = spark.createDataFrame(
        [("a", "f1", 10, 100), ("a", "f2", 20, 200), ("b", "f3", 5, 50),
         ("gone", "f9", 1, 1)],
        "g string, id string, rc long, fb long",
    )
    new = spark.createDataFrame(
        [("a", "f1", 10, 100),     # unchanged
         ("a", "f2", 25, 250),     # modified contribution
         ("a", "f4", 7, 70),       # added
         ("b", "f3", 5, 50),       # unchanged group b
         ("c", "f5", 3, 30)],      # brand-new group
        "g string, id string, rc long, fb long",
    )
    out = {
        r.g: r
        for r in incremental_group_stats(old, new, "g", "id", ("rc", "fb")).collect()
    }
    full = {
        r.g: r
        for r in new.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("rc").alias("rc"), F.sum("fb").alias("fb"))
        .collect()
    }
    assert set(out) == set(full) | {"gone"}
    for g, r in full.items():
        assert (out[g].n, out[g].rc, out[g].fb) == (r.n, r.rc, r.fb), g
    # the vanished group nets to zero via its delta
    assert (out["gone"].n, out["gone"].rc, out["gone"].fb) == (0, 0, 0)
    # delta columns expose the applied work: group b saw none
    assert (out["b"].d_n, out["b"].d_rc, out["b"].d_fb) == (0, 0, 0)
    assert out["a"].d_n == 1 and out["a"].d_rc == 12 and out["a"].d_fb == 120


def test_manifest_rewrite_plan_groups_small_data_manifests(spark):
    from iceberg_meta_spark.operators.maintenance import manifest_rewrite_plan

    mb = 1024 * 1024
    rows = [
        # snapshot 1, spec 0: three small data manifests -> one group
        (1, "m1", 300 * 1024, 0, 0, 5, 2, 0),
        (1, "m2", 400 * 1024, 0, 0, 3, 1, 0),
        (1, "m3", 200 * 1024, 0, 0, 2, 0, 0),
        # small DELETE manifest: excluded
        (1, "m4", 100 * 1024, 0, 1, 1, 0, 1),
        # big data manifest: not small
        (1, "m5", 20 * mb, 0, 0, 9, 9, 0),
        # snapshot 2: a lone small manifest -> singleton group dropped
        (2, "m6", 100 * 1024, 0, 0, 1, 0, 0),
    ]
    mans = spark.createDataFrame(
        rows,
        "snapshot_id long, manifest_path string, manifest_length long, "
        "partition_spec_id int, content int, added_files_count int, "
        "existing_files_count int, deleted_files_count int",
    )
    out = manifest_rewrite_plan(mans).collect()
    assert len(out) == 1
    g = out[0]
    assert g.snapshot_id == 1 and g.n_manifests == 3
    assert g.group_bytes == 900 * 1024 and g.group_files == 5 + 2 + 3 + 1 + 2


def test_equality_delete_plan_zone_map_semantics(spark):
    from iceberg_meta_spark.operators.maintenance import equality_delete_plan

    stats = spark.createDataFrame(
        [
            ("f1", 3, 10, 20),   # contains 15
            ("f2", 3, 30, 40),   # contains none
            ("f3", 3, 0, 100),   # contains 15 AND 99
            ("f4", 7, 10, 20),   # right range, wrong column
        ],
        "file_path string, field_id int, lower_bound long, upper_bound long",
    )
    files = spark.createDataFrame(
        [("f1", 1000, 10), ("f2", 2000, 20), ("f3", 3000, 30), ("f4", 4000, 40)],
        "file_path string, file_size_in_bytes long, record_count long",
    )
    rows = equality_delete_plan(stats, files, field_id=3, subject_keys=[15, 99]).collect()
    got = {r.file_path: (r.n_candidate_keys, r.rewrite_bytes, r.rows_upper_bound) for r in rows}
    assert got == {"f1": (1, 1000, 10), "f3": (2, 3000, 30)}


def test_equality_delete_plan_is_map_side_containment(spark):
    from iceberg_meta_spark.operators.maintenance import equality_delete_plan

    stats = spark.createDataFrame(
        [("f1", 3, 10, 20)],
        "file_path string, field_id int, lower_bound long, upper_bound long",
    )
    files = spark.createDataFrame(
        [("f1", 1000, 10)], "file_path string, file_size_in_bytes long, record_count long"
    )
    plan = (
        equality_delete_plan(stats, files, field_id=3, subject_keys=[15])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the key-containment test must not be a join: exactly ONE join total
    # (attaching file sizes), and never a nested-loop/cartesian
    assert plan.count("Join") <= plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count("ShuffledHashJoin")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_scan_task_plan_crafted_and_invariants(spark):
    """Split math on a crafted frame with known answers, then fixture-wide
    invariants: n_splits >= ideal_tasks >= 1, overhead = splits - ideal,
    max split never exceeds the target, and no row explosion in the plan
    (no Generate/Explode node — the split counts are closed-form)."""
    from iceberg_meta_spark.operators.maintenance import scan_task_plan

    t = 100
    crafted = spark.createDataFrame(
        [
            # part a: 250 -> 3 splits (100,100,50); 90 -> 1 split
            (1, "f1", "a", 250),
            (1, "f2", "a", 90),
            # part b: exactly-at-target 100 -> 1 split; 101 -> 2 splits
            (1, "f3", "b", 100),
            (1, "f4", "b", 101),
        ],
        "snapshot_id int, file_path string, part_key string, file_size_in_bytes long",
    )
    rows = {r["part_key"]: r for r in scan_task_plan(crafted, target_bytes=t).collect()}
    a, b = rows["a"], rows["b"]
    assert (a.n_files, a.total_bytes, a.n_splits) == (2, 340, 4)
    assert (a.ideal_tasks, a.overhead_splits, a.max_split_bytes) == (4, 0, 100)
    assert (b.n_files, b.total_bytes, b.n_splits) == (2, 201, 3)
    assert (b.ideal_tasks, b.overhead_splits, b.max_split_bytes) == (3, 0, 100)

    target = 32 * 1024 * 1024
    files = derive(spark, SF, "meta_files")
    out = scan_task_plan(files, target_bytes=target, snapshot_id=2)
    assert "Generate" not in plan(out)
    got = out.collect()
    assert got
    n_files_direct = files.filter("snapshot_id = 2").count()
    assert sum(r.n_files for r in got) == n_files_direct
    for r in got:
        assert r.n_splits >= r.ideal_tasks >= 1
        assert r.overhead_splits == r.n_splits - r.ideal_tasks
        assert 0 < r.max_split_bytes <= target


def test_source_quota_cap_matches_brute_force(spark):
    """The salted two-phase top-Q must keep exactly the Q best-scored docs
    per source (score desc, doc_id tie-break) — pinned against a driver-side
    brute force over the scored corpus."""
    from iceberg_meta_spark.pipeline import classifier
    from iceberg_meta_spark.queries.text import _QUOTA_Q, source_quota_cap
    from iceberg_meta_spark.sources.parquet import load_table

    docs = load_table(spark, SF, "documents")
    scored = classifier.features_frame(docs, extra_cols=("source", "n_chars")).select(
        "doc_id", "source", "n_chars", classifier.score_expr()
    )
    by_source: dict[str, list] = {}
    for r in scored.collect():
        by_source.setdefault(r["source"], []).append(r)
    got = {r["source"]: r for r in source_quota_cap(spark, SF).collect()}
    assert set(got) == set(by_source)
    for src, members in by_source.items():
        members.sort(key=lambda r: (-r["score_micro"], r["doc_id"]))
        kept = members[:_QUOTA_Q]
        g = got[src]
        assert g.n_docs_total == len(members)
        assert g.n_docs_kept == len(kept)
        assert g.n_docs_dropped == len(members) - len(kept)
        assert g.chars_kept == sum(r["n_chars"] for r in kept)
        assert g.chars_total == sum(r["n_chars"] for r in members)
        assert g.min_kept_score == min(r["score_micro"] for r in kept)


def test_retention_policy_gfs_tiers(spark):
    from iceberg_meta_spark.operators.maintenance import retention_policy

    DAY = 86_400_000_000
    now = 100 * DAY
    # two snapshots on day 99 (yesterday), one per day 95/70, one ancient
    rows = [
        (1, 99 * DAY + 1000),      # day 99, older of the two
        (2, 99 * DAY + 2000),      # day 99, last-of-day
        (3, 95 * DAY + 500),       # day 95, last-of-day, within 30 days
        (4, 70 * DAY + 500),       # day 70, last-of-day AND last-of-week 10
        (5, 1 * DAY + 500),        # ancient: outside every tier
    ]
    snaps = spark.createDataFrame(rows, "snapshot_id long, committed_us long")
    out = {
        r.snapshot_id: r
        for r in retention_policy(
            snaps, now_us=now, keep_last=2, keep_all_hours=24,
            daily_days=30, weekly_weeks=12,
        ).collect()
    }
    # last-2 = snapshots 2 and 1 (by recency); neither is <24h old (now is
    # start of day 100, they are from day 99 but >24h? 99*DAY+2000 is within
    # 24h of 100*DAY -> recent too)
    assert out[2].keep and "last-k" in out[2].reasons
    assert "daily" in out[2].reasons  # last of day 99
    assert out[1].keep and out[1].reasons == "last-k,recent"
    assert out[3].keep and out[3].reasons == "daily,weekly"
    # day 70 is outside daily_days=30 (cutoff day 70 >= 100-30) — boundary:
    # 70 >= 70 -> still daily; and last of week 10 >= 100//7-12=2 -> weekly
    assert out[4].keep and "weekly" in out[4].reasons
    assert not out[5].keep and out[5].reasons == "expire"

    import pytest

    with pytest.raises(ValueError, match="now_us"):
        retention_policy(snaps, now_us=-1)
