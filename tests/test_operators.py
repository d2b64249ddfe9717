"""Kernel unit tests on pinned synthetic inputs — the reference's test style
(structural invariants, dev/tests/test_health.py / test_diff.py) plus exact
expectations where the fixture is fully pinned (FIXTURES.md §3 scenarios)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_meta_spark import operators as ops
from iceberg_meta_spark.functions import display
from iceberg_meta_spark.sources.fixtures import SMALL_FILE_THRESHOLD

MB = 1024 * 1024


def _files(spark, rows):
    return spark.createDataFrame(
        rows,
        "snapshot_id long, file_path string, file_format string, part_key string, "
        "manifest_path string, record_count long, file_size_in_bytes long",
    )


def _file(snap, path, part="p0", manifest="m0", rows=10, size=MB):
    return (snap, path, "PARQUET", part, manifest, rows, size)


def test_file_size_stats_basic(spark):
    files = _files(spark, [_file(1, "a", size=10 * MB), _file(1, "b", size=40 * MB), _file(1, "c", size=100 * MB)])
    row = ops.file_size_stats(files).collect()[0]
    assert row.file_count == 3
    assert row.total_size == 150 * MB
    assert row.min_size == 10 * MB and row.max_size == 100 * MB
    assert row.median_size == 40.0 * MB
    assert row.small_files == 1  # only the 10 MB file is under 32 MiB
    assert abs(row.small_pct - 33.3333) < 1e-9


def test_file_size_stats_empty_table_all_zeros(spark):
    # Reference scenario: empty table -> all-zero health report
    # (formatters.py:384-414; dev/tests/test_health.py:34-53).
    empty = _files(spark, [])
    row = ops.file_size_stats(empty).collect()[0]
    assert (row.file_count, row.total_size, row.min_size, row.max_size) == (0, 0, 0, 0)
    assert (row.avg_size, row.median_size, row.small_pct) == (0.0, 0.0, 0.0)


def test_partition_skew_flags_and_zero_guard(spark):
    # One partition with 6 files vs two with 1 -> avg 8/3, 6 > 2*avg.
    rows = [_file(1, f"hot{i}", part="hot") for i in range(6)]
    rows += [_file(1, "c1", part="cold1"), _file(1, "c2", part="cold2")]
    out = {r.part_key: r for r in ops.partition_skew(_files(spark, rows)).collect()}
    assert out["hot"].skewed and not out["cold1"].skewed
    assert abs(out["hot"].skew_ratio - round(6 / (8 / 3), 4)) < 1e-9


def test_snapshot_diff_append_and_overwrite(spark):
    # Append-only: added>0, deleted==0 (reference test_diff.py:17-24).
    s1 = _files(spark, [_file(1, "a"), _file(1, "b")])
    s2_append = _files(spark, [_file(2, "a"), _file(2, "b"), _file(2, "c")])
    d = ops.snapshot_diff_summary(s1, s2_append).collect()[0]
    assert d.added_files == 1 and d.deleted_files == 0 and d.net_files == 1
    # Overwrite: both directions present (reference test_diff.py:26-44).
    s2_over = _files(spark, [_file(2, "a"), _file(2, "d")])
    d2 = ops.snapshot_diff_summary(s1, s2_over).collect()[0]
    assert d2.added_files == 1 and d2.deleted_files == 1 and d2.net_files == 0


def test_column_health_non_nullable_zero_pct(spark):
    stats = spark.createDataFrame(
        [("f1", 1, 100, 0, 1000, 1, 50), ("f1", 2, 100, 25, 3000, 5, 60)],
        "file_path string, field_id int, value_count long, null_count long, "
        "column_size long, lower_bound long, upper_bound long",
    )
    out = {r.field_id: r for r in ops.column_health(stats).collect()}
    assert out[1].null_pct == 0.0  # non-nullable column -> 0.0%
    assert out[2].null_pct == 25.0
    assert out[1].bytes_pct == 25.0 and out[2].bytes_pct == 75.0
    assert out[2].min_lower == 5 and out[2].max_upper == 60


def _ranges(spark, rows):
    return spark.createDataFrame(rows, "file_path string, lo long, hi long")


def test_overlap_exact_and_sweepline_agree(spark):
    # [0,10],[5,15],[20,30],[8,25]: pairs (a,b),(a,d),(b,d),(c,d) = 4.
    r = _ranges(spark, [("a", 0, 10), ("b", 5, 15), ("c", 20, 30), ("d", 8, 25)])
    exact = ops.overlap_pair_count(r).collect()[0]
    assert exact.overlapping_pairs == 4
    sweep = ops.overlap_sweepline(r, bucket_width=7).collect()[0]
    assert sweep.overlapping_files == 3  # b, d, c each overlap a predecessor


def test_overlap_gate_returns_sentinel(spark):
    # above the gate, -1 only when the sweep actually detects an overlap
    r = _ranges(spark, [(f"f{i}", i, i + 2) for i in range(10)])
    out = ops.overlap_pair_count(r, limit=5).collect()[0]
    assert out.overlapping_pairs == -1 and out.file_count == 10
    # disjoint ranges above the gate: a big-but-clean table reports 0
    clean = _ranges(spark, [(f"f{i}", i * 10, i * 10 + 2) for i in range(10)])
    out = ops.overlap_pair_count(clean, limit=5).collect()[0]
    assert out.overlapping_pairs == 0 and out.file_count == 10
    # exactly-touching ranges count as overlapping (inclusive bounds),
    # consistent with the exact mode's a.lo <= b.hi join
    touch = _ranges(spark, [(f"f{i}", i * 5, (i + 1) * 5) for i in range(10)])
    out = ops.overlap_pair_count(touch, limit=5).collect()[0]
    assert out.overlapping_pairs == -1


def test_overlap_sweepline_bucketed_matches_global(spark):
    # Bucketed two-level running max == single global window, any width.
    import random

    rng = random.Random(7)
    rows = [(f"f{i}", rng.randrange(0, 1000), 0) for i in range(200)]
    rows = [(p, lo, lo + rng.randrange(1, 120)) for p, lo, _ in rows]
    r = _ranges(spark, rows)
    counts = {
        w: ops.overlap_sweepline(r, bucket_width=w).collect()[0].overlapping_files
        for w in (1, 13, 4096, 10**9)
    }
    assert len(set(counts.values())) == 1


def _fields(spark, rows):
    return spark.createDataFrame(
        rows, "table_name string, schema_id int, field_id int, name string, type string, required boolean"
    )


def test_schema_diff_detects_all_changes(spark):
    fields = _fields(
        spark,
        [
            ("t", 1, 1, "id", "long", True),
            ("t", 1, 2, "old_only", "string", False),
            ("t", 1, 3, "renamed", "string", False),
            ("t", 1, 4, "typed", "int", False),
            ("t", 2, 1, "id", "long", True),
            ("t", 2, 3, "renamed_v2", "string", False),
            ("t", 2, 4, "typed", "long", False),
            ("t", 2, 5, "new_col", "date", False),
        ],
    )
    out = {r.field_id: r.change for r in ops.schema_diff(fields, 1, 2).collect()}
    # field 1 unchanged -> absent; 2 removed; 3 renamed; 4 type change; 5 added
    assert out == {2: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_schema_conflicts(spark):
    fields = _fields(
        spark,
        [
            ("t1", 2, 1, "amount", "double", False),
            ("t2", 2, 2, "amount", "long", False),
            ("t1", 2, 3, "id", "long", True),
            ("t2", 2, 4, "id", "long", True),
        ],
    )
    rows = ops.schema_conflicts(fields, 2).collect()
    assert len(rows) == 1
    assert rows[0].name == "amount" and rows[0].n_types == 2
    assert rows[0].types == "double,long"


def test_display_functions(spark):
    df = spark.createDataFrame(
        [(512, 999), (1024, 1536), (5 * MB + 300 * 1024, 1234567), (3 * 1024**3, 2_500_000_000)],
        "v long, w long",
    )
    rows = df.select(
        display.format_bytes(F.col("v")).alias("b"),
        display.compact_number(F.col("w")).alias("c"),
        display.format_net(F.col("v") - 1024).alias("n"),
    ).collect()
    # 5550080 B / MB = 5.293 -> rounds to '5.3' like the reference's f'{:.1f}'
    assert [r.b for r in rows] == ["512.0 B", "1.0 KB", "5.3 MB", "3.0 GB"]
    assert [r.c for r in rows] == ["999", "1.5K", "1.2M", "2.5B"]
    assert [r.n for r in rows] == ["-512", "0", "+5549056", "+3221224448"]


def test_format_bytes_rounds_and_reaches_pb(spark):
    df = spark.createDataFrame(
        [(1126,), (1024**4 - 1,), (3 * 1024**5,), (1536,)], "v long"
    )
    got = [r.b for r in df.select(display.format_bytes(F.col("v")).alias("b")).collect()]
    # 1126/1024 = 1.0996: half-up decimal gives '1.1 KB' (truncation said 1.0);
    # TB-1 rounds up to the unit boundary text exactly like f'{:.1f}' does
    assert got == ["1.1 KB", "1024.0 GB", "3.0 PB", "1.5 KB"]


def test_format_timestamp_us(spark):
    df = spark.createDataFrame([(1704067200_000_000,)], "us long")
    row = df.select(display.format_timestamp_us(F.col("us")).alias("s")).collect()[0]
    assert row.s == "2024-01-01 00:00:00 UTC"


def test_truncate_path(spark):
    long = "warehouse/" + "x/" * 40 + "part-00000.parquet"
    df = spark.createDataFrame([("short/path.parquet",), (long,)], "p string")
    rows = df.select(display.truncate_path(F.col("p")).alias("t")).collect()
    assert rows[0].t == "short/path.parquet"
    assert rows[1].t == ".../part-00000.parquet"


def test_freshness_and_alerts(spark):
    now = 1713139200000  # fixed NOW
    day = 86400000
    tables = spark.createDataFrame(
        [
            ("ns", "fresh_t", 2, 3, now - 2 * day, 10, 100, 1000),
            ("ns", "stale_t", 2, 3, now - 10 * day, 10, 100, 1000),
            ("ns", "crit_t", 1, 60, now - 45 * day, 10, 100, 1000),
        ],
        "namespace string, table_name string, format_version int, snapshot_count int, "
        "last_updated_ms long, total_files long, total_records long, total_size long",
    )
    hist = {r.freshness: r.table_count for r in ops.freshness_histogram(tables, now_ms=now).collect()}
    assert hist == {"fresh": 1, "stale": 1, "critical": 1}
    alerts = {r.table_name: r for r in ops.table_alerts(tables, now_ms=now).collect()}
    assert set(alerts) == {"crit_t"}
    assert alerts["crit_t"].is_stale and alerts["crit_t"].too_many_snapshots and alerts["crit_t"].is_v1_format


def test_warehouse_rollup_has_grand_total(spark):
    tables = spark.createDataFrame(
        [("a", "t1", 2, 1, 0, 1, 10, 100), ("b", "t2", 2, 1, 0, 2, 20, 200)],
        "namespace string, table_name string, format_version int, snapshot_count int, "
        "last_updated_ms long, total_files long, total_records long, total_size long",
    )
    out = {r.namespace: r for r in ops.warehouse_rollup(tables).collect()}
    assert out["(warehouse)"].total_size == 300 and out["(warehouse)"].table_count == 2
    assert out["a"].total_size == 100


def test_new_snapshots_anti_join(spark):
    cur = spark.createDataFrame([(1,), (2,), (3,)], "snapshot_id long")
    seen = spark.createDataFrame([(1,), (2,)], "snapshot_id long")
    assert [r.snapshot_id for r in ops.new_snapshots(cur, seen).collect()] == [3]


def test_warehouse_cube_all_levels(spark):
    tables = spark.createDataFrame(
        [("a", "t1", 1, 1, 0, 1, 10, 100), ("a", "t2", 2, 1, 0, 2, 20, 200), ("b", "t3", 2, 1, 0, 3, 30, 400)],
        "namespace string, table_name string, format_version int, snapshot_count int, "
        "last_updated_ms long, total_files long, total_records long, total_size long",
    )
    out = {(r.namespace, r.format_version): r for r in ops.warehouse_cube(tables).collect()}
    assert out[("(all)", -1)].total_size == 700          # grand total
    assert out[("a", -1)].table_count == 2               # per-namespace
    assert out[("(all)", 2)].table_count == 2            # per-version
    assert out[("b", 2)].total_size == 400               # finest level
    assert len(out) == 1 + 2 + 2 + 3


def test_schema_field_history_lag(spark):
    fields = spark.createDataFrame(
        [
            # field 1: stable in v1, renamed in v2, retyped in v3
            ("t", 1, 1, "a", "int", True),
            ("t", 2, 1, "a2", "int", True),
            ("t", 3, 1, "a2", "long", True),
            # field 2: appears in v2 (added), requirement flips in v3
            ("t", 2, 2, "b", "string", False),
            ("t", 3, 2, "b", "string", True),
        ],
        "table_name string, schema_id int, field_id int, name string, type string, required boolean",
    )
    out = {(r.field_id, r.schema_id): r.change for r in ops.schema_field_history(fields).collect()}
    assert out == {
        (1, 1): "added",
        (1, 2): "renamed",
        (1, 3): "retyped",
        (2, 2): "added",
        (2, 3): "requirement_changed",
    }


def test_empty_table_all_zero_health_report(spark):
    # Reference contract: an empty table yields the all-zero report shape,
    # never NULLs (formatters.py:384-414).
    from iceberg_meta_spark.plans.health import health_report_df

    files = spark.createDataFrame(
        [], "snapshot_id long, file_path string, file_format string, part_key string, "
        "manifest_path string, record_count long, file_size_in_bytes long"
    )
    stats = spark.createDataFrame(
        [], "file_path string, field_id int, value_count long, null_count long, "
        "column_size long, lower_bound long, upper_bound long"
    )
    mans = spark.createDataFrame(
        [], "snapshot_id long, manifest_path string, manifest_length long, "
        "partition_spec_id int, content int, added_files_count int, "
        "existing_files_count int, deleted_files_count int"
    )
    ranges = spark.createDataFrame([], "file_path string, lo long, hi long")
    rows = health_report_df(files, stats, mans, ranges).collect()
    assert len(rows) == 8
    assert all(r.value == 0.0 for r in rows), rows


def test_salted_join_matches_plain_join(spark):
    from iceberg_meta_spark.operators.skew import salted_join

    # heavy-tailed key histogram: 'hot' carries 500 of 510 rows
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [(f"k{i}", i) for i in range(10)],
        "key string, v long",
    )
    small = spark.createDataFrame([("hot", 1), ("k3", 2), ("missing", 9)], "key string, w long")
    got = salted_join(big, small, "key", n_salts=4).groupBy("key").count().collect()
    expect = big.join(small, "key").groupBy("key").count().collect()
    assert {(r.key, r["count"]) for r in got} == {(r.key, r["count"]) for r in expect}
    # left join keeps unmatched big rows exactly once
    left = salted_join(big, small, "key", n_salts=4, how="left")
    assert left.count() == big.count()


def test_salted_count_matches_groupby(spark):
    from iceberg_meta_spark.operators.skew import salted_count

    df = spark.createDataFrame([("a",)] * 97 + [("b",)] * 3, "key string")
    got = {r.key: r.n for r in salted_count(df, "key", n_salts=5).collect()}
    assert got == {"a": 97, "b": 3}


def test_key_skew_profile_recommends_salting_for_hot_key(spark):
    from iceberg_meta_spark.operators.skew import key_skew_profile

    # 'hot' holds 900 of 1000 rows over 101 keys: max/avg ~ 90.9
    df = spark.createDataFrame(
        [("hot",)] * 900 + [(f"k{i:03d}",) for i in range(100)], "key string"
    )
    row = key_skew_profile(df, "key").collect()[0]
    assert row.key_col == "key"
    assert (row.n_rows, row.n_keys, row.max_cnt) == (1000, 101, 900)
    assert row.top_key == "hot"
    assert abs(row.max_over_avg - 90.9) < 0.01
    # Herfindahl: 1000^2 / (900^2 + 100*1) = 1.23 effective keys
    assert abs(row.eff_keys - 1.23) < 0.01
    assert row.recommendation == "salt"
    # ceil(90.9) = 91 capped at 64
    assert row.salt_n == 64


def test_key_skew_profile_uniform_and_tiny_keyspace(spark):
    from iceberg_meta_spark.operators.skew import key_skew_profile

    uniform = spark.createDataFrame(
        [(f"k{i:04d}",) for i in range(2000)] * 2, "key string"
    )
    r = key_skew_profile(uniform, "key").collect()[0]
    assert r.recommendation == "hash-partition as-is"
    assert r.salt_n == 0
    assert r.max_over_avg == 1.0
    assert r.eff_keys == 2000.0

    tiny = spark.createDataFrame([("a",), ("b",), ("b",)], "key string")
    t = key_skew_profile(tiny, "key").collect()[0]
    assert t.recommendation == "pre-aggregate or broadcast"
    # ties on cnt break by key value, deterministically (max struct)
    assert t.top_key == "b"


def test_key_skew_profile_top_key_tie_is_deterministic(spark):
    from iceberg_meta_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame([("a",), ("z",), ("m",)], "key string")
    # all counts tie at 1 -> greatest key wins (ORDER BY cnt DESC, k DESC)
    assert key_skew_profile(df, "key").collect()[0].top_key == "z"


def test_join_preflight_out_rows_equals_real_join(spark):
    from iceberg_meta_spark.operators.skew import join_cardinality_preflight

    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)], "key string"
    )
    right = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 5 + [("d",)], "key string"
    )
    row = join_cardinality_preflight(left, right, "key", broadcast_row_cap=2).collect()[0]
    assert row.out_rows == left.join(right, "key").count() == 22
    assert row.matched_keys == 2
    assert (row.max_key_out, row.top_key) == (12, "a")
    assert (row.left_rows, row.right_rows) == (6, 10)
    # neither side fits a 2-row broadcast cap, no 8x hot key -> as-is
    assert row.recommendation == "sort-merge as-is"


def test_join_preflight_broadcast_and_salted_branches(spark):
    from iceberg_meta_spark.operators.skew import join_cardinality_preflight

    small = spark.createDataFrame([("a",), ("b",)], "key string")
    big = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "key string")
    r = join_cardinality_preflight(big, small, "key", broadcast_row_cap=10).collect()[0]
    assert r.recommendation == "broadcast smaller side"

    # one key produces 100x the output of each of 100 cold keys
    hot_left = spark.createDataFrame(
        [("hot",)] * 100 + [(f"k{i:03d}",) for i in range(100)], "key string"
    )
    hot_right = spark.createDataFrame(
        [("hot",)] * 100 + [(f"k{i:03d}",) for i in range(100)], "key string"
    )
    s = join_cardinality_preflight(hot_left, hot_right, "key", broadcast_row_cap=10).collect()[0]
    # out = 100*100 + 100*1 = 10100; max_key_out*matched = 10000*101 > 8*10100
    assert (s.out_rows, s.max_key_out) == (10100, 10000)
    assert s.recommendation == "salted sort-merge"


def test_join_preflight_disjoint_keys_zero_output(spark):
    from iceberg_meta_spark.operators.skew import join_cardinality_preflight

    left = spark.createDataFrame([("a",), ("b",)], "key string")
    right = spark.createDataFrame([("x",), ("y",)], "key string")
    r = join_cardinality_preflight(left, right, "key", broadcast_row_cap=0).collect()[0]
    assert (r.matched_keys, r.out_rows, r.max_key_out) == (0, 0, 0)
    assert r.top_key is None
    assert r.amplification == 0.0


def test_column_profile_metrics_and_single_scan(spark):
    from iceberg_meta_spark.operators.profile import column_profile

    df = spark.createDataFrame(
        [(1, "aa", 2.0), (2, None, 4.0), (2, "bbbb", None), (None, "aa", 8.0)],
        "k long, s string, v double",
    )
    rows = {r.column: r for r in column_profile(df).collect()}
    assert rows["k"].n_rows == 4 and rows["k"].n_nulls == 1
    assert rows["k"].null_share == 0.25 and rows["k"].n_distinct == 2
    assert (rows["k"].min_num, rows["k"].max_num) == (1.0, 2.0)
    assert rows["k"].avg_len is None
    # string column: numeric range NULL, mean length over NON-NULL values
    assert rows["s"].min_num is None
    assert rows["s"].avg_len == round((2 + 4 + 2) / 3, 4)
    assert rows["v"].n_distinct == 3
    # one scan: exactly one (expanded) aggregate over the input, no union
    # of per-column subplans — the long format must come from explode
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        column_profile(df).explain("formatted")
    import re

    formatted = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Scan ", formatted)) <= 1, formatted
    assert "Union" not in formatted, formatted


def test_column_profile_empty_table_zero_guard(spark):
    from iceberg_meta_spark.operators.profile import column_profile

    empty = spark.createDataFrame([], "k long, s string")
    rows = {r.column: r for r in column_profile(empty).collect()}
    assert rows["k"].n_rows == 0 and rows["k"].null_share == 0.0
    assert rows["s"].n_distinct == 0


def test_column_profile_approx_mode_close_to_exact(spark):
    from iceberg_meta_spark.operators.profile import column_profile

    df = spark.range(5000).select((F.col("id") % 977).alias("k"))
    exact = {r.column: r.n_distinct for r in column_profile(df).collect()}
    approx = {r.column: r.n_distinct for r in column_profile(df, approx=True).collect()}
    assert exact["k"] == 977
    assert abs(approx["k"] - 977) / 977 < 0.1


def test_correlation_matrix_matches_numpy_and_edge_cases(spark):
    from iceberg_meta_spark.operators.stats import correlation_matrix

    xs = [1, 2, 3, 4, 10]
    ys = [2, 4, 7, 8, 21]
    zs = [5, 5, 5, 5, 5]  # zero variance
    df = spark.createDataFrame(list(zip(xs, ys, zs)), "x long, y long, z long")
    rows = {(r.col_x, r.col_y): r for r in correlation_matrix(df, ["x", "y", "z"]).collect()}
    import math

    n = len(xs)
    num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    den = math.sqrt((n * sum(a * a for a in xs) - sum(xs) ** 2)
                    * (n * sum(b * b for b in ys) - sum(ys) ** 2))
    assert rows[("x", "y")].corr == round(num / den, 6)
    assert rows[("x", "y")].n_rows == 5
    # zero-variance side -> NULL, not a division error
    assert rows[("x", "z")].corr is None and rows[("y", "z")].corr is None


def test_correlation_matrix_single_scan_plan(spark):
    import contextlib
    import io
    import re

    from iceberg_meta_spark.operators.stats import correlation_matrix

    df = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        correlation_matrix(df, ["a", "b"]).explain("formatted")
    p = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Scan ", p)) <= 1, p
    assert "Union" not in p and "Join" not in p, p


def test_grouped_ols_matches_closed_form(spark):
    from iceberg_meta_spark.operators.stats import grouped_ols

    # group g: y = 3x + 10 exactly -> slope 3, intercept 10, r2 = 1
    pts = [("g", x, 3 * x + 10) for x in (1, 2, 5, 9)]
    # group h: no x variance -> NULLs; group i: single point -> NULLs
    pts += [("h", 4, 1), ("h", 4, 9), ("i", 2, 7)]
    df = spark.createDataFrame(pts, "k string, x long, y long")
    rows = {r.k: r for r in grouped_ols(df, ["k"], "x", "y").collect()}
    assert (rows["g"].slope_fp, rows["g"].intercept_fp, rows["g"].r2) == (
        3000,
        10000,
        1.0,
    )
    assert rows["g"].n_points == 4
    assert rows["h"].slope_fp is None and rows["i"].slope_fp is None

    # noisy group: verify against the integer closed form (trunc-toward-zero
    # fixed-point division, matching Spark div / DuckDB //)
    xs, ys = [1, 2, 3, 4, 5], [2, 1, 4, 3, 7]
    df2 = spark.createDataFrame([("n", a, b) for a, b in zip(xs, ys)], "k string, x long, y long")
    r = grouped_ols(df2, ["k"], "x", "y").collect()[0]
    n = len(xs)
    cov = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    vx = n * sum(a * a for a in xs) - sum(xs) ** 2
    vy = n * sum(b * b for b in ys) - sum(ys) ** 2

    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    assert r.slope_fp == trunc_div(cov * 1000, vx)
    assert r.intercept_fp == trunc_div((sum(ys) * vx - cov * sum(xs)) * 1000, n * vx)
    assert r.r2 == round(cov * cov / (vx * vy), 6)

    # negative-slope group: trunc-toward-zero on a negative numerator is the
    # cross-engine contract (Spark div == DuckDB //), pin it explicitly
    xs3, ys3 = [1, 2, 4], [9, 6, 2]
    df3 = spark.createDataFrame(
        [("d", a, b) for a, b in zip(xs3, ys3)], "k string, x long, y long"
    )
    r3 = grouped_ols(df3, ["k"], "x", "y").collect()[0]
    n3 = len(xs3)
    cov3 = n3 * sum(a * b for a, b in zip(xs3, ys3)) - sum(xs3) * sum(ys3)
    vx3 = n3 * sum(a * a for a in xs3) - sum(xs3) ** 2
    assert cov3 < 0
    assert r3.slope_fp == trunc_div(cov3 * 1000, vx3)


def test_benford_audit_counts_and_constants(spark, tmp_path):
    import datetime

    from iceberg_meta_spark.registry import load_all
    from iceberg_meta_spark.sources import parquet

    # totals with known first digits of round(v*100): 1.23 -> 123 (d=1),
    # 9.99 -> 999 (d=9), 0.05 -> 5 (d=5), 45.0 -> 4500 (d=4), 19.0 -> 1900
    vals = [1.23, 9.99, 0.05, 45.0, 19.0]
    rows = [
        (i, i, "O", v, datetime.datetime(2024, 1, 1), "1-URGENT")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    prior = parquet._CACHE_ENABLED
    parquet.enable_cache(False)
    try:
        out = {
            r.first_digit: r
            for r in load_all()["orders_benford_audit"]
            .spark_fn(spark, str(tmp_path))
            .collect()
        }
    finally:
        parquet.enable_cache(prior)
    assert {d: r.n_obs for d, r in out.items()} == {1: 2, 4: 1, 5: 1, 9: 1}
    assert out[1].obs_share == 0.4
    assert out[1].benford_share == 0.30103  # log10(2) literal, rounded
    # chi2 term for digit 1: (2 - 5*0.301029995664)^2 / (5*0.301029995664)
    exp = 5 * 0.301029995664
    assert out[1].chi2_term == round((2 - exp) ** 2 / exp, 2)


def test_wilson_lower_bound_ranks_small_cohorts_down(spark, tmp_path):
    """2/2 must rank BELOW 180/300 by the Wilson lower bound even though
    its raw rate is higher — the whole point of the bound."""
    import datetime

    from iceberg_meta_spark.registry import load_all
    from iceberg_meta_spark.sources import parquet

    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)

    def add(uid, ev_type, minute):
        nonlocal eid
        rows.append((eid, base + datetime.timedelta(minutes=minute), uid, ev_type, 1.0, "p"))
        eid += 1

    # 2 users acquired via 'signup', both convert (rate 1.0)
    for u in (1, 2):
        add(u, "signup", 0)
        add(u, "purchase", 5)
    # 300 users acquired via 'click', 180 convert (rate 0.6)
    for u in range(10, 310):
        add(u, "click", 0)
        if u < 190:
            add(u, "purchase", 5)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    prior = parquet._CACHE_ENABLED
    parquet.enable_cache(False)
    try:
        out = (
            load_all()["cohort_conversion_wilson"]
            .spark_fn(spark, str(tmp_path))
            .collect()
        )
    finally:
        parquet.enable_cache(prior)
    by = {r.acq_type: r for r in out}
    assert by["signup"].rate == 1.0 and by["click"].rate == 0.6
    # ranked by the bound: click's 0.6 over n=300 beats signup's 1.0 over n=2
    assert [r.acq_type for r in out] == ["click", "signup"]
    assert by["click"].wilson_lb > by["signup"].wilson_lb
    # the bound is strictly below the rate (shrinkage, never inflation)
    assert by["signup"].wilson_lb < 1.0 and by["click"].wilson_lb < 0.6


def test_ivf_probe_finds_in_cluster_neighbors(spark):
    from iceberg_meta_spark.pipeline.similarity import ivf_probe_topk

    # two clean clusters; centroid_mod=4 makes ids 1 and 5 the centroids
    rows = [
        (1, [1.0, 0.1], 0), (2, [0.9, 0.05], 0), (3, [1.1, -0.05], 0), (4, [0.95, 0.0], 0),
        (5, [0.1, 1.0], 1), (6, [0.05, 0.9], 1), (7, [-0.05, 1.1], 1), (8, [0.0, 0.95], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = ivf_probe_topk(df, query_ids=[2, 6], k=2, centroid_mod=4, nprobe=1).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {2, 6}
    for qid, cluster in ((2, {1, 3, 4}), (6, {5, 7, 8})):
        got = by_q[qid]
        assert [r.rank for r in got] == [1, 2]
        assert {r.neighbor_id for r in got} <= cluster
        assert all(r.cos_sim > 0.9 for r in got)


def test_decode_bound_bytes_spec_roundtrip():
    import struct

    from iceberg_meta_spark.functions.bounds import decode_bound_bytes

    # Iceberg single-value serialization: little-endian numerics, UTF-8 strings
    assert decode_bound_bytes(struct.pack("<i", -7), "int") == -7
    assert decode_bound_bytes(struct.pack("<q", 2**40), "long") == 2**40
    assert abs(decode_bound_bytes(struct.pack("<f", 1.5), "float") - 1.5) < 1e-7
    assert decode_bound_bytes(struct.pack("<d", -2.25), "double") == -2.25
    assert decode_bound_bytes(b"\x01", "boolean") is True
    assert decode_bound_bytes("café".encode(), "string") == "café"
    assert decode_bound_bytes(struct.pack("<i", 19000), "date") == 19000
    assert decode_bound_bytes(None, "long") is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported bound type"):
        decode_bound_bytes(b"\x00", "struct<int>")


def test_decode_bound_column(spark):
    import struct

    from iceberg_meta_spark.functions.bounds import decode_bound

    rows = [(1, struct.pack("<q", 100)), (2, struct.pack("<q", -5)), (3, None)]
    df = spark.createDataFrame(rows, "field_id int, lower binary")
    out = {r.field_id: r.lo for r in df.select("field_id", decode_bound(F.col("lower"), "long").alias("lo")).collect()}
    assert out == {1: 100, 2: -5, 3: None}
    # min/max over decoded bounds — the A7 shape on raw bytes
    agg = df.select(decode_bound(F.col("lower"), "long").alias("lo")).agg(
        F.min("lo").alias("mn"), F.max("lo").alias("mx")
    ).collect()[0]
    assert (agg.mn, agg.mx) == (-5, 100)


def test_asof_join_semantics(spark):
    from iceberg_meta_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 50, "p2"), (2, 10, "p3"), (3, 99, "p4")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        # k=1: two quotes before t=100, the later (t=80) must win; at t=50
        # the equal-ts quote counts (at-or-before is inclusive)
        [(1, 20, 7), (1, 80, 8), (1, 50, 9), (2, 11, 10)],
        "k long, t long, rid long",
    )
    out = {
        r.name: (r.r_t, r.r_rid)
        for r in asof_join(left, right, key="k", ts="t", right_cols=["rid"], tiebreak="rid").collect()
    }
    assert out["p1"] == (80, 8)      # latest at-or-before 100
    assert out["p2"] == (50, 9)      # equal-ts match is included
    assert out["p3"] == (None, None) # right row at t=11 is AFTER t=10
    assert out["p4"] == (None, None) # key has no right rows at all


def test_asof_join_tiebreak_among_equal_ts(spark):
    from iceberg_meta_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 100, 5), (1, 100, 9), (1, 100, 2)], "k long, t long, rid long"
    )
    rows = asof_join(left, right, key="k", ts="t", right_cols=["rid"], tiebreak="rid").collect()
    assert len(rows) == 1 and rows[0].r_rid == 9  # max tiebreak wins


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    from iceberg_meta_spark.pipeline import sampling

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)], "doc_id long, lang string"
    )
    s1 = sampling.stratified_sample(df, "doc_id", "lang", {"en": 64, "zh": 192})
    s2 = sampling.stratified_sample(df, "doc_id", "lang", {"en": 64, "zh": 192})
    r1 = sorted(r.doc_id for r in s1.collect())
    assert r1 == sorted(r.doc_id for r in s2.collect())  # reproducible
    by_lang = {r.lang: r.n for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # 1000 docs per stratum; expected 250 (en) and 750 (zh), binomial sd ~14
    assert 175 <= by_lang["en"] <= 325, by_lang
    assert 675 <= by_lang["zh"] <= 825, by_lang
    # unlisted stratum falls back to default_256=0 -> excluded entirely
    df2 = df.withColumn("lang", F.lit("de"))
    assert sampling.stratified_sample(df2, "doc_id", "lang", {"en": 64}).count() == 0


def test_hash_sample_rate_validation():
    import pytest as _pytest

    from iceberg_meta_spark.pipeline.sampling import _hex2

    assert _hex2(256) == "zz"  # full-rate sentinel sorts above any hex pair
    with _pytest.raises(ValueError):
        _hex2(257)
    with _pytest.raises(ValueError):
        _hex2(-1)


def test_curate_corpus_stages(spark):
    from iceberg_meta_spark.pipeline.curation import curate_corpus

    good = "the cat and the dog of a house and to the " * 4  # 40 tokens, stopword-rich
    rows = [
        (1, good, "en", "s0"),            # keeper of its dup group
        (2, good, "en", "s0"),            # exact dup of 1 -> dropped
        (3, "tiny doc", "en", "s0"),      # low quality -> dropped
        (4, "unique tail here " + good, "zh", "s1"),  # distinct 3-token prefix
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    # rate 256/256 everywhere isolates the quality+dedup stages from sampling
    out = {r.doc_id: r for r in curate_corpus(df, rates_256={}, default_256=256).collect()}
    assert set(out) == {1, 4}
    assert out[1].quality == "good" and out[1].lang == "en"
    # rate 0 drops everything
    assert curate_corpus(df, rates_256={}, default_256=0).count() == 0


def test_hll_sketch_tolerance(spark):
    # approx_count_distinct is the constant-memory scale path for reach
    # queries: HLL++ sketches merge across partitions without shuffling
    # raw keys. Pin its error on a known cardinality.
    df = spark.range(0, 20000).select((F.col("id") % 7919).alias("u"))
    exact, approx = df.agg(
        F.countDistinct("u").alias("e"),
        F.approx_count_distinct("u", rsd=0.02).alias("a"),
    ).collect()[0]
    assert exact == 7919
    assert abs(approx - exact) / exact < 0.06  # 3x the configured rsd


def test_file_health_approx_matches_exact(spark):
    # approx variant: every exact column identical, median within sketch
    # error (exact at accuracy=10000 on small inputs)
    files = _files(spark, [_file(1, f"f{i}", size=(i + 1) * MB) for i in range(101)])
    exact = ops.file_size_stats(files).collect()[0]
    approx = ops.file_size_stats_approx(files).collect()[0]
    for c in ("file_count", "total_size", "min_size", "max_size", "avg_size",
              "small_files", "small_pct"):
        assert getattr(approx, c) == getattr(exact, c), c
    assert abs(approx.median_size - exact.median_size) / exact.median_size < 0.01
    # empty input keeps the all-zero contract
    empty = ops.file_size_stats_approx(_files(spark, [])).collect()[0]
    assert (empty.file_count, empty.median_size) == (0, 0.0)


def test_deciles_approx_matches_exact(spark):
    # percentile_approx boundaries are exact at accuracy=10000 on sf-scale
    # user counts, so the approx twin reproduces the ntile deciles up to
    # boundary-tie granularity (±1 user per bucket).
    from iceberg_meta_spark.registry import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.01"
    exact = {r.decile: r for r in reg["user_value_deciles"].spark_fn(spark, sf).collect()}
    approx = {r.decile: r for r in reg["user_value_deciles_approx"].spark_fn(spark, sf).collect()}
    assert set(exact) == set(approx) == set(range(1, 11))
    assert sum(r.n_users for r in exact.values()) == sum(r.n_users for r in approx.values())
    for d in exact:
        assert abs(approx[d].n_users - exact[d].n_users) <= 1, d
    # buckets are value-ordered and non-overlapping
    for d in range(1, 10):
        assert approx[d].max_cents <= approx[d + 1].min_cents


def test_kernels_handle_empty_inputs(spark):
    # SURVEY §7.3: empty-table paths must produce schema-stable results
    # (correct columns, zero or all-zero rows), not errors.
    from iceberg_meta_spark.operators.maintenance import (
        compaction_plan, orphan_files, snapshot_expiry, zorder_layout,
    )
    from iceberg_meta_spark.operators.lineage import ancestry

    empty_files = spark.createDataFrame(
        [], "snapshot_id int, part_key string, file_path string, "
        "record_count long, file_size_in_bytes long",
    )
    empty_snaps = spark.createDataFrame(
        [], "snapshot_id long, committed_us long, operation string, "
        "total_data_files long, total_files_size long",
    )
    empty_ranges = spark.createDataFrame([], "file_path string, lo long, hi long")
    empty_nodes = spark.createDataFrame([], "snapshot_id long, parent_id long")

    assert compaction_plan(empty_files).count() == 0
    assert snapshot_expiry(empty_snaps, now_us=10**18).count() == 0
    assert orphan_files(empty_ranges.select("file_path", F.col("lo").alias("file_size_in_bytes")), empty_files).count() == 0
    assert zorder_layout(empty_ranges).count() == 0
    assert ancestry(empty_nodes).count() == 0
    # file-health over empty files: one all-null/zero row with the full schema
    fh = ops.file_size_stats(empty_files)
    assert fh.columns == [
        "file_count", "total_size", "min_size", "max_size",
        "avg_size", "median_size", "small_files", "small_pct",
    ]
    row = fh.collect()[0]
    assert row.file_count == 0
    # round-3 kernels
    from iceberg_meta_spark.operators.incremental import incremental_group_stats
    from iceberg_meta_spark.operators.maintenance import hilbert_layout
    from iceberg_meta_spark.pipeline.corpus import bm25_scores
    from iceberg_meta_spark.pipeline.sampling import pps_sample
    from iceberg_meta_spark.streaming.gaps import heartbeat_gaps

    assert hilbert_layout(empty_ranges).count() == 0
    empty_events = spark.createDataFrame([], "user_id long, ts_us long")
    assert heartbeat_gaps(empty_events, gap_us=100).count() == 0
    assert (
        incremental_group_stats(
            empty_files, empty_files, "part_key", "file_path",
            ("record_count", "file_size_in_bytes"),
        ).count()
        == 0
    )
    empty_docs = spark.createDataFrame([], "doc_id long, text string, lang string, n_chars long")
    assert pps_sample(empty_docs, "doc_id", "n_chars", "lang", k=5).count() == 0
    assert bm25_scores(empty_docs, ("hash", "join")).count() == 0


def test_event_value_outliers_flags_known_spike(spark, monkeypatch):
    """3-sigma screen: a 100x spike among tight values is flagged, and only it."""
    import iceberg_meta_spark.queries.events as ext

    base = [(f"t", 100 + (i % 3)) for i in range(50)]  # tight cluster
    rows = [(t, float(v) / 100) for t, v in base] + [("t", 100.0)]  # 10000 cents
    ev = spark.createDataFrame(rows, "event_type string, value double")
    monkeypatch.setattr(ext, "load_table", lambda s, d, n: ev)
    out = ext.event_value_outliers(spark, "ignored").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 51 and r.n_outliers == 1
    assert r.mean_cents > 100  # dragged up by the spike


def test_schema_compat_classifies_promotions(spark):
    """All five safety classes from one synthetic evolution: int->long is a
    legal widening, string->int is not, optional->required tightens,
    name-only changes are safe renames, add/remove pass through."""
    from iceberg_meta_spark.operators.schema import schema_compat

    rows = [
        # (table, schema_id, field_id, name, type, required)
        ("t", 1, 1, "a", "int", False), ("t", 2, 1, "a", "long", False),      # widened
        ("t", 1, 2, "b", "string", False), ("t", 2, 2, "b", "int", False),    # incompatible
        ("t", 1, 3, "c", "string", False), ("t", 2, 3, "c", "string", True),  # tightened
        ("t", 1, 4, "d", "string", True), ("t", 2, 4, "d2", "string", True),  # renamed
        ("t", 1, 5, "e", "string", True),                                     # removed
        ("t", 2, 6, "f", "string", False),                                    # added
        ("t", 1, 7, "g", "string", True), ("t", 2, 7, "g", "string", True),   # unchanged -> absent
    ]
    fields = spark.createDataFrame(
        rows, "table_name string, schema_id int, field_id int, name string, type string, required boolean"
    )
    got = {r.compat: r.n_fields for r in schema_compat(fields, 1, 2).collect()}
    assert got == {
        "widened": 1, "incompatible": 1, "tightened": 1,
        "renamed": 1, "removed": 1, "added": 1,
    }


def test_files_asof_reconstruction(spark):
    """Time travel over a branched forest: as-of mid-chain sees exactly the
    ancestor snapshots' files; a different root's files never leak in."""
    from iceberg_meta_spark.operators.lineage import files_asof

    # chain A: 1 <- 2 <- 3 ; chain B: 10 <- 11
    nodes = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (10, None), (11, 10)],
        "snapshot_id long, parent_id long",
    )
    files = spark.createDataFrame(
        [
            (1, "p0", "f1", 10, 100),
            (2, "p0", "f2", 20, 200),
            (2, "p1", "f3", 30, 300),
            (3, "p0", "f4", 40, 400),
            (11, "p0", "f9", 99, 999),  # other lineage
        ],
        "snapshot_id long, part_key string, file_path string, record_count long, "
        "file_size_in_bytes long",
    )
    asof2 = {r.part_key: r for r in files_asof(files, nodes, as_of=2).collect()}
    assert asof2["p0"].n_files == 2 and asof2["p0"].total_bytes == 300
    assert asof2["p1"].n_files == 1
    asof3 = {r.part_key: r for r in files_asof(files, nodes, as_of=3).collect()}
    assert asof3["p0"].n_files == 3 and asof3["p0"].total_records == 70
    # chain B's files appear only under chain B anchors
    asof11 = {r.part_key: r for r in files_asof(files, nodes, as_of=11).collect()}
    assert asof11["p0"].n_files == 1 and asof11["p0"].total_bytes == 999


def test_snapshot_growth_deltas(spark):
    from iceberg_meta_spark.operators.snapshots import snapshot_growth

    snaps = spark.createDataFrame(
        [
            (1, None, "append", 100, 1, 10),
            (2, 1, "append", 350, 3, 40),     # +250
            (3, 2, "delete", 50, 1, 5),       # -300 (largest |delta|)
            (10, None, "append", 7, 1, 1),    # other root, no parent row
        ],
        "snapshot_id long, parent_id long, operation string, "
        "total_files_size long, total_data_files long, total_records long",
    )
    out = snapshot_growth(snaps, k=5).collect()
    assert [r.snapshot_id for r in out] == [3, 2]  # roots have no delta row
    assert out[0].size_delta == -300 and out[0].files_delta == -2
    assert out[1].size_delta == 250 and out[1].records_delta == 30


def test_files_asof_forked_history(spark):
    """Branched lineage: 1 <- 2 <- 3 and 1 <- 4 fork at snapshot 1. The
    (root, depth) shortcut would count sibling-branch snapshot 2 (same root,
    depth(2)=1 <= depth(4)=1) as visible from 4 — the fork guard must route
    to the exact closure instead."""
    from iceberg_meta_spark.operators.lineage import ancestor_closure, files_asof

    nodes = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (4, 1)], "snapshot_id long, parent_id long"
    )
    files = spark.createDataFrame(
        [(1, "p0", "f1", 10, 100), (2, "p0", "f2", 20, 200),
         (3, "p0", "f3", 30, 300), (4, "p0", "f4", 40, 400)],
        "snapshot_id long, part_key string, file_path string, record_count long, "
        "file_size_in_bytes long",
    )
    at4 = {r.part_key: r for r in files_asof(files, nodes, as_of=4).collect()}
    assert at4["p0"].n_files == 2 and at4["p0"].total_bytes == 500  # f1 + f4, NOT f2
    at3 = {r.part_key: r for r in files_asof(files, nodes, as_of=3).collect()}
    assert at3["p0"].n_files == 3 and at3["p0"].total_bytes == 600  # f1 + f2 + f3

    closure = {(r.snapshot_id, r.ancestor_id) for r in ancestor_closure(nodes).collect()}
    assert closure == {(1, 1), (2, 2), (2, 1), (3, 3), (3, 2), (3, 1), (4, 4), (4, 1)}


def test_bloom_filter_no_false_negatives_and_prunes(spark):
    """Every build-side key must pass its own filter (no false negatives —
    the Bloom contract); with m sized at ~100 bits/key the miss-side pass
    rate is far below 1, so the prefilter genuinely shrinks the shuffle."""
    from pyspark.sql import functions as F

    from iceberg_meta_spark.operators.bloom import bloom_build, bloom_might_contain

    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", m_bits=8192, k=3)
    assert len(words) == 128 and any(w != 0 for w in words)
    hits = keys.filter(bloom_might_contain(F.col("k"), words, 3)).count()
    assert hits == 100  # no false negatives, ever
    misses = spark.range(1000, 3000).select(F.col("id").alias("k"))
    fp = misses.filter(bloom_might_contain(F.col("k"), words, 3)).count()
    assert fp < 100  # ~(1-e^{-kn/m})^k ~ 0.004% at these sizes; <5% is slack


def test_bloom_semi_join_equals_plain_semi_join(spark):
    """The Bloom prefilter is semantically transparent: result equals the
    plain left-semi join even though false positives pass the prefilter."""
    from pyspark.sql import functions as F

    from iceberg_meta_spark.operators.bloom import bloom_semi_join

    big = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    small = spark.range(0, 500, 7).select(F.col("id").alias("k"))
    out = bloom_semi_join(big, small, "k", m_bits=256, k=3)  # tiny m -> many FPs
    expect = big.join(small, "k", "left_semi")
    assert sorted(r.k for r in out.collect()) == sorted(r.k for r in expect.collect())
    # the prefilter sits on the probe side BEFORE the semi join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_udtf_parse_props_parity_and_error_recovery(spark):
    """§2.10 UDTF surface: LATERAL parse_props matches the expression-based
    extraction on well-formed rows, and malformed rows yield a tagged error
    row instead of failing the task."""
    from pyspark.sql import functions as F

    from iceberg_meta_spark.functions.tablefuncs import register_table_functions

    register_table_functions(spark)
    df = spark.createDataFrame(
        [(1, '{"k": 7, "z": 2}'), (2, '{"k": 9}'), (3, "not json"),
         (4, "[1,2]"), (5, '{"k": "text"}'), (6, None)],
        "event_id long, props string",
    )
    df.createOrReplaceTempView("props_rows")
    out = spark.sql(
        "SELECT e.event_id, p.key, p.value, p.error "
        "FROM props_rows e, LATERAL parse_props(e.props) p ORDER BY e.event_id, p.key"
    ).collect()
    good = [(r.event_id, r.key, r.value) for r in out if r.error is None]
    assert good == [(1, "k", 7), (1, "z", 2), (2, "k", 9)]
    errs = {r.event_id: r.error for r in out if r.error is not None}
    assert errs == {3: "JSONDecodeError", 4: "NotAnObject", 5: "NonNumericValue"}
    assert all(r.event_id != 6 for r in out)  # NULL props expand to no rows
    # parity with the hot-path expression extraction on the parseable rows
    expr = df.select(
        "event_id",
        F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").alias("k"),
    ).where(F.col("k").isNotNull()).collect()
    assert {(r.event_id, r.k) for r in expr} == {(e, v) for e, k, v in good if k == "k"}


def test_audience_overlap_hll_tracks_exact(spark):
    """The sketched overlap matrix must track the exact one: same pair set,
    reaches and intersections within HLL tolerance (lgK=12 default ->
    ~1.6% relative standard error; 10% slack here)."""
    import os

    from iceberg_meta_spark.registry import load_all

    qs = load_all()
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    exact = {(r.type_a, r.type_b): r for r in qs["audience_overlap"].spark_fn(spark, sf).collect()}
    est = {(r.type_a, r.type_b): r for r in qs["audience_overlap_hll"].spark_fn(spark, sf).collect()}
    assert set(exact) == set(est)
    for k, e in exact.items():
        s = est[k]
        assert abs(s.reach_a_est - e.reach_a) <= max(3, 0.1 * e.reach_a)
        assert abs(s.both_users_est - e.both_users) <= max(5, 0.2 * e.both_users)


def test_join_cardinality_estimate_tracks_truth(spark):
    """Correlated sampling keeps whole keys, so the per-key na*nb products
    survive sampling and the scaled estimate lands near the true join size
    (independent sampling would collapse toward zero at these rates)."""
    from pyspark.sql import functions as F

    from iceberg_meta_spark.operators.estimate import estimate_join_cardinality

    # 2000 orders x ~4 lines each through 500 keys, mild skew via %7
    a = spark.range(2000).select((F.col("id") % 500).alias("k"))
    b = spark.range(8000).select(((F.col("id") * 13) % 500).alias("k"), F.col("id").alias("v"))
    truth = a.join(b, "k").count()
    est = estimate_join_cardinality(a, b, "k", rate_256=64)  # 1/4 of key space
    assert est["sampled_keys"] > 50
    assert abs(est["estimate"] - truth) / truth < 0.35
    # diagnostics are well-formed
    assert est["sampled_pairs"] > 0 and est["scale"] == 4.0
    assert 0 < est["top_key_share_pct"] <= 100.0


def test_join_cardinality_empty_and_disjoint(spark):
    from pyspark.sql import functions as F

    from iceberg_meta_spark.operators.estimate import estimate_join_cardinality

    a = spark.range(100).select(F.col("id").alias("k"))
    b = spark.range(1000, 1100).select(F.col("id").alias("k"))
    est = estimate_join_cardinality(a, b, "k", rate_256=128)
    assert est["estimate"] == 0 and est["top_key_share_pct"] == 0.0


def test_concurrent_commits_detects_forks(spark):
    """A parent with two children is a fork (concurrent writers); chains
    produce no rows. Destructive children are counted for the
    rollback-vs-branch triage."""
    from unittest.mock import patch

    import iceberg_meta_spark.queries.metadata as qm

    snaps = spark.createDataFrame(
        [
            (1, None, "append"),
            (2, 1, "append"),
            (3, 2, "append"),      # chain so far
            (4, 2, "overwrite"),   # fork at parent 2, destructive child
            (5, 4, "append"),
        ],
        "snapshot_id long, parent_id long, operation string",
    )
    with patch.object(qm, "derive", lambda spark_, sf, name: snaps):
        rows = qm.meta_concurrent_commits(spark, "unused").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.parent_id == 2 and r.n_children == 2
    assert (r.first_child, r.last_child) == (3, 4)
    assert r.n_operations == 2 and r.destructive_children == 1


def test_render_presentation_layer(spark):
    """F12 chrome: bars, plurals, traffic-light colors, and the aligned
    table with its hard display cap (collects max_rows+1, never more)."""
    from iceberg_meta_spark.functions import render

    assert render.plural(1, "file") == "1 file"
    assert render.plural(3, "file") == "3 files"
    assert render.bar(0, 10, width=4) == "    "
    assert render.bar(10, 10, width=4) == "████"
    assert render.bar(5, 10, width=4).startswith("██")
    assert len(render.bar(3, 7, width=12)) == 12
    assert render.bar(5, 0, width=4) == "    "  # degenerate max: empty, no raise

    assert render.threshold_color(1, warn=5, alert=9) == "green"
    assert render.threshold_color(6, warn=5, alert=9) == "yellow"
    assert render.threshold_color(9, warn=5, alert=9) == "red"
    assert render.colorize("x", "red") == "\x1b[31mx\x1b[0m"
    assert render.colorize("x", "red", enabled=False) == "x"
    assert render.colorize("x", None) == "x"

    df = spark.createDataFrame(
        [("a", 10), ("b", 40), ("c", 20), ("d", 5)], "part string, n long"
    ).orderBy("part")
    out = render.render_table(df, max_rows=3, bar_col="n", bar_width=8)
    lines = out.splitlines()
    assert lines[0].split() == ["part", "n", "n_bar"]
    assert len(lines) == 2 + 3 + 1  # header + sep + 3 rows + truncation note
    assert lines[-1] == "... (3 rows shown; more exist)"
    # bar of the in-view max (40) is full width
    assert "████████" in [l for l in lines if l.startswith("b")][0]
    # no truncation note when everything fits
    assert "more exist" not in render.render_table(df, max_rows=10)


def test_empty_partition_day_schema_stable(spark, tmp_path):
    """The empty-input regressions tools/empty_probe.py found, pinned:
    an all-empty sf dir must yield schema-stable empty frames, not ANSI
    divide-by-zero or 1-D numpy arrays (the empty-partition-day failure).
    The full 223-query sweep lives in tools/empty_probe.py."""
    from iceberg_meta_spark.registry import load_all
    from iceberg_meta_spark.sources import parquet

    src = "/root/testdata/sf0.001"
    for t in ("embeddings", "documents", "events", "lineitem", "orders"):
        spark.read.parquet(f"{src}/{t}.parquet").limit(0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"{t}.parquet"))
    prior = parquet._CACHE_ENABLED
    parquet.enable_cache(False)
    try:
        qs = load_all()
        # the census still emits its two summary rows — zeros, not a
        # divide-by-zero — because aggregates reduce even over nothing
        pre = qs["join_cardinality_preflight"].spark_fn(spark, str(tmp_path)).collect()
        assert len(pre) == 2
        assert all(r.out_rows == 0 and r.amplification == 0.0 for r in pre)
        for name in ("ann_ivf_pq", "ann_ivf_pq_refined"):
            out = qs[name].spark_fn(spark, str(tmp_path))
            assert out.count() == 0, name
            assert out.columns, name  # schema survives the empty path
    finally:
        parquet.enable_cache(prior)


def test_sql_udfs_match_column_functions(spark):
    """Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN expr): the SQL-callable
    display functions must equal the Column versions row for row, including
    the 1024/1000 ladder boundaries and the rounding carry."""
    from iceberg_meta_spark.functions.sqlfuncs import register_sql_functions

    register_sql_functions(spark)
    vals = [0, 512, 999, 1000, 1023, 1024, 1536, 10**6 - 1, 10**6,
            5 * MB + 300 * 1024, 3 * 1024**3, 2_500_000_000, 1024**5 + 7]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    df.createOrReplaceTempView("sqludf_vals")
    got = spark.sql(
        "SELECT v, format_bytes(v) AS fb, compact_number(v) AS cn, "
        "format_net(v - 1024) AS fn, "
        "truncate_path(concat('/a/', repeat('x', CAST(v % 80 AS INT)), '/f.parquet')) AS tp "
        "FROM sqludf_vals"
    ).collect()
    want = df.select(
        "v",
        display.format_bytes(F.col("v")).alias("fb"),
        display.compact_number(F.col("v")).alias("cn"),
        display.format_net(F.col("v") - 1024).alias("fn"),
        display.truncate_path(
            F.concat(F.lit("/a/"), F.repeat(F.lit("x"), (F.col("v") % 80).cast("int")), F.lit("/f.parquet"))
        ).alias("tp"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # the SQL UDF body is a Catalyst expression: no Python worker appears
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spark.sql("SELECT format_bytes(v) FROM sqludf_vals").explain("formatted")
    plan = buf.getvalue()
    # the body inlines as a Catalyst CASE inside codegen — no Python worker
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CASE WHEN" in plan


def test_exact_median_bisect_matches_percentile(spark):
    """Histogram-refinement selection: exact k-th/median in O(log range)
    scans and O(width) driver memory — the scale path through the A1
    percentile-buffer cliff. Must equal Spark's exact percentile on odd,
    even, duplicate-heavy, and huge-range inputs."""
    import random

    from iceberg_meta_spark.operators.selection import exact_median, kth_smallest

    rng = random.Random(3)
    cases = [
        [5],
        [1, 2],
        [7, 7, 7, 7],
        [rng.randrange(0, 2**60) for _ in range(101)],
        [rng.randrange(-50, 50) for _ in range(100)],
        sorted(rng.randrange(0, 10) for _ in range(37)),
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        want = df.agg(F.expr("percentile(x, 0.5)")).collect()[0][0]
        # tiny width forces MANY refinement passes — exercises the recursion
        assert exact_median(df, "x", width=4) == want, vals
        s = sorted(vals)
        for k in (1, len(vals) // 2 + 1, len(vals)):
            assert kth_smallest(df, "x", k, width=4) == s[k - 1], (vals, k)


def test_kth_smallest_rejects_out_of_range(spark):
    import pytest

    from iceberg_meta_spark.operators.selection import kth_smallest

    df = spark.createDataFrame([(1,), (2,)], "x long")
    with pytest.raises(ValueError, match="out of range"):
        kth_smallest(df, "x", 3)
    empty = spark.createDataFrame([], "x long")
    with pytest.raises(ValueError, match="out of range"):
        kth_smallest(empty, "x", 1)


def test_exact_median_of_empty_is_null(spark):
    """SQL median of no rows is NULL (round-5 advisory): exact_median must
    return None for empty/all-null columns, not 0.0 — 0.0 would diverge
    from the DuckDB median-of-empty on the empty-partition path."""
    from iceberg_meta_spark.operators.selection import exact_median

    assert exact_median(spark.createDataFrame([], "x long"), "x") is None
    all_null = spark.createDataFrame([(None,), (None,)], "x long")
    assert exact_median(all_null, "x") is None


def test_join_preflight_self_join_skips_the_join(spark):
    """The ``right is left`` census must return exactly what the general
    full-outer form returns on an identical (but distinct-object) copy —
    the r13 projection shortcut is result-identical by construction, this
    pins it against regressions."""
    from iceberg_meta_spark.operators.skew import join_cardinality_preflight

    rows = [("a",)] * 3 + [("b",)] * 2 + [("c",)] + [(None,)] * 2
    df = spark.createDataFrame(rows, "key string")
    copy = spark.createDataFrame(rows, "key string")
    self_row = join_cardinality_preflight(df, df, "key", broadcast_row_cap=2).collect()[0]
    two_row = join_cardinality_preflight(df, copy, "key", broadcast_row_cap=2).collect()[0]
    assert self_row == two_row
    # NULL keys count in the row totals but are NOT matched: join equality
    # is NULL != NULL, so the full-outer form leaves the NULL groups
    # unmatched and the shortcut must exclude them from out_k too
    assert self_row.left_rows == 8 and self_row.right_rows == 8
    assert self_row.matched_keys == 3 and self_row.out_rows == 3 * 3 + 2 * 2 + 1


def test_file_size_stats_median_ignores_nulls(spark):
    """The rank-selection median must match F.median (which skips NULLs)
    when the size column is nullable — the r12 form counted NULL rows in
    the selection positions (latent, unreachable for spec-non-null sizes;
    fixed r13)."""
    vals = [10, None, 30, None, 20, 40, None]
    df = spark.createDataFrame([(v,) for v in vals], "file_size_in_bytes long")
    row = ops.file_size_stats(df).collect()[0]
    want = df.agg(F.median("file_size_in_bytes")).collect()[0][0]
    assert row.median_size == float(want) == 25.0
    # the other aggregates still count ALL rows (reference semantics)
    assert row.file_count == 7
