"""Unit tests for the bucketed range join (operators/rangejoin.py) and the
hypertable time rollup (operators/hypertable.py) on handcrafted data with
known answers; sf0.01 oracle parity is covered by test_oracle_parity.py.
"""

from __future__ import annotations

from iceberg_meta_spark.operators.hypertable import US_HOUR, US_MIN, time_rollup
from iceberg_meta_spark.operators.rangejoin import bucketed_range_join, session_intervals

W = 100  # narrow bucket width so intervals span several buckets


def test_range_join_inclusive_bounds_and_no_dups(spark):
    # interval [100, 350] spans buckets 1-3 with width 100; points at the
    # exact bounds match once each, a point outside matches nothing
    iv = spark.createDataFrame([(1, 10, 100, 350)], "k long, ival long, lo long, hi long")
    pts = spark.createDataFrame(
        [(1, 100), (1, 350), (1, 200), (1, 351), (2, 200)], "k long, ts long"
    )
    out = bucketed_range_join(pts, iv, key="k", ts_col="ts", width=W).collect()
    assert sorted(r.ts for r in out) == [100, 200, 350]
    assert all(r.ival == 10 for r in out)  # one row per match, no bucket dups


def test_range_join_disjoint_intervals_single_match(spark):
    iv = spark.createDataFrame(
        [(1, 1, 0, 99), (1, 2, 200, 299)], "k long, ival long, lo long, hi long"
    )
    pts = spark.createDataFrame([(1, 50), (1, 250), (1, 150)], "k long, ts long")
    out = {r.ts: r.ival for r in bucketed_range_join(pts, iv, key="k", ts_col="ts", width=W).collect()}
    assert out == {50: 1, 250: 2}


def test_session_intervals_gap_split(spark):
    ev = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 5000), (2, 42)], "user_id long, ts_us long"
    )
    out = sorted(
        session_intervals(ev, key="user_id", ts_col="ts_us", gap=1000).collect(),
        key=lambda r: (r.user_id, r.lo),
    )
    assert [(r.user_id, r.lo, r.hi) for r in out] == [(1, 0, 100), (1, 5000, 5000), (2, 42, 42)]


def test_time_rollup_grains_are_consistent(spark):
    # two events in the same minute, one in a later hour of the same day
    ev = spark.createDataFrame(
        [(0, 1.25), (30_000_000, 2.0), (2 * US_HOUR, 4.5)], "ts_us long, value double"
    )
    rows = time_rollup(ev).collect()
    by = {(r.grain, r.bucket_us): r for r in rows}
    assert by[("minute", 0)].n_events == 2 and by[("minute", 0)].sum_cents == 325
    assert by[("hour", 0)].n_events == 2
    assert by[("hour", 2 * US_HOUR)].sum_cents == 450
    assert by[("day", 0)].n_events == 3 and by[("day", 0)].sum_cents == 775
    # every coarser grain's totals equal the sum of its finer grain
    mins = sum(r.n_events for r in rows if r.grain == "minute")
    hours = sum(r.n_events for r in rows if r.grain == "hour")
    days = sum(r.n_events for r in rows if r.grain == "day")
    assert mins == hours == days == 3
    assert 2 * US_MIN == 120_000_000  # sanity on the constants


def test_session_paths_known_journeys(spark, tmp_path):
    # two users; u1 has two sessions (gap > 30 min splits), u2 one session
    # with >3 events (path truncates to first 3)
    import iceberg_meta_spark.queries.analytics as A

    rows = [
        # user 1, session A: view > click
        (1, 1, "view", 0),
        (2, 1, "click", 60_000_000),
        # user 1, session B (2h later): view > click
        (3, 1, "view", 7_200_000_000),
        (4, 1, "click", 7_260_000_000),
        # user 2, one session: view > click > purchase > error (truncated)
        (5, 2, "view", 0),
        (6, 2, "click", 30_000_000),
        (7, 2, "purchase", 90_000_000),
        (8, 2, "error", 120_000_000),
    ]
    import datetime as dt

    ev = spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=us), uid, et, 1.0, "{}")
            for eid, uid, et, us in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    src = str(tmp_path)
    ev.write.mode("overwrite").parquet(f"{src}/events.parquet")
    got = {r.path: (r.n_sessions, r.share_permille) for r in A.session_paths(spark, src).collect()}
    assert got == {
        "view>click": (2, 666),
        "view>click>purchase": (1, 333),
    }
