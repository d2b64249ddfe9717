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


def _mta(spark, clicks, purchases, lookback=100):
    from iceberg_meta_spark.operators.attribution import multi_touch_attribution

    c = spark.createDataFrame(clicks, "user_id long, event_id long, ts long")
    p = spark.createDataFrame(
        purchases, "user_id long, event_id long, ts long, value_micro long"
    )
    return multi_touch_attribution(
        c, p, lookback=lookback, ts_col="ts", value_col="value_micro"
    ).collect()


def test_multi_touch_weights_sum_to_exactly_1000(spark):
    # one purchase with n touches, n = 1..6: both models must sum to 1000
    for n in range(1, 7):
        clicks = [(1, i, 10 * (i + 1)) for i in range(n)]
        rows = _mta(spark, clicks, [(1, 100, 100, 1_000_000)])
        assert len(rows) == n
        assert sum(r.w_linear_milli for r in rows) == 1000, (n, rows)
        assert sum(r.w_ushape_milli for r in rows) == 1000, (n, rows)


def test_multi_touch_u_shape_position_weights(spark):
    # n=4: 400 / 100 / 100 / 400 (mid tranche 200 split over 2)
    clicks = [(1, i, 10 * (i + 1)) for i in range(4)]
    rows = sorted(_mta(spark, clicks, [(1, 100, 100, 2_000_000)]), key=lambda r: r.position)
    assert [r.w_ushape_milli for r in rows] == [400, 100, 100, 400]
    # linear: 250 each; credits floor-exact
    assert [r.w_linear_milli for r in rows] == [250, 250, 250, 250]
    assert [r.credit_ushape_micro for r in rows] == [800_000, 200_000, 200_000, 800_000]


def test_multi_touch_window_bounds_and_isolation(spark):
    # click outside the lookback and other-user clicks attract no credit
    clicks = [(1, 1, 0), (1, 2, 50), (2, 3, 60)]
    rows = _mta(spark, clicks, [(1, 9, 100, 1_000_000)], lookback=60)
    assert [r.click_id for r in rows] == [2]  # ts=0 is out (100-60=40), user 2 excluded
    assert rows[0].n_touches == 1 and rows[0].w_ushape_milli == 1000
    # boundary click exactly at ts - lookback is INCLUDED (inclusive lo)
    rows2 = _mta(spark, [(1, 1, 40)], [(1, 9, 100, 1_000_000)], lookback=60)
    assert [r.click_id for r in rows2] == [1]


def test_time_interpolate_linear_fill_and_edges(spark):
    from iceberg_meta_spark.operators.hypertable import time_interpolate

    # key 'a': observations at buckets 0 (100) and 3 (400): gaps at 1,2
    # interpolate to 200, 300; key 'b': single point passes through
    ev = spark.createDataFrame(
        [("a", 0, 100), ("a", 180_000_000, 400), ("b", 60_000_000, 7)],
        "event_type string, ts_us long, value_cents long",
    )
    out = {
        (r.event_type, r.bucket_us): (r.filled, r.observed_flag)
        for r in time_interpolate(ev).collect()
    }
    assert out[("a", 0)] == (100, True)
    assert out[("a", 60_000_000)] == (200, False)
    assert out[("a", 120_000_000)] == (300, False)
    assert out[("a", 180_000_000)] == (400, True)
    assert out[("b", 60_000_000)] == (7, True)


def test_time_interpolate_never_uses_unbounded_following_frame(spark):
    """Spark evaluates [current, unboundedFollowing] frames by rescanning
    to the partition end per row — O(rows^2) per key (measured 484s on a
    216k-row grid before the fix). The backward fence post must come from
    a DESC-ordered GROWING frame instead."""
    import contextlib
    import io

    from iceberg_meta_spark.operators.hypertable import time_interpolate

    ev = spark.createDataFrame(
        [("a", 0, 1), ("a", 600_000_000, 2)],
        "event_type string, ts_us long, value_cents long",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        time_interpolate(ev).explain("formatted")
    assert "unboundedfollowing" not in buf.getvalue().lower(), buf.getvalue()
