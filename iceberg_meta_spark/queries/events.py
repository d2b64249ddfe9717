"""Event-stream analytics over the events table: sessionization,
attribution, funnels, rollups/LOCF/interpolation, anomaly & outlier
profiles, heavy hitters, quantile sketches, seasonal backtests.

Split from the former monolithic queries/extensions.py (round 7); the
registration order of the full extension family is pinned by
queries/extensions.py::_CANONICAL_ORDER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.parquet import load_table


from iceberg_meta_spark.operators.hypertable import time_rollup  # noqa: E402

from iceberg_meta_spark.operators.rangejoin import (  # noqa: E402
    bucketed_range_join,
    session_intervals,
)

@register(
    "session_purchase_match",
    oracle="""
        WITH clicks AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
                        WHERE event_type = 'click'),
        lagged AS (SELECT user_id, ts_us,
                     lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_ts
                   FROM clicks),
        marked AS (SELECT user_id, ts_us,
                     CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
                   FROM lagged),
        sess AS (SELECT user_id, ts_us,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                 FROM marked),
        iv AS (SELECT user_id, session_id, min(ts_us) AS lo,
                      max(ts_us) + 1800000000 AS hi
               FROM sess GROUP BY user_id, session_id),
        pur AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
                WHERE event_type = 'purchase'),
        matched AS (SELECT p.user_id, iv.session_id
                    FROM pur p JOIN iv ON iv.user_id = p.user_id
                    AND p.ts_us >= iv.lo AND p.ts_us <= iv.hi)
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions_hit
        FROM matched GROUP BY user_id
    """,
    doc="Range join (point-in-interval): purchases matched into the same "
    "user's click-session windows via the bucketed range join — intervals "
    "explode to covered 30-min buckets, points tag their single bucket, "
    "candidates come from an EQUI-join on (user_id, bucket), never a "
    "nested-loop BETWEEN join",
)
def session_purchase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us")
    )
    # a session window stays open until its gap expires: hi = last click + gap
    iv = session_intervals(
        ev.filter(F.col("event_type") == "click").select("user_id", "ts_us"),
        key="user_id",
        ts_col="ts_us",
    ).withColumn("hi", F.col("hi") + 1_800_000_000)
    pur = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts_us")
    matched = bucketed_range_join(
        pur, iv, key="user_id", ts_col="ts_us", width=1_800_000_000
    )
    return matched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.countDistinct("session_id").alias("n_sessions_hit"),
    )

@register(
    "events_time_rollup",
    tags=("bench",),
    oracle="""
        WITH ev AS (SELECT epoch_us(ts) AS ts_us, value FROM events),
        minute AS (SELECT ts_us - ts_us % 60000000 AS bucket_us,
                     CAST(count(*) AS BIGINT) AS n_events,
                     CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
                   FROM ev GROUP BY 1),
        hour AS (SELECT bucket_us - bucket_us % 3600000000 AS bucket_us,
                   CAST(sum(n_events) AS BIGINT) AS n_events,
                   CAST(sum(sum_cents) AS BIGINT) AS sum_cents
                 FROM minute GROUP BY 1),
        day AS (SELECT bucket_us - bucket_us % 86400000000 AS bucket_us,
                  CAST(sum(n_events) AS BIGINT) AS n_events,
                  CAST(sum(sum_cents) AS BIGINT) AS sum_cents
                FROM hour GROUP BY 1)
        SELECT 'minute' AS grain, bucket_us, n_events, sum_cents FROM minute
        UNION ALL
        SELECT 'hour' AS grain, bucket_us, n_events, sum_cents FROM hour
        UNION ALL
        SELECT 'day' AS grain, bucket_us, n_events, sum_cents FROM day
    """,
    doc="Hypertable-style hierarchical rollup: raw events aggregated ONCE "
    "at minute grain; hour derives from minute partials and day from hour "
    "(mergeable integer sums) — Spark's ReuseExchange dedups the shared "
    "minute subtree across the union branches, so raw data is scanned once",
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts DIV 1000").alias("ts_us"), "value"
    )
    return time_rollup(ev, ts_col="ts_us", value_col="value")

from iceberg_meta_spark import operators as ops  # noqa: E402

@register(
    "events_props_variant",
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
               CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k
        FROM events GROUP BY event_type
    """,
    doc="VARIANT twin of events_props_extract: parse_json once into a "
    "VARIANT column, then typed variant_get paths — Spark 4's binary "
    "variant encoding is parsed once per row instead of per-path "
    "re-parsing under get_json_object; same oracle semantics",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_with_k"),
        )
    )

from iceberg_meta_spark.operators.asof import asof_join  # noqa: E402

@register(
    "purchase_click_attribution_1h",
    oracle="""
        WITH ev AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
                    FROM events),
        p AS (SELECT event_id, user_id, ts_us,
                     CAST(floor(value * 100) AS BIGINT) AS value_cents
              FROM ev WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, p.ts_us, p.value_cents,
               (SELECT c.event_id FROM ev c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts_us <= p.ts_us AND c.ts_us >= p.ts_us - 3600000000
                ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1) AS click_event_id,
               (SELECT p.ts_us - c.ts_us FROM ev c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts_us <= p.ts_us AND c.ts_us >= p.ts_us - 3600000000
                ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1) AS gap_us
        FROM p ORDER BY event_id
    """,
    doc="Tolerance-bounded as-of join (pandas merge_asof(tolerance=1h) "
    "semantics): same union + forward-fill plan as the unbounded "
    "attribution — one shuffle, no join operator — with the lookback bound "
    "applied as a map-side predicate after the fill",
)
def purchase_click_attribution_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.expr("ts DIV 1000").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_us")
    out = asof_join(
        purchases, clicks, key="user_id", ts="ts_us", right_cols=["event_id"],
        tiebreak="event_id", prefix="click_", tolerance=3_600_000_000,
    )
    return out.select(
        "event_id", "user_id", "ts_us", "value_cents",
        F.col("click_event_id"),
        (F.col("ts_us") - F.col("click_ts_us")).alias("gap_us"),
    ).orderBy("event_id")

@register(
    "cdc_latest_state",
    tags=("bench",),
    oracle="""
        WITH ch AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
                           CAST(floor(value * 100) AS BIGINT) AS value_cents
                    FROM events),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
                   FROM ch)
        SELECT user_id, ts_us AS last_ts_us, event_id AS last_event_id,
               event_type AS last_event_type, value_cents AS last_value_cents
        FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
    doc="CDC latest-state compaction (upsert-materialization): one "
    "groupBy(key).max(struct(ts, id, payload)) — partial aggregation "
    "reduces each partition's changes map-side before ONE shuffle of "
    "per-key maxima, strictly less data movement than the row_number "
    "window formulation that shuffles every change row",
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts DIV 1000").alias("ts_us"),
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    latest = ch.groupBy("user_id").agg(
        F.max(
            F.struct("ts_us", "event_id", "event_type", "value_cents")
        ).alias("s")
    )
    return latest.select(
        "user_id",
        F.col("s.ts_us").alias("last_ts_us"),
        F.col("s.event_id").alias("last_event_id"),
        F.col("s.event_type").alias("last_event_type"),
        F.col("s.value_cents").alias("last_value_cents"),
    ).orderBy("user_id")

@register(
    "value_hour_correlation",
    oracle="""
        WITH ev AS (SELECT event_type,
                           (epoch_us(ts) // 3600000000) % 24 AS hour,
                           CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM events),
        sums AS (SELECT event_type,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(hour) AS BIGINT) AS sx,
                        CAST(sum(cents) AS BIGINT) AS sy,
                        CAST(sum(hour * hour) AS BIGINT) AS sxx,
                        CAST(sum(cents * cents) AS BIGINT) AS syy,
                        CAST(sum(hour * cents) AS BIGINT) AS sxy
                 FROM ev GROUP BY event_type)
        SELECT event_type, n,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS corr_hour_value
        FROM sums ORDER BY event_type
    """,
    doc="Pearson correlation from integer-exact sums: the six BIGINT "
    "accumulators (n, Sx, Sy, Sxx, Syy, Sxy) are order-insensitive so the "
    "shuffle combine is bit-deterministic across engines and partitionings; "
    "the float division happens once on the final 1-row-per-group result — "
    "the built-in corr() accumulates in floating point and is not "
    "reproducible under re-partitioning",
)
def value_hour_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.expr("(ts DIV 1000) DIV 3600000000") % 24).alias("hour"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("hour").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("hour") * F.col("hour")).alias("sxx"),
        F.sum(F.col("cents") * F.col("cents")).alias("syy"),
        F.sum(F.col("hour") * F.col("cents")).alias("sxy"),
    )
    n, sx, sy = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n * F.col("sxy") - sx * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - sx * F.col("sx")) * F.sqrt(n * F.col("syy") - sy * F.col("sy"))
    return s.select(
        "event_type", "n", F.round(num / den, 6).alias("corr_hour_value")
    ).orderBy("event_type")

@register(
    "events_grouping_sets",
    oracle="""
        WITH ev AS (SELECT event_type,
                           (epoch_us(ts) // 3600000000) % 24 AS hour,
                           CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM events)
        SELECT CAST(grouping(event_type) AS INT) AS g_type,
               CAST(grouping(hour) AS INT) AS g_hour,
               event_type, hour,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM ev
        GROUP BY GROUPING SETS ((event_type, hour), (event_type), ())
        ORDER BY g_type, g_hour, event_type, hour
    """,
    doc="Explicit GROUPING SETS (finer than ROLLUP/CUBE: an arbitrary "
    "level list) with grouping() indicators — all levels computed from one "
    "Expand + single hash aggregate, one shuffle total",
)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.expr("(ts DIV 1000) DIV 3600000000") % 24).alias("hour"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = ev.groupingSets(
        [["event_type", "hour"], ["event_type"], []], "event_type", "hour"
    ).agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("hour").cast("int").alias("g_hour"),
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
    )
    return out.select(
        "g_type", "g_hour", "event_type", "hour", "n", "sum_cents"
    ).orderBy("g_type", "g_hour", "event_type", "hour")

@register(
    "event_funnel",
    oracle="""
        WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        v AS (SELECT user_id, min(ts_us) AS t1 FROM ev
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts_us) AS t2
              FROM ev e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts_us > v.t1
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts_us) AS t3
              FROM ev e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts_us > c.t2
              GROUP BY e.user_id)
        SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS viewed,
               CAST((SELECT count(*) FROM c) AS BIGINT) AS clicked_after_view,
               CAST((SELECT count(*) FROM p) AS BIGINT) AS purchased_after_click
    """,
    doc="Ordered funnel (view -> click -> purchase, strict temporal order): "
    "each stage is a per-user MIN aggregate semi-joined onto the previous "
    "stage's timestamps — per-user rows through every shuffle, no event-"
    "level self-join, no window; the standard conversion-funnel kernel",
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("purchased_after_click")))
    )

from iceberg_meta_spark.operators.hypertable import time_fill  # noqa: E402

@register(
    "events_minute_locf",
    oracle="""
        WITH ev AS (SELECT event_type,
                           epoch_us(ts) - epoch_us(ts) % 60000000 AS bucket_us,
                           CAST(floor(value * 100) AS BIGINT) AS value_cents
                    FROM events),
        obs AS (SELECT event_type, bucket_us, CAST(sum(value_cents) AS BIGINT) AS observed
                FROM ev GROUP BY event_type, bucket_us),
        span AS (SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
                 FROM obs GROUP BY event_type),
        grid AS (SELECT s.event_type, g AS bucket_us
                 FROM span s, LATERAL (SELECT unnest(generate_series(s.lo, s.hi, 60000000)) g)),
        j AS (SELECT g.event_type, g.bucket_us, o.observed
              FROM grid g LEFT JOIN obs o
                ON o.event_type = g.event_type AND o.bucket_us = g.bucket_us)
        SELECT event_type, bucket_us,
               last_value(observed IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
               observed IS NOT NULL AS observed_flag
        FROM j ORDER BY event_type, bucket_us
    """,
    doc="Gap-filled minute series with last-observation-carried-forward "
    "(time_bucket_gapfill + locf shape): bucketed observations, per-key "
    "grid densified map-side via sequence + explode, forward-fill window "
    "partitioned by key — grid size is O(keys x span/step), independent "
    "of event count",
)
def events_minute_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts DIV 1000").alias("ts_us"),
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return time_fill(ev)

@register(
    "events_hourly_unpivot",
    oracle="""
        WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type
                   FROM events),
        wide AS (SELECT hour,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
                 FROM e GROUP BY hour)
        SELECT hour, event_type, n FROM wide
        UNPIVOT (n FOR event_type IN (click, view, purchase))
        ORDER BY hour, event_type
    """,
    doc="Wide-to-long UNPIVOT (melt): the hourly pivot matrix stacked back "
    "to (hour, event_type, n) rows via DataFrame.unpivot — the inverse of "
    "events_hourly_pivot, both from one conditional-aggregation pass; "
    "unpivot is a zero-shuffle row expansion of the already-aggregated "
    "hour-grain frame",
)
def events_hourly_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.expr("(ts DIV 1000) DIV 3600000000").alias("hour"), "event_type"
    )
    wide = e.groupBy("hour").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(t)
            for t in ("click", "view", "purchase")
        ]
    )
    return (
        wide.unpivot(["hour"], ["click", "view", "purchase"], "event_type", "n")
        .orderBy("hour", "event_type")
    )

@register(
    "events_tumbling_reach",
    oracle="""
        WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events)
        SELECT ts_us - (ts_us % 3600000000) AS window_start_us,
               CAST(count(DISTINCT user_id) AS BIGINT) AS reach
        FROM e GROUP BY window_start_us ORDER BY window_start_us
    """,
    doc="Per-hour distinct users (batch twin of "
    "streaming/windows.streaming_tumbling_reach): exact countDistinct per "
    "tumbling bucket — the streaming twin swaps in approx_count_distinct "
    "so per-window state is an HLL sketch (KBs) instead of one entry per "
    "(window, user), the exact-to-sketch trade the reach/HLL pair already "
    "documents",
)
def events_tumbling_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.streaming.windows import tumbling_reach

    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts DIV 1000").alias("ts_us")
    )
    return tumbling_reach(e, 3_600_000_000).orderBy("window_start_us")

@register(
    "event_transitions",
    oracle="""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
                   FROM events),
        nxt AS (SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS to_type
                FROM e),
        pairs AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
                  FROM nxt WHERE to_type IS NOT NULL
                  GROUP BY from_type, to_type),
        tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t
                FROM pairs GROUP BY from_type)
        SELECT from_type, to_type, n,
               CAST(n * 1000000 // t AS BIGINT) AS p_ppm
        FROM pairs JOIN tot USING (from_type)
        ORDER BY from_type, to_type
    """,
    doc="Markov next-event transition matrix: per-user lead() window "
    "(key-partitioned, ordered by (ts, event_id) — deterministic under "
    "duplicate-free ids), pair counts with map-side combine, per-source "
    "totals broadcast back for integer-ppm probabilities; the "
    "sequence-mining shape behind funnel discovery",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("t"))
    return (
        pairs.join(F.broadcast(tot), "from_type")
        .select("from_type", "to_type", "n", F.expr("n * 1000000 DIV t").alias("p_ppm"))
        .orderBy("from_type", "to_type")
    )

@register(
    "event_value_outliers",
    oracle="""
        WITH ev AS (SELECT event_type,
                      CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM events),
        st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(cents) AS BIGINT) AS s,
                      CAST(sum(cents * cents) AS BIGINT) AS ss
               FROM ev GROUP BY event_type),
        stats AS (SELECT event_type, n, s, ss,
                    CAST(s AS DOUBLE) / n AS mean,
                    sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n) AS std
                  FROM st)
        SELECT ev.event_type, max(n) AS n,
               CAST(sum(CASE WHEN abs(cents - mean) > 3 * std THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_outliers,
               CAST(floor(max(mean)) AS BIGINT) AS mean_cents,
               CAST(floor(max(std)) AS BIGINT) AS std_cents
        FROM ev JOIN stats USING (event_type)
        GROUP BY ev.event_type ORDER BY ev.event_type
    """,
    doc="3-sigma outlier screen per event type: one narrow per-type moment "
    "aggregate (count/sum/sum-of-squares as exact BIGINTs), broadcast back "
    "onto the events for the |x-mean| > 3*std flag, second per-type count "
    "— two passes by necessity (the threshold depends on the global "
    "moments), both shuffles are per-type partials; all float math derives "
    "from exact integers via IEEE ops so the gate stays exact",
)
def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.expr("cents * cents")).alias("ss"),
    )
    stats = st.withColumn("mean", F.expr("CAST(s AS DOUBLE) / n")).withColumn(
        "std",
        F.expr("sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.sum(
                F.when(F.expr("abs(cents - mean) > 3 * std"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.floor(F.max("mean")).cast("long").alias("mean_cents"),
            F.floor(F.max("std")).cast("long").alias("std_cents"),
        )
        .orderBy("event_type")
    )

@register(
    "events_hourly_anomalies",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
        trailed AS (
            SELECT event_type, window_start_us, n,
                   CAST(sum(n) OVER w AS BIGINT) AS trail_sum,
                   CAST(count(*) OVER w AS BIGINT) AS trail_n
            FROM hourly
            WINDOW w AS (PARTITION BY event_type ORDER BY window_start_us
                         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
        SELECT event_type, window_start_us, n, trail_sum,
               CAST((n * 3000) // trail_sum AS BIGINT) AS deviation_permille
        FROM trailed
        WHERE trail_n = 3 AND 2 * n > trail_sum
        ORDER BY deviation_permille DESC, event_type, window_start_us
        LIMIT 50
    """,
    doc="Hourly traffic anomaly screen: per event type, hours whose count "
    "exceeds 1.5x the trailing 3-hour average (2n > trailing sum, integer "
    "exact), deviation in permille of that average; the lag window is "
    "partitioned by type and bounded by retention hours, never data volume",
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    hour_us = 3_600_000_000
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts DIV 1000").alias("ts_us"), "event_type"
    )
    hourly = (
        ev.withColumn("window_start_us", F.expr(f"(ts_us DIV {hour_us}) * {hour_us}"))
        .groupBy("event_type", "window_start_us")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("window_start_us")
        .rowsBetween(-3, -1)
    )
    trailed = hourly.withColumn("trail_sum", F.sum("n").over(w)).withColumn(
        "trail_n", F.count(F.lit(1)).over(w)
    )
    return (
        trailed.filter((F.col("trail_n") == 3) & (2 * F.col("n") > F.col("trail_sum")))
        .select(
            "event_type",
            "window_start_us",
            "n",
            "trail_sum",
            F.expr("CAST((n * 3000) DIV trail_sum AS BIGINT)").alias("deviation_permille"),
        )
        .orderBy(F.desc("deviation_permille"), "event_type", "window_start_us")
        .limit(50)
    )

@register(
    "events_dow_profile",
    oracle="""
        WITH ev AS (SELECT epoch_us(ts) AS us FROM events),
        keyed AS (SELECT ((us // 86400000000) + 4) % 7 AS dow,
                         (us // 3600000000) % 24 AS hod
                  FROM ev),
        cnt AS (SELECT dow, hod, CAST(count(*) AS BIGINT) AS n
                FROM keyed GROUP BY dow, hod),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt)
        SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod, n,
               CAST((n * 1000000) // total AS BIGINT) AS share_ppm
        FROM cnt, tot ORDER BY dow, hod
    """,
    doc="Traffic heat profile by (day-of-week, hour-of-day) with ppm "
    "share: dow from pure integer epoch math ((days + 4) % 7 — "
    "engine-portable, unlike dayofweek() whose origin differs between "
    "Spark and DuckDB); one shrinking aggregate + a broadcast 1-row total",
)
def events_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(F.expr("ts DIV 1000").alias("us"))
    keyed = ev.select(
        F.expr("((us DIV 86400000000) + 4) % 7").alias("dow"),
        F.expr("(us DIV 3600000000) % 24").alias("hod"),
    )
    cnt = keyed.groupBy("dow", "hod").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(F.sum("n").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.col("hod").cast("long").alias("hod"),
            "n",
            F.expr("CAST((n * 1000000) DIV total AS BIGINT)").alias("share_ppm"),
        )
        .orderBy("dow", "hod")
    )

_HH_HOUR_US = 3_600_000_000

@register(
    "events_heavy_hitters",
    tags=("bench",),
    oracle=f"""
        WITH cnt AS (SELECT (epoch_us(ts) // {_HH_HOUR_US}) * {_HH_HOUR_US} AS window_start_us,
                            user_id, CAST(count(*) AS BIGINT) AS n_events
                     FROM events GROUP BY 1, 2),
        tot AS (SELECT window_start_us, CAST(sum(n_events) AS BIGINT) AS window_events
                FROM cnt GROUP BY 1),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY window_start_us
                                                ORDER BY n_events DESC, user_id) AS rank
                   FROM cnt)
        SELECT r.window_start_us, r.rank, r.user_id, r.n_events,
               CAST((r.n_events * 1000) // t.window_events AS BIGINT) AS share_permille
        FROM ranked r JOIN tot t USING (window_start_us)
        WHERE r.rank <= 3 ORDER BY window_start_us, rank
    """,
    doc="Windowed heavy hitters: exact top-3 users per tumbling hour with "
    "permille share of window traffic. Salted two-phase top-k: per-user "
    "counts (one map-side-combined aggregate), LOCAL top-k inside each "
    "(window, user_id%32) salt slice, then a final window over only 32*k "
    "survivors per hour — no hour ever funnels its full user census through "
    "one sort partition. Streaming twin: streaming/heavy.py space-saving "
    "sketch (bounded state per window)",
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    win_start = F.expr(
        f"((ts DIV 1000) DIV {_HH_HOUR_US}) * {_HH_HOUR_US}"
    ).alias("window_start_us")
    cnt = ev.select(win_start, "user_id").groupBy("window_start_us", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    tot = cnt.groupBy("window_start_us").agg(F.sum("n_events").alias("window_events"))
    # local top-k within each salt slice: the global top-k of complete
    # per-user counts is preserved under ANY user partitioning
    salted = Window.partitionBy(
        "window_start_us", F.col("user_id") % 32
    ).orderBy(F.desc("n_events"), F.asc("user_id"))
    survivors = (
        cnt.withColumn("lr", F.row_number().over(salted)).filter(F.col("lr") <= 3).drop("lr")
    )
    final = Window.partitionBy("window_start_us").orderBy(F.desc("n_events"), F.asc("user_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= 3)
        .join(tot, "window_start_us")
        .select(
            "window_start_us",
            "rank",
            "user_id",
            "n_events",
            F.expr("CAST((n_events * 1000) DIV window_events AS BIGINT)").alias("share_permille"),
        )
        .orderBy("window_start_us", "rank")
    )

@register(
    "events_value_quantiles",
    oracle=f"""
        WITH ev AS (SELECT (epoch_us(ts) // {_HH_HOUR_US}) * {_HH_HOUR_US} AS window_start_us,
                           CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM events)
        SELECT window_start_us, CAST(count(*) AS BIGINT) AS n_events,
               quantile_cont(cents, 0.25) AS p25,
               quantile_cont(cents, 0.5) AS p50,
               quantile_cont(cents, 0.75) AS p75
        FROM ev GROUP BY 1 ORDER BY window_start_us
    """,
    doc="Per-window value quantiles: exact p25/p50/p75 of integer cents per "
    "tumbling hour. DYADIC probes only — the interpolation a+(b-a)*g lands "
    "on exact binary fractions, so Spark percentile() and DuckDB "
    "quantile_cont() are bit-identical (the adaptive-buckets trick). Exact "
    "per-group percentile is the documented sort-buffer cliff; the "
    "deployment twin is percentile_approx per window (same plan shape), "
    "and the STREAMING twin is streaming/quantiles.py's bounded histogram "
    "state",
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"((ts DIV 1000) DIV {_HH_HOUR_US}) * {_HH_HOUR_US}").alias("window_start_us"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    return (
        ev.groupBy("window_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.percentile("cents", 0.25).alias("p25"),
            F.percentile("cents", 0.5).alias("p50"),
            F.percentile("cents", 0.75).alias("p75"),
        )
        .orderBy("window_start_us")
    )

@register(
    "events_seasonal_backtest",
    oracle=f"""
        WITH hourly AS (SELECT event_type,
                               (epoch_us(ts) // {_HH_HOUR_US}) AS hr,
                               CAST(count(*) AS BIGINT) AS n
                        FROM events GROUP BY 1, 2),
        joined AS (SELECT a.event_type, a.hr, a.n AS actual,
                          s.n AS seasonal_pred, p.n AS naive_pred
                   FROM hourly a
                   JOIN hourly s ON s.event_type = a.event_type AND s.hr = a.hr - 24
                   JOIN hourly p ON p.event_type = a.event_type AND p.hr = a.hr - 1)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
               CAST(sum(abs(actual - seasonal_pred)) AS BIGINT) AS seasonal_abs_err,
               CAST(sum(abs(actual - naive_pred)) AS BIGINT) AS naive_abs_err,
               CAST((sum(abs(actual - seasonal_pred)) * 1000)
                    // greatest(sum(abs(actual - naive_pred)), 1) AS BIGINT)
                 AS mase_permille
        FROM joined GROUP BY event_type ORDER BY event_type
    """,
    doc="Forecast-baseline backtest: per event type, seasonal-naive "
    "(t-24h) vs naive (t-1h) hourly-count predictions scored by total "
    "absolute error and their permille ratio (integer MASE - under 1000 "
    "means daily seasonality is real signal, the go/no-go a forecasting "
    "pipeline checks before training anything). One hourly aggregate then "
    "two self-equi-joins on the (type, hour) key - the aggregate output "
    "is hours x types rows, bounded regardless of event count",
)
def events_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(F.expr(f"(ts DIV 1000) DIV {_HH_HOUR_US}").alias("hr"), "event_type")
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = hourly.select("event_type", "hr", F.col("n").alias("actual"))
    s = hourly.select("event_type", (F.col("hr") + 24).alias("hr"), F.col("n").alias("seasonal_pred"))
    p = hourly.select("event_type", (F.col("hr") + 1).alias("hr"), F.col("n").alias("naive_pred"))
    joined = a.join(s, ["event_type", "hr"]).join(p, ["event_type", "hr"])
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.abs(F.col("actual") - F.col("seasonal_pred"))).alias("seasonal_abs_err"),
            F.sum(F.abs(F.col("actual") - F.col("naive_pred"))).alias("naive_abs_err"),
        )
        .select(
            "event_type", "n_hours", "seasonal_abs_err", "naive_abs_err",
            F.expr(
                "CAST((seasonal_abs_err * 1000) DIV greatest(naive_abs_err, 1) AS BIGINT)"
            ).alias("mase_permille"),
        )
        .orderBy("event_type")
    )

@register(
    "purchase_multi_touch",
    oracle="""
        WITH ev AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
                    FROM events),
        p AS (SELECT event_id AS purchase_id, user_id, ts_us AS p_ts,
                     CAST(floor(value * 1000000) AS BIGINT) AS value_micro
              FROM ev WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS click_id, user_id, ts_us AS click_ts
              FROM ev WHERE event_type = 'click'),
        pairs AS (SELECT p.user_id, p.purchase_id, p.value_micro, c.click_id, c.click_ts
                  FROM p JOIN c ON p.user_id = c.user_id
                              AND c.click_ts >= p.p_ts - 3600000000
                              AND c.click_ts <= p.p_ts),
        ranked AS (SELECT *,
                          CAST(row_number() OVER (PARTITION BY purchase_id
                               ORDER BY click_ts, click_id) AS BIGINT) AS position,
                          CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches
                   FROM pairs),
        wt AS (SELECT *,
                      CASE WHEN position = 1
                           THEN 1000 - (1000 // n_touches) * (n_touches - 1)
                           ELSE 1000 // n_touches END AS w_linear_milli,
                      CASE WHEN n_touches = 1 THEN 1000
                           WHEN n_touches = 2 THEN 500
                           WHEN position = 1 THEN 400
                           WHEN position = n_touches THEN 400
                           WHEN position = 2
                           THEN 200 - (200 // (n_touches - 2)) * (n_touches - 3)
                           ELSE 200 // (n_touches - 2) END AS w_ushape_milli
               FROM ranked)
        SELECT user_id, purchase_id, click_id, click_ts, position, n_touches,
               CAST(w_linear_milli AS BIGINT) AS w_linear_milli,
               CAST(w_ushape_milli AS BIGINT) AS w_ushape_milli,
               CAST((value_micro * w_linear_milli) // 1000 AS BIGINT) AS credit_linear_micro,
               CAST((value_micro * w_ushape_milli) // 1000 AS BIGINT) AS credit_ushape_micro
        FROM wt
        ORDER BY purchase_id, position
    """,
    tags=("bench",),
    doc="Multi-touch attribution (operators/attribution.py): every click in "
    "the 1h lookback shares the purchase's value under linear AND 40/20/40 "
    "U-shape position weights — integer millis summing to EXACTLY 1000 per "
    "conversion (floor remainder to the earliest touch of its tranche), "
    "credits = (value*w) DIV 1000 so per-channel rollups replay exactly. "
    "Candidates from the bucketed range equi-join (never a per-user cross "
    "product); position windows partition by purchase",
)
def purchase_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.attribution import multi_touch_attribution

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.expr("ts DIV 1000").alias("ts_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us",
        F.floor(F.col("value") * 1_000_000).cast("long").alias("value_micro"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    out = multi_touch_attribution(
        clicks, purchases, lookback=3_600_000_000,
        key="user_id", ts_col="ts_us", id_col="event_id", value_col="value_micro",
    )
    return out.orderBy("purchase_id", "position")

@register(
    "events_type_dow_independence",
    oracle="""
        WITH keyed AS (SELECT event_type,
                              CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS BIGINT) AS dow
                       FROM events),
        obs AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_obs
                FROM keyed GROUP BY event_type, dow),
        rt AS (SELECT event_type, CAST(sum(n_obs) AS BIGINT) AS row_tot FROM obs GROUP BY event_type),
        ct AS (SELECT dow, CAST(sum(n_obs) AS BIGINT) AS col_tot FROM obs GROUP BY dow),
        g AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs)
        SELECT event_type, dow, n_obs,
               CAST((CAST(row_tot AS HUGEINT) * col_tot * 1000)
                    // CAST(n AS HUGEINT) AS BIGINT) AS expected_milli,
               round(CAST(CAST(n AS HUGEINT) * n_obs
                          - CAST(row_tot AS HUGEINT) * col_tot AS DOUBLE)
                     * CAST(CAST(n AS HUGEINT) * n_obs
                            - CAST(row_tot AS HUGEINT) * col_tot AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(row_tot AS DOUBLE)
                        * CAST(col_tot AS DOUBLE)), 2) AS chi2_term
        FROM obs o JOIN rt r USING (event_type) JOIN ct c USING (dow) CROSS JOIN g
        ORDER BY o.event_type, o.dow
    """,
    tags=("bench",),
    doc="Chi-square independence audit: the event_type x day-of-week "
    "contingency table with expected counts under independence and "
    "per-cell chi-square terms — is behavior day-patterned, or is a "
    "tracking pipeline duplicating one type on one day? One shrinking "
    "groupBy; marginals are tiny keyed tables broadcast back onto the "
    "cells (A4's shape, three ways). dow from integer epoch-day math "
    "(1970-01-01 = Thursday = 4), no timezone/locale dependence",
)
def events_type_dow_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_type",
        F.expr("((ts DIV 1000) DIV 86400000000 + 4) % 7").cast("long").alias("dow"),
    )
    obs = keyed.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("n_obs"))
    rt = obs.groupBy("event_type").agg(F.sum("n_obs").alias("row_tot"))
    ct = obs.groupBy("dow").agg(F.sum("n_obs").alias("col_tot"))
    g = obs.agg(F.sum("n_obs").alias("n"))
    # expected count E = row_tot*col_tot/n is unbounded (up to n), so a
    # 6-decimal double round is not cross-engine-portable past ~1e10 —
    # emit it ×1000 fixed-point via exact integer division instead
    # (DECIMAL(38,0) div == DuckDB HUGEINT //, all operands positive).
    # chi2_term = (n·n_obs − rt·ct)²/(n·rt·ct): the deviation is built as
    # an EXACT decimal integer first, then the one division runs in double
    # with d=2 (chi2_term ≤ n ≤ ~1e12 events at 100 TB → 1e14 < 2^52,
    # inside the cross-engine round-stability budget)
    dec = "CAST(n AS DECIMAL(38,0))"
    dev = (
        "(CAST(n AS DECIMAL(38,0)) * n_obs"
        " - CAST(row_tot AS DECIMAL(38,0)) * col_tot)"
    )
    return (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "dow",
            "n_obs",
            F.expr(
                f"(CAST(row_tot AS DECIMAL(38,0)) * col_tot * 1000) div {dec}"
            ).alias("expected_milli"),
            F.round(
                F.expr(f"CAST({dev} AS DOUBLE)") * F.expr(f"CAST({dev} AS DOUBLE)")
                / (
                    F.col("n").cast("double")
                    * F.col("row_tot").cast("double")
                    * F.col("col_tot").cast("double")
                ),
                2,
            ).alias("chi2_term"),
        )
        .orderBy("event_type", "dow")
    )

@register(
    "events_minute_interpolate",
    oracle="""
        WITH ev AS (SELECT event_type,
                           epoch_us(ts) - epoch_us(ts) % 60000000 AS bucket_us,
                           CAST(floor(value * 100) AS BIGINT) AS value_cents
                    FROM events),
        obs AS (SELECT event_type, bucket_us, CAST(sum(value_cents) AS BIGINT) AS observed
                FROM ev GROUP BY event_type, bucket_us),
        span AS (SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
                 FROM obs GROUP BY event_type),
        grid AS (SELECT s.event_type, g AS bucket_us
                 FROM span s, LATERAL (SELECT unnest(generate_series(s.lo, s.hi, 60000000)) g)),
        j AS (SELECT g.event_type, g.bucket_us, o.observed
              FROM grid g LEFT JOIN obs o
                ON o.event_type = g.event_type AND o.bucket_us = g.bucket_us),
        fenced AS (SELECT event_type, bucket_us, observed,
               last_value(observed IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
               last_value(CASE WHEN observed IS NOT NULL THEN bucket_us END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
               first_value(observed IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
               first_value(CASE WHEN observed IS NOT NULL THEN bucket_us END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
               FROM j)
        SELECT event_type, bucket_us,
               CAST(CASE WHEN observed IS NOT NULL THEN observed
                    WHEN prev_v IS NULL THEN next_v
                    WHEN next_v IS NULL THEN prev_v
                    ELSE prev_v + ((next_v - prev_v) * (bucket_us - prev_t))
                         // (next_t - prev_t) END AS BIGINT) AS filled,
               observed IS NOT NULL AS observed_flag
        FROM fenced ORDER BY event_type, bucket_us
    """,
    doc="Gap-filled minute series with LINEAR interpolation "
    "(time_bucket_gapfill + interpolate shape, beside the locf twin): "
    "each gap row carries both fence posts via two ignore-nulls windows "
    "partitioned by key, and the fill is integer "
    "prev + (next-prev)*(t-t0) DIV (t1-t0) — exact on any engine; grid "
    "edges fall back to the available post",
)
def events_minute_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.hypertable import time_interpolate

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts DIV 1000").alias("ts_us"),
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return time_interpolate(ev)

@register(
    "event_value_outliers_mad",
    oracle="""
        WITH ev AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM events),
        med AS (SELECT event_type, median(cents) AS med_cents FROM ev GROUP BY event_type),
        dev AS (SELECT ev.event_type, abs(ev.cents - m.med_cents) AS adev, ev.cents,
                       m.med_cents
                FROM ev JOIN med m USING (event_type)),
        mad AS (SELECT event_type, median(adev) AS mad_cents FROM dev GROUP BY event_type)
        SELECT d.event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(max(d.med_cents), 1) AS med_cents,
               round(max(a.mad_cents), 1) AS mad_cents,
               CAST(sum(CASE WHEN abs(d.cents - d.med_cents)
                              > 3 * 1.4826 * a.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers,
               CAST(sum(CASE WHEN abs(d.cents - d.med_cents)
                              > 3 * 1.4826 * a.mad_cents THEN 1 ELSE 0 END) * 1000
                    // count(*) AS BIGINT) AS outlier_permille
        FROM dev d JOIN mad a USING (event_type)
        GROUP BY d.event_type ORDER BY d.event_type
    """,
    doc="Robust outlier census per event type: median / MAD with the "
    "1.4826 normal-consistency constant (|x - med| > 3·1.4826·MAD) — the "
    "fat-tail detector that keeps working where event_value_outliers' "
    "3-sigma rule is dragged by the outliers it is hunting. Exact group "
    "medians (5-key grain; the per-key sort buffer is the documented A1 "
    "cliff — swap percentile_approx past ~10^8 rows/key); two shrinking "
    "aggregates with the tiny median/MAD tables joined back",
)
def event_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med_cents")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "cents", "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_cents")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    is_out = F.abs(F.col("cents") - F.col("med_cents")) > 3 * 1.4826 * F.col("mad_cents")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med_cents"), 1).alias("med_cents"),
            F.round(F.max("mad_cents"), 1).alias("mad_cents"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
            F.expr(
                "CAST(sum(CASE WHEN abs(cents - med_cents) > 3 * 1.4826 * mad_cents "
                "THEN 1 ELSE 0 END) * 1000 DIV count(1) AS BIGINT)"
            ).alias("outlier_permille"),
        )
        .orderBy("event_type")
    )
