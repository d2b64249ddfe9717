"""General relational capability queries: full-scan aggregation, multi-way
joins with broadcast dims, date-range filtering, event-time windowing and
sessionization. These anchor the bench (bench.py) and prove the engine's
execution quality beyond the reference's metadata surface.

Precision: monetary aggregates are exact BIGINT cents via per-row
``floor(x*100)`` (per-row double ops are deterministic; BIGINT sums are
order-independent — no float-accumulation drift between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.parquet import load_table
from iceberg_meta_spark.streaming.windows import sliding_counts, tumbling_counts

HOUR_US = 3_600_000_000
QUARTER_US = 900_000_000


@register(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("bench",),
    doc="TPC-H Q1-flavor pricing summary: predicate-pushdown full scan + "
    "partial/final hash aggregation",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date")
    )
    qty = F.floor(F.col("l_quantity")).cast("long")
    base_cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    disc_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("sum_qty"),
        F.sum(base_cents).alias("sum_base_cents"),
        F.sum(disc_cents).alias("sum_disc_cents"),
        (F.sum(qty).cast("double") / n).alias("avg_qty"),
        n.alias("count_order"),
    )


@register(
    "top_customers",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name AS nation,
               CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2, 3
        ORDER BY revenue_cents DESC, c.c_custkey LIMIT 10
    """,
    tags=("bench",),
    doc="Multi-way join (fact shuffles once; nation broadcast) + top-k",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    return (
        joined.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("revenue_cents"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    "order_priority_counts",
    oracle="""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        GROUP BY o_orderpriority
    """,
    doc="Date-range filtered aggregation (pushdown-friendly predicate)",
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.filter(
            (d >= F.lit("1996-01-01").cast("date")) & (d < F.lit("1997-01-01").cast("date"))
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "events_tumbling_counts",
    oracle=f"""
        SELECT (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS window_start_us, event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events GROUP BY 1, 2
    """,
    tags=("bench",),
    doc="Event-time tumbling-window aggregation; same kernel drives the "
    "Structured Streaming variant (streaming/windows.py)",
)
def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts DIV 1000").alias("ts_us"), "event_type", "value"
    )
    return tumbling_counts(ev, width_us=HOUR_US)


@register(
    "events_sliding_counts",
    oracle=f"""
        WITH ev AS (SELECT epoch_us(ts) AS ts_us, event_type, value FROM events),
        w AS (SELECT (ts_us // {QUARTER_US}) * {QUARTER_US} - k * {QUARTER_US} AS window_start_us,
                     event_type, value
              FROM ev, generate_series(0, {HOUR_US // QUARTER_US - 1}) AS g(k))
        SELECT window_start_us, event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM w GROUP BY 1, 2
    """,
    doc="Sliding-window aggregation (1h window, 15min slide): explode into "
    "the overlapping window starts — the batch twin of window(width, slide)",
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts DIV 1000").alias("ts_us"), "event_type", "value"
    )
    return sliding_counts(ev, width_us=HOUR_US, slide_us=QUARTER_US)


@register(
    "user_sessions",
    oracle="""
        WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        lagged AS (
            SELECT user_id, ts_us,
                   lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_ts
            FROM ev),
        marked AS (
            SELECT user_id, ts_us,
                   CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000 THEN 1 ELSE 0 END AS new_sess
            FROM lagged),
        sess AS (
            SELECT user_id,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM marked),
        per_sess AS (
            SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
            FROM sess GROUP BY user_id, session_id)
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS session_count,
               CAST(sum(n_events) AS BIGINT) AS event_count,
               CAST(max(n_events) AS BIGINT) AS max_session_events
        FROM per_sess GROUP BY user_id
    """,
    tags=("bench",),
    doc="Sessionization: lag + cumulative-sum windows (30-min gap), "
    "per-user parallel window partitions",
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts DIV 1000").alias("ts_us")
    )
    by_user = Window.partitionBy("user_id").orderBy("ts_us")
    gap = F.col("ts_us") - F.lag("ts_us").over(by_user)
    marked = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("session_count"),
        F.sum("n_events").alias("event_count"),
        F.max("n_events").alias("max_session_events"),
    )


@register(
    "events_props_extract",
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    doc="S8-analog: JSON property extraction + aggregation "
    "(reference pulls typed values out of the snapshot summary map, "
    "formatters.py:953-965)",
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND CAST(o.o_orderdate AS DATE) < DATE '1996-06-30'
          AND CAST(l.l_shipdate AS DATE) > DATE '1996-06-30'
        GROUP BY l.l_orderkey, CAST(CAST(o.o_orderdate AS DATE) AS STRING)
        ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join, segment + date-range filters pushed to "
    "the scans, integer-cents revenue, top-10 (TakeOrderedAndProject)",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1996-06-30").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1996-06-30").cast("date")
    )
    rev_cents = F.sum(
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .cast("decimal(38,0)")
    ).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"))
        .agg(rev_cents.alias("revenue_cents"))
        .select("l_orderkey", "revenue_cents", "o_orderdate")
        .orderBy(F.desc("revenue_cents"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "local_supplier_volume",
    oracle="""
        SELECT n.n_name,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """,
    tags=("bench",),
    doc="TPC-H Q5 shape: 6-way star join (region/nation/supplier broadcast), "
    "local-supplier co-nation predicate, per-nation revenue",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev_cents = F.sum(
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .cast("decimal(38,0)")
    ).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(rev_cents.alias("revenue_cents"))
    )


@register(
    "priority_with_returns",
    oracle="""
        SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI hash join (each "
    "order counted once regardless of matching lineitem count), priority agg",
)
def priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "customers_without_orders",
    oracle="""
        SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
        GROUP BY c.c_mktsegment
    """,
    doc="TPC-H Q22 shape: churned customers — NOT EXISTS as a LEFT ANTI hash "
    "join (the J1 set-difference pattern on the data side); the date filter "
    "pushes to the orders scan before the join",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").cast("date") >= F.lit("2000-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "returns_by_priority",
    oracle="""
        SELECT l.l_returnflag, o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_lineitems,
               CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_returnflag, o.o_orderpriority
    """,
    doc="TPC-H Q12 shape: fact-fact equi-join + two-dimensional aggregate",
)
def returns_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(F.floor(F.col("l_quantity")).cast("long")).alias("total_qty"),
        )
    )


@register(
    "purchase_click_attribution",
    oracle="""
        WITH ev AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
                    FROM events)
        SELECT p.event_id, p.user_id, p.ts_us,
               CAST(floor(p.value * 100) AS BIGINT) AS value_cents,
               (SELECT c.event_id FROM ev c
                WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts_us <= p.ts_us
                ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1) AS click_event_id,
               (SELECT c.ts_us FROM ev c
                WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts_us <= p.ts_us
                ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1) AS click_ts_us,
               (SELECT p.ts_us - c.ts_us FROM ev c
                WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts_us <= p.ts_us
                ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1) AS gap_us
        FROM ev p WHERE p.event_type = 'purchase'
    """,
    tags=("bench",),
    doc="As-of join (attribution): each purchase + the user's latest click "
    "at-or-before it — union + forward-fill window, ONE shuffle on user_id, "
    "no join operator (operators/asof.py; the reference has no as-of join; "
    "ties break on max event_id)",
)
def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.expr("ts DIV 1000").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts_us",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_us")
    out = asof_join(
        purchases, clicks, key="user_id", ts="ts_us", right_cols=["event_id"],
        tiebreak="event_id", prefix="click_",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        "value_cents",
        F.col("click_event_id"),
        F.col("click_ts_us"),
        (F.col("ts_us") - F.col("click_ts_us")).alias("gap_us"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_hourly_pivot",
    oracle="""
        WITH ev AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hour_of_day, event_type
                    FROM events)
        SELECT hour_of_day,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM ev GROUP BY hour_of_day
    """,
    doc="Pivot (wide conditional aggregation): hour-of-day x event_type "
    "counts via groupBy().pivot(values=...) — explicit value list keeps the "
    "plan a single pass (no distinct-collect pre-query) at any scale",
)
def events_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        ((F.expr("ts DIV 1000") / F.lit(HOUR_US)).cast("long") % 24).alias("hour_of_day"),
        "event_type",
    )
    out = ev.groupBy("hour_of_day").pivot("event_type", _EVENT_TYPES).count()
    # pivot leaves NULL for empty cells; the conditional-sum semantics is 0
    return out.select(
        "hour_of_day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


@register(
    "user_value_deciles",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM events GROUP BY user_id),
        tiled AS (
            SELECT user_id, total_cents,
                   ntile(10) OVER (ORDER BY total_cents, user_id) AS decile
            FROM per_user)
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_users,
               min(total_cents) AS min_cents,
               max(total_cents) AS max_cents
        FROM tiled GROUP BY decile
    """,
    doc="Quantile bucketing: per-user totals -> ntile(10) ranking window -> "
    "per-decile stats. The ntile runs over per-USER aggregates (orders of "
    "magnitude smaller than events); (total, user_id) ordering is total, so "
    "bucket assignment is deterministic in any engine",
)
def user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("total_cents")
    )
    tiled = per_user.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("total_cents", "user_id"))
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("total_cents").alias("min_cents"),
        F.max("total_cents").alias("max_cents"),
    )


@register(
    "event_user_reach",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    """,
    doc="Reach: exact distinct-count per event type (two-phase distinct "
    "aggregate). The >10^9-key scale path is approx_count_distinct — the "
    "HLL++ sketch, constant memory, mergeable across partitions — "
    "unit-tested for error tolerance (test_hll_sketch_tolerance)",
)
def event_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "top_supplier_revenue",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
              AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, r.total_cents
        FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
    """,
    doc="TPC-H Q15 shape: quarterly per-supplier revenue, winner(s) by "
    "scalar-max — decorrelated to a 1-row aggregate broadcast back (the "
    "partition_skew pattern), never a global window over all suppliers",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    rev = (
        li.filter((d >= F.lit("1996-01-01").cast("date")) & (d < F.lit("1996-04-01").cast("date")))
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("total_cents")
        )
    )
    mx = rev.agg(F.max("total_cents").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_cents == F.col("mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_cents")
    )


@register(
    "large_orders",
    oracle="""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 250)
        SELECT c.c_name, o.o_orderkey,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
               b.total_qty
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18 shape: HAVING group-filter on the fact aggregate (the "
    "IN-subquery decorrelated to agg->filter->join), then order/customer "
    "enrichment joins",
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.floor(F.col("l_quantity")).cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("totalprice_cents"),
            "total_qty",
        )
    )


@register(
    "promo_revenue_share",
    oracle="""
        SELECT round(
                 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                          ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE),
                 4) AS promo_pct,
               CAST(sum(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS promo_cents,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l.l_shipdate AS DATE) < DATE '1997-02-01'
    """,
    doc="TPC-H Q14 shape: promo revenue share — part dim broadcast into the "
    "date-pruned fact scan, conditional/total sums in ONE aggregate pass "
    "(no second scan for the denominator)",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    li = li.filter((d >= F.lit("1997-01-01").cast("date")) & (d < F.lit("1997-02-01").cast("date")))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(0))
    total = F.sum(cents)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.lit(100.0) * promo.cast("double") / total.cast("double"), 4).alias("promo_pct"),
            promo.alias("promo_cents"),
            total.alias("total_cents"),
        )
    )


@register(
    "brand_quantity_revenue",
    oracle="""
        SELECT CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_lineitems
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 5 AND 20 AND p.p_size <= 10)
           OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 40 AND p.p_size <= 25)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive brand/quantity/size "
    "predicates over the fact-dim join — Catalyst extracts the common "
    "sub-predicates for pushdown and keeps the OR as a post-join filter",
)
def brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        (F.col("p_brand") == "Brand#1") & q.between(5, 20) & (F.col("p_size") <= 10)
    ) | (
        (F.col("p_brand") == "Brand#3") & q.between(20, 40) & (F.col("p_size") <= 25)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "session_paths",
    oracle="""
        WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
                    FROM events),
        lagged AS (
            SELECT *, lag(ts_us) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id) AS prev_ts
            FROM ev),
        marked AS (
            SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
                           THEN 1 ELSE 0 END AS new_sess
            FROM lagged),
        sess AS (
            SELECT *, sum(new_sess) OVER (PARTITION BY user_id
                                          ORDER BY ts_us, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS session_id
            FROM marked),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                                         ORDER BY ts_us, event_id) AS rn
            FROM sess),
        paths AS (
            SELECT user_id, session_id,
                   string_agg(event_type, '>' ORDER BY rn) AS path
            FROM ranked WHERE rn <= 3 GROUP BY user_id, session_id),
        counted AS (
            SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM paths GROUP BY path),
        tot AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS total FROM counted)
        SELECT c.path, c.n_sessions,
               CAST(c.n_sessions * 1000 // t.total AS BIGINT) AS share_permille
        FROM counted c, tot t
        ORDER BY c.n_sessions DESC, c.path
        LIMIT 20
    """,
    tags=("bench",),
    doc="Path analysis (the Amplitude/GA 'top user journeys' query): the "
    "first three event types of every 30-minute-gap session, joined "
    "'a>b>c', counted across sessions with integer permille share — the "
    "behavioral signature report. Every window (lag, cumulative session "
    "id, in-session rank) partitions by user_id — sessionization work is "
    "per-user parallel, never a global ordering; path counting is one "
    "shrinking groupBy on the path string, the 1-row total broadcasts "
    "back, and the top-20 compiles to TakeOrderedAndProject (per-"
    "partition heaps, no global sort). Ties inside a session break on "
    "event_id in BOTH engines, so paths are engine-deterministic",
)
def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts DIV 1000").alias("ts_us")
    )
    by_user = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    run = by_user.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col("ts_us") - F.lag("ts_us").over(by_user)
    marked = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    )
    # r13: the first-3-events path is assembled with lead() inside the ONE
    # user window — rows are already session-contiguous in (ts, event_id)
    # order there, so the old (user, session_id) row_number window and the
    # (user, session_id) collect_list groupBy (two more full exchanges +
    # sorts, §2.4) are both unnecessary; a lead belongs to the path only
    # while its session_id matches the start row's (session_id is
    # non-decreasing within a user, so a mismatch means session end).
    # Result-identical (A/B'd row-for-row at sf0.1), 1.69 -> 1.18 s warm.
    sess = marked.select(
        "user_id",
        "event_type",
        "new_sess",
        F.sum("new_sess").over(run).alias("session_id"),
        F.lead("event_type", 1).over(by_user).alias("e2"),
        F.lead("event_type", 2).over(by_user).alias("e3"),
        F.lead(F.sum("new_sess").over(run), 1).over(by_user).alias("s2"),
        F.lead(F.sum("new_sess").over(run), 2).over(by_user).alias("s3"),
    )
    paths = sess.where(F.col("new_sess") == 1).select(
        F.concat_ws(
            ">",
            F.col("event_type"),
            F.when(F.col("s2") == F.col("session_id"), F.col("e2")),
            F.when(F.col("s3") == F.col("session_id"), F.col("e3")),
        ).alias("path")
    )
    # counted feeds BOTH the output rows and the broadcast total — without
    # the lazy checkpoint each branch re-runs the whole window pipeline
    counted = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .localCheckpoint(eager=False)
    )
    tot = counted.agg(F.sum("n_sessions").cast("long").alias("total"))
    return (
        counted.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n_sessions",
            F.expr("n_sessions * 1000 DIV total").alias("share_permille"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )
