"""Relational analytics over the TPC-H-shaped tables (customer / supplier /
part / orders / lineitem): revenue rollups, market share, graph-ish
supplier analytics, histograms, skyline/fuzzy-match extensions.

Split from the former monolithic queries/extensions.py (round 7); the
registration order of the full extension family is pinned by
queries/extensions.py::_CANONICAL_ORDER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.parquet import load_table


from iceberg_meta_spark.pipeline import graph, quality  # noqa: E402

from iceberg_meta_spark.pipeline import corpus  # noqa: E402

@register(
    "customer_order_histogram",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey)
        SELECT c_count, CAST(count(*) AS BIGINT) AS n_customers
        FROM per_cust GROUP BY c_count
        ORDER BY n_customers DESC, c_count DESC
    """,
    doc="Q13 shape: customer-order-count distribution including zero-order "
    "customers — LEFT OUTER join then two shrinking aggregations; the "
    "per-customer count reuses the join's custkey partitioning (no extra "
    "exchange) and the histogram key space is tiny",
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("c_count").desc())
    )

@register(
    "small_quantity_revenue",
    oracle="""
        WITH li AS (SELECT l_partkey, l_extendedprice,
                           CAST(floor(l_quantity * 100) AS BIGINT) AS lq
                    FROM lineitem),
        pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
        stats AS (SELECT l_partkey, CAST(sum(lq) AS BIGINT) AS sum_lq,
                         CAST(count(*) AS BIGINT) AS cnt
                  FROM li JOIN pk ON p_partkey = l_partkey GROUP BY l_partkey)
        SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM li JOIN stats USING (l_partkey)
        WHERE lq * cnt * 5 < sum_lq
    """,
    doc="Q17 shape: revenue from below-one-fifth-of-part-average quantity "
    "lines of one brand — the correlated per-part AVG decorrelated into a "
    "groupBy broadcast back onto the fact scan; the threshold compare is "
    "integer cross-multiplication (lq*cnt*5 < sum_lq), no float division",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_extendedprice",
        F.floor(F.col("l_quantity") * 100).cast("long").alias("lq"),
    )
    pk = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    brand_li = li.join(F.broadcast(pk), li.l_partkey == pk.p_partkey).drop("p_partkey")
    stats = brand_li.groupBy("l_partkey").agg(
        F.sum("lq").alias("sum_lq"), F.count(F.lit(1)).alias("cnt")
    )
    hits = brand_li.join(F.broadcast(stats), "l_partkey").filter(
        F.col("lq") * F.col("cnt") * 5 < F.col("sum_lq")
    )
    return hits.agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )

@register(
    "sole_return_suppliers",
    oracle="""
        WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem
                    WHERE l_returnflag = 'R'),
        multi AS (
            SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
            FROM l1
            WHERE EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R'))
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM multi JOIN supplier s ON s.s_suppkey = multi.l_suppkey
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    doc="Q21 shape: suppliers who were the SOLE returner in multi-supplier "
    "orders — compound-condition LeftSemi (another supplier exists) and "
    "LeftAnti (no other returner) on the orderkey with a suppkey "
    "inequality, then a broadcast supplier-dim join and top-k",
)
def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = l1.select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    multi = l1.join(
        l2, (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")), "leftsemi"
    ).join(
        l3, (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")), "leftanti"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        multi.join(F.broadcast(sup), multi.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )

@register(
    "sole_return_suppliers_agg",
    oracle="""
        WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem
                    WHERE l_returnflag = 'R'),
        multi AS (
            SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
            FROM l1
            WHERE EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R'))
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM multi JOIN supplier s ON s.s_suppkey = multi.l_suppkey
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    doc="Scale twin of sole_return_suppliers: the semi/anti formulation "
    "shuffles lineitem three times (base + EXISTS + NOT EXISTS probes); "
    "this one reduces each order in ONE groupBy — distinct suppliers, "
    "distinct returners, and the sole returner id via conditional "
    "aggregates — then filters (n_supp >= 2, n_ret = 1). Same rows, "
    "one-third the shuffle volume; the plan test pins the single exchange",
)
def sole_return_suppliers_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    ret_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(ret_supp).alias("n_ret"),
        F.max(ret_supp).alias("ret_supp"),
    )
    hits = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        hits.join(F.broadcast(sup), hits.ret_supp == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )

_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"

@register(
    "nation_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(CAST(l.l_shipdate AS DATE)) AS INT) AS l_year,
               CAST(sum({_CENTS.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l.l_shipdate AS DATE) <= DATE '1997-12-31'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape (volume shipping between two nations): fact scanned "
    "once, every dimension broadcast, the two-nation disjunction applied "
    "after the joins on broadcast-joined attributes; integer-cents revenue",
)
def nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") <= F.lit("1997-12-31").cast("date"))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cus = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cus), ords.o_custkey == cus.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).alias("l_year"),
        )
        .agg(F.sum(cents.cast("decimal(38,0)")).cast("long").alias("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )

@register(
    "nation_market_share",
    oracle="""
        WITH vol AS (
            SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS INT) AS o_year,
                   CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS cents,
                   n1.n_name AS supp_nation
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n2.n_regionkey
            WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
              AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
              AND CAST(o.o_orderdate AS DATE) <= DATE '1997-12-31')
        SELECT o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS DOUBLE)
                     / sum(cents), 6) AS mkt_share
        FROM vol GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): one pass over the filtered "
    "fact with all six dimensions broadcast; share = conditional sum over "
    "total per order-year — no second scan, no self-join",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    par = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    # customer-side nation restricted to the target region before the join:
    # the filter prunes the broadcast build side, not the probe stream
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n2 = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    ords = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") <= F.lit("1997-12-31").cast("date"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cus = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    vol = (
        li.join(F.broadcast(par), li.l_partkey == par.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cus), ords.o_custkey == cus.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .select(
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
            cents.alias("cents"),
            F.col("supp_nation"),
        )
    )
    national = F.when(F.col("supp_nation") == "NATION_3", F.col("cents")).otherwise(F.lit(0))
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(national).cast("double") / F.sum("cents"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )

@register(
    "returned_item_customers",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue_cents DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item top customers): returnflag filter "
    "pushed to the lineitem scan, quarter filter to the orders scan, "
    "customer/nation broadcast, top-20 via TakeOrderedAndProject",
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    ords = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    cus = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cus), ords.o_custkey == cus.c_custkey)
        .join(F.broadcast(nat), cus.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(cents.cast("decimal(38,0)")).cast("long").alias("revenue_cents"))
        .select("c_custkey", "c_name", "revenue_cents", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(20)
    )

@register(
    "min_cost_supplier",
    oracle="""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   CAST(min(floor(l_extendedprice / l_quantity * 100)) AS BIGINT) AS cost_cents
            FROM lineitem WHERE l_quantity > 0
            GROUP BY l_partkey, l_suppkey),
        eur AS (
            SELECT ps.l_partkey, ps.l_suppkey, ps.cost_cents, s.s_name, n.n_name
            FROM ps
            JOIN supplier s ON s.s_suppkey = ps.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'),
        best AS (
            SELECT *, row_number() OVER (
                PARTITION BY l_partkey ORDER BY cost_cents, l_suppkey) AS rn
            FROM eur)
        SELECT b.l_partkey AS p_partkey, p.p_name, b.cost_cents,
               b.l_suppkey AS s_suppkey, b.s_name, b.n_name
        FROM best b JOIN part p ON p.p_partkey = b.l_partkey
        WHERE b.rn = 1 AND p.p_size >= 45
        ORDER BY b.cost_cents, p_partkey
        LIMIT 25
    """,
    doc="TPC-H Q2 shape (min-cost supplier per part in a region): partsupp "
    "derived from lineitem history, region filter prunes the broadcast "
    "supplier/nation build side, per-part argmin via min(struct(cost, "
    "suppkey)) — a partial-aggregating groupBy, not a row_number window "
    "over every quote",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100)
        ).cast("long").alias("cost_cents")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dim = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    eur = ps.join(F.broadcast(dim), ps.l_suppkey == dim.s_suppkey)
    best = eur.groupBy("l_partkey").agg(
        F.min(F.struct("cost_cents", "l_suppkey", "s_name", "n_name")).alias("b")
    )
    par = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 45).select(
        "p_partkey", "p_name"
    )
    return (
        best.join(F.broadcast(par), best.l_partkey == par.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("b.cost_cents").alias("cost_cents"),
            F.col("b.l_suppkey").alias("s_suppkey"),
            F.col("b.s_name").alias("s_name"),
            F.col("b.n_name").alias("n_name"),
        )
        .orderBy("cost_cents", "p_partkey")
        .limit(25)
    )

@register(
    "nation_profit",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(year(CAST(o.o_orderdate AS DATE)) AS INT) AS o_year,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                        - CAST(floor(p.p_retailprice * l.l_quantity) AS BIGINT)) AS BIGINT) AS profit_cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-line profit by nation and year): LIKE "
    "filter prunes the broadcast part build side, revenue minus derived "
    "supply cost in integer cents, one pass over the fact",
)
def nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    par = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
        - F.floor(F.col("p_retailprice") * F.col("l_quantity")).cast("long")
    )
    return (
        li.join(F.broadcast(par), li.l_partkey == par.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
        )
        .agg(F.sum(amount).alias("profit_cents"))
        .orderBy("nation", F.desc("o_year"))
    )

from iceberg_meta_spark.pipeline.graph import pagerank  # noqa: E402

@register(
    "supplier_pagerank",
    oracle="""
        WITH e AS (SELECT DISTINCT l_suppkey AS src, (l_partkey % 100) + 1 AS dst
                   FROM lineitem WHERE l_suppkey <> (l_partkey % 100) + 1),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_scaled FROM nodes),
        c1 AS (SELECT e.dst, CAST(sum(r0.rank_scaled // od.outdeg) AS BIGINT) AS in_sum
               FROM e JOIN r0 ON r0.node = e.src JOIN od ON od.src = e.src
               GROUP BY e.dst),
        r1 AS (SELECT n.node,
                      CAST(150000 + (850000 * coalesce(c1.in_sum, 0)) // 1000000 AS BIGINT) AS rank_scaled
               FROM nodes n LEFT JOIN c1 ON c1.dst = n.node),
        c2 AS (SELECT e.dst, CAST(sum(r1.rank_scaled // od.outdeg) AS BIGINT) AS in_sum
               FROM e JOIN r1 ON r1.node = e.src JOIN od ON od.src = e.src
               GROUP BY e.dst),
        r2 AS (SELECT n.node,
                      CAST(150000 + (850000 * coalesce(c2.in_sum, 0)) // 1000000 AS BIGINT) AS rank_scaled
               FROM nodes n LEFT JOIN c2 ON c2.dst = n.node)
        SELECT node, rank_scaled FROM r2 ORDER BY rank_scaled DESC, node
    """,
    doc="PageRank power iteration (2 rounds, damping 0.85) over a supplier "
    "co-supply graph derived from lineitem: fixed-point BIGINT arithmetic "
    "makes the iteration bit-deterministic, so the unrolled recursive "
    "oracle hash-gates it like the k-means trainer; per round one "
    "edge-side shuffle with map-side combine, rank/outdeg dims broadcast",
)
def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dst = (F.col("l_partkey") % 100) + 1
    edges = (
        li.select(F.col("l_suppkey").alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return pagerank(edges, n_iters=2)

@register(
    "important_stock",
    oracle="""
        WITH s7 AS (SELECT s_suppkey FROM supplier s JOIN nation n
                      ON s.s_nationkey = n.n_nationkey
                    WHERE n.n_name = 'NATION_7'),
        v AS (SELECT l_partkey AS partkey,
                     CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS value_cents
              FROM lineitem l JOIN s7 ON l.l_suppkey = s7.s_suppkey
              GROUP BY l_partkey),
        t AS (SELECT sum(value_cents) AS tot FROM v)
        SELECT partkey, value_cents FROM v, t
        WHERE value_cents * 1000 > tot
        ORDER BY value_cents DESC, partkey
    """,
    doc="TPC-H Q11 shape (important stock): per-part inventory value held "
    "by one nation's suppliers, kept when above 1/1000 of that nation's "
    "total — supplier dim broadcast onto lineitem, ONE partkey groupBy, "
    "1-row total broadcast back for the threshold (no second scan); "
    "integer cents keep the hash gate exact",
)
def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    s7 = supp.join(
        F.broadcast(nat.filter(F.col("n_name") == "NATION_7")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    v = (
        li.join(F.broadcast(s7), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
                "value_cents"
            )
        )
    )
    tot = v.agg(F.sum("value_cents").alias("tot"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("tot"))
        .select("partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "partkey")
    )

@register(
    "supplier_part_variety",
    oracle="""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        ok AS (SELECT ps.l_suppkey, p.p_brand, p.p_type, p.p_size
               FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
               WHERE p.p_brand <> 'Brand#1'
                 AND p.p_type NOT LIKE 'PROMO%'
                 AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
                 AND ps.l_suppkey NOT IN
                     (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM ok GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): distinct supplier "
    "count per (brand, type, size) over the derived partsupp, excluding a "
    "blacklist (negative-balance suppliers as the complaints stand-in) — "
    "part dim and the tiny blacklist both broadcast (the NOT IN compiles "
    "to LeftAnti), distinct-count is the only wide aggregate",
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    pok = part.filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    blacklist = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    ok = (
        ps.join(F.broadcast(pok), ps.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(blacklist), ps.l_suppkey == F.col("s_suppkey"), "left_anti")
    )
    return (
        ok.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )

@register(
    "excess_stock_suppliers",
    oracle="""
        WITH q97 AS (SELECT l_partkey, l_suppkey,
                       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS q
                     FROM lineitem
                     WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
                       AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
                     GROUP BY l_partkey, l_suppkey),
        tot AS (SELECT l_partkey, l_suppkey,
                  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS aq
                FROM lineitem GROUP BY l_partkey, l_suppkey),
        cand AS (SELECT DISTINCT t.l_suppkey
                 FROM tot t JOIN q97 USING (l_partkey, l_suppkey)
                 JOIN part p ON t.l_partkey = p.p_partkey
                 WHERE p.p_name LIKE 'red%' AND t.aq > 2 * q97.q)
        SELECT s.s_suppkey, s.s_name
        FROM supplier s JOIN cand ON s.s_suppkey = cand.l_suppkey
        ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 shape (excess stock): suppliers holding more than 2x a "
    "year's shipments of a named part family — availqty derives as the "
    "all-time quantity per partsupp pair, compared against the 1997 "
    "aggregate of the same pair; ONE shuffle keyed (partkey, suppkey) "
    "serves both aggregates via conditional sums, part dim broadcast, "
    "then a semi-join to supplier; integer quantities keep it exact",
)
def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    in97 = (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date")) & (
        F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date")
    )
    qty = F.floor(F.col("l_quantity")).cast("long")
    # one aggregation pass: all-time and 1997 sums from the same shuffle
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty).alias("aq"),
        F.sum(F.when(in97, qty).otherwise(F.lit(0))).alias("q97"),
        F.max(F.when(in97, F.lit(1)).otherwise(F.lit(0))).alias("has97"),
    )
    reds = part.filter(F.col("p_name").startswith("red")).select("p_partkey")
    cand = (
        pair.filter((F.col("has97") == 1) & (F.col("aq") > 2 * F.col("q97")))
        .join(F.broadcast(reds), pair.l_partkey == F.col("p_partkey"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(cand, supp.s_suppkey == cand.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )

@register(
    "customer_rolling_revenue",
    oracle="""
        WITH d AS (SELECT o_custkey,
                     CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS BIGINT) AS day,
                     CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents
                   FROM orders GROUP BY o_custkey, day)
        SELECT o_custkey, day, day_cents,
               CAST(sum(day_cents) OVER (PARTITION BY o_custkey ORDER BY day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_7d_cents
        FROM d ORDER BY o_custkey, day
    """,
    doc="Rolling 7-day revenue per customer via a RANGE-frame window: "
    "day-grain pre-aggregation first (the wide work, map-side combined), "
    "then the RANGE BETWEEN 6 PRECEDING frame over the per-customer "
    "day-grain rows — value-based framing handles day gaps correctly "
    "where a ROWS frame would not; window partitions by customer, integer "
    "cents end to end",
)
def customer_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            F.expr(
                "CAST(unix_micros(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)) DIV 86400000000 AS BIGINT)"
            ).alias("day"),
        )
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("day_cents"))
    )
    w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-6, 0)
    return d.select(
        "o_custkey", "day", "day_cents",
        F.sum("day_cents").over(w).alias("rolling_7d_cents"),
    ).orderBy("o_custkey", "day")

@register(
    "copurchase_pairs",
    oracle="""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                    CAST(count(*) AS BIGINT) AS n_orders
                  FROM items a JOIN items b
                    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                  GROUP BY part_a, part_b)
        SELECT part_a, part_b, n_orders FROM pairs
        WHERE n_orders >= 2
        ORDER BY n_orders DESC, part_a, part_b LIMIT 50
    """,
    doc="Market-basket co-purchase pairs: distinct (order, part) items "
    "self-joined WITHIN an order key — the blocked self-join is bounded by "
    "basket size (quadratic per order, never per corpus), the classic "
    "item-item co-occurrence shape; map-side combine on the pair counts, "
    "top-k via TakeOrdered",
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(50)
    )

@register(
    "monthly_revenue_growth",
    oracle="""
        WITH m AS (SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS VARCHAR) AS month,
                     CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
                   FROM orders GROUP BY month)
        SELECT month, revenue_cents,
               CAST(CASE WHEN lag(revenue_cents) OVER (ORDER BY month) IS NULL THEN NULL
                    ELSE (revenue_cents - lag(revenue_cents) OVER (ORDER BY month)) * 1000000
                         // lag(revenue_cents) OVER (ORDER BY month) END AS BIGINT) AS growth_ppm
        FROM m ORDER BY month
    """,
    doc="Month-over-month revenue growth: one month-keyed aggregate (the "
    "wide work) then a lag() window over the MONTH-grain frame — the "
    "global ordering is over #months rows, metadata-sized, so the "
    "single-partition window is safe at any data scale; integer-ppm "
    "growth keeps the gate exact",
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("month"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("revenue_cents"))
    )
    prev = F.lag("revenue_cents").over(Window.orderBy("month"))
    return m.select(
        "month",
        "revenue_cents",
        F.when(prev.isNull(), F.lit(None).cast("long"))
        .otherwise(F.expr(
            "(revenue_cents - lag(revenue_cents) OVER (ORDER BY month)) * 1000000"
            " DIV lag(revenue_cents) OVER (ORDER BY month)"
        ))
        .alias("growth_ppm"),
    ).orderBy("month")

@register(
    "promo_discount_revenue",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_delta_cents
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): single-table predicate "
    "band + one global aggregate — every filter pushes to the parquet "
    "scan, the whole query is one codegen'd map-reduce with a 1-row "
    "result; the canonical data-skipping beneficiary (a year-clustered "
    "layout prunes all other files)",
)
def promo_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    return (
        li.filter(
            (d >= F.lit("1997-01-01").cast("date"))
            & (d < F.lit("1998-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("long")
            ).alias("revenue_delta_cents"),
        )
    )

@register(
    "order_value_histogram",
    oracle="""
        WITH b AS (SELECT CASE WHEN o_totalprice < 50000 THEN 'lt_50k'
                               WHEN o_totalprice < 150000 THEN '50_150k'
                               WHEN o_totalprice < 300000 THEN '150_300k'
                               ELSE 'ge_300k' END AS bucket,
                          CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                   FROM orders),
        cnt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
                  CAST(sum(cents) AS BIGINT) AS bucket_cents
                FROM b GROUP BY bucket),
        tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM cnt)
        SELECT bucket, n_orders, bucket_cents,
               CAST((n_orders * 1000) // total AS BIGINT) AS share_permille
        FROM cnt, tot ORDER BY bucket
    """,
    doc="Order-value histogram in fixed price buckets with permille "
    "shares: CASE bucketing, one shrinking aggregate, broadcast total",
)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        F.expr(
            "CASE WHEN o_totalprice < 50000 THEN 'lt_50k' "
            "WHEN o_totalprice < 150000 THEN '50_150k' "
            "WHEN o_totalprice < 300000 THEN '150_300k' "
            "ELSE 'ge_300k' END"
        ).alias("bucket"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    cnt = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("bucket_cents")
    )
    tot = cnt.agg(F.sum("n_orders").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_orders",
            "bucket_cents",
            F.expr("CAST((n_orders * 1000) DIV total AS BIGINT)").alias("share_permille"),
        )
        .orderBy("bucket")
    )

from iceberg_meta_spark.operators.bloom import bloom_semi_join  # noqa: E402

@register(
    "bloom_semi_revenue",
    tags=("bench",),
    oracle="""
        WITH hot AS (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT' AND o_totalprice >= 150000)
        SELECT l.l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem l
        WHERE l.l_orderkey IN (SELECT o_orderkey FROM hot)
        GROUP BY 1 ORDER BY l.l_returnflag
    """,
    doc="Bloom-prefiltered semi join (operators/bloom.py): urgent high-value "
    "orders are aggregated into a 4096-bit md5-positioned filter (one "
    "m/64-row aggregate), baked into the plan as a literal, and applied "
    "MAP-SIDE to lineitem before the exact left-semi backstop - only "
    "probable matches reach the shuffle, false positives never reach the "
    "result; the oracle is the plain semi join because the filter is "
    "semantically transparent",
)
def bloom_semi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hot = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") >= 150000)
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    # m_bits sizing, measured r12: 65536 bits = ~3 bits/key for the ~21k
    # surviving hot orders (~23 % false positives — 207k of 600k rows pass
    # vs ~84k true matches). Raising m to the §3.2 10-bits/key rule
    # (262144) was tried and MEASURED SLOWER here: the 4096-long literal
    # word array dominates codegen at this scale factor, costing more than
    # the extra 120k-row shuffle it saves. Result-identical at any m (the
    # exact semi join backstops every false positive), so the knob stays
    # at the locally-faster value; at real scale the probe-side row volume
    # dominates and a deployment would size m to the build cardinality.
    kept = bloom_semi_join(li, hot, "l_orderkey", m_bits=65536, k=3)
    return (
        kept.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(
                "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)"
            ).alias("revenue_cents"),
        )
        .orderBy("l_returnflag")
    )

@register(
    "customer_fuzzy_matches",
    tags=("bench",),
    oracle="""
        WITH c AS (SELECT c_custkey, c_nationkey, c_name FROM customer),
        pairs AS (
          SELECT a.c_nationkey, a.c_custkey AS key_a, b.c_custkey AS key_b
          FROM c a JOIN c b
            ON a.c_custkey < b.c_custkey
           AND levenshtein(a.c_name, b.c_name) <= 1
        )
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS n_matched_pairs,
               CAST((min(struct_pack(a := key_a, b := key_b))).a AS BIGINT)
                   AS sample_key_a,
               CAST((min(struct_pack(a := key_a, b := key_b))).b AS BIGINT)
                   AS sample_key_b
        FROM pairs GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    doc="Record linkage / entity resolution: customer-name pairs within "
    "edit distance 1, found by SymSpell-style deletion-neighborhood "
    "blocking — each name emits itself plus its length single-char-deletion "
    "variants as candidate keys, candidates come from an EQUI-join on those "
    "keys (recall-complete for distance <= 1: a substitution shares the "
    "delete-at-the-differing-position variant, an insert/delete shares the "
    "shorter string itself), then exact levenshtein() verifies. The oracle "
    "is the independent O(N^2) blocked specification; the Spark side never "
    "forms the quadratic product, so the shape survives 10^9 names "
    "(candidate keys are near-unique, hot-key-free). Grouped per nation of "
    "the lower-keyed customer",
)
def customer_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.col("c_name").alias("name")
    )
    # name itself + every single-char-deletion variant = candidate keys
    keys = cust.select(
        "c_custkey",
        "c_nationkey",
        "name",
        F.explode(
            F.expr(
                "array_union(array(name), transform(sequence(1, length(name)),"
                " i -> concat(substring(name, 1, i - 1), substring(name, i + 1))))"
            )
        ).alias("k"),
    )
    a, b = keys.alias("a"), keys.alias("b")
    # levenshtein BEFORE the pair-dedup (r13): the verify predicate is a
    # pure function of the pair, so filtering first is result-identical —
    # and the distinct then shuffles three ints for MATCHED pairs only,
    # instead of every candidate row with both name strings aboard
    # (§2.3 project/filter before the exchange). Re-verified duplicates
    # (pairs sharing several deletion variants) cost one extra ~20-char
    # levenshtein each, far less than the wide distinct they replace.
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .where(F.levenshtein(F.col("a.name"), F.col("b.name")) <= 1)
        .select(
            F.col("a.c_nationkey").alias("c_nationkey"),
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
        )
        .distinct()
    )
    return (
        cand.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched_pairs"),
            # lexicographic struct min, not key_a*C+key_b packing: arithmetic
            # packing overflows BIGINT once keys approach 10^9 (ADVICE r4)
            F.min(F.struct(F.col("key_a"), F.col("key_b"))).alias("_p"),
        )
        .select(
            "c_nationkey",
            "n_matched_pairs",
            F.col("_p.key_a").alias("sample_key_a"),
            F.col("_p.key_b").alias("sample_key_b"),
        )
        .orderBy("c_nationkey")
    )

@register(
    "order_skyline",
    tags=("bench",),
    oracle="""
        WITH pts AS (
          SELECT o_orderpriority,
                 CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
                 o_orderdate AS ts,
                 CAST(min(o_orderkey) AS BIGINT) AS o_orderkey
          FROM orders GROUP BY 1, 2, 3)
        SELECT o_orderpriority, price_cents, ts AS o_orderdate, o_orderkey
        FROM pts p
        WHERE NOT EXISTS (
          SELECT 1 FROM pts q
          WHERE q.o_orderpriority = p.o_orderpriority
            AND q.price_cents >= p.price_cents AND q.ts >= p.ts
            AND (q.price_cents > p.price_cents OR q.ts > p.ts))
        ORDER BY o_orderpriority, price_cents DESC
    """,
    doc="2-D skyline (Pareto frontier) per order priority, maximizing "
    "(total price, recency): an order is on the skyline iff no other order "
    "in its priority class is >= on both dimensions and > on one. "
    "Distinct (price, date) points with the min-orderkey representative. "
    "The oracle is the independent NOT-EXISTS dominance specification; the "
    "Spark side is the O(N log N) sort-filter form - running max(date) over "
    "rows sorted by (price DESC, date DESC) - run TWICE: a local pass "
    "inside (priority, salt-of-16) partitions prunes dominated points "
    "map-side-cheap, the global pass over the tiny survivor set finishes. "
    "skyline(union of local skylines) = skyline(all), so no single "
    "partition ever sees the full group - the classic distributed-skyline "
    "decomposition",
)
def order_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    pts = (
        o.groupBy(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
            F.col("o_orderdate").alias("ts"),
        )
        .agg(F.min("o_orderkey").cast("long").alias("o_orderkey"))
    )

    def _skyline_pass(df: DataFrame, extra_key: list) -> DataFrame:
        w = (
            Window.partitionBy("o_orderpriority", *extra_key)
            .orderBy(F.desc("price_cents"), F.desc("ts"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            df.withColumn("prev_max_ts", F.max("ts").over(w))
            .where(F.col("prev_max_ts").isNull() | (F.col("prev_max_ts") < F.col("ts")))
            .drop("prev_max_ts")
        )

    local = _skyline_pass(
        pts.withColumn("salt", F.pmod(F.hash("o_orderkey"), F.lit(16))), ["salt"]
    ).drop("salt")
    sky = _skyline_pass(local, [])
    return sky.select(
        "o_orderpriority", "price_cents", F.col("ts").alias("o_orderdate"), "o_orderkey"
    ).orderBy("o_orderpriority", F.desc("price_cents"))

from iceberg_meta_spark.pipeline.graph import triangle_stats  # noqa: E402

@register(
    "supplier_triangles",
    oracle="""
        WITH raw AS (SELECT DISTINCT least(l_suppkey, (l_partkey % 100) + 1) AS a,
                            greatest(l_suppkey, (l_partkey % 100) + 1) AS b
                     FROM lineitem WHERE l_suppkey <> (l_partkey % 100) + 1),
        alln AS (SELECT a AS node FROM raw UNION ALL SELECT b FROM raw),
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM alln GROUP BY node),
        wd AS (SELECT r.a, r.b, da.d AS da, db.d AS db
               FROM raw r JOIN deg da ON da.node = r.a JOIN deg db ON db.node = r.b),
        o AS (SELECT CASE WHEN da <= db THEN a ELSE b END AS u,
                     CASE WHEN da <= db THEN b ELSE a END AS v FROM wd),
        w AS (SELECT e1.u, e1.v AS v1, e2.v AS v2
              FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.v < e2.v),
        c AS (SELECT u AS v1, v AS v2 FROM o UNION ALL SELECT v, u FROM o),
        agg AS (SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
                       CAST((SELECT count(*) FROM raw) AS BIGINT) AS n_edges,
                       CAST((SELECT sum(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
                       CAST((SELECT count(*) FROM w
                             WHERE EXISTS (SELECT 1 FROM c
                                           WHERE c.v1 = w.v1 AND c.v2 = w.v2))
                            AS BIGINT) AS n_triangles)
        SELECT n_nodes, n_edges, n_wedges, n_triangles,
               CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(n_triangles * 3000 // n_wedges AS BIGINT)
               END AS closure_permille
        FROM agg
    """,
    doc="Exact triangle census + global clustering coefficient of the "
    "supplier co-supply graph (same edge set as supplier_pagerank, "
    "canonicalized undirected), by DEGREE ORIENTATION (Suri & "
    "Vassilvitskii WWW'11): orient every edge low-(degree,id) -> high, "
    "making the wedge self-join O(E^1.5) total — the naive undirected "
    "wedge join explodes as sum(deg^2) and dies on the first celebrity "
    "hub; one LeftSemi against the oriented edges closes each triangle "
    "exactly once (each triangle has exactly one apex pointing at both "
    "others)",
)
def supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dst = (F.col("l_partkey") % 100) + 1
    edges = (
        li.select(
            F.least(F.col("l_suppkey"), dst).alias("a"),
            F.greatest(F.col("l_suppkey"), dst).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return triangle_stats(edges)

@register(
    "lineitem_correlation_matrix",
    oracle="""
        WITH s AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
                          CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
                          CAST(round(l_tax * 100) AS BIGINT) AS tax_c
                   FROM lineitem),
        agg AS (SELECT count(*) AS n,
                       sum(qty) AS s_q, sum(qty * qty) AS ss_q,
                       sum(price_c) AS s_p, sum(price_c * price_c) AS ss_p,
                       sum(disc_c) AS s_d, sum(disc_c * disc_c) AS ss_d,
                       sum(tax_c) AS s_t, sum(tax_c * tax_c) AS ss_t,
                       sum(qty * price_c) AS s_qp, sum(qty * disc_c) AS s_qd,
                       sum(qty * tax_c) AS s_qt, sum(price_c * disc_c) AS s_pd,
                       sum(price_c * tax_c) AS s_pt, sum(disc_c * tax_c) AS s_dt
                FROM s)
        SELECT col_x, col_y, CAST(n AS BIGINT) AS n_rows,
               CASE WHEN (CAST(n AS DOUBLE) * ssx - sx * sx) > 0
                         AND (CAST(n AS DOUBLE) * ssy - sy * sy) > 0
                    THEN round((CAST(n AS DOUBLE) * sxy - sx * sy)
                         / sqrt((CAST(n AS DOUBLE) * ssx - sx * sx)
                                * (CAST(n AS DOUBLE) * ssy - sy * sy)), 6)
               END AS corr
        FROM (
            SELECT 'qty' AS col_x, 'price_c' AS col_y, n,
                   CAST(s_q AS DOUBLE) AS sx, CAST(ss_q AS DOUBLE) AS ssx,
                   CAST(s_p AS DOUBLE) AS sy, CAST(ss_p AS DOUBLE) AS ssy,
                   CAST(s_qp AS DOUBLE) AS sxy FROM agg
            UNION ALL SELECT 'qty', 'disc_c', n, CAST(s_q AS DOUBLE), CAST(ss_q AS DOUBLE),
                   CAST(s_d AS DOUBLE), CAST(ss_d AS DOUBLE), CAST(s_qd AS DOUBLE) FROM agg
            UNION ALL SELECT 'qty', 'tax_c', n, CAST(s_q AS DOUBLE), CAST(ss_q AS DOUBLE),
                   CAST(s_t AS DOUBLE), CAST(ss_t AS DOUBLE), CAST(s_qt AS DOUBLE) FROM agg
            UNION ALL SELECT 'price_c', 'disc_c', n, CAST(s_p AS DOUBLE), CAST(ss_p AS DOUBLE),
                   CAST(s_d AS DOUBLE), CAST(ss_d AS DOUBLE), CAST(s_pd AS DOUBLE) FROM agg
            UNION ALL SELECT 'price_c', 'tax_c', n, CAST(s_p AS DOUBLE), CAST(ss_p AS DOUBLE),
                   CAST(s_t AS DOUBLE), CAST(ss_t AS DOUBLE), CAST(s_pt AS DOUBLE) FROM agg
            UNION ALL SELECT 'disc_c', 'tax_c', n, CAST(s_d AS DOUBLE), CAST(ss_d AS DOUBLE),
                   CAST(s_t AS DOUBLE), CAST(ss_t AS DOUBLE), CAST(s_dt AS DOUBLE) FROM agg
        ) ORDER BY col_x, col_y
    """,
    tags=("bench",),
    doc="Pearson correlation for every pair of lineitem's fixed-point "
    "measures in ONE aggregate pass (operators/stats.py): integer-exact "
    "sufficient statistics (DECIMAL(38,0) sums — a 100 TB table cannot "
    "overflow them), k-squared correlations as scalar arithmetic on the "
    "1-row result. F.corr per pair would scan k(k-1)/2 times and float-"
    "accumulate in partition order; this is one scan and hash-gate "
    "deterministic on any partitioning",
)
def lineitem_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.stats import correlation_matrix

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_c"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_c"),
    )
    return correlation_matrix(li, ["qty", "price_c", "disc_c", "tax_c"]).orderBy(
        "col_x", "col_y"
    )

@register(
    "nation_revenue_trend",
    oracle="""
        WITH m AS (SELECT n.n_name,
                          CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS HUGEINT)
                              AS month_idx,
                          CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS HUGEINT)
                              AS rev_cents
                   FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                                 JOIN nation n ON c.c_nationkey = n.n_nationkey
                   GROUP BY n.n_name, month_idx),
        agg AS (SELECT n_name, CAST(count(*) AS HUGEINT) AS n,
                       sum(month_idx) AS sx, sum(rev_cents) AS sy,
                       sum(month_idx * month_idx) AS sxx,
                       sum(rev_cents * rev_cents) AS syy,
                       sum(month_idx * rev_cents) AS sxy
                FROM m GROUP BY n_name),
        s AS (SELECT n_name, n, sx, sy,
                     n * sxx - sx * sx AS vx,
                     n * syy - sy * sy AS vy,
                     n * sxy - sx * sy AS cov
              FROM agg)
        SELECT n_name, CAST(n AS BIGINT) AS n_points,
               CASE WHEN vx > 0
                    THEN CAST((cov * 1000) // vx AS BIGINT) END AS slope_fp,
               CASE WHEN vx > 0
                    THEN CAST(((sy * vx - cov * sx) * 1000) // (n * vx) AS BIGINT)
               END AS intercept_fp,
               CASE WHEN vx > 0 AND vy > 0
                    THEN round(CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE)
                         / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 6)
               END AS r2
        FROM s ORDER BY n_name
    """,
    tags=("bench",),
    doc="Per-nation revenue trend: grouped closed-form OLS "
    "(operators/stats.py:grouped_ols) over monthly revenue-cents points — "
    "slope/intercept/r² per group from five DECIMAL(38,0) sufficient sums "
    "in ONE aggregate per group, no per-group sort, no window, no model "
    "library; dims broadcast onto the orders scan. slope_fp/intercept_fp "
    "are ×1000 fixed-point LONGs from exact integer division (Spark div "
    "on DECIMAL == DuckDB // on HUGEINT, truncation toward zero) because "
    "a 6-decimal double round is NOT portable past ~1e10 magnitude (fuzz-"
    "caught ULP divergence at 1.19e9); r2 ∈ [0,1] stays a bounded double. "
    "The trend-detection shape that runs unchanged over 10^9 series",
)
def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.stats import grouped_ols

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # nation (25 rows) broadcasts; customer joins hash-partitioned — it is
    # 1:10 with orders, too big to assume broadcastable at deployment scale
    # (AQE upgrades it to broadcast at runtime when it does fit)
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("month_idx"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    return grouped_ols(monthly, ["n_name"], "month_idx", "rev_cents").orderBy("n_name")

_BENFORD_P = {
    1: "0.301029995664",
    2: "0.176091259056",
    3: "0.124938736608",
    4: "0.096910013008",
    5: "0.079181246048",
    6: "0.066946789631",
    7: "0.057991946978",
    8: "0.051152522447",
    9: "0.045757490561",
}

_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items()
) + " END"

@register(
    "orders_benford_audit",
    oracle=f"""
        WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                      AS VARCHAR), 1, 1) AS BIGINT) AS first_digit
                   FROM orders WHERE o_totalprice > 0),
        obs AS (SELECT first_digit, CAST(count(*) AS BIGINT) AS n_obs
                FROM d GROUP BY first_digit),
        tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs)
        SELECT o.first_digit, o.n_obs,
               round(CAST(o.n_obs AS DOUBLE) / t.n, 6) AS obs_share,
               round({_BENFORD_CASE}, 6) AS benford_share,
               round(
                   (CAST(o.n_obs AS DOUBLE) - t.n * CAST(({_BENFORD_CASE}) AS DOUBLE))
                   * (CAST(o.n_obs AS DOUBLE) - t.n * CAST(({_BENFORD_CASE}) AS DOUBLE))
                   / (t.n * CAST(({_BENFORD_CASE}) AS DOUBLE)), 2) AS chi2_term
        FROM obs o CROSS JOIN tot t
        ORDER BY o.first_digit
    """,
    tags=("bench",),
    doc="Benford first-digit audit over order totals (the fraud / "
    "fabricated-data screen): observed leading-digit shares vs the "
    "Benford expectation with per-digit chi-square terms — digits from "
    "integer cents (no float formatting), expectations as literal "
    "constants (no query-time libm), ONE tiny groupBy + a 1-row total "
    "broadcast. Data-quality family: a synthetic-data or unit-mixup "
    "regression in a revenue column shifts these nine rows immediately",
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = orders.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("first_digit")
    )
    obs = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").alias("n"))
    p = F.expr(f"CAST(({_BENFORD_CASE}) AS DOUBLE)")
    exp_n = F.col("n") * p
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "first_digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias("obs_share"),
            F.round(p, 6).alias("benford_share"),
            # d=2: chi2_term is bounded by n (orders rows, ~1e12 at 100 TB);
            # round(x, d) is cross-engine-stable only while |x|*10^d < 2^52,
            # so 6 decimals would overrun at ~1e10 — 2 decimals keeps the
            # budget (1e14) with headroom. obs_share/benford_share ∈ [0,1]
            # stay at 6.
            F.round(
                (F.col("n_obs").cast("double") - exp_n)
                * (F.col("n_obs").cast("double") - exp_n)
                / exp_n,
                2,
            ).alias("chi2_term"),
        )
        .orderBy("first_digit")
    )
