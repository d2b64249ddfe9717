"""Scale-preflight diagnostics: data-quality rule checks, shuffle-key skew
profiling, join-cardinality preflight, column profiling.

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

@register(
    "data_quality_checks",
    oracle="""
        SELECT 'referential' AS check_name, 'lineitem_orphan_orderkeys' AS metric,
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS value
        UNION ALL
        SELECT 'referential', 'orders_orphan_custkeys',
               CAST((SELECT count(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        UNION ALL
        SELECT 'uniqueness', 'orders_duplicate_pk',
               CAST((SELECT coalesce(sum(n - 1), 0) FROM (
                     SELECT count(*) AS n FROM orders GROUP BY o_orderkey) g
                     WHERE n > 1) AS BIGINT)
        UNION ALL
        SELECT 'completeness', 'customer_null_names',
               CAST((SELECT count(*) FROM customer WHERE c_name IS NULL) AS BIGINT)
        UNION ALL
        SELECT 'domain', 'lineitem_discount_out_of_range',
               CAST((SELECT count(*) FROM lineitem
                     WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
        UNION ALL
        SELECT 'domain', 'lineitem_nonpositive_quantity',
               CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT)
        ORDER BY check_name, metric
    """,
    doc="Data-quality expectations (Deequ / dbt-test shape): referential "
    "integrity via LeftAnti probes against broadcast key sets, primary-key "
    "uniqueness via a shrinking groupBy, completeness and domain "
    "constraints as map-side conditional counts — one long-format result "
    "a pipeline gate can assert on",
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ords = load_table(spark, sf_dir, "orders")
    cus = load_table(spark, sf_dir, "customer")

    def row(check: str, metric: str, df_count) -> DataFrame:
        return df_count.select(
            F.lit(check).alias("check_name"),
            F.lit(metric).alias("metric"),
            F.col("n").cast("long").alias("value"),
        )

    li_orphans = (
        li.select("l_orderkey")
        .join(ords.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    o_orphans = (
        ords.select("o_custkey")
        .join(cus.select("c_custkey"), ords.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dup_pk = (
        ords.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("n"))
    )
    null_names = cus.agg(
        F.sum(F.when(F.col("c_name").isNull(), 1).otherwise(0)).alias("n")
    )
    disc_range = li.agg(
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)
        ).alias("n")
    )
    bad_qty = li.agg(
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("n")
    )
    out = (
        row("referential", "lineitem_orphan_orderkeys", li_orphans)
        .unionByName(row("referential", "orders_orphan_custkeys", o_orphans))
        .unionByName(row("uniqueness", "orders_duplicate_pk", dup_pk))
        .unionByName(row("completeness", "customer_null_names", null_names))
        .unionByName(row("domain", "lineitem_discount_out_of_range", disc_range))
        .unionByName(row("domain", "lineitem_nonpositive_quantity", bad_qty))
    )
    return out.orderBy("check_name", "metric")

def _skew_profile_sql(table: str, key: str) -> str:
    """DuckDB mirror of one key_skew_profile row (operators/skew.py)."""
    return f"""
        SELECT '{key}' AS key_col,
               CAST((SELECT sum(cnt) FROM c_{key}) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM c_{key}) AS BIGINT) AS n_keys,
               CAST((SELECT max(cnt) FROM c_{key}) AS BIGINT) AS max_cnt,
               (SELECT k FROM c_{key} ORDER BY cnt DESC, k DESC LIMIT 1) AS top_key,
               round((SELECT max(cnt) FROM c_{key})
                     / ((SELECT sum(cnt) FROM c_{key}) / (SELECT count(*) FROM c_{key})), 2)
                   AS max_over_avg,
               round(CAST((SELECT sum(cnt) FROM c_{key}) AS DOUBLE)
                     * (SELECT sum(cnt) FROM c_{key})
                     / (SELECT sum(cnt * cnt) FROM c_{key}), 2) AS eff_keys,
               round((SELECT max(cnt) FROM c_{key})
                     / CAST((SELECT sum(cnt) FROM c_{key}) AS DOUBLE), 6) AS top_share,
               CASE WHEN CAST((SELECT max(cnt) FROM c_{key}) AS DOUBLE)
                         * (SELECT count(*) FROM c_{key})
                         > 8 * (SELECT sum(cnt) FROM c_{key}) THEN 'salt'
                    WHEN (SELECT count(*) FROM c_{key}) < 1000
                         THEN 'pre-aggregate or broadcast'
                    ELSE 'hash-partition as-is' END AS recommendation,
               CAST(CASE WHEN CAST((SELECT max(cnt) FROM c_{key}) AS DOUBLE)
                              * (SELECT count(*) FROM c_{key})
                              > 8 * (SELECT sum(cnt) FROM c_{key})
                         THEN least(64, CAST(ceil(CAST((SELECT max(cnt) FROM c_{key}) AS DOUBLE)
                              * (SELECT count(*) FROM c_{key})
                              / (SELECT sum(cnt) FROM c_{key})) AS BIGINT))
                         ELSE 0 END AS BIGINT) AS salt_n
    """

@register(
    "shuffle_key_skew_profile",
    oracle=f"""
        WITH c_user_id AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS cnt
                           FROM events GROUP BY 1),
             c_event_type AS (SELECT CAST(event_type AS VARCHAR) AS k, count(*) AS cnt
                              FROM events GROUP BY 1),
             c_l_suppkey AS (SELECT CAST(l_suppkey AS VARCHAR) AS k, count(*) AS cnt
                             FROM lineitem GROUP BY 1)
        SELECT * FROM ({_skew_profile_sql('events', 'user_id')})
        UNION ALL SELECT * FROM ({_skew_profile_sql('events', 'event_type')})
        UNION ALL SELECT * FROM ({_skew_profile_sql('lineitem', 'l_suppkey')})
        ORDER BY key_col
    """,
    tags=("bench",),
    doc="Pre-flight shuffle-key skew diagnosis (operators/skew.py:"
    "key_skew_profile): for each candidate join/groupBy key, ONE summary "
    "row — hottest-key-over-uniform-share ratio (AQE's skew signal), "
    "inverse-Herfindahl effective key count, the heavy key itself, and a "
    "salt/broadcast/as-is recommendation with the salt count sized from "
    "the measured ratio. Decide the partitioning strategy from two "
    "shrinking aggregates BEFORE shuffling 100 TB on the wrong key; no "
    "sort, no window, no collect",
)
def shuffle_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.skew import key_skew_profile

    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    prof = (
        key_skew_profile(ev, "user_id")
        .unionByName(key_skew_profile(ev, "event_type"))
        .unionByName(key_skew_profile(li, "l_suppkey"))
    )
    return prof.orderBy("key_col")

def _join_preflight_sql(key_col: str, left_sql: str, right_sql: str, cap: int) -> str:
    """DuckDB mirror of one join_cardinality_preflight row."""
    return f"""
        WITH la AS (SELECT k, count(*) AS ca FROM ({left_sql}) GROUP BY k),
             rb AS (SELECT k, count(*) AS cb FROM ({right_sql}) GROUP BY k),
             pk AS (SELECT la.k, ca * cb AS out_k FROM la JOIN rb USING (k)),
             ag AS (SELECT CAST(count(*) AS BIGINT) AS matched_keys,
                           CAST(coalesce(sum(out_k), 0) AS BIGINT) AS out_rows,
                           CAST(coalesce(max(out_k), 0) AS BIGINT) AS max_key_out
                    FROM pk),
             lt AS (SELECT CAST(count(*) AS BIGINT) AS left_rows FROM ({left_sql})),
             rt AS (SELECT CAST(count(*) AS BIGINT) AS right_rows FROM ({right_sql}))
        SELECT '{key_col}' AS key_col, left_rows, right_rows, matched_keys,
               out_rows, max_key_out,
               (SELECT k FROM pk ORDER BY out_k DESC, k DESC LIMIT 1) AS top_key,
               CASE WHEN greatest(left_rows, right_rows) > 0
                    THEN round(out_rows / CAST(greatest(left_rows, right_rows) AS DOUBLE), 2)
                    ELSE 0.0 END AS amplification,
               CASE WHEN least(left_rows, right_rows) <= {cap}
                         THEN 'broadcast smaller side'
                    WHEN matched_keys > 0
                         AND CAST(max_key_out AS DOUBLE) * matched_keys > 8 * out_rows
                         THEN 'salted sort-merge'
                    ELSE 'sort-merge as-is' END AS recommendation
        FROM ag, lt, rt
    """

@register(
    "join_cardinality_preflight",
    oracle=f"""
        SELECT * FROM ({_join_preflight_sql(
            'o_orderkey',
            "SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders",
            "SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem",
            1000)})
        UNION ALL
        SELECT * FROM ({_join_preflight_sql(
            'l_partkey',
            "SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem",
            "SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem",
            1000)})
        ORDER BY key_col
    """,
    tags=("bench",),
    doc="Exact join-output cardinality WITHOUT running the join "
    "(operators/skew.py:join_cardinality_preflight): |A JOIN B| = "
    "SUM(cntA*cntB) over the two per-key COUNT tables — O(distinct keys) "
    "through the shuffle instead of O(output). Emits the hottest output "
    "key (the reducer a skewed join would flood), the amplification vs "
    "the larger input, and a broadcast/salted/as-is strategy pick. Rows: "
    "orders-lineitem 1:N and the lineitem self-join on l_partkey "
    "(a fan-out join whose output is ~30x its input — the case where "
    "knowing out_rows BEFORE launching matters)",
)
def join_cardinality_preflight_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.skew import join_cardinality_preflight

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "join_key"
    )
    li_ok = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "join_key"
    )
    li = load_table(spark, sf_dir, "lineitem")
    a = join_cardinality_preflight(
        orders, li_ok, "join_key", broadcast_row_cap=1000
    ).withColumn("key_col", F.lit("o_orderkey"))
    b = join_cardinality_preflight(li, li, "l_partkey", broadcast_row_cap=1000)
    return a.unionByName(b).orderBy("key_col")

def _col_profile_sql(col: str, num_expr: str | None, len_expr: str | None) -> str:
    """DuckDB mirror of one column_profile row over `events`."""
    num_min = f"CAST(min({num_expr}) AS DOUBLE)" if num_expr else "CAST(NULL AS DOUBLE)"
    num_max = f"CAST(max({num_expr}) AS DOUBLE)" if num_expr else "CAST(NULL AS DOUBLE)"
    avg_len = (
        f"round(CAST(sum({len_expr}) AS DOUBLE) / (count(*) - sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)), 4)"
        if len_expr
        else "CAST(NULL AS DOUBLE)"
    )
    return f"""
        SELECT '{col}' AS "column",
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CASE WHEN count(*) = 0 THEN 0.0
                    ELSE round(CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                               / count(*), 6) END AS null_share,
               CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
               {num_min} AS min_num,
               {num_max} AS max_num,
               {avg_len} AS avg_len
        FROM events
    """

@register(
    "events_column_profile",
    oracle=f"""
        SELECT * FROM ({_col_profile_sql('event_id', 'event_id', None)})
        UNION ALL SELECT * FROM ({_col_profile_sql('ts', 'epoch_ns(ts)', None)})
        UNION ALL SELECT * FROM ({_col_profile_sql('user_id', 'user_id', None)})
        UNION ALL SELECT * FROM ({_col_profile_sql('event_type', None, 'length(event_type)')})
        UNION ALL SELECT * FROM ({_col_profile_sql('value', 'value', None)})
        UNION ALL SELECT * FROM ({_col_profile_sql('props', None, 'length(props)')})
        ORDER BY "column"
    """,
    tags=("bench",),
    doc="ANALYZE-style one-pass column profiler (operators/profile.py): "
    "every column's null share, EXACT distinct count, numeric/timestamp "
    "range, and mean string length from a single aggregate over the table "
    "— the long format comes from exploding an array-of-structs on the "
    "1-row result, so the table is scanned once, not once per column. "
    "Exact multi-column distinct plans via EXPAND (the standard ANALYZE "
    "cost); approx=True swaps HLL++ for the petabyte deployment path",
)
def events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_meta_spark.operators.profile import column_profile

    ev = load_table(spark, sf_dir, "events")
    return column_profile(ev).orderBy("column")
