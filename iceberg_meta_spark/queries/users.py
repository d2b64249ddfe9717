"""Per-user value & cohort analytics: retention, WAU, heartbeat gaps,
time-weighted value, reach, deciles/Pareto/EWMA, audience overlap,
SCD2 state, cohort significance tests.

Split from the former monolithic queries/extensions.py (round 7); the
registration order of the full extension family is pinned by
queries/extensions.py::_CANONICAL_ORDER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.parquet import load_table


@register(
    "user_value_deciles_approx",
    oracle=None,  # percentile_approx sketch boundaries are engine-specific;
    # the exact twin user_value_deciles is oracle-gated (tolerance_twin
    # contract) and test_deciles_approx_matches_exact pins the two together.
    tolerance_twin="user_value_deciles",
    doc="Scale twin of user_value_deciles: decile BOUNDARIES from one "
    "percentile_approx aggregate (1 row, broadcast back), bucket assignment "
    "map-side — no global ntile window funneling every user through a "
    "single partition (the 10⁹-user deployment path)",
)
def user_value_deciles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("total_cents")
    )
    bounds = per_user.agg(
        F.percentile_approx(
            "total_cents", [i / 10 for i in range(1, 10)], 10000
        ).alias("bounds")
    )
    # decile = 1 + #boundaries strictly below the user's total: pure map-side
    # arithmetic against the broadcast 9-element boundary array.
    tiled = per_user.crossJoin(F.broadcast(bounds)).withColumn(
        "decile",
        F.lit(1)
        + F.aggregate(
            F.col("bounds"),
            F.lit(0),
            lambda acc, b: acc + F.when(F.col("total_cents") > b, 1).otherwise(0),
        ),
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("total_cents").alias("min_cents"),
        F.max("total_cents").alias("max_cents"),
    )

@register(
    "user_retention_cohorts",
    oracle="""
        WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        first_day AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
        activity AS (SELECT DISTINCT e.user_id, f.cohort_day,
                            e.day - f.cohort_day AS day_offset
                     FROM ev e JOIN first_day f ON f.user_id = e.user_id)
        SELECT cohort_day, day_offset,
               CAST(count(*) AS BIGINT) AS active_users
        FROM activity
        WHERE day_offset <= 7
        GROUP BY cohort_day, day_offset
        ORDER BY cohort_day, day_offset
    """,
    doc="Retention cohorts: cohort = first-active day per user (one per-user "
    "aggregate), activity matrix = distinct (user, day) re-joined to the "
    "cohort and offset-bucketed — the (cohort x day-offset) retention "
    "triangle, week-one window; cohort dimension rides a per-user equi-join, "
    "never an event-level self-join",
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("(ts DIV 1000) DIV 86400000000").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(first_day, "user_id")
        .select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )

@register(
    "weekly_active_users",
    oracle="""
        WITH act AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                     FROM events),
        bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM act),
        contrib AS (SELECT a.user_id, a.day + g AS target_day
                    FROM act a, generate_series(0, 6) t(g)),
        wau AS (SELECT target_day AS day,
                       CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
                FROM contrib GROUP BY target_day)
        SELECT w.day, w.active_7d FROM wau w, bounds b
        WHERE w.day <= b.hi
        ORDER BY w.day
    """,
    doc="Rolling 7-day active users (WAU): distinct (user, day) activity "
    "explodes each day into the 7 target days it contributes to (map-side "
    "x7 row expansion of the ALREADY-distinct per-day frame, not of raw "
    "events), then one distinct-count aggregate per target day — no "
    "range self-join, no window over event rows",
)
def weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    act = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr("(ts DIV 1000) DIV 86400000000").alias("day"))
        .distinct()
    )
    hi = act.agg(F.max("day").alias("hi"))
    contrib = act.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day")
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("active_7d"))
    return (
        wau.join(F.broadcast(hi), wau.day <= F.col("hi"))
        .select("day", "active_7d")
        .orderBy("day")
    )

from iceberg_meta_spark.streaming.gaps import heartbeat_gaps  # noqa: E402

_GAP_US = 86_400_000_000  # 24h of per-user silence

@register(
    "user_heartbeat_gaps",
    tags=("bench",),
    oracle="""
        WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        l AS (SELECT user_id, ts_us,
                lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev
              FROM e)
        SELECT user_id, prev AS gap_start_us, ts_us AS gap_end_us,
               ts_us - prev AS gap_us
        FROM l WHERE ts_us - prev > 86400000000
        ORDER BY user_id, gap_start_us
    """,
    doc="Heartbeat/silence-gap detection (batch twin of "
    "streaming/gaps.silence_stream): spans > 24h between consecutive "
    "events of one user — ONE lag() window partitioned by user, no global "
    "ordering; the complementary alert to the reference's new-snapshot "
    "watch (cli.py:987-1007): the asset that STOPPED emitting",
)
def user_heartbeat_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts DIV 1000").alias("ts_us")
    )
    return heartbeat_gaps(ev, gap_us=_GAP_US).orderBy("user_id", "gap_start_us")

@register(
    "user_value_twa",
    oracle="""
        WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                     CAST(floor(value * 100) AS BIGINT) AS cents
                   FROM events),
        seg AS (SELECT user_id, cents, ts_us,
                  lead(ts_us) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS next_us
                FROM e),
        agg AS (SELECT user_id,
                  CAST(sum((next_us - ts_us) * cents) AS BIGINT) AS area,
                  CAST(max(next_us) - min(ts_us) AS BIGINT) AS span_us,
                  CAST(count(*) AS BIGINT) AS n_segments
                FROM seg WHERE next_us IS NOT NULL GROUP BY user_id)
        SELECT user_id, n_segments, span_us,
               CAST(area // span_us AS BIGINT) AS twa_cents
        FROM agg WHERE span_us > 0 ORDER BY user_id
    """,
    doc="Time-weighted average value per user (TimescaleDB time_weight "
    "shape, LOCF kernel): each observation holds until the next one, so "
    "the average is sum(duration x value) / total span — one lead() "
    "window per user then a per-user aggregate; exact BIGINT "
    "micros x cents arithmetic end to end",
)
def user_value_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts DIV 1000").alias("ts_us"),
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seg = e.select(
        "user_id", "cents", "ts_us", F.lead("ts_us").over(w).alias("next_us")
    ).filter(F.col("next_us").isNotNull())
    agg = seg.groupBy("user_id").agg(
        F.sum(F.expr("(next_us - ts_us) * cents")).alias("area"),
        (F.max("next_us") - F.min("ts_us")).alias("span_us"),
        F.count(F.lit(1)).alias("n_segments"),
    )
    return (
        agg.filter(F.col("span_us") > 0)
        .select(
            "user_id", "n_segments", "span_us", F.expr("area DIV span_us").alias("twa_cents")
        )
        .orderBy("user_id")
    )

@register(
    "salted_user_reach",
    oracle="""
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS reach
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Hot-key distinct count via salting: salt = hash(user_id) % 16 "
    "routes each USER (not row) to a stable salt, so per-(type, salt) "
    "distinct partials are disjoint and their SUM is the exact distinct "
    "count — the hot event type's state spreads over 16 reducers instead "
    "of flooding one. The decomposition a plain countDistinct can't get "
    "when one key dominates; results identical to the unsalted oracle",
)
def salted_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    salted = ev.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("user_id")), F.lit(16)).cast("int")
    )
    partial = salted.groupBy("event_type", "__salt").agg(
        F.countDistinct("user_id").alias("pr")
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum("pr").alias("reach"))
        .orderBy("event_type")
    )

@register(
    "behavior_cohorts",
    oracle="""
        WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY user_id, event_type),
        sig AS (SELECT user_id,
                  coalesce(
                    array_to_string(list_sort(list(event_type) FILTER (n >= 15)), ','),
                    '') AS signature
                FROM c GROUP BY user_id)
        SELECT signature, CAST(count(*) AS BIGINT) AS n_users
        FROM sig GROUP BY signature
        ORDER BY n_users DESC, signature
    """,
    doc="Behavioral cohorts: each user's HABITUAL event types (>= 15 "
    "occurrences) sorted and canonicalized to one signature string, users "
    "counted per signature — the segment-discovery shape; per-(user, type) "
    "counts collapse map-side first, the collected set is bounded by the "
    "type vocabulary (bytes per user), and every aggregate combines "
    "map-side",
)
def behavior_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sig = c.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_set(F.when(F.col("n") >= 15, F.col("event_type")))),
            ",",
        ).alias("signature")
    )
    return (
        sig.groupBy("signature")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "signature")
    )

@register(
    "user_value_pareto",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM events GROUP BY user_id),
        tiled AS (
            SELECT user_id, total_cents,
                   ntile(10) OVER (ORDER BY total_cents, user_id) AS decile
            FROM per_user),
        per_dec AS (
            SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(total_cents) AS BIGINT) AS decile_cents
            FROM tiled GROUP BY decile),
        tot AS (SELECT CAST(sum(decile_cents) AS BIGINT) AS total FROM per_dec),
        cum AS (SELECT decile, n_users, decile_cents,
                  sum(decile_cents) OVER (ORDER BY decile DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_cents
                FROM per_dec)
        SELECT decile, n_users, decile_cents,
               CAST((decile_cents * 1000) // total AS BIGINT) AS share_permille,
               CAST((top_cents * 1000) // total AS BIGINT) AS top_share_permille
        FROM cum, tot ORDER BY decile
    """,
    doc="Revenue concentration (the 80/20 view): per exact-ntile decile, "
    "its permille share of total user value plus the cumulative share held "
    "by this-and-higher deciles. The only window beyond the decile ntile "
    "runs over the 10-row per-decile frame — bounded forever",
)
def user_value_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("total_cents")
    )
    tiled = per_user.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("total_cents", "user_id"))
    )
    per_dec = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("total_cents").alias("decile_cents"),
    )
    tot = per_dec.agg(F.sum("decile_cents").alias("total"))
    w = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_dec.withColumn("top_cents", F.sum("decile_cents").over(w))
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            "decile_cents",
            F.expr("CAST((decile_cents * 1000) DIV total AS BIGINT)").alias("share_permille"),
            F.expr("CAST((top_cents * 1000) DIV total AS BIGINT)").alias("top_share_permille"),
        )
        .orderBy("decile")
    )

@register(
    "audience_overlap",
    oracle="""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        reach AS (SELECT event_type, CAST(count(*) AS BIGINT) AS reach FROM ut GROUP BY 1),
        inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                         CAST(count(*) AS BIGINT) AS both_users
                  FROM ut a JOIN ut b
                    ON a.user_id = b.user_id AND a.event_type < b.event_type
                  GROUP BY 1, 2)
        SELECT i.type_a, i.type_b, ra.reach AS reach_a, rb.reach AS reach_b,
               i.both_users,
               CAST((i.both_users * 1000) // (ra.reach + rb.reach - i.both_users) AS BIGINT)
                 AS jaccard_permille
        FROM inter i
        JOIN reach ra ON ra.event_type = i.type_a
        JOIN reach rb ON rb.event_type = i.type_b
        ORDER BY type_a, type_b
    """,
    doc="Audience-overlap matrix (exact): distinct users per event-type "
    "pair with Jaccard permille. One (user,type) distinct shuffle, then a "
    "user-keyed self-join whose fan-out is bounded by the type vocabulary "
    "(<= |types|^2 rows per user). The HLL twin (audience_overlap_hll) is "
    "the 10^9-user path: KB sketches per type, mergeable, no user-keyed "
    "join at all",
)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    reach = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("reach"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("both_users"))
    )
    ra = reach.select(F.col("event_type").alias("type_a"), F.col("reach").alias("reach_a"))
    rb = reach.select(F.col("event_type").alias("type_b"), F.col("reach").alias("reach_b"))
    return (
        inter.join(F.broadcast(ra), "type_a")
        .join(F.broadcast(rb), "type_b")
        .select(
            "type_a", "type_b", "reach_a", "reach_b", "both_users",
            F.expr(
                "CAST((both_users * 1000) DIV (reach_a + reach_b - both_users) AS BIGINT)"
            ).alias("jaccard_permille"),
        )
        .orderBy("type_a", "type_b")
    )

@register(
    "audience_overlap_hll",
    tolerance_twin="audience_overlap",
    doc="Audience-overlap matrix, sketched: one Datasketches HLL per event "
    "type (hll_sketch_agg - KB of mergeable state, map-side combined), "
    "pairwise hll_union + inclusion-exclusion for the intersection "
    "estimate. ZERO user-keyed joins or shuffles of user rows - the path "
    "that survives 10^9 distinct users. Approximate by construction: "
    "rows-only gate; the exact twin (audience_overlap) carries the hash "
    "oracle and the unit test pins sketch-vs-exact tolerance",
)
def audience_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("long").alias("reach_est"),
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"),
                  F.col("reach_est").alias("reach_a_est"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"),
                  F.col("reach_est").alias("reach_b_est"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("type_a") < F.col("type_b"))
    union_est = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")).cast("long")
    return pairs.select(
        "type_a", "type_b", "reach_a_est", "reach_b_est",
        union_est.alias("union_est"),
        F.greatest(
            F.lit(0).cast("long"),
            (F.col("reach_a_est") + F.col("reach_b_est") - union_est).cast("long"),
        ).alias("both_users_est"),
    ).orderBy("type_a", "type_b")

@register(
    "user_value_ewma",
    oracle="""
        WITH ev AS (SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS cents,
                           epoch_us(ts) AS ts_us, event_id
                    FROM events),
        seqs AS (SELECT user_id,
                        array_agg(cents ORDER BY ts_us, event_id) AS vals
                 FROM ev GROUP BY user_id),
        folded AS (SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
                          list_reduce(vals,
                              (acc, v) -> (acc // 1099511627776
                                           + CASE WHEN v > 2 * (acc % 1099511627776)
                                                  THEN 1 ELSE 0 END) * 1099511627776
                                          + (v + (acc % 1099511627776) * 7) // 8
                          ) AS packed
                   FROM seqs)
        SELECT user_id, n_events,
               CAST(packed % 1099511627776 AS BIGINT) AS final_ewma_cents,
               CAST(packed // 1099511627776 AS BIGINT) AS n_spikes
        FROM folded ORDER BY user_id
    """,
    doc="Per-user EWMA of event value (alpha=1/8, integer arithmetic: "
    "ewma' = (v + 7*ewma) DIV 8) with spike counting (v > 2*ewma before "
    "update) - a RECURSIVE per-key fold carried as a full hash oracle by "
    "packing (spikes, ewma) into one BIGINT accumulator (spikes*2^40 + "
    "ewma; cents < 2^40 always). The per-key collect+sort is the "
    "documented memory cliff (exact-percentile family); the deployment "
    "path is streaming/ewma.py holding O(1) state per key",
)
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    PACK = 1_099_511_627_776  # 2^40
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        F.expr("ts DIV 1000").alias("ts_us"),
        "event_id",
    )
    seqs = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts_us", "event_id", "cents"))),
            lambda x: x["cents"],
        ).alias("vals")
    )
    # seed = first value (ewma := v1, spikes := 0) on BOTH engines:
    # DuckDB's list_reduce seeds with the list head, Spark's aggregate()
    # gets it explicitly; every step is BIGINT DIV/% arithmetic so the
    # recursive fold is bit-identical anywhere
    folded = seqs.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        F.expr(
            f"""aggregate(
                slice(vals, 2, greatest(size(vals) - 1, 0)),
                element_at(vals, 1),
                (acc, v) -> (acc DIV {PACK} + IF(v > 2 * (acc % {PACK}), 1, 0)) * {PACK}
                            + (v + (acc % {PACK}) * 7) DIV 8
            )"""
        ).alias("packed"),
    )
    return folded.select(
        "user_id", "n_events",
        F.expr(f"packed % {PACK}").alias("final_ewma_cents"),
        F.expr(f"packed DIV {PACK}").alias("n_spikes"),
    ).orderBy("user_id")

@register(
    "scd2_user_state",
    oracle="""
        WITH ch AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
                    FROM events WHERE user_id % 50 = 0),
        ordered AS (SELECT *, lag(event_type) OVER (
                        PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
                    FROM ch),
        starts AS (SELECT user_id, event_type AS state, ts_us AS valid_from_us, event_id
                   FROM ordered
                   WHERE prev_type IS NULL OR prev_type <> event_type),
        iv AS (SELECT *, lead(valid_from_us) OVER (
                   PARTITION BY user_id ORDER BY valid_from_us, event_id) AS valid_to_us
               FROM starts)
        SELECT user_id, state, valid_from_us, valid_to_us,
               (valid_to_us IS NULL) AS is_current
        FROM iv ORDER BY user_id, valid_from_us, event_id
    """,
    doc="SCD Type-2 dimension build from a change stream: collapse each "
    "user's event-type runs into validity intervals [valid_from, valid_to) "
    "with an open-ended current row - the full-history companion to "
    "cdc_latest_state's latest-only compaction. Gaps-and-islands via one "
    "lag window, interval close via one lead window, both riding the SAME "
    "hashpartitioning(user_id) exchange - per-key state only, no global "
    "window, the shape that survives 10^9 users. Deterministic 2% user "
    "sample bounds the emitted history",
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ch = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 50 == 0)
        .select(
            "user_id",
            F.expr("ts DIV 1000").alias("ts_us"),
            "event_id",
            "event_type",
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ordered = ch.withColumn("prev_type", F.lag("event_type").over(w))
    starts = ordered.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_us").alias("valid_from_us"),
        "event_id",
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    iv = starts.withColumn("valid_to_us", F.lead("valid_from_us").over(w2))
    return iv.select(
        "user_id",
        "state",
        "valid_from_us",
        "valid_to_us",
        F.col("valid_to_us").isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from_us", "event_id")

@register(
    "cohort_conversion_wilson",
    oracle="""
        WITH ranked AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                               row_number() OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS rn
                        FROM events),
        first_ev AS (SELECT user_id, event_type AS acq_type FROM ranked WHERE rn = 1),
        conv AS (SELECT user_id,
                        CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                             AS BIGINT) AS converted
                 FROM events GROUP BY user_id),
        cohort AS (SELECT f.acq_type,
                          CAST(count(*) AS BIGINT) AS n_users,
                          CAST(sum(c.converted) AS BIGINT) AS n_converted
                   FROM first_ev f JOIN conv c USING (user_id)
                   GROUP BY f.acq_type),
        scored AS (SELECT acq_type, n_users, n_converted,
                          CAST(n_converted AS DOUBLE) / n_users AS p
                   FROM cohort)
        SELECT acq_type, n_users, n_converted,
               round(p, 6) AS rate,
               round((p + 1.9208 / n_users
                      - 1.96 * sqrt(p * (1 - p) / n_users
                                    + 0.9604 / (CAST(n_users AS DOUBLE) * n_users)))
                     / (1 + 3.8416 / n_users), 6) AS wilson_lb
        FROM scored
        ORDER BY wilson_lb DESC, acq_type
    """,
    doc="Conversion ranking by the Wilson score lower bound (z=1.96, "
    "constants as literal text: z²/2=1.9208, z²/4=0.9604, z²=3.8416 — no "
    "runtime pow): cohorts keyed by each user's FIRST event (acquisition "
    "action, (ts, event_id)-deterministic), converted = ever purchased. "
    "Sorting by the LOWER BOUND instead of the raw rate is the standard "
    "fix for small-cohort rate inflation — a 2/2 cohort ranks below a "
    "180/300 one. All inputs exact integers; sqrt is correctly-rounded "
    "IEEE on both engines so the hash gate holds",
)
def cohort_conversion_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    first_ev = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("acq_type"))
    )
    conv = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("converted")
    )
    cohort = (
        first_ev.join(conv, "user_id")
        .groupBy("acq_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
    )
    p = F.col("n_converted").cast("double") / F.col("n_users")
    n = F.col("n_users")
    wilson = (
        p
        + F.lit(1.9208) / n
        - F.lit(1.96)
        * F.sqrt(p * (1 - p) / n + F.lit(0.9604) / (n.cast("double") * n))
    ) / (F.lit(1) + F.lit(3.8416) / n)
    return cohort.select(
        "acq_type",
        "n_users",
        "n_converted",
        F.round(p, 6).alias("rate"),
        F.round(wilson, 6).alias("wilson_lb"),
    ).orderBy(F.desc("wilson_lb"), "acq_type")

@register(
    "cohort_ab_ztest",
    oracle="""
        WITH ranked AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                               row_number() OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS rn
                        FROM events),
        first_ev AS (SELECT user_id, event_type AS acq_type FROM ranked WHERE rn = 1),
        conv AS (SELECT user_id,
                        CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                             AS BIGINT) AS converted
                 FROM events GROUP BY user_id),
        cohort AS (SELECT f.acq_type,
                          CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(c.converted) AS BIGINT) AS k
                   FROM first_ev f JOIN conv c USING (user_id)
                   GROUP BY f.acq_type)
        , pairs AS (
            SELECT a.acq_type AS cohort_a, b.acq_type AS cohort_b,
                   a.n AS n_a, b.n AS n_b, a.k AS k_a, b.k AS k_b,
                   CAST(a.k + b.k AS DOUBLE) / (a.n + b.n) AS pool
            FROM cohort a JOIN cohort b ON a.acq_type < b.acq_type)
        SELECT cohort_a, cohort_b, n_a, n_b,
               round(CAST(k_a AS DOUBLE) / n_a, 6) AS rate_a,
               round(CAST(k_b AS DOUBLE) / n_b, 6) AS rate_b,
               CASE WHEN pool > 0 AND pool < 1
                    THEN round((CAST(k_a AS DOUBLE) / n_a - CAST(k_b AS DOUBLE) / n_b)
                         / sqrt(pool * (1 - pool) * (1.0 / n_a + 1.0 / n_b)), 4)
               END AS z,
               coalesce(CASE WHEN pool > 0 AND pool < 1
                    THEN abs((CAST(k_a AS DOUBLE) / n_a - CAST(k_b AS DOUBLE) / n_b)
                         / sqrt(pool * (1 - pool) * (1.0 / n_a + 1.0 / n_b))) > 1.96
               END, FALSE) AS significant
        FROM pairs
        ORDER BY cohort_a, cohort_b
    """,
    doc="Two-proportion z-test between every cohort pair (pooled standard "
    "error, |z| > 1.96 at the 5% level): did acquisition channel A "
    "genuinely out-convert channel B, or is the gap noise? Completes the "
    "testing family (chi-square independence, Benford, Wilson ranking) — "
    "cohort table is tiny so the pair join is trivially bounded; exact "
    "integer inputs + IEEE sqrt keep the gate",
)
def cohort_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    first_ev = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("acq_type"))
    )
    conv = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("converted")
    )
    cohort = (
        first_ev.join(conv, "user_id")
        .groupBy("acq_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("converted").cast("long").alias("k"))
    )
    a = cohort.select(*[F.col(c).alias(f"{c}_a") for c in cohort.columns])
    b = cohort.select(*[F.col(c).alias(f"{c}_b") for c in cohort.columns])
    pairs = a.join(b, F.col("acq_type_a") < F.col("acq_type_b"))
    pa = F.col("k_a").cast("double") / F.col("n_a")
    pb = F.col("k_b").cast("double") / F.col("n_b")
    pool = (F.col("k_a") + F.col("k_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    raw_z = (pa - pb) / F.sqrt(
        pool * (1 - pool) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    # degenerate pool (everyone or no one converted): zero pooled variance,
    # the test is undefined -> NULL z, not-significant, no ANSI div-by-zero
    defined = (pool > 0) & (pool < 1)
    z = F.when(defined, raw_z)
    return pairs.select(
        F.col("acq_type_a").alias("cohort_a"),
        F.col("acq_type_b").alias("cohort_b"),
        F.col("n_a"),
        F.col("n_b"),
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 4).alias("z"),
        F.coalesce(F.abs(z) > 1.96, F.lit(False)).alias("significant"),
    ).orderBy("cohort_a", "cohort_b")
