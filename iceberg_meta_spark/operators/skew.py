"""Skew-mitigation utilities: salted joins and salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew at
runtime; salting is the plan-level tool for the cases AQE can't fix — a
broadcast-ineligible join where one key holds a disproportionate share of
rows (the partition-skew situation A4 *detects*, this module *mitigates*),
or a groupBy whose hot key floods one reducer.

Pattern (public knowledge, e.g. the Spark docs' skew guidance): explode the
small side into N salt replicas, salt the big side randomly-but-
deterministically, join on (key, salt) — the hot key's rows spread over N
reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(col: Column, n: int) -> Column:
    """Deterministic salt in [0, n): hash-mod, stable across retries
    (rand() would break task-retry idempotence)."""
    return F.pmod(F.xxhash64(col), F.lit(n)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Join ``big`` with ``small`` on ``key``, spreading each key over
    ``n_salts`` partitions.

    The big side gets a per-row salt (hashed from ``salt_by`` or a stable
    row discriminator); the small side is exploded ×n_salts so every
    (key, salt) bucket can match. Shuffle cost: small side replicated
    n_salts times — only worth it when the key histogram is heavy-tailed.
    """
    discriminator = F.col(salt_by) if salt_by else F.monotonically_increasing_id().cast("string")
    b = big.withColumn("__salt", _salt_of(discriminator, n_salts))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0).cast("int"), F.lit(n_salts - 1).cast("int")))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-stage aggregation for hot-key counts: partial count per
    (key, salt) — spreads the hot key over n_salts reducers — then final
    re-aggregate per key (tiny: n_salts rows per key).

    Spark's partial aggregation usually makes this unnecessary; it matters
    when the payload per group is large (collect_list/distinct) or partial
    aggregation is defeated.
    """
    salted = df.withColumn(
        "__salt", _salt_of(F.monotonically_increasing_id().cast("string"), n_salts)
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias("n"))


def key_skew_profile(df: DataFrame, key: str, salt_cap: int = 64) -> DataFrame:
    """Pre-flight shuffle-key diagnosis: ONE summary row quantifying how
    skewed ``key``'s row distribution is, with a partitioning
    recommendation.

    The decision A4's partition-skew detector makes for Iceberg partitions,
    generalized to any join/groupBy key: before shuffling 100 TB on ``key``,
    measure whether one key would funnel a disproportionate share of rows
    through a single reducer, and if so how many salts spread it flat.

    Metrics (all from one groupBy(key).count() + one single-row aggregate —
    two shrinking shuffles, no sort, no window):

    - ``max_over_avg`` — max key count over the uniform share ``n/k``; the
      direct "hottest reducer vs ideal" ratio AQE's skew threshold uses.
    - ``eff_keys`` — inverse Herfindahl ``n² / Σcnt²``: the number of
      equal-size keys that would produce the same concentration (rational
      arithmetic, no log/entropy — reproducible across engines).
    - ``top_key`` / ``top_share`` — the single heaviest key (ties broken by
      key value, deterministically).
    - ``recommendation`` / ``salt_n`` — 'salt' with ``ceil(max_over_avg)``
      salts (capped) when the hot key exceeds 8× the uniform share;
      'pre-aggregate or broadcast' when the key space itself is tiny
      (< 1000 keys — every reducer count is a hot spot at scale); else
      'hash-partition as-is'.
    """
    cnts = df.groupBy(F.col(key).cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return cnts.agg(
        F.lit(key).alias("key_col"),
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.max(F.struct(F.col("cnt"), F.col("k"))).getField("k").alias("top_key"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"),
    ).select(
        "key_col",
        "n_rows",
        "n_keys",
        "max_cnt",
        "top_key",
        # d=2, not 4: max_over_avg is bounded by n_keys (max_cnt <= n_rows),
        # up to ~1e12 distinct keys at 100 TB — round(x, d) is only
        # cross-engine-stable while |x|*10^d < 2^52 (past that Spark's
        # BigDecimal HALF_UP and DuckDB's multiply-round-divide can differ
        # on the same double), so 1e12 * 1e2 = 1e14 keeps ~45x headroom
        F.round(F.col("max_cnt") / (F.col("n_rows") / F.col("n_keys")), 2).alias("max_over_avg"),
        # n_rows is a single already-reduced value: cast before squaring so
        # the product can't overflow long at petabyte row counts. sum_sq
        # stays integer-exact (the per-key counts this profiles fit long
        # squared comfortably below ~3e9 rows per key).
        F.round(F.col("n_rows").cast("double") * F.col("n_rows") / F.col("sum_sq"), 2).alias("eff_keys"),
        F.round(F.col("max_cnt") / F.col("n_rows"), 6).alias("top_share"),
        # the 8x trigger compares in DOUBLE: max_cnt * n_keys as BIGINT
        # overflows 2^63 at petabyte scale (1e10-row hot key across 1e9
        # keys) and would flip the recommendation; the comparison needs no
        # integer exactness, and the oracle casts the same operand
        F.when(
            F.col("max_cnt").cast("double") * F.col("n_keys") > 8 * F.col("n_rows"),
            F.lit("salt"),
        )
        .when(F.col("n_keys") < 1000, F.lit("pre-aggregate or broadcast"))
        .otherwise(F.lit("hash-partition as-is"))
        .alias("recommendation"),
        F.when(
            F.col("max_cnt").cast("double") * F.col("n_keys") > 8 * F.col("n_rows"),
            F.least(
                F.lit(salt_cap).cast("long"),
                F.ceil(F.col("max_cnt").cast("double") * F.col("n_keys") / F.col("n_rows")),
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("salt_n"),
    )


def join_cardinality_preflight(
    left: DataFrame, right: DataFrame, key: str, broadcast_row_cap: int = 10_000_000
) -> DataFrame:
    """Exact inner-join output size WITHOUT running the join, plus the
    strategy that output shape calls for.

    |A ⋈ B| on ``key`` is exactly ``Σ_k cntA(k)·cntB(k)`` — computable by
    joining the two per-key COUNT tables (O(distinct keys) rows through the
    shuffle, versus O(output) for the join itself; at 100 TB that is the
    difference between a second and an hour). The same pass yields the
    hottest output key (the reducer that would receive the most joined
    rows), the amplification factor vs the larger input, and a
    broadcast/salt/sort-merge recommendation:

    - ``broadcast`` when one side's ROW COUNT fits the broadcast cap (row
      proxy for autoBroadcastJoinThreshold — exact bytes are the planner's
      call);
    - ``salted sort-merge`` when the hottest key alone would produce > 8×
      the uniform per-key output share (the join-side analog of
      :func:`key_skew_profile`'s trigger — AQE splits such partitions at
      runtime, salting fixes them at plan time);
    - ``sort-merge as-is`` otherwise.

    One row out: (key_col, left_rows, right_rows, matched_keys, out_rows,
    max_key_out, top_key, amplification, recommendation).
    """
    la = left.groupBy(F.col(key).cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    if right is left:
        # self-join census (r13): every NON-NULL key trivially matches
        # itself, so the per-key frame is a pure projection of the ONE
        # count table — no join at all (the r12 shape full-outer-joined
        # the table with its own aliased copy, an exchange + join stage
        # for an identity). NULL keys never match (NULL != NULL in join
        # equality — the full-outer form leaves them unmatched too), so
        # they stay in the totals but out of out_k/matched stats.
        per_key = la.select(
            "k",
            "ca",
            F.col("ca").alias("cb"),
            F.when(F.col("k").isNotNull(), F.col("ca") * F.col("ca")).alias("out_k"),
        )
    else:
        rb = right.groupBy(F.col(key).cast("string").alias("k")).agg(
            F.count(F.lit(1)).alias("cb")
        )
        # ONE full-outer join + ONE aggregate carries everything: the input
        # totals are just sum(ca)/sum(cb) over the (full) per-key count
        # tables — unmatched and NULL keys survive a full outer join, so the
        # totals equal plain count(*) of each input — and the matched-key
        # stats read the both-sides-present rows. This replaces the previous
        # shape (two extra whole-input count aggregates + two 1-row
        # broadcast cross joins = four more jobs per preflight) with zero
        # result change (r12).
        per_key = la.join(rb, "k", "full_outer").select(
            "k", "ca", "cb",
            F.when(
                F.col("ca").isNotNull() & F.col("cb").isNotNull(),
                F.col("ca") * F.col("cb"),
            ).alias("out_k"),
        )
    prof = per_key.agg(
        F.lit(key).alias("key_col"),
        F.coalesce(F.sum("ca"), F.lit(0)).alias("left_rows"),
        F.coalesce(F.sum("cb"), F.lit(0)).alias("right_rows"),
        F.count("out_k").alias("matched_keys"),
        F.coalesce(F.sum("out_k"), F.lit(0)).alias("out_rows"),
        F.coalesce(F.max("out_k"), F.lit(0)).alias("max_key_out"),
        F.max(
            F.when(
                F.col("out_k").isNotNull(), F.struct(F.col("out_k"), F.col("k"))
            )
        ).getField("k").alias("top_key"),
    )
    return prof.select(
        "key_col",
        "left_rows",
        "right_rows",
        "matched_keys",
        "out_rows",
        "max_key_out",
        "top_key",
        # greatest() is 0 only when BOTH inputs are empty: emit 0.0 rather
        # than tripping ANSI divide-by-zero on the empty-partition day
        F.when(
            F.greatest(F.col("left_rows"), F.col("right_rows")) > 0,
            # d=2: amplification <= min(left_rows, right_rows) (~1e12 at
            # 100 TB); |x|*10^d must stay under 2^52 for cross-engine
            # round stability, so 2 digits, not 4
            F.round(
                F.col("out_rows") / F.greatest(F.col("left_rows"), F.col("right_rows")),
                2,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("amplification"),
        F.when(
            F.least(F.col("left_rows"), F.col("right_rows")) <= broadcast_row_cap,
            F.lit("broadcast smaller side"),
        )
        .when(
            # DOUBLE trigger: max_key_out * matched_keys as BIGINT can
            # exceed 2^63 on petabyte joins (same class as the
            # key_skew_profile trigger; the oracle casts identically)
            (F.col("matched_keys") > 0)
            & (F.col("max_key_out").cast("double") * F.col("matched_keys")
               > 8 * F.col("out_rows")),
            F.lit("salted sort-merge"),
        )
        .otherwise(F.lit("sort-merge as-is"))
        .alias("recommendation"),
    )
