"""Round-4 operators: record linkage, distributed skyline, Matryoshka audit.

Each new operator gets (a) a brute-force semantic check against an
independent Spark formulation, and (b) a plan-shape assertion that the
scale-critical property (no quadratic product, partitioned windows) held.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline.similarity import truncated_recall
from iceberg_meta_spark.queries.ann import matryoshka_recall
from iceberg_meta_spark.queries.relational import customer_fuzzy_matches, order_skyline
from iceberg_meta_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# customer_fuzzy_matches — deletion-neighborhood blocking
# ---------------------------------------------------------------------------


def test_fuzzy_matches_recall_complete(spark):
    """The deletion-neighborhood candidate join must find EVERY pair within
    edit distance 1 — compare against the direct quadratic product."""
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_nationkey", "c_name")
    a = cust.alias("a")
    b = cust.alias("b")
    brute = (
        a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey"))
        .where(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
        .groupBy(F.col("a.c_nationkey").alias("c_nationkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched_pairs"))
    )
    expected = {r["c_nationkey"]: r["n_matched_pairs"] for r in brute.collect()}
    got = {
        r["c_nationkey"]: r["n_matched_pairs"]
        for r in customer_fuzzy_matches(spark, SF).collect()
    }
    assert got == expected
    assert sum(got.values()) > 0  # TPC-H names do contain distance-1 pairs


def test_fuzzy_matches_no_quadratic_product(spark):
    p = plan(customer_fuzzy_matches(spark, SF))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


# ---------------------------------------------------------------------------
# order_skyline — two-phase distributed Pareto frontier
# ---------------------------------------------------------------------------


def _dominates(p, q) -> bool:
    """p dominates q: >= on both (price, ts), > on at least one."""
    return (
        p[0] >= q[0]
        and p[1] >= q[1]
        and (p[0] > q[0] or p[1] > q[1])
    )


def test_skyline_exact_vs_brute_force(spark):
    pts = (
        load_table(spark, SF, "orders")
        .groupBy(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
            F.col("o_orderdate").alias("ts"),
        )
        .agg(F.min("o_orderkey").cast("long").alias("o_orderkey"))
        .collect()
    )
    by_prio: dict[str, list] = {}
    for r in pts:
        by_prio.setdefault(r["o_orderpriority"], []).append(
            (r["price_cents"], r["ts"], r["o_orderkey"])
        )
    expected = set()
    for prio, rows in by_prio.items():
        for q in rows:
            if not any(_dominates(p, q) for p in rows):
                expected.add((prio, q[0], q[1], q[2]))
    got = {
        (r["o_orderpriority"], r["price_cents"], r["o_orderdate"], r["o_orderkey"])
        for r in order_skyline(spark, SF).collect()
    }
    assert got == expected
    assert len(got) > 0
    # the frontier must be strictly decreasing in ts as price falls, per prio
    for prio in by_prio:
        front = sorted((p, t) for pr, p, t, _ in got if pr == prio)
        assert all(front[i][1] > front[i + 1][1] for i in range(len(front) - 1))


def test_skyline_windows_are_partitioned(spark):
    # both passes must partition their window (local adds the salt key) —
    # a global unpartitioned window would funnel every order through one task
    import re

    from tools.plan_lint import _has_global_window

    p = plan(order_skyline(spark, SF))
    assert "CartesianProduct" not in p, p
    # structural check: no SinglePartition exchange may feed a Window
    assert not _has_global_window(p), p
    # every Window node's Arguments line is [exprs], [partitionSpec],
    # [orderSpec] — an empty partition spec prints as ", [], [" exactly
    win_blocks = [
        b for b in re.split(r"\n(?=\(\d+\) )", p) if re.match(r"\(\d+\) Window", b)
    ]
    assert len(win_blocks) >= 2, p
    for b in win_blocks:
        arg = next(ln for ln in b.splitlines() if ln.startswith("Arguments:"))
        assert ", [], [" not in arg, f"unpartitioned window: {arg}"
    # the salt column appears in the first pass's partition spec
    assert any("salt" in b for b in win_blocks), p


# ---------------------------------------------------------------------------
# matryoshka_recall — truncated-prefix agreement audit
# ---------------------------------------------------------------------------


def test_matryoshka_full_prefix_is_perfect(spark):
    """Truncating to ALL 64 dims must agree with itself: recall@1 == 1.0
    for every label (degenerate-case sanity of the agreement machinery)."""
    emb = load_table(spark, SF, "embeddings")
    rows = truncated_recall(emb, sample_mod=10, trunc_dims=64).collect()
    assert rows
    for r in rows:
        assert r["n_top1_agree"] == r["n_queries"]
        assert r["recall_at_1"] == 1.0


def test_matryoshka_truncation_degrades_or_holds(spark):
    """Prefix recall is a fraction in [0, 1] and the 16-dim prefix finds at
    least one agreeing top-1 somewhere (sanity against all-zero output)."""
    rows = matryoshka_recall(spark, SF).collect()
    assert rows
    assert all(0.0 <= r["recall_at_1"] <= 1.0 for r in rows)
    assert sum(r["n_top1_agree"] for r in rows) > 0


def test_matryoshka_single_broadcast_one_shuffle(spark):
    p = plan(matryoshka_recall(spark, SF))
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p
    # both rank windows share one hashpartitioning(query_id) exchange
    n_query_exchanges = sum(
        1
        for line in p.splitlines()
        if "Exchange hashpartitioning(query_id" in line
    )
    assert n_query_exchanges <= 1, p
