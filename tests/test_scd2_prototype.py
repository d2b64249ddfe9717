"""Round-4 operators: SCD2 history build and prototype-distance pruning."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from iceberg_meta_spark.queries.ann import prototype_pruning
from iceberg_meta_spark.queries.users import scd2_user_state
from iceberg_meta_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_scd2_intervals_tile_each_user(spark):
    """Intervals must tile the user's history: exactly one open (current)
    row per user, each valid_to equals the next interval's valid_from, and
    consecutive intervals never carry the same state (runs are collapsed)."""
    rows = scd2_user_state(spark, SF).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from_us"])
        opens = [r for r in ivs if r["valid_to_us"] is None]
        assert len(opens) == 1 and ivs[-1]["is_current"]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
            assert a["state"] != b["state"]
            assert not a["is_current"]


def test_scd2_first_interval_starts_at_first_event(spark):
    ev = (
        load_table(spark, SF, "events")
        .where(F.col("user_id") % 50 == 0)
        .groupBy("user_id")
        .agg(F.min(F.expr("ts DIV 1000")).alias("first_us"))
    )
    first = {r["user_id"]: r["first_us"] for r in ev.collect()}
    got = scd2_user_state(spark, SF)
    starts = {
        r["user_id"]: r["valid_from_us"]
        for r in got.groupBy("user_id")
        .agg(F.min("valid_from_us").alias("valid_from_us"))
        .collect()
    }
    assert starts == first


def test_scd2_windows_share_one_user_exchange(spark):
    p = plan(scd2_user_state(spark, SF))
    n = sum(
        1 for line in p.splitlines() if "Exchange hashpartitioning(user_id" in line
    )
    assert n <= 1, p


def test_prototype_pruning_invariants(spark):
    """Per cell: prototype has the max cos (>= min), hardest the min,
    n_keep = ceil(n/2), and member counts sum to the corpus size."""
    rows = prototype_pruning(spark, SF).collect()
    assert rows
    total = sum(r["n_vectors"] for r in rows)
    n_emb = load_table(spark, SF, "embeddings").count()
    assert total == n_emb
    for r in rows:
        assert r["n_keep"] == (r["n_vectors"] + 1) // 2
        assert r["min_cos"] <= r["max_cos"]
        if r["n_vectors"] == 1:
            assert r["prototype_id"] == r["hardest_id"]


def test_prototype_centroid_join_is_broadcast(spark):
    p = plan(prototype_pruning(spark, SF))
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    # both ranking windows ride one hashpartitioning(cell) exchange
    n = sum(1 for line in p.splitlines() if "Exchange hashpartitioning(cell" in line)
    assert n <= 1, p


def test_k_anonymity_monotone_in_k(spark):
    """Raising k can only widen the violating set; rows_at_risk is bounded
    by the table size; permille consistent with the row counts."""
    from iceberg_meta_spark.queries.privacy import k_anonymity_audit

    rows = sorted(k_anonymity_audit(spark, SF).collect(), key=lambda r: r["k"])
    n_rows = load_table(spark, SF, "customer").count()
    assert [r["k"] for r in rows] == [2, 3, 5, 10]
    for a, b in zip(rows, rows[1:]):
        assert a["n_violating_classes"] <= b["n_violating_classes"]
        assert a["n_rows_at_risk"] <= b["n_rows_at_risk"]
    for r in rows:
        assert 0 <= r["n_rows_at_risk"] <= n_rows
        assert r["risk_permille"] == r["n_rows_at_risk"] * 1000 // n_rows


def test_privacy_report_matches_standalone_audits(spark):
    """The composite long-format gate must agree row-for-row with the two
    standalone audits (same QI derivation, same thresholds), and its plan
    must stay broadcast-only: the class tables are QI-domain-bounded, so
    no sweep may introduce a shuffled join or cartesian product."""
    from iceberg_meta_spark.queries.privacy import (
        k_anonymity_audit,
        l_diversity_audit,
        privacy_report,
    )

    got = {
        (r["audit"], r["thr"]): (
            r["n_violating_classes"],
            r["n_rows_at_risk"],
            r["risk_permille"],
        )
        for r in privacy_report(spark, SF).collect()
    }
    assert len(got) == 7
    for r in k_anonymity_audit(spark, SF).collect():
        assert got[("k_anonymity", r["k"])] == (
            r["n_violating_classes"],
            r["n_rows_at_risk"],
            r["risk_permille"],
        )
    for r in l_diversity_audit(spark, SF).collect():
        assert got[("l_diversity", r["l"])] == (
            r["n_violating_classes"],
            r["n_rows_at_risk"],
            r["risk_permille"],
        )
    p = plan(privacy_report(spark, SF))
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p
