"""Physical-plan shape tests: the 100 TB posture, asserted.

Correctness tests prove the kernels compute the right rows; these prove
Catalyst compiled the plan we designed for scale — filters reach the scan,
small dimensions broadcast, candidate generation never degenerates into a
cartesian product, and per-row windows stay partitioned. A regression here
is invisible at sf0.01 and fatal at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from iceberg_meta_spark import operators as ops
from iceberg_meta_spark.pipeline import dedup, similarity
from iceberg_meta_spark.registry import load_all
from iceberg_meta_spark.sources.fixtures import derive

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _scale_plan_shapes():
    """These tests pin the AT-SCALE plan. The r13 tiny-input scan floor
    (sources/parquet.py::_parallelize_scan) inserts a round-robin exchange
    for sub-megabyte local tables only and no-ops above its byte bound —
    i.e. at any data scale — so it is disabled here: a local-only exchange
    must not fail a 100-TB shape contract, and the contracts must keep
    guarding the plan that actually runs at scale."""
    import iceberg_meta_spark.sources.parquet as pq

    old = pq._SCAN_FLOOR_BYTES
    pq._SCAN_FLOOR_BYTES = 0
    pq._SCAN_PARTS.clear()
    yield
    pq._SCAN_FLOOR_BYTES = old
    pq._SCAN_PARTS.clear()


def plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_scan_column_pruning(spark):
    # A1 needs only file_size_in_bytes from lineitem-derived meta_files.
    # r13: file_size_stats projects to that column BEFORE its one-evaluation
    # checkpoint, so the composed plan shows a single-column RDD scan (the
    # checkpoint hides the parquet node) — assert the materialization is
    # narrow, then assert pruning reaches the parquet scan in the plan the
    # checkpoint was built from (the same projected derivation).
    p = plan(ops.file_size_stats(derive(spark, SF, "meta_files")))
    rdd_scans = [l for l in p.splitlines() if "Scan ExistingRDD" in l]
    assert rdd_scans, p
    inner = plan(derive(spark, SF, "meta_files").select("file_size_in_bytes"))
    read_schema = next(line for line in inner.splitlines() if "ReadSchema" in line)
    assert "l_extendedprice" in read_schema  # the one column A1 consumes
    for unused in ("l_comment", "l_shipdate", "l_partkey"):
        assert unused not in read_schema, read_schema


def test_filter_pushdown_reaches_scan(spark):
    p = plan(derive(spark, SF, "meta_files").filter(F.col("record_count") <= 40))
    pushed = [line for line in p.splitlines() if "PushedFilters" in line]
    # record_count derives from floor(l_quantity) — the derivation is a
    # projection, so the filter can't push below it; the base-column prune
    # must still reach the scan.
    assert pushed, p


def test_partition_skew_has_no_window(spark):
    # A4 global average = 1-row aggregate broadcast back, NOT a global
    # window (which funnels all rows through one partition at scale).
    p = plan(ops.partition_skew(derive(spark, SF, "meta_files")))
    assert "Window" not in p, p
    assert "Broadcast" in p, p


def test_column_health_broadcasts_schema_dim(spark):
    stats = derive(spark, SF, "meta_column_stats")
    fields = derive(spark, SF, "meta_schema_fields").filter(F.col("schema_id") == 2)
    p = plan(ops.column_health_named(stats, fields))
    assert "BroadcastHashJoin" in p, p


def test_snapshot_diff_is_single_full_outer_join(spark):
    mf = derive(spark, SF, "meta_files")
    p = plan(ops.snapshot_diff(mf.filter("snapshot_id = 1"), mf.filter("snapshot_id = 2")))
    # both diff directions from ONE hash join: each side scanned/shuffled
    # once, not twice as in the two-anti-join formulation
    assert "FullOuter" in p, p
    assert "LeftAnti" not in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_minhash_lsh_no_cartesian(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(dedup.minhash_lsh_pairs(docs))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_ngram_jaccard_no_cartesian(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(dedup.ngram_jaccard_pairs(docs))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    # candidate generation must be the MinHash band join (LSH-then-verify),
    # not a corpus-wide shingle self-join: band keys appear as join columns,
    # and the old (lang, source) block keys appear nowhere in the plan
    assert "band_idx" in p and "band_key" in p, p
    assert "lang" not in p and "source#" not in p, p


def test_lsh_bucketed_ann_is_equi_join(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan(similarity.lsh_bucketed_topk(emb, query_ids=[3, 11]))
    # bucket equality must compile to a hash join (broadcast of the tiny
    # query side), not a nested-loop over all candidates
    assert "BroadcastHashJoin" in p, p


def test_overlap_sweepline_window_is_partitioned(spark):
    p = plan(ops.overlap_sweepline(derive(spark, SF, "file_ranges")))
    # the per-file running max must be partitioned by bucket; the only
    # unpartitioned window runs over the tiny per-bucket aggregate
    win_lines = [line for line in p.splitlines() if "windowspecdefinition" in line.lower()]
    assert any("bucket" in line for line in win_lines), p


def test_aggregates_are_partial_final(spark):
    # partial (map-side) aggregation must precede the shuffle for A3
    p = plan(ops.partition_distribution(derive(spark, SF, "meta_files")), "simple")
    assert p.count("HashAggregate") >= 2, p


def test_whole_stage_codegen_covers_kernels(spark):
    # A3 (groupBy sum/count) must fall inside whole-stage codegen spans.
    # (A1 itself compiles to ObjectHashAggregate because exact median keeps
    # a sort buffer — that's the one aggregate outside codegen, by design.)
    # AQE reports 0 subtrees before execution, so inspect the non-adaptive
    # compilation of the same plan.
    df = ops.partition_distribution(derive(spark, SF, "meta_files"))
    # derive() re-applies the session confs, so flip AQE off only after —
    # the conf is read at explain/execution time.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = plan(df, "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    import re

    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", p)
    assert m and int(m.group(1)) >= 1, p[:500]


@pytest.mark.parametrize("name", ["health_report", "dedup_minhash_lsh", "ann_cosine_topk"])
def test_headline_queries_no_cartesian(spark, name):
    q = load_all()[name]
    p = plan(q.spark_fn(spark, SF))
    assert "CartesianProduct" not in p, p


def test_shipping_priority_filters_pushed(spark):
    p = plan(load_all()["shipping_priority"].spark_fn(spark, SF))
    pushed = [line for line in p.splitlines() if "PushedFilters" in line and "EqualTo" in line]
    # the segment equality must reach the customer parquet scan
    assert any("c_mktsegment" in line for line in pushed), p


def test_ivf_probe_plan_shape(spark):
    p = plan(load_all()["ann_ivf_probe"].spark_fn(spark, SF))
    # centroid table + probe set broadcast; cell assignment is a map-side
    # partial-aggregated argmax, never an N*K row_number shuffle
    assert "CartesianProduct" not in p, p
    assert p.count("Broadcast") >= 2, p
    assert "partial_max" in p, p


def test_semi_and_anti_join_shapes(spark):
    p = plan(load_all()["priority_with_returns"].spark_fn(spark, SF))
    assert "LeftSemi" in p, p
    assert "CartesianProduct" not in p, p
    p = plan(load_all()["customers_without_orders"].spark_fn(spark, SF))
    assert "LeftAnti" in p, p
    assert "CartesianProduct" not in p, p


def test_local_supplier_volume_broadcasts_dims(spark):
    p = plan(load_all()["local_supplier_volume"].spark_fn(spark, SF))
    # supplier, nation, region all broadcast: no dim shuffles
    assert p.count("BroadcastHashJoin") >= 3, p
    assert "CartesianProduct" not in p, p


def test_asof_join_has_no_join_operator(spark):
    # the as-of join compiles to union + ONE partitioned forward-fill
    # window — no join, no cross product, one hash-partition exchange
    q = load_all()["purchase_click_attribution"]
    p = plan(q.spark_fn(spark, SF))
    assert "Join" not in p, p
    assert "Window" in p and "Union" in p, p
    assert p.count("hashpartitioning") == 1, p


def test_training_mix_is_pure_map_side(spark):
    # sampling must be a FILTER: no exchange, no aggregate, no join — the
    # plan that samples 100 TB without moving a byte between executors
    p = plan(load_all()["training_mix"].spark_fn(spark, SF))
    assert "Exchange" not in p, p
    assert "Join" not in p and "Aggregate" not in p, p


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # both sides bucketed by the join key into the same bucket count:
    # the equi-join must compile with ZERO Exchange — the write-time
    # shuffle is amortized across every future join
    from iceberg_meta_spark.sources.bucketed import write_bucketed

    o = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v1"))
    l = spark.range(0, 5000).select((F.col("id") % 1000).alias("k"), F.col("id").alias("v2"))
    write_bucketed(o, "t_bucket_o", "k", 8, path=str(tmp_path / "bo"))
    write_bucketed(l, "t_bucket_l", "k", 8, path=str(tmp_path / "bl"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        j = spark.table("t_bucket_o").join(spark.table("t_bucket_l"), "k")
        p = plan(j)
        assert "Exchange" not in p, p
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bucket_o")
        spark.sql("DROP TABLE IF EXISTS t_bucket_l")


def test_q15_q18_shapes(spark):
    p = plan(load_all()["top_supplier_revenue"].spark_fn(spark, SF))
    # scalar max = 1-row aggregate broadcast back, never a global window
    assert "Window" not in p, p
    assert "Broadcast" in p, p
    p = plan(load_all()["large_orders"].spark_fn(spark, SF))
    assert "CartesianProduct" not in p, p


def test_deciles_approx_has_no_window(spark):
    # the exact twin's global ntile funnels every user through one
    # partition; the approx twin must plan as broadcast boundaries +
    # map-side bucketing — no window operator anywhere
    p = plan(load_all()["user_value_deciles_approx"].spark_fn(spark, SF))
    assert "Window" not in p, p
    assert "Broadcast" in p, p


def test_doc_repetition_is_pure_map_side(spark):
    # per-doc repetition ratios are computed in-row (transform over
    # sequence, no explode): the plan must move zero bytes — no exchange,
    # no join, no aggregate, no window
    p = plan(load_all()["doc_repetition"].spark_fn(spark, SF))
    assert "Exchange" not in p, p
    assert "Join" not in p and "Aggregate" not in p and "Window" not in p, p


def test_quality_rules_single_tiny_key_aggregate(spark):
    # four rule bits fold into ONE partial+final aggregate on (lang,
    # source) — no join, no window, and exactly one shuffle key
    p = plan(load_all()["quality_rule_summary"].spark_fn(spark, SF))
    assert "Join" not in p and "Window" not in p, p
    assert p.count("hashpartitioning") == 1, p


def test_contamination_broadcasts_eval_grams(spark):
    # the eval n-gram set is MBs against a 100 TB train side: the hit
    # join must be a broadcast, never a shuffled join of train shingles
    # against eval shingles
    p = plan(load_all()["contamination_check"].spark_fn(spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_domain_mix_broadcasts_total(spark):
    # the 1-row (total_docs, total_w) aggregate joins back via broadcast
    # (A4's shape); a global window here would serialize the domain rows
    p = plan(load_all()["domain_mix_temperature"].spark_fn(spark, SF))
    assert "Window" not in p, p
    assert "Broadcast" in p, p


def test_fingerprint_edges_no_cartesian(spark):
    # star edges come from an equi-join on the fingerprint key; any
    # nested-loop here means the blocking collapsed
    from iceberg_meta_spark.pipeline.graph import fingerprint_edges

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(fingerprint_edges(docs))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_pii_scrub_is_pure_map_side(spark):
    # regex counting + redaction are per-row expressions: zero exchange,
    # zero join — the shape that scrubs 100 TB without moving a byte
    p = plan(load_all()["pii_scrub"].spark_fn(spark, SF))
    assert "Exchange" not in p, p
    assert "Join" not in p and "Aggregate" not in p, p


def test_token_rarity_broadcasts_vocab(spark):
    # the capped vocab table must broadcast onto the exploded tokens; a
    # shuffled vocab join would re-shuffle the whole corpus by token
    p = plan(load_all()["token_rarity_scores"].spark_fn(spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_kmeans_assign_is_vectorized_map(spark):
    # assignment is the Arrow-batched numpy argmax kernel (MLlib-style:
    # centroids ride in the task closure, the N x K cosine block is a local
    # matrix product) — a narrow MapInPandas, no join/window/shuffle of the
    # vector table during assignment; the only joins left in the final plan
    # are the K-row broadcast of centroid md5s against the cell sizes
    p = plan(load_all()["ann_ivf_train"].spark_fn(spark, SF))
    assert "MapInPandas" in p, p
    assert "row_number" not in p, p
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p


def test_range_join_is_equi_join(spark):
    # the point-in-interval match must compile to an equi-join on
    # (key, bucket) — a BETWEEN-only join would be a nested loop,
    # quadratic per key at scale
    p = plan(load_all()["session_purchase_match"].spark_fn(spark, SF))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p, p


def test_time_rollup_reuses_minute_exchange(spark):
    # hour and day derive from the minute partials: the minute subtree
    # must appear once and be shared (ReusedExchange), so raw events are
    # scanned exactly once across the three union branches. AQE defers
    # exchange reuse to runtime, so inspect the non-adaptive plan.
    df = load_all()["events_time_rollup"].spark_fn(spark, SF)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = plan(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # formatted mode lists each node in the tree AND the detail section;
    # count the detail-only markers: one "Reuses operator id" per reuse,
    # one "Location:" per real scan
    assert p.count("Reuses operator id") == 2, p
    assert p.count("Location:") == 1, p


def test_q13_histogram_two_shuffles(spark):
    # LEFT OUTER join -> per-customer count -> histogram: exactly two hash
    # exchanges (custkey agg, c_count agg) — the join side feeds the first
    # aggregate without an extra exchange
    p = plan(load_all()["customer_order_histogram"].spark_fn(spark, SF))
    assert "CartesianProduct" not in p, p
    assert p.count("hashpartitioning") == 2, p


def test_q17_decorrelated_no_window(spark):
    # the correlated per-part AVG must decorrelate to a groupBy broadcast
    # back onto the brand-filtered fact — no window, no nested loop
    p = plan(load_all()["small_quantity_revenue"].spark_fn(spark, SF))
    assert "Window" not in p, p
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_q21_semi_anti_compound_conditions(spark):
    # EXISTS(other supplier) -> LeftSemi; NOT EXISTS(other returner) ->
    # LeftAnti; supplier dim broadcast
    p = plan(load_all()["sole_return_suppliers"].spark_fn(spark, SF))
    assert "LeftSemi" in p, p
    assert "LeftAnti" in p, p
    assert "BroadcastHashJoin" in p, p


def test_q21_agg_twin_single_lineitem_shuffle(spark):
    # the aggregate formulation reduces each order in one groupBy: no
    # semi/anti probes re-shuffling lineitem, no join except the broadcast
    # supplier dim
    p = plan(load_all()["sole_return_suppliers_agg"].spark_fn(spark, SF))
    assert "LeftSemi" not in p and "LeftAnti" not in p, p
    assert "SortMergeJoin" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_sequence_packing_partitioned_window(spark):
    # the prefix-sum window is partitioned by the packing domain — no
    # global-order single-partition funnel
    p = plan(load_all()["sequence_packing"].spark_fn(spark, SF))
    assert "hashpartitioning" in p, p
    assert "Window" in p, p


def test_duplicated_ngram_share_no_cartesian(spark):
    # dup-gram re-attachment is an equi-join on the gram key, never a
    # doc-pair product
    p = plan(load_all()["duplicated_ngram_share"].spark_fn(spark, SF))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    # session default enables runtime bloom filters at production thresholds
    # (build <= 10 MB, probe scan >= 10 GB); lowering the thresholds to toy
    # scale must inject might_contain into the probe-side scan filter, so a
    # selective dim filter prunes fact rows BEFORE the shuffle at 100 TB
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        p = plan(li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority").count())
        assert "might_contain" in p, p
        assert "bloom_filter_agg" in p, p
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_semantic_dedup_no_cartesian(spark):
    # candidate pairs come from the in-cell equi-join; the only broadcast
    # NLJ is the deliberate K-row centroid broadcast in assignment
    p = plan(load_all()["dedup_semantic"].spark_fn(spark, SF))
    assert "CartesianProduct" not in p, p


def test_q7_q8_fact_broadcast_dims(spark):
    # Q7/Q8 shapes: the lineitem fact streams through broadcast hash joins
    # for every dimension; only the orders join may shuffle — no
    # SortMergeJoin against a dimension, no cartesian
    for name in ("nation_volume_shipping", "nation_market_share"):
        p = plan(load_all()[name].spark_fn(spark, SF))
        assert "BroadcastHashJoin" in p, (name, p)
        assert "CartesianProduct" not in p, (name, p)


def test_q10_top20_take_ordered(spark):
    # top-20 compiles to TakeOrderedAndProject, not a global sort
    p = plan(load_all()["returned_item_customers"].spark_fn(spark, SF))
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastHashJoin" in p, p


def test_variant_twin_matches_json_extract(spark):
    # the VARIANT path computes the same sums as get_json_object
    a = {
        (r.event_type, r.sum_k)
        for r in load_all()["events_props_variant"].spark_fn(spark, SF).collect()
    }
    b = {
        (r.event_type, r.sum_k)
        for r in load_all()["events_props_extract"].spark_fn(spark, SF).collect()
    }
    assert a == b


def _tree_scans(p: str) -> int:
    # formatted explain lists each node in the tree AND in the details
    # section; count only tree occurrences
    return sum(1 for line in p.splitlines() if "- Scan parquet" in line)


def test_grouping_sets_single_expand_aggregate(spark):
    # all grouping-set levels come from one Expand + one hash aggregate
    # (one shuffle), not a union of per-level scans
    p = plan(load_all()["events_grouping_sets"].spark_fn(spark, SF))
    assert "Expand" in p, p
    assert _tree_scans(p) == 1, p


def test_correlation_is_single_integer_aggregate(spark):
    # the six integer accumulators fold into ONE partial->final aggregate;
    # no second pass, no window
    p = plan(load_all()["value_hour_correlation"].spark_fn(spark, SF))
    assert "Window" not in p, p
    assert _tree_scans(p) == 1, p


def test_funnel_no_event_self_join_no_window(spark):
    # stage joins operate on per-user aggregates; the event table is
    # scanned per stage but never self-joined at event grain, and no
    # window appears
    p = plan(load_all()["event_funnel"].spark_fn(spark, SF))
    assert "Window" not in p, p
    assert "CartesianProduct" not in p.replace("BroadcastNestedLoopJoin", ""), p


def test_retention_cohort_dimension_join(spark):
    # the cohort map is a per-user aggregate equi-joined back; no window
    p = plan(load_all()["user_retention_cohorts"].spark_fn(spark, SF))
    assert "Window" not in p, p
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p, p


def test_wau_no_self_join_no_window(spark):
    # the 7-day rolling distinct comes from a map-side explode of the
    # per-day distinct frame + one distinct aggregate — no range self-join
    # at event grain, no window
    p = plan(load_all()["weekly_active_users"].spark_fn(spark, SF))
    assert "Window" not in p, p
    assert "Generate" in p, p  # the explode
    assert "CartesianProduct" not in p, p


def test_bm25_broadcasts_small_sides(spark):
    """BM25: the corpus-sized token stream shuffles once (doc-term
    partials); df and the 1-row corpus aggregate broadcast; top-k is
    TakeOrdered, not a global sort."""
    from iceberg_meta_spark.registry import load_all

    q = load_all()["bm25_retrieval"]
    p = plan(q.spark_fn(spark, SF))
    assert "BroadcastExchange" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p


def test_pps_sample_single_stratum_window(spark):
    """PPS: running and total sums share ONE window keyed by the stratum —
    no global ordering, no second shuffle."""
    from iceberg_meta_spark.pipeline.sampling import pps_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(pps_sample(docs, "doc_id", "n_chars", "lang", k=5))
    tree = p.split("\n\n")[0]
    # running-sum and stratum-total windows have different frames (two
    # Window nodes) but share ONE stratum-keyed exchange — no re-shuffle
    assert sum(1 for ln in tree.splitlines() if "Exchange" in ln) == 1, p
    assert "hashpartitioning(lang" in p, p
    assert sum(1 for ln in tree.splitlines() if "Window" in ln) == 2, p
    assert "SinglePartition" not in p, p


def test_event_transitions_window_is_user_partitioned(spark):
    from iceberg_meta_spark.registry import load_all

    q = load_all()["event_transitions"]
    p = plan(q.spark_fn(spark, SF))
    assert "hashpartitioning(user_id" in p, p


def test_salted_reach_two_stage_aggregate(spark):
    """Salted distinct count: partials keyed (event_type, salt) then the
    per-type sum — the hot key's state provably spans 16 reducers."""
    from iceberg_meta_spark.registry import load_all

    q = load_all()["salted_user_reach"]
    p = plan(q.spark_fn(spark, SF))
    assert "__salt" in p, p
    assert "hashpartitioning(event_type, __salt" in p or "hashpartitioning(event_type#" in p, p


def test_top_k_window_gets_group_limit_pushdown(spark):
    """Spark's WindowGroupLimit: the rank<=k filter pushes INTO the window
    sort, so each partition keeps only k rows before the full sort — the
    difference between sorting k rows/group and every row at 10^9 files."""
    q = load_all()["meta_top_files_per_partition"]
    p = plan(q.spark_fn(spark, SF))
    assert "WindowGroupLimit" in p, p


def test_fleet_wide_plan_lint(spark):
    """Every registered query's plan, swept for the two silent scale
    killers: cartesian products, and unpartitioned windows fed by a
    SinglePartition exchange (the every-row-through-one-task funnel).
    Bounded-by-design exceptions live in tools/plan_lint.py with reasons —
    adding a query with a global window means either fixing the plan or
    justifying it there."""
    import tools.plan_lint as pl

    findings = pl.lint(spark=spark)  # share the fixture session (see lint())
    assert not findings, findings


def test_q6_filters_reach_the_scan(spark):
    """Q6's whole value is scan-side filtering: discount band and quantity
    predicates must appear in the parquet PushedFilters."""
    q = load_all()["promo_discount_revenue"]
    p = plan(q.spark_fn(spark, SF))
    pushed = " ".join(line for line in p.splitlines() if "PushedFilters" in line)
    assert "l_discount" in pushed and "l_quantity" in pushed, p


def test_adc_scoring_is_joinless_map_side(spark):
    # ADC's promise at scale: after encoding (MapInPandas) the per-query
    # scores come from baked-in LUT map literals — no join anywhere in the
    # scoring plan, the only wide op is the per-query top-k window
    p = plan(load_all()["ann_pq_adc"].spark_fn(spark, SF))
    assert "MapInPandas" in p, p
    assert "Join" not in p, p
    assert "CartesianProduct" not in p, p


def test_aqe_splits_skewed_join_partitions(spark):
    """Evidence for the runtime half of the skew story: with the session's
    skew-join AQE enabled (session.py pins skewJoin.enabled=true), a join
    whose left side funnels 75% of rows through one key is re-planned at
    runtime — the FINAL adaptive plan marks the join skew=true, meaning
    the oversized partition was split across tasks instead of stalling the
    stage on one straggler. (Salting, used by salted_user_reach and the
    heavy-hitter kernels, is the plan-time half for aggregates, which AQE
    skew handling does not cover.) Thresholds are lowered to make local
    test data 'big'; on a real cluster the defaults (256 MB) bind."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200000).select(
            F.when(F.col("id") < 150000, 0)
            .otherwise(F.col("id") % 5000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 5000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 200000  # every left row matches exactly once
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        p = buf.getvalue()
        assert "isFinalPlan=true" in p, p
        assert "skew=true" in p, p
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dv_scan_positions_decode_executor_side(spark):
    """r10: the v3 DV scan's physical plan — positions decode in a
    MapInPandas over the descriptor frame (never a driver loop) and apply
    via the position-delete anti-join; no cartesian anywhere."""
    p = plan(load_all()["iceberg_native_dv_scan"].spark_fn(spark, SF))
    assert "MapInPandas" in p, p          # executor-side roaring decode
    assert "LeftAnti" in p, p             # the delete application join
    assert "CartesianProduct" not in p, p
