"""Duplicate-cluster graph kernels: fingerprint-share edges + distributed
connected components (iterative min-label propagation).

Pair generators (exact keys, MinHash-LSH) emit EDGES; a real dedup pipeline
needs CLUSTERS — the transitive closure — so that exactly one representative
per connected component survives. The reference has no analog (it is a
single-table metadata tool); this is part of the LLM-pipeline surface the
brief adds on top.

Scale notes:
- Edges are doc->group-representative STARS (one edge per (doc, key), never
  the O(group²) clique), so edge count is bounded by rows × #key-types.
- Label propagation does one shuffle per round (union + min-groupBy) and
  converges in O(graph diameter) rounds; star-shaped edge sets keep the
  diameter small. Each round is `localCheckpoint`-ed so the lineage (and the
  task binary) stays constant-size — the standard iterative-DataFrame idiom.
- The per-round convergence check is one count() action on the changed-label
  frame; an iterative algorithm is inherently multi-job, this is the minimum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint_edges(docs: DataFrame, k: int = 3) -> DataFrame:
    """(src, dst) edges linking docs that share a k-token prefix OR suffix
    fingerprint: each doc links to the MIN doc_id of every key group it
    belongs to (star edges, not cliques).

    The suffix is taken via reverse->slice->reverse so short documents
    degrade to their full token list identically in Spark and DuckDB
    (negative-index slicing differs between engines; this form doesn't).
    """
    toks = F.split(F.col("text"), " ")
    prefix = F.md5(F.concat(F.lit("p|"), F.concat_ws(" ", F.slice(toks, 1, k))))
    suffix = F.md5(
        F.concat(
            F.lit("s|"),
            F.concat_ws(" ", F.reverse(F.slice(F.reverse(toks), 1, k))),
        )
    )
    keys = docs.select("doc_id", prefix.alias("fp")).unionAll(
        docs.select("doc_id", suffix.alias("fp"))
    )
    reps = keys.groupBy("fp").agg(F.min("doc_id").alias("rep"))
    return (
        keys.join(reps, "fp")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("doc_id").alias("src"), F.col("rep").alias("dst"))
        .distinct()
    )


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(node, label): every node labeled with the MIN node id reachable in
    its undirected connected component.

    Min-label propagation: each round every node takes the min of its own
    label and its neighbors' labels — expressed as union(current, labels
    arriving over edges) -> min-groupBy, i.e. ONE shuffle per round. Stops
    when a round changes nothing (or at ``max_iter`` as a safety bound).
    """
    sym = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        arriving = sym.join(
            cur.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        new = (
            cur.unionAll(arriving)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new.withColumnRenamed("label", "new_label")
            .join(cur, "node")
            .filter(F.col("new_label") < F.col("label"))
            .count()
        )
        cur = new
        if changed == 0:
            break
    return cur


def dedup_clusters(docs: DataFrame, k: int = 3) -> DataFrame:
    """Duplicate clusters over prefix/suffix fingerprint edges: one row per
    connected component with its size and id range. Every clustered doc
    except ``cluster_id`` itself is a removal candidate — the keep-min-id
    policy of :func:`exact_dup_groups` generalized across transitive links.
    """
    cc = connected_components(fingerprint_edges(docs, k))
    return cc.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("node").alias("max_doc_id"),
    )


def pagerank(
    edges: DataFrame,
    n_iters: int = 2,
    damping_ppm: int = 850_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer-scaled PageRank power iteration over (src, dst) edges.

    All arithmetic is fixed-point BIGINT — rank starts at ``scale`` per
    node, each round computes ``floor((1-d)*scale) + (d * sum(rank_u DIV
    outdeg_u)) DIV 1e6`` — so the iteration is bit-deterministic across
    engines and partitionings, which is what lets an iterative operator
    carry a hash-gated oracle (the same idiom as the k-means trainer).
    Dangling-node mass is dropped (the standard simplification).

    Scale posture: per round, ONE edge-side shuffle — contributions
    aggregate map-side per dst — and the rank/outdeg dimension joins
    broadcast (ranks are one row per node, orders of magnitude smaller
    than edges). ``localCheckpoint`` per round caps lineage.
    """
    # (1-d) teleport mass in `scale` units: damping_ppm is parts-per-million
    # regardless of `scale`, so the two units must not be mixed.
    base_scaled = scale * (1_000_000 - damping_ppm) // 1_000_000
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("rank_scaled", F.lit(scale).cast("long"))
    for _ in range(n_iters):
        r = ranks.select(F.col("node").alias("src"), "rank_scaled")
        contrib = (
            edges.join(F.broadcast(r), "src")
            .join(F.broadcast(outdeg), "src")
            .select("dst", F.expr("rank_scaled DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base_scaled)
                    + F.expr(f"{damping_ppm} * coalesce(in_sum, 0) DIV 1000000")
                ).cast("long").alias("rank_scaled"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.orderBy(F.desc("rank_scaled"), "node")


def leakage_safe_splits(
    docs: DataFrame, k: int = 3, test_256: int = 26, val_256: int = 26, salt: str = "split"
) -> DataFrame:
    """Train/validation/test assignment that near-duplicates can never
    straddle: the split is a function of the doc's duplicate-CLUSTER id, not
    the doc id — a test doc's near-dup leaking into train is the classic
    eval-contamination failure, and hashing the connected-component label
    makes it structurally impossible (transitively linked docs share the
    label, hence the split).

    Deterministic md5 bucketing (first 2 hex digits vs a hex threshold, the
    ``sampling.stratified_sample`` trick) replaces the RNG: ``test_256`` and
    ``val_256`` are rates in 256ths. Singleton docs (no dup edges) use their
    own doc_id as the split key. Returns (doc_id, split_key, split).

    Scale: the component labeling is the bounded min-label propagation of
    :func:`connected_components` (star edges, diameter ≈2); the split
    assignment itself is one left join + pure map-side hashing.
    """
    from iceberg_meta_spark.pipeline.sampling import _hex2

    cc = connected_components(fingerprint_edges(docs, k))
    labeled = (
        docs.select("doc_id")
        .join(cc, F.col("doc_id") == F.col("node"), "left")
        .select("doc_id", F.coalesce(F.col("label"), F.col("doc_id")).alias("split_key"))
    )
    b = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col("split_key").cast("string"))), 1, 2
    )
    split = (
        F.when(b < F.lit(_hex2(test_256)), "test")
        .when(b < F.lit(_hex2(test_256 + val_256)), "validation")
        .otherwise("train")
    )
    return labeled.select("doc_id", "split_key", split.alias("split"))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Exact triangle count + global clustering coefficient, the
    degree-orientation way (the standard distributed-triangle algorithm,
    e.g. Suri & Vassilvitskii WWW'11).

    ``edges`` is canonical undirected: one row per edge with ``a < b``.
    Orienting every edge from its lower-(degree, id) endpoint to the
    higher makes the graph acyclic with out-degree O(sqrt(E)) per node,
    so the wedge join (two out-edges sharing a source) generates
    O(E^1.5) candidates TOTAL regardless of hub nodes — the naive
    undirected wedge join explodes as sum(deg^2) and dies on the first
    celebrity vertex. Each triangle then has exactly one wedge whose
    closing edge is oriented (lower, higher), so one LeftSemi against
    the oriented edge set counts every triangle exactly once.

    Returns ONE row: n_nodes, n_edges, n_wedges (undirected, sum of
    C(deg,2) — the clustering-coefficient denominator), n_triangles,
    closure_permille = 3·triangles·1000 / wedges.
    """
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    with_deg = edges.join(da, "a").join(db, "b")
    # orient from lower (degree, id); a < b already breaks degree ties
    fwd = F.col("da") < F.col("db")
    tie = (F.col("da") == F.col("db"))
    oriented = with_deg.select(
        F.when(fwd | tie, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd | tie, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    e1 = oriented.select(F.col("u"), F.col("v").alias("v1"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("v2"))
    wedges = e1.join(e2, "u").where(F.col("v1") < F.col("v2"))
    # the closing edge of a (v1, v2) wedge is oriented min->max in the
    # SAME (degree, id) order; both candidate orientations are probed
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    ).unionAll(oriented.select(F.col("v").alias("v1"), F.col("u").alias("v2")))
    tri = wedges.join(closing, ["v1", "v2"], "left_semi")
    counts = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    nodes = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        # coalesce: an empty graph reports the all-zero row, never NULLs
        F.coalesce(F.sum(F.expr("d * (d - 1) DIV 2")), F.lit(0))
        .cast("long")
        .alias("n_wedges"),
    )
    tri_n = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    return (
        nodes.crossJoin(counts)
        .crossJoin(tri_n)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.expr(
                "CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST(n_triangles * 3000 DIV n_wedges AS BIGINT) END"
            ).alias("closure_permille"),
        )
    )


def near_dedup_impact(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-source impact of TRANSITIVE (near-dup-cluster) dedup: docs/tokens
    dropped if only each connected component's min-id doc survives.

    The companion report to :func:`dedup.dedup_impact` (exact-key policy):
    clusters chain prefix/suffix fingerprint links, so a doc can be dropped
    for matching a doc that itself matched a third — the FineWeb-style
    cluster-collapse accounting. Scale: star edges (never cliques),
    min-label propagation (one shuffle per round), then one per-source
    aggregate; the cluster label IS the keeper id, so no extra keeper join.
    """
    cc = connected_components(fingerprint_edges(docs, k))
    per_doc = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    labeled = per_doc.join(
        cc.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).withColumn("cluster", F.coalesce(F.col("label"), F.col("doc_id")))
    kept = F.col("doc_id") == F.col("cluster")
    return (
        labeled.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(F.when(kept, F.col("n_tok")).otherwise(0)).cast("long").alias("kept_tokens"),
            F.sum(F.when(~kept, F.col("n_tok")).otherwise(0)).cast("long").alias("dropped_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "kept_docs",
            "total_tokens",
            "kept_tokens",
            "dropped_tokens",
            F.expr("dropped_tokens * 1000 DIV total_tokens").alias("savings_permille"),
        )
        .orderBy("source")
    )


def cluster_size_histogram(docs: DataFrame, k: int = 3) -> DataFrame:
    """Near-dup cluster-size distribution INCLUDING singletons — the
    standard dedup-analysis figure (how much mass sits in giant clusters
    vs the long tail of unique docs).

    Clustered docs roll up by component label; unclustered docs enter as
    size-1 clusters via one anti-join count (never materialized per-doc).
    Output per cluster_size: n_clusters and n_docs (= size * n_clusters).
    """
    cc = connected_components(fingerprint_edges(docs, k))
    sizes = cc.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )
    singletons = (
        docs.select("doc_id")
        .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            F.col("n").cast("long").alias("n_clusters"),
        )
        .where(F.col("n_clusters") > 0)
    )
    return (
        hist.select(F.col("cluster_size").cast("long"), "n_clusters")
        .unionAll(singletons)
        .groupBy("cluster_size")
        .agg(F.sum("n_clusters").cast("long").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )
