"""Snapshot-lineage ancestry via pointer doubling.

The reference models snapshot lineage as a parent pointer per snapshot
(``parent_snapshot_id``, SURVEY §1.1; rendered as history in
formatters.py:886-934) and walks it one hop at a time in Python. At scale
the walk is the classic *pointer-doubling* (path-halving) iteration: each
round joins the current ancestor pointer onto itself, doubling the hop
distance — a forest of depth D resolves every node's root and depth in
ceil(log2(D)) rounds instead of D.

Scale posture: each round is ONE equi-join of the (node -> ancestor) frame
with itself on the ancestor key, both sides hash-partitioned the same way;
rows stay one-per-node throughout (never per-edge expansion).
``localCheckpoint`` after each round caps lineage growth, the same idiom as
the connected-components kernel (pipeline/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestry(nodes: DataFrame, max_depth: int = 1 << 20) -> DataFrame:
    """Resolve every node's root ancestor and depth.

    ``nodes``: (snapshot_id, parent_id) with ``parent_id`` NULL for roots.
    Returns (snapshot_id, root_id, depth) where depth is the hop count to
    the root (0 for roots). Runs ceil(log2(max_depth)) pointer-doubling
    rounds at most, stopping early when every pointer has reached a root.
    """
    # state: (snapshot_id, anc, depth, done) — anc = current known ancestor,
    # depth = hops covered so far, done = anc is the root
    state = nodes.select(
        "snapshot_id",
        F.coalesce(F.col("parent_id"), F.col("snapshot_id")).alias("anc"),
        F.when(F.col("parent_id").isNull(), F.lit(0)).otherwise(F.lit(1)).cast("long").alias("depth"),
        F.col("parent_id").isNull().alias("done"),
    ).localCheckpoint(eager=False)

    # lookup table reused every round: each node's (ancestor, hop, done)
    rounds = max(1, (max_depth - 1).bit_length())
    for _ in range(rounds):
        if state.filter(~F.col("done")).isEmpty():
            break
        hop = state.select(
            F.col("snapshot_id").alias("j_id"),
            F.col("anc").alias("j_anc"),
            F.col("depth").alias("j_depth"),
            F.col("done").alias("j_done"),
        )
        state = (
            state.join(hop, state.anc == hop.j_id, "left")
            .select(
                "snapshot_id",
                # a dangling parent pointer (ancestor not in the frame) is
                # treated as a root: keep anc, mark done
                F.when(F.col("done"), F.col("anc"))
                .otherwise(F.coalesce(F.col("j_anc"), F.col("anc")))
                .alias("anc"),
                F.when(F.col("done"), F.col("depth"))
                .otherwise(F.col("depth") + F.coalesce(F.col("j_depth"), F.lit(0)))
                .alias("depth"),
                F.when(F.col("done"), F.lit(True))
                .otherwise(F.coalesce(F.col("j_done"), F.lit(True)))
                .alias("done"),
            )
            .localCheckpoint(eager=False)
        )
    return state.select(
        "snapshot_id", F.col("anc").alias("root_id"), "depth"
    ).orderBy("snapshot_id")


def ancestor_closure(nodes: DataFrame) -> DataFrame:
    """Full transitive ancestor closure of the lineage forest.

    Returns (snapshot_id, ancestor_id) — one row per (node, strict-or-self
    ancestor) pair, including the reflexive (X, X) row. Built by relation
    doubling: R0 = identity ∪ parent edges; each round unions
    ``R ∘ R`` back in, so depth-D chains close in ceil(log2(D)) joins.
    O(N·D) output rows — metadata-sized for snapshot logs — and exact on
    ANY forest shape, forks included (unlike the (root, depth) test).
    """
    edges = nodes.select(
        F.col("snapshot_id"), F.col("parent_id").alias("ancestor_id")
    ).filter(F.col("ancestor_id").isNotNull())
    closure = nodes.select(
        "snapshot_id", F.col("snapshot_id").alias("ancestor_id")
    ).unionByName(edges).localCheckpoint(eager=False)
    while True:
        hop = closure.select(
            F.col("snapshot_id").alias("j_id"), F.col("ancestor_id").alias("j_anc")
        )
        grown = (
            closure.join(hop, closure.ancestor_id == hop.j_id)
            .select("snapshot_id", F.col("j_anc").alias("ancestor_id"))
            .unionByName(closure)
            .distinct()
            .localCheckpoint(eager=False)
        )
        if grown.count() == closure.count():
            return closure
        closure = grown


def files_asof(files: DataFrame, nodes: DataFrame, as_of: int) -> DataFrame:
    """Time-travel state reconstruction: the per-partition file inventory
    VISIBLE at snapshot ``as_of`` — files whose adding snapshot is an
    ancestor of (or is) ``as_of`` in the lineage forest.

    On unbranched parent chains, membership comes from the pointer-doubled
    :func:`ancestry` frame: X is an ancestor of S iff they share a root and
    ``depth(X) <= depth(S)`` — log-depth self-joins, one row per node. On a
    FORKED history (any parent with >1 child: a branch, or rollback then
    recommit) that test would silently count sibling-branch snapshots, so
    forks are detected up front (one metadata-sized aggregate) and the exact
    :func:`ancestor_closure` is used instead — O(N·D) rows, still
    metadata-sized, correct on any forest.

    Scale: lineage math touches only the metadata-sized snapshot log; the
    visibility test then broadcasts the (small) visible-snapshot set and
    semi-filters the file table — the big file frame is scanned once, no
    per-file lineage walk.
    """
    has_fork = not (
        nodes.filter(F.col("parent_id").isNotNull())
        .groupBy("parent_id")
        .agg(F.count(F.lit(1)).alias("n_children"))
        .filter(F.col("n_children") > 1)
        .isEmpty()
    )
    if has_fork:
        visible_snaps = (
            ancestor_closure(nodes)
            .filter(F.col("snapshot_id") == as_of)
            .select(F.col("ancestor_id").alias("snapshot_id"))
        )
    else:
        anc = ancestry(nodes)
        anchor = anc.filter(F.col("snapshot_id") == as_of).select(
            F.col("root_id").alias("as_of_root"), F.col("depth").alias("as_of_depth")
        )
        visible_snaps = (
            anc.crossJoin(F.broadcast(anchor))
            .filter(
                (F.col("root_id") == F.col("as_of_root"))
                & (F.col("depth") <= F.col("as_of_depth"))
            )
            .select("snapshot_id")
        )
    return (
        files.join(F.broadcast(visible_snaps), "snapshot_id")
        .groupBy("part_key")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("file_size_in_bytes").alias("total_bytes"),
            F.sum("record_count").alias("total_records"),
        )
        .orderBy("part_key")
    )
