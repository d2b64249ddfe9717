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
    ).localCheckpoint()

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
            .localCheckpoint()
        )
    return state.select(
        "snapshot_id", F.col("anc").alias("root_id"), "depth"
    ).orderBy("snapshot_id")


def files_asof(files: DataFrame, nodes: DataFrame, as_of: int) -> DataFrame:
    """Time-travel state reconstruction: the per-partition file inventory
    VISIBLE at snapshot ``as_of`` — files whose adding snapshot is an
    ancestor of (or is) ``as_of`` in the lineage forest.

    Membership comes from the pointer-doubled :func:`ancestry` frame: X is
    an ancestor of S iff they share a root and ``depth(X) <= depth(S)`` —
    exact for forests of parent CHAINS (Iceberg lineage without branch
    forks; a forked history would need the pairwise closure instead, at
    O(N·D) rows — metadata-sized either way).

    Scale: ancestry is log-depth self-joins on the metadata-sized snapshot
    log; the visibility test then broadcasts the 1-row as-of anchor and
    semi-filters the file table by (root, depth) — the big file frame is
    scanned once, no per-file lineage walk.
    """
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
