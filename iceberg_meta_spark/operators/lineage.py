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
