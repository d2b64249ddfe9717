"""Incremental aggregate maintenance over snapshot deltas.

The 100 TB idiom the reference's eager rescans can't reach: when a new
snapshot lands, per-group statistics should be refreshed by applying the
DELTA (files added/removed/changed since the last snapshot), not by
re-aggregating the whole table. Iceberg's metadata tree makes the delta
cheap to enumerate (only the new snapshot's manifests); this kernel does the
algebraic half — merging signed per-group deltas into the previous stats.

``incremental_group_stats`` is deliberately restricted to SUM/COUNT-shaped
aggregates: those are the self-maintainable ones (a delta of the input maps
to an addition on the output). MIN/MAX are not (a deleted extremum forces a
rescan of its group) — callers needing bounds keep the full-recompute path.

Correctness contract (pinned by the oracle and unit tests): the merged
result EQUALS the full recompute at the new snapshot, while the wide work
touches only rows whose (group, id) contribution changed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_group_stats(
    old: DataFrame,
    new: DataFrame,
    group_col: str,
    id_col: str,
    sum_cols: tuple[str, ...],
) -> DataFrame:
    """Per-``group_col`` stats at the NEW snapshot, computed as old stats
    plus the signed delta of changed ``(group, id)`` contributions.

    Plan shape: three aggregates keyed (group, id) / (group) — each
    map-side combined — and ONE full-outer equi-join on (group, id) that at
    deployment scale is delta-sized on the new side (Iceberg hands you only
    the new snapshot's manifests; here both sides shrink to per-id
    contributions first, so nothing wide flows twice). The final merge is a
    group-keyed outer join of two group-cardinality frames.

    Output: ``group_col``, n_files/sum columns at the new snapshot, plus
    the ``d_``-prefixed deltas showing exactly how much incremental work
    the refresh applied.
    """

    def contrib(df: DataFrame) -> DataFrame:
        return df.groupBy(group_col, id_col).agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(c).alias(c) for c in sum_cols],
        )

    zero = F.lit(0).cast("long")
    co, cn = contrib(old), contrib(new)
    measures = ["n", *sum_cols]
    delta = (
        cn.alias("nw")
        .join(co.alias("od"), [group_col, id_col], "full_outer")
        .select(
            group_col,
            *[
                (F.coalesce(f"nw.{c}", zero) - F.coalesce(f"od.{c}", zero)).alias(f"d_{c}")
                for c in measures
            ],
        )
        # changed contributions only: the delta-sized frontier
        .filter(" OR ".join(f"d_{c} <> 0" for c in measures))
    )
    d_g = delta.groupBy(group_col).agg(
        *[F.sum(f"d_{c}").alias(f"d_{c}") for c in measures]
    )
    old_g = old.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(c) for c in sum_cols],
    )
    merged = old_g.join(d_g, group_col, "full_outer")
    return merged.select(
        group_col,
        *[
            (F.coalesce(c, zero) + F.coalesce(f"d_{c}", zero)).alias(c)
            for c in measures
        ],
        *[F.coalesce(f"d_{c}", zero).alias(f"d_{c}") for c in measures],
    )
