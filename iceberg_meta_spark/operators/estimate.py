"""Join-cardinality estimation by correlated sampling — planner tooling.

Before launching a 100 TB join, a planner wants |A ⋈ B| to choose shuffle
partition counts, detect key skew, and decide broadcast vs sort-merge.
Independent uniform samples of A and B almost never collide on the join
key (a p²-fraction of matches survives), so the estimator uses CORRELATED
sampling (Vengerov et al., VLDB 2015, "Join size estimation subject to
filter conditions"): both sides keep rows whose join-key HASH lands under
the same threshold — the same 1/r fraction of the KEY SPACE on both
sides. Every key either survives on both sides (with all its rows) or on
neither, so the sampled join is the true join restricted to a 1/r key
subspace and scales back LINEARLY: |A ⋈ B| ≈ r × |A_s ⋈ B_s|.

The hash is the engine-standard md5-prefix bucket (sampling.hash_bucket),
so the sample — like every sample in this engine — is deterministic,
engine-portable, and a pure map-side FILTER on both scans: the estimate
costs two filtered scans plus a join that is ~1/r of the real one.

Caveat the planner must know: variance concentrates in heavy keys — a
single key holding most matches is either in the sample (overestimate by
~r) or not (underestimate). ``estimate_join_cardinality`` therefore also
returns the sampled top-key share so callers can see when the estimate
rests on few keys (the signal to fall back to an exact heavy-key count,
the classic end-biased refinement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline.sampling import hash_bucket


def correlated_sample(df: DataFrame, key_col: str, rate_256: int, salt: str = "joinest") -> DataFrame:
    """Keep rows whose JOIN-KEY hash bucket < rate_256/256 — the same key
    subspace for every table sampled with the same salt."""
    from iceberg_meta_spark.pipeline.sampling import _hex2

    return df.filter(hash_bucket(F.col(key_col), salt) < _hex2(rate_256))


def estimate_join_cardinality(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    rate_256: int = 16,
    salt: str = "joinest",
) -> dict:
    """Estimate |a ⋈ b on key_col| from a 1/r correlated key-space sample.

    Returns {estimate, sampled_pairs, scale, sampled_keys, top_key_share_pct}
    — top_key_share_pct is the largest single key's share of sampled pairs
    (high values mean the estimate rests on few keys; refine those exactly).
    """
    scale = 256.0 / rate_256
    sa = correlated_sample(a, key_col, rate_256, salt).groupBy(key_col).agg(
        F.count(F.lit(1)).alias("na")
    )
    sb = correlated_sample(b, key_col, rate_256, salt).groupBy(key_col).agg(
        F.count(F.lit(1)).alias("nb")
    )
    per_key = sa.join(sb, key_col).select(
        key_col, (F.col("na") * F.col("nb")).alias("pairs")
    )
    row = per_key.agg(
        F.coalesce(F.sum("pairs"), F.lit(0)).alias("pairs"),
        F.count(F.lit(1)).alias("keys"),
        F.coalesce(F.max("pairs"), F.lit(0)).alias("max_pairs"),
    ).collect()[0]
    sampled = int(row["pairs"])
    return {
        "estimate": int(round(sampled * scale)),
        "sampled_pairs": sampled,
        "scale": scale,
        "sampled_keys": int(row["keys"]),
        "top_key_share_pct": round(100.0 * int(row["max_pairs"]) / sampled, 2) if sampled else 0.0,
    }
