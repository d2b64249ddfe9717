"""Embedding similarity-search kernels (ANN over array<float> columns).

Determinism contract: per-element products are scaled+floored to BIGINT
(``floor(x*y*1e12)``) so dot products are *exact integer sums* — identical in
any engine and any partition order. Cosine = dot_s / (sqrt(na_s)*sqrt(nb_s))
on those integers is then a deterministic double.

Scale posture: brute force is the correctness baseline (fine for a broadcast
query set x N candidates — one pass, no shuffle); the LSH-bucketed variant
prunes candidates by sign-bucket equality — an equi-join, the shape that
survives 10⁹ vectors (bucket key can grow to more planes as N grows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1e12


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def scaled_dot(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product of two float arrays at 1e12 scale."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: F.floor(x * y * F.lit(SCALE)).cast("long"))
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


def with_self_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the scaled self-dot (norm² at 1e12 scale) once per vector."""
    return emb.withColumn("norm_s", scaled_dot(F.col(vec_col), F.col(vec_col)))


def cosine(dot_s: Column, na_s: Column, nb_s: Column) -> Column:
    return dot_s.cast("double") / (
        F.sqrt(na_s.cast("double")) * F.sqrt(nb_s.cast("double"))
    )


def brute_force_topk(emb: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact cosine top-k per query vector (self excluded).

    Queries are a tiny broadcast side; candidates stream by in one scan.
    Ranking key (cos DESC, vec_id) is fully deterministic.
    """
    base = with_self_norm(emb)
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_s").alias("q_norm"),
    )
    pairs = base.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    cos = cosine(scaled_dot(F.col("q_emb"), F.col("embedding")), F.col("q_norm"), F.col("norm_s"))
    ranked = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos_sim")
    )


def hyperplane_signs(planes: int, dims: int) -> list[list[int]]:
    """Deterministic md5-seeded ±1 random-hyperplane matrix.

    Sign(p, d) = +1 iff the first hex nibble of md5("hyperplane:p:d") < 8 —
    an unbiased coin that any engine/runtime reproduces.  The matrix is
    computed driver-side and baked into the plan (and the DuckDB oracle SQL)
    as literals, so both engines see the identical projection.
    """
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"hyperplane:{p}:{d}".encode()).hexdigest()[0], 16) < 8 else -1
            for d in range(dims)
        ]
        for p in range(planes)
    ]


#: Integer scale for hyperplane projections: sign(Σ ±floor(x·1e6)) is an
#: exact-integer comparison, immune to float summation order.
PROJ_SCALE = 1e6


def sign_bucket(arr: Column, planes: int = 4, dims: int = 64) -> Column:
    """LSH bucket id from random-hyperplane sign bits.

    Each plane is a dense ±1 hyperplane over ALL ``dims`` components (real
    embedding dims are correlated, so first-k-component signs would skew the
    buckets); the projection Σ_d sign(p,d)·floor(x_d·1e6) is an exact BIGINT
    sum, so the bucket id is deterministic across engines and partitionings.
    """
    signs = hyperplane_signs(planes, dims)
    scaled = F.transform(_as_double(arr), lambda x: F.floor(x * F.lit(PROJ_SCALE)).cast("long"))
    bucket = F.lit(0)
    for p in range(planes):
        coef = F.array(*[F.lit(s).cast("long") for s in signs[p]])
        proj = F.aggregate(
            F.zip_with(scaled, coef, lambda x, c: x * c),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket * 2 + F.when(proj >= 0, 1).otherwise(0)
    return bucket


def lsh_bucketed_topk(
    emb: DataFrame, query_ids: list[int], k: int = 3, planes: int = 4, dims: int = 64
) -> DataFrame:
    """ANN top-k restricted to the query's sign-bucket (candidate pruning).

    The bucket equi-join replaces the cross join — at scale each query
    touches ~N/2^planes candidates, and buckets shuffle-partition evenly.
    """
    base = with_self_norm(emb).withColumn("bucket", sign_bucket(F.col("embedding"), planes, dims))
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_s").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    pairs = base.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = cosine(scaled_dot(F.col("q_emb"), F.col("embedding")), F.col("q_norm"), F.col("norm_s"))
    ranked = pairs.select(
        "query_id", "bucket", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id", "bucket", "rank", "neighbor_id", F.round("cos", 6).alias("cos_sim")
    )


def embedding_near_dups(
    emb: DataFrame, planes: int = 4, threshold: float = 0.9, dims: int = 64
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with cosine >=
    threshold, candidates restricted to the same sign-plane LSH bucket.

    The dedup variant of ANN: a bucket-local self-join (equi-join on the
    bucket key, a.vec_id < b.vec_id) instead of an all-pairs product —
    at 10⁹ vectors the bucket count grows with the plane count so each
    bucket's quadratic term stays bounded. High-cosine pairs land in the
    same bucket with high probability (sign agreement on every plane).
    """
    base = with_self_norm(emb).withColumn("bucket", sign_bucket(F.col("embedding"), planes, dims))
    a = base.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm_s").alias("norm_a"),
    )
    b = base.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm_s").alias("norm_b"),
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    cos = cosine(scaled_dot(F.col("emb_a"), F.col("emb_b")), F.col("norm_a"), F.col("norm_b"))
    return (
        pairs.select("bucket", "vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("bucket", "vec_a", "vec_b", F.round("cos", 6).alias("cos_sim"))
    )


def ivf_probe_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    centroid_mod: int = 31,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize to centroid cells, probe the query's
    ``nprobe`` nearest cells, rank only those cells' vectors.

    The inverted-file counterpart to :func:`lsh_bucketed_topk` (data-dependent
    cells instead of data-independent hyperplanes). Centroids here are a
    deterministic sample (``vec_id % centroid_mod == 1``) — the coarse
    quantizer a k-means pass would refine; assignment/probe plumbing is
    identical either way, and determinism keeps the DuckDB oracle exact.

    Scale posture (10⁹ vectors): the centroid table is K ≈ sqrt(N) rows and
    BROADCAST, so cell assignment is a map-side broadcast product followed by
    a partial-aggregated argmax — the shuffle carries ONE row per vector, not
    N×K. Probing is an equi-join on the cell id, touching ~nprobe/K of the
    data per query; the final ranking window partitions by query_id (small).
    """
    base = with_self_norm(emb)
    cent = base.filter(F.col("vec_id") % centroid_mod == 1).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm_s").alias("c_norm"),
    )
    cos_c = cosine(scaled_dot(F.col("embedding"), F.col("c_emb")), F.col("norm_s"), F.col("c_norm"))
    acs = (
        base.select("vec_id", "embedding", "norm_s")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", "cent_id", cos_c.alias("cos"))
    )
    # argmax via max(struct): (cos DESC, cent_id ASC) tie-break, map-side
    # combinable — unlike a row_number window, which would shuffle N*K rows.
    assign = (
        acs.groupBy("vec_id")
        .agg(F.max(F.struct(F.col("cos"), (-F.col("cent_id")).alias("neg_cent"))).alias("m"))
        .select("vec_id", (-F.col("m.neg_cent")).cast("long").alias("cell"))
    )
    probes = (
        acs.filter(F.col("vec_id").isin(query_ids))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cent_id"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), F.col("cent_id").cast("long").alias("cell"))
    )
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_s").alias("q_norm"),
    )
    cand = assign.join(base, "vec_id").join(
        F.broadcast(probes.join(q, "query_id")),
        on="cell",
    ).filter(F.col("vec_id") != F.col("query_id"))
    cos = cosine(scaled_dot(F.col("q_emb"), F.col("embedding")), F.col("q_norm"), F.col("norm_s"))
    ranked = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos_sim")
    )


def nearest_in_label(emb: DataFrame, sample_mod: int = 10) -> DataFrame:
    """Embedding near-dup detection blocked by label: nearest neighbor
    within the same label for a deterministic sample of vectors."""
    base = with_self_norm(emb)
    q = base.filter(F.col("vec_id") % sample_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_s").alias("q_norm"),
    )
    pairs = base.join(
        F.broadcast(q),
        (F.col("label") == F.col("q_label")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = cosine(scaled_dot(F.col("q_emb"), F.col("embedding")), F.col("q_norm"), F.col("norm_s"))
    ranked = pairs.select(
        "query_id", F.col("q_label").alias("label"), F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") == 1).select(
        "query_id", "label", "neighbor_id", F.round("cos", 6).alias("cos_sim")
    )


QUANT_SCALE = 1_000_000_000  # 1e9 floor-scale for quantization stats


def int8_quantize(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization per vector — the standard 4× memory
    reduction for ANN candidate storage: ``q_i = floor(x_i / scale * 127)``
    with ``scale = max|x_i|``.

    Returns per-vector (vec_id, scale_s, q_md5, err_s): the floor-scaled
    BIGINT scale, the md5 of the int8 array, and the floor-scaled total
    reconstruction error — all integer-exact, so the oracle hash-matches.
    Pure map-side: zero shuffle, embarrassingly parallel at 10⁹ vectors.
    """
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(xd(x))))
    q = F.transform(F.col(vec_col), lambda x: F.floor((xd(x) / scale) * 127).cast("long"))
    err_term = lambda x: F.floor(  # noqa: E731
        F.abs(xd(x) - (F.floor((xd(x) / scale) * 127).cast("double") * scale) / 127.0)
        * QUANT_SCALE
    ).cast("long")
    err = F.aggregate(
        F.transform(F.col(vec_col), err_term), F.lit(0).cast("long"), lambda a, x: a + x
    )
    zero = F.lit(0).cast("long")
    return emb.select(
        "vec_id",
        F.when(scale == 0, zero)
        .otherwise(F.floor(scale * QUANT_SCALE).cast("long"))
        .alias("scale_s"),
        F.when(
            scale == 0,
            F.md5(F.concat_ws(",", F.transform(F.col(vec_col), lambda x: F.lit("0")))),
        )
        .otherwise(F.md5(F.concat_ws(",", F.transform(q, lambda x: x.cast("string")))))
        .alias("q_md5"),
        F.when(scale == 0, zero).otherwise(err).alias("err_s"),
    )


def hard_negatives(emb: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector, the
    top-k most-similar candidates with a DIFFERENT label — high-cosine
    wrong-class neighbors, the pairs that sharpen a metric-learning loss.

    Same plan as the brute-force baseline (tiny query set broadcast, one
    candidate pass, per-query ranking window) with the label-mismatch
    predicate applied before ranking.
    """
    base = with_self_norm(emb)
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_s").alias("q_norm"),
    )
    pairs = base.crossJoin(F.broadcast(q)).filter(
        (F.col("vec_id") != F.col("query_id")) & (F.col("label") != F.col("q_label"))
    )
    cos = cosine(scaled_dot(F.col("q_emb"), F.col("embedding")), F.col("q_norm"), F.col("norm_s"))
    ranked = pairs.select(
        "query_id",
        "q_label",
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("neg_label"),
        cos.alias("cos"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("negative_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id", "q_label", "rank", "negative_id", "neg_label",
        F.round("cos", 6).alias("cos_sim"),
    )


def truncated_recall(
    emb: DataFrame, sample_mod: int = 10, trunc_dims: int = 16
) -> DataFrame:
    """Matryoshka prefix-embedding audit: per label, how often the top-1
    in-label neighbor under the first ``trunc_dims`` dims agrees with the
    top-1 under the full vector (recall@1 of the cheap prefix index).

    One broadcast of the query sample, one hash partitioning by query_id
    shared by both row_number windows; integer-exact dots make both argmaxes
    engine-deterministic.
    """
    base = with_self_norm(emb).withColumn(
        "t_emb", F.slice(F.col("embedding"), 1, trunc_dims)
    )
    base = base.withColumn("tnorm_s", scaled_dot(F.col("t_emb"), F.col("t_emb")))
    q = base.filter(F.col("vec_id") % sample_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("t_emb").alias("qt_emb"),
        F.col("norm_s").alias("q_norm"),
        F.col("tnorm_s").alias("qt_norm"),
    )
    pairs = base.join(
        F.broadcast(q),
        (F.col("label") == F.col("q_label")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos_f = cosine(
        scaled_dot(F.col("q_emb"), F.col("embedding")), F.col("q_norm"), F.col("norm_s")
    )
    cos_t = cosine(
        scaled_dot(F.col("qt_emb"), F.col("t_emb")), F.col("qt_norm"), F.col("tnorm_s")
    )
    scored = pairs.select(
        "query_id",
        F.col("q_label").alias("label"),
        F.col("vec_id").alias("neighbor_id"),
        cos_f.alias("cos_f"),
        cos_t.alias("cos_t"),
    )
    w = Window.partitionBy("query_id")
    ranked = scored.withColumn(
        "rank_f",
        F.row_number().over(w.orderBy(F.desc("cos_f"), F.asc("neighbor_id"))),
    ).withColumn(
        "rank_t",
        F.row_number().over(w.orderBy(F.desc("cos_t"), F.asc("neighbor_id"))),
    )
    top = ranked.groupBy("query_id", "label").agg(
        F.max(F.when(F.col("rank_f") == 1, F.col("neighbor_id"))).alias("nn_full"),
        F.max(F.when(F.col("rank_t") == 1, F.col("neighbor_id"))).alias("nn_trunc"),
    )
    agree = F.sum(
        F.when(F.col("nn_full") == F.col("nn_trunc"), 1).otherwise(0)
    ).cast("long")
    return (
        top.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            agree.alias("n_top1_agree"),
        )
        .withColumn(
            "recall_at_1",
            F.round(F.col("n_top1_agree").cast("double") / F.col("n_queries"), 4),
        )
        .orderBy("label")
    )


def lsh_recall_audit(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    planes: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Recall@k of LSH candidate generation vs the exact top-k, per query
    — the ANN quality metric, computed inside the engine (and hash-gated
    by its DuckDB oracle, unlike an external eval script).

    Recall here judges the CANDIDATE SET (did the true neighbors land in
    the probed bucket?), the quantity bucketing actually risks — in-bucket
    ranking is exact. Exact side: one broadcast-query scan; candidate
    side: the same bucket equi-join as retrieval; the audit itself is a
    LeftSemi + two tiny per-query aggregates. Scale cost ≈ one retrieval
    pass + one exact pass over the probe set.
    """
    exact = brute_force_topk(emb, query_ids, k).select("query_id", "neighbor_id")
    base = emb.select(
        "vec_id", sign_bucket(F.col("embedding"), planes, dims).alias("bucket")
    )
    qb = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("bucket").alias("q_bucket")
    )
    cand = (
        base.join(F.broadcast(qb), F.col("bucket") == F.col("q_bucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    hits = (
        exact.join(cand, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    n_cand = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    spark = emb.sparkSession
    from iceberg_meta_spark.sources.localrel import local_frame

    qframe = local_frame(spark, [(int(i),) for i in query_ids], "query_id bigint")
    return (
        qframe.join(n_cand, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.lit(k).cast("long").alias("n_exact"),
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(f"CAST(coalesce(n_hits, 0) * 1000 DIV {k} AS BIGINT)").alias(
                "recall_permille"
            ),
        )
        .orderBy("query_id")
    )
