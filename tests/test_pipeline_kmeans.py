"""Unit tests for the deterministic Lloyd k-means refinement
(pipeline/kmeans.py) on a handcrafted separable dataset. Oracle parity at
sf0.01 (2 unrolled iterations as CTEs) is covered by test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline import kmeans

SCHEMA = "vec_id long, embedding array<float>"


def _emb(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_kmeans_separates_two_clusters(spark):
    # ids 0-2 point along +x, ids 3-5 along +y; init sample (vec_id % 3 == 1)
    # picks one seed per cluster (ids 1 and 4)
    rows = [
        (0, [1.0, 0.1, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.1, 0.0]),
        (2, [0.9, 0.1, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.1, 0.0]),
        (4, [0.1, 1.0, 0.0, 0.0]),
        (5, [0.0, 0.9, 0.1, 0.0]),
    ]
    out = kmeans.kmeans_cells(_emb(spark, rows), centroid_mod=3, iters=2, dims=4).collect()
    by_cell = {r.cell: r for r in out}
    assert set(by_cell) == {1, 4}
    assert by_cell[1].n_vectors == 3 and by_cell[4].n_vectors == 3
    assert by_cell[1].centroid_md5 != by_cell[4].centroid_md5


def test_kmeans_centroid_mean_is_integer_exact(spark):
    # one cluster, one centroid: after an update the centroid is the
    # element-wise integer mean of the quantized members
    rows = [(1, [0.5, 0.5]), (2, [0.7, 0.3]), (3, [0.6, 0.4])]
    base = _emb(spark, rows)
    q = base.select(
        "vec_id",
        F.transform("embedding", lambda x: F.floor(x.cast("double") * 1_000_000).cast("long")).alias("q"),
    )
    expected = q.agg(
        F.expr("CAST(sum(q[0]) DIV count(1) AS BIGINT)").alias("m0"),
        F.expr("CAST(sum(q[1]) DIV count(1) AS BIGINT)").alias("m1"),
    ).collect()[0]
    out = kmeans.kmeans_cells(base, centroid_mod=100, iters=1, dims=2).collect()
    assert len(out) == 1 and out[0].n_vectors == 3
    import hashlib

    assert out[0].centroid_md5 == hashlib.md5(f"{expected.m0},{expected.m1}".encode()).hexdigest()


def test_kmeans_converged_assignment_is_stable(spark):
    # running one more iteration on an already-converged partition must not
    # change cells or counts (idempotence of the Lloyd fixed point)
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [0.1, 0.9]),
    ]
    a = kmeans.kmeans_cells(_emb(spark, rows), centroid_mod=3, iters=2, dims=2).collect()
    b = kmeans.kmeans_cells(_emb(spark, rows), centroid_mod=3, iters=3, dims=2).collect()
    assert sorted((r.cell, r.n_vectors) for r in a) == sorted((r.cell, r.n_vectors) for r in b)


def test_semantic_dedup_finds_in_cell_pairs(spark):
    # two clusters (seeds 1 and 4); ids 0 and 2 duplicate id 1's direction
    # exactly -> 3 near-identical members in the +x cell; the +y cell has
    # no dups at 0.99
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0, 0.0]),  # same direction, different norm
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.8, 0.6, 0.0]),  # pairwise cos <= 0.96 within the cell
        (5, [0.0, 0.6, 0.8, 0.0]),
    ]
    out = {r.cell: r for r in kmeans.semantic_dedup(
        _emb(spark, rows), centroid_mod=3, iters=1, dims=4, threshold=0.99
    ).collect()}
    assert len(out) == 2
    # cell ids carry over from the seed ids (1 -> +x, 4 -> +y) through the
    # one update round's GROUP BY
    x_cell, y_cell = out[1], out[4]
    # all three +x members pairwise cos=1.0 -> 3 pairs; keep-lowest leaves
    # ids 1 and 2 removable
    assert x_cell.n_vectors == 3 and x_cell.dup_pairs == 3 and x_cell.removable == 2
    assert y_cell.n_vectors == 3 and y_cell.dup_pairs == 0 and y_cell.removable == 0


def test_semantic_dedup_empty_when_threshold_high(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.8, 0.6, 0.0, 0.0]),
        (3, [0.6, 0.8, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    out = kmeans.semantic_dedup(
        _emb(spark, rows), centroid_mod=3, iters=1, dims=4, threshold=0.999
    ).collect()
    assert sum(r.dup_pairs for r in out) == 0
    assert sum(r.n_vectors for r in out) == 4


def test_pq_codes_separable_subspaces(spark):
    """Two clear clusters in EACH subspace: vectors 0-2 near +1 in both
    halves, 3-5 near -1. With centroid_mod=3 the init sample is {1, 4} per
    subspace, so every subspace's codebook separates the two groups."""
    from iceberg_meta_spark.pipeline import pq

    rows = []
    for i in range(6):
        sign = 1.0 if i < 3 else -1.0
        rows.append((i, [sign + 0.01 * i] * 4))
    emb = _emb(spark, rows)
    out = {r.vec_id: r for r in pq.pq_codes(emb, m=2, dims=4, centroid_mod=3, iters=1).collect()}
    assert len(out) == 6
    # same-group vectors share codes in every subspace; groups differ
    assert out[0].code == out[1].code == out[2].code
    assert out[3].code == out[4].code == out[5].code
    assert out[0].code != out[3].code
    # code string mirrors the subspace cells
    assert out[0].code == f"{out[0].s0}-{out[0].s1}"


def test_pq_codebook_balance_counts_sum_to_n(spark):
    from iceberg_meta_spark.pipeline import pq

    rows = [(i, [((i * 7 + d) % 5) / 5.0 for d in range(4)]) for i in range(12)]
    bal = pq.pq_codebook_summary(
        _emb(spark, rows), m=2, dims=4, centroid_mod=5, iters=1
    ).collect()
    per_sub = {}
    for r in bal:
        per_sub[r.subspace] = per_sub.get(r.subspace, 0) + r.n_vectors
    assert per_sub == {0: 12, 1: 12}


def test_adc_topk_recovers_cluster_neighbors(spark):
    """On a separable corpus the ADC approximation must put same-cluster
    vectors at the top: query 1 lives in the +1 cluster (ids 0-2)."""
    from iceberg_meta_spark.pipeline import pq

    rows = []
    for i in range(6):
        sign = 1.0 if i < 3 else -1.0
        rows.append((i, [sign + 0.01 * i] * 4))
    out = pq.adc_topk(
        _emb(spark, rows), query_ids=[1], k=2, m=2, dims=4, centroid_mod=3, iters=1
    ).collect()
    assert [r.rank for r in out] == [1, 2]
    assert {r.neighbor_id for r in out} <= {0, 2}  # own-cluster ids (self excluded)
    assert all(r.adc_s > 0 for r in out)


def test_adc_recall_on_clustered_corpus(spark):
    """ADC must preserve neighbor ranking when neighborhoods are resolvable
    at codebook granularity: 15 well-separated clusters of 6 vectors, one
    Lloyd seed per cluster — a query's exact top-5 are its 5 same-cluster
    peers, and ADC recall@5 vs exact brute force is >= 0.8. (Finer-than-cell
    ranking is unresolvable by construction for ANY product quantizer: all
    cell members share a code.)"""
    import numpy as np

    from iceberg_meta_spark.pipeline import pq

    def pattern(c):
        # half 1: binary code of c (distinct for every cluster); half 2: scrambled
        h1 = [1.0 if (c >> b) & 1 else -1.0 for b in range(4)]
        h2 = [1.0 if ((c * 5 + 3) >> b) & 1 else -1.0 for b in range(4)]
        return h1 + h2

    rows = []
    for i in range(1, 91):  # ids 1..90; cluster = (id-1)//6; seeds 1,7,...,85 — one per cluster
        c = (i - 1) // 6
        noise = [((i * 13 + d * 7) % 11 - 5) / 250.0 for d in range(8)]
        rows.append((i, [pattern(c)[d] + noise[d] for d in range(8)]))
    emb = _emb(spark, rows)
    qid = 2  # cluster 0; its 5 peers are ids 1, 3, 4, 5, 6
    out = pq.adc_topk(emb, query_ids=[qid], k=5, m=2, dims=8, centroid_mod=6, iters=1).collect()
    adc_top = {r.neighbor_id for r in out}

    X = np.array([r[1] for r in rows])
    ids = np.array([r[0] for r in rows])
    q = X[ids == qid][0]
    exact = (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    mask = ids != qid
    exact_top = set(ids[mask][np.argsort(-exact[mask])][:5])
    assert exact_top == {1, 3, 4, 5, 6}  # the construction holds
    recall = len(adc_top & exact_top) / 5
    assert recall >= 0.8, (recall, adc_top, exact_top)


def test_round3_kernels_handle_empty_inputs(spark):
    """Schema-stable empties for the round-3 kernels: no rows, correct
    columns, no crashes (mirrors the maintenance empty-input sweep)."""
    from iceberg_meta_spark.pipeline import pq
    from iceberg_meta_spark.pipeline.corpus import hybrid_retrieval, lm_familiarity_scores

    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )
    out = pq.pq_codes(empty_emb, m=2, dims=4, centroid_mod=3, iters=1)
    assert out.columns == ["vec_id", "s0", "s1", "code"] and out.count() == 0
    assert pq.pq_codebook_summary(empty_emb, m=2, dims=4, centroid_mod=3).count() == 0
    adc = pq.adc_topk(empty_emb, query_ids=[1], k=3, m=2, dims=4, centroid_mod=3)
    assert adc.columns == ["query_id", "rank", "neighbor_id", "adc_s"] and adc.count() == 0
    lm = lm_familiarity_scores(empty_docs)
    assert lm.columns == ["doc_id", "n_bigrams", "mean_familiarity", "low_familiarity"]
    assert lm.count() == 0
    hy = hybrid_retrieval(empty_docs, empty_emb, terms=("x",), query_vec_id=1)
    assert hy.columns == ["rank", "doc_id", "bm25_rank", "cos_rank", "rrf_scaled"]
    assert hy.count() == 0


def test_pq_codebook_persistence_roundtrip(spark, tmp_path):
    """Train -> save -> load -> encode must equal encoding with the
    in-memory codebooks bit for bit (the index-shipping lifecycle)."""
    from iceberg_meta_spark.pipeline import pq

    rows = [(i, [((i * 7 + d) % 5) / 5.0 for d in range(4)]) for i in range(20)]
    emb = _emb(spark, rows)
    base, books = pq.train_codebooks(emb, m=2, dims=4, centroid_mod=5, iters=1)
    path = str(tmp_path / "pq_index")
    pq.save_codebooks(spark, books, path)
    loaded = pq.load_codebooks(spark, path)
    assert loaded == [sorted(b) for b in books]
    direct = {r.vec_id: r for r in pq._encode(base, books, 2).collect()}
    via_disk = {r.vec_id: r for r in pq._encode(base, loaded, 2).collect()}
    assert {k: (v.s0, v.s1) for k, v in direct.items()} == {
        k: (v.s0, v.s1) for k, v in via_disk.items()
    }


def test_ivf_pq_probes_prune_and_rank(spark):
    """Separable clusters: the probe restricts candidates to the query's
    nearest cells and ADC ranks in-cluster neighbors first; with nprobe
    covering all cells the result superset grows, never shrinks."""
    from iceberg_meta_spark.pipeline import pq

    rows = []
    for i in range(1, 13):  # ids 1..12, cluster = (id-1)//6; seeds 1, 7 (mod 6)
        c = (i - 1) // 6
        pat = [1.0, -1.0, 1.0, 1.0] if c == 0 else [-1.0, 1.0, -1.0, 1.0]
        rows.append((i, [pat[d] + ((i * 11 + d) % 7 - 3) / 100.0 for d in range(4)]))
    emb = _emb(spark, rows)
    narrow = pq.ivf_pq_topk(
        emb, query_ids=[2], k=3, nprobe=1, ivf_mod=6, m=2, dims=4, pq_mod=6
    ).collect()
    assert {r.neighbor_id for r in narrow} <= set(range(1, 7)) - {2}  # own cluster only
    wide = pq.ivf_pq_topk(
        emb, query_ids=[2], k=10, nprobe=2, ivf_mod=6, m=2, dims=4, pq_mod=6
    ).collect()
    assert {r.neighbor_id for r in narrow} <= {r.neighbor_id for r in wide}
    assert len(wide) > len(narrow)


def test_ivf_pq_refined_orders_by_exact_cosine(spark):
    """Refinement must recover exact-cosine order within the probed region:
    on the resolvable-cluster corpus the refined top-5 equals the exact
    brute-force top-5 (PQ codes alone cannot rank inside a cell)."""
    import numpy as np

    from iceberg_meta_spark.pipeline import pq

    def pattern(c):
        h1 = [1.0 if (c >> b) & 1 else -1.0 for b in range(4)]
        h2 = [1.0 if ((c * 5 + 3) >> b) & 1 else -1.0 for b in range(4)]
        return h1 + h2

    rows = []
    for i in range(1, 91):
        c = (i - 1) // 6
        noise = [((i * 13 + d * 7) % 11 - 5) / 250.0 for d in range(8)]
        rows.append((i, [pattern(c)[d] + noise[d] for d in range(8)]))
    emb = _emb(spark, rows)
    qid = 2
    out = pq.ivf_pq_refined_topk(
        emb, query_ids=[qid], k=5, shortlist=10, nprobe=2,
        ivf_mod=6, m=2, dims=8, pq_mod=6,
    ).collect()

    X = np.array([r[1] for r in rows]); ids = np.array([r[0] for r in rows])
    q = X[ids == qid][0]
    exact = (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    mask = ids != qid
    order = ids[mask][np.argsort(-exact[mask])]
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == list(order[:5])


def test_ann_eval_harness(spark):
    """The recall harness runs end-to-end at sf0.001 and scores at least
    the PQ-code variants against the exact baseline; refinement can never
    score below plain IVF-PQ on the same shortlist region."""
    import tools.ann_eval as ae

    report = ae.evaluate(spark, "/root/testdata/sf0.001", k=5)
    scored = {n: r for n, r in report.items() if r["recall_at_k"] is not None}
    assert {"ann_pq_adc", "ann_ivf_pq", "ann_ivf_pq_refined"} <= set(scored)
    assert scored["ann_ivf_pq_refined"]["recall_at_k"] >= scored["ann_ivf_pq"]["recall_at_k"]


def test_pq_codebook_persistence_empty_roundtrip(spark, tmp_path):
    """Codebooks trained on an empty corpus round-trip as [] (save writes an
    empty table; load must not crash on max() of nothing)."""
    from iceberg_meta_spark.pipeline import pq

    path = str(tmp_path / "pq_empty")
    pq.save_codebooks(spark, [], path)
    assert pq.load_codebooks(spark, path) == []


def test_knn_graph_ranks_in_cell_neighbors(spark):
    """Two separable clusters (centroid_mod=3 seeds one per cluster): each
    vector's top neighbor is its nearest in-cell sibling, ranks are dense
    from 1, self edges are excluded, and no edge crosses cells."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.05, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.05]),
        (5, [0.0, 0.1, 0.9, 0.0]),
    ]
    out = kmeans.knn_graph(_emb(spark, rows), centroid_mod=3, iters=1, dims=4, k=2).collect()
    by_vec = {}
    for r in out:
        assert r.vec_id != r.neighbor_id
        by_vec.setdefault(r.vec_id, []).append(r)
    x_cluster, y_cluster = {0, 1, 2}, {3, 4, 5}
    for vid, edges in by_vec.items():
        ranks = [e.rank for e in sorted(edges, key=lambda e: e.rank)]
        assert ranks == list(range(1, len(edges) + 1))
        # cos_sim non-increasing with rank
        sims = [e.cos_sim for e in sorted(edges, key=lambda e: e.rank)]
        assert sims == sorted(sims, reverse=True)
        side = x_cluster if vid in x_cluster else y_cluster
        assert all(e.neighbor_id in side for e in edges)
    # 0 and 1 are near-parallel: each is the other's rank-1 neighbor
    assert by_vec[0][0].neighbor_id == 1 and by_vec[1][0].neighbor_id == 0
