"""Deduplication kernels for large-scale training-data pipelines.

All kernels are expression-only (no Python UDFs): shingling via
split/sequence/element_at, hashing via md5 — JVM-side, whole-stage-codegen,
Arrow-free. Designed so the exact same relational shape runs on 10⁹ docs:
per-doc work is linear, candidate generation is an equi-join on (band, sig)
buckets (shuffle on a well-distributed hash key), never an all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dup_groups(docs: DataFrame, prefix_tokens: int = 3) -> DataFrame:
    """Exact-duplicate groups by md5 of the first-k-token normalized prefix.

    Scale: one groupBy on a 128-bit hash key — the canonical exact-dedup
    shape (hash, shuffle on hash, keep min id per group).
    """
    key = F.md5(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, prefix_tokens)))
    return (
        docs.select(F.col("doc_id"), key.alias("dup_key"))
        .groupBy("dup_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _word_shingles(
    docs: DataFrame, k: int, distinct: bool = True, carry: tuple[str, ...] = ()
) -> DataFrame:
    """k-word shingles per doc: (doc_id[, carry...], shingle).

    ``distinct=True`` (set semantics, one shuffle) feeds Jaccard kernels;
    MinHash skips it — min() is duplicate-insensitive, so deduplicating first
    would add a full shuffle of every shingle row for nothing.
    """
    toks = F.split(F.col("text"), " ")
    base = docs.select("doc_id", *carry, toks.alias("toks")).withColumn("n", F.size("toks"))
    base = base.filter(F.col("n") >= k)
    idx = F.explode(F.sequence(F.lit(1), F.col("n") - (k - 1))).alias("i")
    exploded = base.select("doc_id", *carry, "toks", idx)
    parts = [F.element_at("toks", F.col("i") + j) for j in range(k)]
    out = exploded.select("doc_id", *carry, F.concat_ws(" ", *parts).alias("shingle"))
    return out.dropDuplicates(["doc_id", "shingle"]) if distinct else out


def minhash_signature_arrays(
    docs: DataFrame, num_hashes: int = 8, shingle_k: int = 2, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id[, carry...], sig: array<string>): all ``num_hashes`` MinHashes
    in ONE aggregate pass over the shingles.

    Hash family: md5(seed ':' shingle), min taken lexicographically on the
    hex digest — deterministic and identical in any engine. Computing every
    seed's md5 inline (codegen'd CPU) and min-aggregating them side by side
    shuffles each shingle row once — not once per seed, which multiplies
    shuffle volume by ``num_hashes`` at 10⁹ docs.

    ``carry`` columns (functionally dependent on doc_id, e.g. ``source``)
    join the groupBy key and ride through — downstream consumers get doc
    metadata without an N⋈N back-join against the corpus.
    """
    sh = _word_shingles(docs.select("doc_id", "text", *carry), shingle_k, distinct=False, carry=carry)
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{seed}:"), F.col("shingle")))).alias(f"mh_{seed}")
        for seed in range(num_hashes)
    ]
    wide = sh.groupBy("doc_id", *carry).agg(*mins)
    return wide.select(
        "doc_id", *carry, F.array(*[F.col(f"mh_{s}") for s in range(num_hashes)]).alias("sig")
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 8, shingle_k: int = 2) -> DataFrame:
    """(doc_id, seed, mh): long-format MinHash signatures (band rows)."""
    wide = minhash_signature_arrays(docs, num_hashes, shingle_k)
    return wide.select("doc_id", F.posexplode("sig").alias("seed", "mh"))


def minhash_band_rows(
    docs: DataFrame,
    num_hashes: int = 8,
    shingle_k: int = 2,
    band_size: int = 2,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id[, carry...], sig, band_idx, band_key): one row per document per
    LSH band — the indexable unit shared by the batch pair join and the
    streaming ingest-dedup signature store (streaming/lsh.py)."""
    n_bands_total = num_hashes // band_size
    wide = minhash_signature_arrays(docs, num_hashes, shingle_k, carry=carry)
    band_keys = F.array(
        *[
            F.concat_ws("|", *[F.col("sig")[b * band_size + r] for r in range(band_size)])
            for b in range(n_bands_total)
        ]
    )
    return wide.select(
        "doc_id", *carry, "sig", F.posexplode(band_keys).alias("band_idx", "band_key")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    shingle_k: int = 2,
    band_size: int = 2,
    min_bands: int = 1,
) -> DataFrame:
    """MinHash-LSH candidate pairs via b×r banding: the signature splits into
    ``num_hashes/band_size`` bands of ``band_size`` consecutive minhashes; a
    pair is a candidate when >= min_bands whole bands collide. Estimated
    Jaccard = matching minhashes / num_hashes.

    Scale: candidates come from an equi-join on (band_idx, band_key) — each
    bucket joins only within itself, no O(N²) pair enumeration. Band size r
    tunes the collision threshold (~(1/b)^(1/r)); r=2 keeps buckets sharp
    where single-hash bands degenerate into giant buckets on repetitive
    corpora. The Jaccard estimate is an array compare of the two (tiny)
    signature arrays, so the estimation joins move one row per doc, not one
    per (doc, seed).
    """
    # the band table feeds BOTH sides of the self-join; without the (lazy)
    # checkpoint each side re-runs the whole shingle-explode + 8-md5 +
    # signature-aggregate pipeline (measured 2× cost at sf0.1: 1.65 s vs
    # 0.45 s) — materializing the index before a self-join is the §3.3
    # plan-truncation idiom, and at 10⁹ docs it trades one corpus-sized
    # spill-able store for a second full hash pass over the corpus
    bands = minhash_band_rows(docs, num_hashes, shingle_k, band_size).localCheckpoint(
        eager=False
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), "band_idx", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), "band_idx", "band_key"
    )
    # signatures ride along through the band join (~35 bytes/hash/row) so the
    # Jaccard estimate needs NO back-join — the two joins the naive plan pays
    # to re-attach sigs to candidates dominate at 10⁹ docs.
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("m", matches)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands"), F.first("m").alias("m"))
        .filter(F.col("n_bands") >= min_bands)
        .select(
            "doc_a",
            "doc_b",
            "n_bands",
            F.round(F.col("m").cast("double") / F.lit(num_hashes), 4).alias("est_jaccard"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    shingle_k: int = 2,
    df_cap: int = 8,
    min_containment: float = 0.5,
) -> DataFrame:
    """Asymmetric near-dup detection by n-gram CONTAINMENT —
    ``|A∩B| / min(|A|,|B|)`` — the signal Jaccard misses when a small
    document is quoted inside a much larger one (their union dwarfs the
    intersection, so Jaccard stays low while containment is ~1).

    Candidate generation is a frequency-capped inverted index (the classic
    prefix-filter shape of PPJoin-family algorithms): only shingles shared
    by 2..``df_cap`` documents generate pairs, so a shingle contributes at
    most df_cap² candidate rows no matter how big the corpus — boilerplate
    grams that appear everywhere are excluded from candidate generation
    (they carry no discriminative signal) but still count in the exact
    intersection, which runs only over the candidates.

    Scale: shingle df is one map-side-combined groupBy; candidates are an
    equi-join on the rare-shingle key (bounded fan-out by construction);
    verification is candidate × shingles-per-doc, never block².
    """
    # four consumers of the distinct shingle set (df census, candidate
    # generation ×2, sizes, intersection ×2) — one lazy checkpoint instead
    # of re-running the explode+dropDuplicates pipeline per consumer (§3.3)
    sh = _word_shingles(docs, shingle_k).localCheckpoint(eager=False)
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= df_cap))
        .select("shingle")
    )
    rare_sh = sh.join(rare, "shingle")
    cand = (
        rare_sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(rare_sh.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    cont = F.round(
        F.col("n_inter").cast("double") / F.least(F.col("n_a"), F.col("n_b")), 4
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .select("doc_a", "doc_b", "n_inter", cont.alias("containment"))
        .filter(F.col("containment") >= min_containment)
    )


def novel_batch_docs(
    corpus: DataFrame,
    batch: DataFrame,
    num_hashes: int = 8,
    shingle_k: int = 2,
    band_size: int = 2,
) -> DataFrame:
    """Incremental corpus growth: which INCOMING documents are novel vs the
    existing corpus? A doc is flagged as a duplicate candidate when ANY of
    its LSH bands collides with a band already present in the corpus —
    the batch analog of the streaming ingest-dedup probe (streaming/lsh.py),
    and the shape a crawl pipeline runs nightly: never re-pair the corpus
    against itself, only probe the new rows against the signature store.

    Scale: the store is the distinct (band_idx, band_key) table — built once
    and persisted at deployment (here derived inline); the probe is ONE
    left-semi equi-join of batch band rows against it, so per-night work is
    O(batch × bands) regardless of corpus size.
    """
    store = (
        minhash_band_rows(corpus, num_hashes, shingle_k, band_size)
        .select("band_idx", "band_key")
        .distinct()
    )
    collided = (
        minhash_band_rows(batch, num_hashes, shingle_k, band_size)
        .join(store, ["band_idx", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return batch.select("doc_id", "lang").join(collided, "doc_id", "left").select(
        "doc_id", "lang", F.coalesce(F.col("hit"), F.lit(False)).alias("dup_candidate")
    )


def source_overlap_matrix(
    docs: DataFrame,
    num_hashes: int = 8,
    shingle_k: int = 2,
    band_size: int = 2,
) -> DataFrame:
    """Cross-source duplication audit: how much does each pair of sources
    (crawls, dumps, vendors) duplicate each other?  One row per unordered
    source pair with the count of distinct LSH near-dup candidate pairs
    spanning them — the matrix a curation team reads before paying to
    ingest (or re-weight) an overlapping source.  Diagonal rows
    (source_x = source_y) measure within-source redundancy.

    Scale: the ``source`` tag rides the band rows through the equi-join the
    same way signatures do (it joins the minhash groupBy key — functionally
    dependent on doc_id, so group cardinality is unchanged), so candidates
    arrive already labeled: no back-join of the pair list against the
    corpus.  The pair-distinct and the matrix rollup aggregate candidate
    pairs, a set LSH already bounded far below N².
    """
    # lazy checkpoint: both self-join sides read ONE materialized band
    # table instead of re-running the minhash pipeline (see
    # minhash_lsh_pairs)
    bands = minhash_band_rows(
        docs, num_hashes, shingle_k, band_size, carry=("source",)
    ).localCheckpoint(eager=False)
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a"), "band_idx", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b"), "band_idx", "band_key"
    )
    pairs = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "source_a", "source_b")
        .distinct()
    )
    return (
        pairs.select(
            F.least("source_a", "source_b").alias("source_x"),
            F.greatest("source_a", "source_b").alias("source_y"),
        )
        .groupBy("source_x", "source_y")
        .agg(F.count(F.lit(1)).alias("dup_pairs"))
        .orderBy("source_x", "source_y")
    )


def simhash_groups(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash (``bits``-bit) per doc from token md5s; grouped signatures.

    Bit j weight = +1/-1 by bit j of md5(token) (hex-digit arithmetic —
    portable across engines); signature bit = sign of the weighted sum.
    """
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    h = tok.select("doc_id", F.md5("tok").alias("hx"))
    b = h.select(
        "doc_id",
        "hx",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
    )
    with_digit = b.withColumn(
        "digit", F.expr("CAST(conv(substring(hx, 1 + CAST(bit DIV 4 AS INT), 1), 16, 10) AS INT)")
    )
    w = F.expr(
        "CASE WHEN (digit DIV CAST(pow(2, bit % 4) AS INT)) % 2 = 1 THEN 1 ELSE -1 END"
    )
    bitvals = (
        with_digit.select("doc_id", "bit", w.alias("w"))
        .groupBy("doc_id", "bit")
        .agg(F.when(F.sum("w") > 0, 1).otherwise(0).alias("bitval"))
    )
    sig = bitvals.groupBy("doc_id").agg(
        F.sum(F.col("bitval") * F.pow(F.lit(2.0), F.col("bit")).cast("long")).alias("simhash")
    )
    return sig.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    shingle_k: int = 2,
    min_jaccard: float = 0.2,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Exact n-gram Jaccard, LSH-then-verify: candidate pairs come from the
    MinHash band join (:func:`minhash_lsh_pairs`); the exact shingle-set
    intersection runs ONLY for those candidates.

    Scale: the earlier (lang, source) blocked self-join went quadratic the
    moment one block dominated the corpus (at 100 TB a single (en, crawl)
    block IS the corpus). Here the quadratic term is gone entirely: candidate
    generation is the banded equi-join, and verification fans each candidate
    pair out over one doc's shingles and equi-joins on (doc_id, shingle) —
    work proportional to candidates × shingles/doc, not block².
    """
    cand = minhash_lsh_pairs(
        docs, num_hashes=num_hashes, shingle_k=shingle_k, band_size=band_size, min_bands=1
    ).select("doc_a", "doc_b")
    # the distinct shingle set feeds THREE consumers (sizes + both sides of
    # the intersection join): one lazy checkpoint replaces three
    # explode+dropDuplicates pipeline runs (§3.3 — see minhash_lsh_pairs)
    sh = _word_shingles(docs, shingle_k).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.round(
        F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        4,
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "n_inter", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )


def substring_dup_stats(docs: DataFrame, window_tokens: int = 20) -> DataFrame:
    """Exact substring-level dedup audit (the suffix-array result of
    "Deduplicating Training Data Makes Language Models Better", Lee et al.
    2022, recast for Spark): every ``window_tokens``-token sliding window is
    hashed; a window whose hash appears in >= 2 DISTINCT documents is a
    duplicated span. Returns per-doc (doc_id, n_windows, n_dup_windows,
    dup_permille) — the fraction of the document covered by cross-document
    boilerplate, ordered by doc_id.

    Scale shape: windows are linear in corpus tokens (one explode); the
    duplicated-span flag is ONE analytic window PARTITIONED by the md5 key
    ("appears in >= 2 distinct docs" ⟺ min(doc_id) ≠ max(doc_id) within
    the hash partition — no count_distinct expansion, no ordering), so the
    hash pipeline runs ONCE and one exchange replaces the r12 shape's
    groupBy + equi-join back (which evaluated the window explode twice and
    paid two count_distinct exchanges). Never a pair join. Documents
    shorter than the window are excluded (no full window exists).
    """
    w = window_tokens
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= w
    )
    wins = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) - {w}),"
                f" i -> md5(concat_ws(' ', slice(t, i + 1, {w}))))"
            )
        ).alias("h"),
    )
    from pyspark.sql import Window

    per_h = Window.partitionBy("h")
    flagged = wins.select(
        "doc_id",
        (F.min("doc_id").over(per_h) != F.max("doc_id").over(per_h)).alias("dup"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum(F.when(F.col("dup"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.expr("CAST(n_dup_windows * 1000 DIV n_windows AS BIGINT)").alias(
                "dup_permille"
            ),
        )
        .orderBy("doc_id")
    )


def boilerplate_spans(
    docs: DataFrame, window_tokens: int = 20, top_k: int = 20
) -> DataFrame:
    """The most widely repeated ``window_tokens``-token spans across the
    corpus — the "find the boilerplate" companion of
    :func:`substring_dup_stats`: (rank, n_docs, span), top-k by document
    count (ties broken by span text for determinism).

    Same linear window explode; the top-k itself is orderBy().limit() —
    Spark compiles that to TakeOrderedAndProject (per-partition heaps, no
    global sort, no unpartitioned window over the span set); only the <= k
    survivors pass through the rank window.
    """
    w = window_tokens
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= w
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) - {w}),"
                f" i -> concat_ws(' ', slice(t, i + 1, {w})))"
            )
        ).alias("span"),
    )
    counts = (
        spans.groupBy("span")
        .agg(F.count_distinct("doc_id").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    from pyspark.sql import Window

    top = counts.orderBy(F.desc("n_docs"), F.asc("span")).limit(top_k)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("n_docs"), F.asc("span"))),
    ).select("rank", "n_docs", "span")


def substring_removal_stats(docs: DataFrame, window_tokens: int = 20) -> DataFrame:
    """The REMOVAL step of exact substring dedup (Lee et al. 2022 cut,
    not just the audit): of every duplicated ``window_tokens``-token
    window (hash in >= 2 distinct docs), the corpus keeps exactly the
    FIRST occurrence — min (doc_id, position) — and cuts all others; a
    token is removed when any cut window covers it. Returns per doc
    (doc_id, n_tokens, n_removed, removed_permille) over the WHOLE
    corpus (docs with no removable span report 0).

    Mechanics: windows are one linear explode; df + canonical occurrence
    come from ONE analytic window PARTITIONED by the md5 key ("df >= 2"
    ⟺ min(doc_id) ≠ max(doc_id) in the hash partition, canon = min of a
    (doc_id, pos) struct — no ordering, no count_distinct expansion), so
    the hash pipeline runs ONCE and one exchange replaces the r12 shape's
    groupBy + equi-join back (two full evaluations of the window explode
    plus two count_distinct exchanges); removed mass is the union length
    of the cut intervals, computed with the standard sweep — running max
    of interval ends in a window PARTITIONED BY doc_id, contribution
    ``max(0, end - max(start, prev_max_end))`` — so per-doc work is
    linear and no global funnel exists. The final left join restores
    uncut docs.
    """
    w = window_tokens
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    wins = toks.where(F.size("t") >= w).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) - {w}),"
                f" i -> struct(i AS i, md5(concat_ws(' ', slice(t, i + 1, {w}))) AS h))"
            )
        ).alias("x"),
    ).select("doc_id", F.col("x.i").alias("i"), F.col("x.h").alias("h"))
    from pyspark.sql import Window

    per_h = Window.partitionBy("h")
    cut = (
        wins.select(
            "doc_id",
            "i",
            (F.min("doc_id").over(per_h) != F.max("doc_id").over(per_h)).alias("dup"),
            F.min(F.struct("doc_id", "i")).over(per_h).alias("canon"),
        )
        .where(
            F.col("dup")
            & ~(
                (F.col("doc_id") == F.col("canon.doc_id"))
                & (F.col("i") == F.col("canon.i"))
            )
        )
        .select("doc_id", "i")
    )

    sweep = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = cut.withColumn(
        "prev_end", F.coalesce(F.max(F.col("i") + w).over(sweep), F.lit(0))
    ).select(
        "doc_id",
        F.greatest(
            F.lit(0), F.col("i") + w - F.greatest(F.col("i"), F.col("prev_end"))
        ).alias("c"),
    )
    removed = contrib.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_removed")
    )
    base = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return (
        base.join(removed, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.expr(
                "CAST(coalesce(n_removed, 0) * 1000 DIV n_tokens AS BIGINT)"
            ).alias("removed_permille"),
        )
        .orderBy("doc_id")
    )


def dedup_impact(docs: DataFrame, prefix_tokens: int = 3) -> DataFrame:
    """Per-source dedup decision support: if exact dedup (keep-min-doc-id,
    same policy as :func:`exact_dup_groups`) ran now, how many docs and
    tokens would each source lose?

    The report a curation team reads BEFORE spending a cluster-day on the
    actual rewrite — and the per-source attribution shows which crawl is
    redundant. Scale shape: one groupBy on the 128-bit fingerprint for the
    keeper ids, then a key-local equi-join back (both sides hash-partition
    on dup_key) and one per-source aggregate. No window, no all-pairs.
    """
    key = F.md5(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, prefix_tokens)))
    per_doc = docs.select(
        "doc_id",
        "source",
        key.alias("dup_key"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    keep = per_doc.groupBy("dup_key").agg(F.min("doc_id").alias("keep_id"))
    kept = F.col("doc_id") == F.col("keep_id")
    return (
        per_doc.join(keep, "dup_key")
        .groupBy("source")
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
