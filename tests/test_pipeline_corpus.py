"""Unit tests for the corpus-statistics kernels (pipeline/corpus.py) on
handcrafted corpora with known answers. Oracle parity at sf0.01 is covered by
tests/test_oracle_parity.py; these pin the semantics directly — in particular
the PII regex behavior, which the synthetic corpus (zero matches) can't.
"""

from __future__ import annotations

from iceberg_meta_spark.pipeline import corpus


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src") for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string",
    )


def test_top_ngrams_counts_and_tiebreak(spark):
    out = corpus.top_ngrams(_docs(spark, ["a b a b", "a b c", "x"]), n=2, k=3).collect()
    assert [(r.ngram, r.occurrences) for r in out] == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_vocabulary_stats(spark):
    out = corpus.vocabulary_stats(_docs(spark, ["a a b", "a c"])).collect()
    assert len(out) == 1
    r = out[0]
    assert r.total_tokens == 5 and r.vocab_size == 3
    assert r.hapax_count == 2  # b, c
    assert r.type_token_ratio == 0.6


def test_token_rarity_flags_rare_heavy(spark):
    # 'common' dominates the corpus; doc 1 is all-hapax -> rare_heavy
    rows = ["common common common common common common", "rare1 rare2 rare3"]
    out = {r.doc_id: r for r in corpus.token_rarity_scores(_docs(spark, rows)).collect()}
    assert out[0].rare_heavy is False
    assert out[1].rare_heavy is True
    assert out[0].mean_commonness > out[1].mean_commonness
    # weights: common=6/9, rare=1/9 of 1e9 (floor)
    assert out[1].mean_commonness == (1 * corpus.COMMONNESS_SCALE) // 9


def test_token_rarity_oov_scores_zero(spark):
    rows = ["seen seen", "unseen"]
    out = corpus.token_rarity_scores(_docs(spark, rows), vocab_cap=1).collect()
    by_id = {r.doc_id: r for r in out}
    # vocab_cap=1 keeps only 'seen' (count 2 beats 1); 'unseen' is OOV -> 0
    assert by_id[1].mean_commonness == 0 and by_id[1].min_commonness == 0


def test_pii_scrub_detects_and_redacts(spark):
    rows = [
        "contact me at alice.smith+x@example.co.uk today",
        "server 192.168.0.1 and 10.0.0.255 up",
        "call +1 555 123-4567 now",
        "no pii here at all",
    ]
    out = {r.doc_id: r for r in corpus.pii_scrub(_docs(spark, rows)).collect()}
    assert out[0].n_emails == 1 and out[0].n_redactions == 1
    assert out[1].n_ips == 2 and out[1].n_emails == 0
    assert out[2].n_phones == 1
    assert out[3].n_redactions == 0
    # redaction actually removed the PII text: md5 differs from raw for hits
    raw = {r.doc_id: r.redacted_md5 for r in corpus.pii_scrub(_docs(spark, rows)).collect()}
    import hashlib

    assert raw[3] == hashlib.md5(rows[3].encode()).hexdigest()  # untouched doc
    assert raw[0] == hashlib.md5(b"contact me at <EMAIL> today").hexdigest()
    assert raw[2] == hashlib.md5(b"call <PHONE> now").hexdigest()


def test_duplicated_ngram_share_detects_shared_gram(spark):
    # docs 0 and 1 share one 3-gram ("a b c"); doc 2 shares nothing
    rows = ["a b c d", "x a b c", "p q r s"]
    out = {
        r.doc_id: r
        for r in corpus.duplicated_ngram_share(_docs(spark, rows), n=3).collect()
    }
    assert out[0].n_grams == 2 and out[0].dup_grams == 1
    assert out[1].n_grams == 2 and out[1].dup_grams == 1
    assert out[2].dup_grams == 0 and out[2].dup_permille == 0
    assert out[0].dup_permille == 500


def test_duplicated_ngram_share_counts_repeated_positions(spark):
    # the shared gram occupies BOTH positions of doc 0 (text is "a b a b" ->
    # 3-grams "a b a", "b a b"; doc 1 repeats them) -> every position dup
    rows = ["a b a b", "a b a b"]
    out = corpus.duplicated_ngram_share(_docs(spark, rows), n=3).collect()
    assert all(r.dup_grams == r.n_grams and r.dup_permille == 1000 for r in out)


def test_duplicated_ngram_share_short_docs(spark):
    # doc shorter than n contributes zero grams and survives with 0/0 -> 0
    rows = ["a b", "a b c d e"]
    out = {
        r.doc_id: r
        for r in corpus.duplicated_ngram_share(_docs(spark, rows), n=3).collect()
    }
    assert out[0].n_grams == 0 and out[0].dup_permille == 0


def test_bm25_favors_term_dense_docs(spark):
    from iceberg_meta_spark.pipeline.corpus import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "hash hash hash join"),       # dense in query terms
            (2, "hash filter scan sort"),     # one hit
            (3, "filter scan sort merge"),    # no hits
            (4, "join join table table table table table table"),  # long doc, diluted
        ],
        "doc_id long, text string",
    )
    rows = bm25_scores(docs, ("hash", "join"), topk=10).collect()
    got = {r.doc_id: r for r in rows}
    assert 3 not in got  # no matching term -> no row
    assert got[1].n_terms_matched == 2
    # doc 1 (3x hash + join, short) outscores doc 2 (1x hash)
    assert got[1].score_scaled > got[2].score_scaled
    # length normalization: doc 4's joins are diluted by its length vs doc 1
    assert got[1].score_scaled > got[4].score_scaled
    # ordering contract: desc score, asc doc_id
    scores = [r.score_scaled for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_pps_sample_weighted_and_deterministic(spark):
    from iceberg_meta_spark.pipeline.sampling import pps_sample

    rows = [(i, "a", 1) for i in range(100)] + [(1000, "a", 500)] + [
        (i, "b", 10) for i in range(2000, 2050)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = pps_sample(df, "doc_id", "n_chars", "lang", k=5).collect()
    by = {}
    for r in out:
        by.setdefault(r.lang, []).append(r)
    # uniform stratum b: systematic PPS returns ~k rows (can drift by 1)
    assert 4 <= len(by["b"]) <= 6
    # skewed stratum a (one row holds 500/600 of the weight): the heavy row
    # absorbs most boundary crossings but is emitted ONCE — fewer distinct
    # rows than k is correct PPS behavior, and the heavy row is ALWAYS in
    assert any(r.doc_id == 1000 for r in by["a"])
    assert 2 <= len(by["a"]) <= 5
    # deterministic across partitionings
    out2 = pps_sample(df.repartition(13), "doc_id", "n_chars", "lang", k=5).collect()
    assert {(r.lang, r.doc_id) for r in out2} == {(r.lang, r.doc_id) for r in out}


def test_lm_familiarity_conditional_probabilities(spark):
    # corpus: "a b a b" -> bigrams (a b)x2, (b a)x1 ; "a c" -> (a c)x1
    # prefix totals: a. = 3 (a b, a b, a c), b. = 1 (b a)
    # weights: w(a b) = (2*1e9) DIV 3 = 666666666 ; w(b a) = 1e9 ; w(a c) = 333333333
    out = {
        r.doc_id: r
        for r in corpus.lm_familiarity_scores(_docs(spark, ["a b a b", "a c"])).collect()
    }
    d0, d1 = out[0], out[1]
    assert d0.n_bigrams == 3
    # doc0 mean = (666666666 + 1000000000 + 666666666) DIV 3
    assert d0.mean_familiarity == (666666666 + 1000000000 + 666666666) // 3
    assert d1.n_bigrams == 1 and d1.mean_familiarity == 333333333
    # expected_w = (2*666666666 + 1*1000000000 + 1*333333333) DIV 4 = 666666666
    # low flag: mean*2 < expected -> neither doc here
    assert not d0.low_familiarity and not d1.low_familiarity


def test_lm_familiarity_drops_single_token_docs(spark):
    out = corpus.lm_familiarity_scores(_docs(spark, ["only", "a b"])).collect()
    assert [r.doc_id for r in out] == [1]


def test_lm_familiarity_oov_scores_zero(spark):
    # cap the model to 1 bigram: only the most frequent (count desc, text asc)
    # stays; every other bigram backs off to weight 0
    out = {
        r.doc_id: r
        for r in corpus.lm_familiarity_scores(
            _docs(spark, ["a b a b", "x y"]), vocab_cap=1
        ).collect()
    }
    # kept bigram: (a b) cnt=2; w = (2*1e9) DIV 2 = 1e9 (prefix a. = 2)
    assert out[0].mean_familiarity == (1000000000 + 0 + 1000000000) // 3
    assert out[1].mean_familiarity == 0 and out[1].low_familiarity


def test_hybrid_retrieval_fuses_bm25_and_cosine(spark):
    """Handcrafted corpus: doc 0 is the keyword hit, doc 1 is the semantic
    hit; RRF must surface both, and a doc missing its embedding row is
    dropped (it cannot be reranked)."""
    docs = _docs(spark, ["hash join spark", "query engine", "hash hash", "noise"])
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            # doc 2 has NO embedding row
            (3, [0.0, 1.0]),
            (9, [1.0, 0.05]),  # the query vector
        ],
        "vec_id long, embedding array<float>",
    )
    out = corpus.hybrid_retrieval(
        docs, emb, terms=("hash", "join"), query_vec_id=9, topk_bm25=3, k=5
    ).collect()
    # BM25 candidates: docs 0 and 2 (doc 2 dropped: no embedding) — doc 0 survives
    ids = [r.doc_id for r in out]
    assert 0 in ids and 2 not in ids and 3 not in ids
    r0 = next(r for r in out if r.doc_id == 0)
    assert r0.rank == 1 and r0.rrf_scaled > 0
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(range(1, len(out) + 1))


def test_longest_dup_span_finds_planted_run(spark):
    """Two docs share a 12-token span (5 consecutive 8-gram positions);
    a third doc is unrelated and reports nothing."""
    shared = " ".join(f"s{i}" for i in range(12))
    docs = _docs(
        spark,
        [
            "x1 x2 " + shared + " x3 x4",
            "y1 " + shared + " y2 y3 y4",
            " ".join(f"z{i}" for i in range(16)),
        ],
    )
    out = {r.doc_id: r for r in corpus.longest_dup_span(docs, n=8).collect()}
    assert set(out) == {0, 1}
    # 12 shared tokens -> 12-8+1 = 5 consecutive dup positions -> span 12
    assert out[0].longest_run == 5 and out[0].span_tokens == 12
    assert out[1].longest_run == 5 and out[1].span_tokens == 12


def test_tfidf_keywords_rare_term_wins_over_ubiquitous(spark):
    # 'zebra' appears once in one doc; 'the' appears in every doc.
    docs = _docs(spark, ["the cat zebra", "the cat", "the dog", "the dog"])
    out = {r.doc_id: r for r in corpus.tfidf_keywords(docs, k=1).collect()}
    assert out[0].token == "zebra"
    # integer raw-odds score: tf=1, N=4, df=1 -> (1*(2*3+1)*1000) DIV 3 = 2333
    assert out[0].tfidf_milli == 2333
    # doc 1: 'cat' (df=2) beats 'the' (df=4)
    assert out[1].token == "cat"


def test_tfidf_keywords_tf_and_tie_break(spark):
    docs = _docs(spark, ["b b a", "a b"])
    out = [(r.rank, r.token) for r in corpus.tfidf_keywords(docs, k=2).collect() if r.doc_id == 0]
    # both terms have df=2 (same idf); tf=2 ranks 'b' first, then 'a'
    assert out == [(1, "b"), (2, "a")]
    # all-tied doc: alphabetical tie-break is deterministic
    docs2 = _docs(spark, ["z y x"])
    out2 = [r.token for r in corpus.tfidf_keywords(docs2, k=3).collect()]
    assert out2 == ["x", "y", "z"]


def test_tfidf_keywords_k_caps_output(spark):
    docs = _docs(spark, ["a b c d e f g h"])
    assert corpus.tfidf_keywords(docs, k=3).count() == 3
