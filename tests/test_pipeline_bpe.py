"""Unit tests for BPE merge training (pipeline/bpe.py) on handcrafted
corpora with known winners; oracle parity at sf0.01 covers the full unroll."""

from __future__ import annotations

from iceberg_meta_spark.pipeline import bpe


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_bpe_first_merge_is_most_frequent_pair(spark):
    out = bpe.bpe_merges(_docs(spark, ["a b a b c", "a b x"]), rounds=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r.merge_round == 1 and r.merged_pair == "a+b" and r.pair_count == 3
    # 8 symbols before, 3 merges applied -> 5 after
    assert r.symbols_after == 5


def test_bpe_greedy_leftmost_overlap(spark):
    # 'a a a' with winner (a, a): leftmost merge wins -> [a+a, a], ONE merge
    out = bpe.bpe_merges(_docs(spark, ["a a a"]), rounds=1).collect()[0]
    assert out.merged_pair == "a+a" and out.pair_count == 2  # counted pre-merge
    assert out.symbols_after == 2  # [a+a, a]


def test_bpe_second_round_sees_merged_symbols(spark):
    # round 1 merges (a,b) everywhere; round 2's most frequent pair is then
    # (a+b, c) — merged symbols participate as atoms
    out = {r.merge_round: r for r in bpe.bpe_merges(
        _docs(spark, ["a b c d", "a b c e", "a b f"]), rounds=2
    ).collect()}
    assert out[1].merged_pair == "a+b" and out[1].pair_count == 3
    assert out[2].merged_pair == "a+b+c" and out[2].pair_count == 2


def test_bpe_tiebreak_is_lexicographic(spark):
    # (a,b) and (b,a) both occur twice in 'a b a b' (overlap-free counting:
    # pairs are counted at every adjacent position pre-merge): a b, b a, a b
    # -> (a,b)=2, (b,a)=1. Use a symmetric corpus instead: 'x y' + 'y x'
    # gives (x,y)=1 and (y,x)=1 -> lexicographically smaller (x,y) wins.
    out = bpe.bpe_merges(_docs(spark, ["x y", "y x"]), rounds=1).collect()[0]
    assert out.merged_pair == "x+y"


def test_apply_merges_encodes_like_training(spark):
    docs = _docs(spark, ["a b c d", "a b c e", "a b f"])
    merges = [("a", "b", "a+b"), ("a+b", "c", "a+b+c")]
    enc = {r.doc_id: r.symbols for r in bpe.apply_merges(docs, merges).collect()}
    assert enc[0] == ["a+b+c", "d"]
    assert enc[1] == ["a+b+c", "e"]
    assert enc[2] == ["a+b", "f"]
