"""BPE merge learning/application: greedy overlap semantics, weighted
counts, deterministic tie-breaks, learned-order application."""

from __future__ import annotations

from monday_etl_spark.extensions.bpe import bpe_apply, bpe_learn, word_counts


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_word_counts_alpha_runs_lowercased(spark):
    df = _docs(spark, ["The cat, the CAT!", "cat 42 dog"])
    got = {(r.word, r.cnt) for r in word_counts(df).collect()}
    assert got == {("the", 2), ("cat", 3), ("dog", 1)}


def test_bpe_learn_weighted_and_tiebreak(spark):
    # "ab" x3, "cd" x3: pair counts tie at 3 -> lexicographic (a,b) wins
    df = _docs(spark, ["ab ab ab cd cd cd"])
    merges = bpe_learn(df, rounds=1)
    assert merges == [(1, "a", "b", "ab", 3)]


def test_bpe_learn_greedy_overlap(spark):
    # "aaa": adjacent (a,a) occurs twice PER word (counting), but the
    # merge applies greedily left-to-right -> "aa a"; round 2's top pair
    # is then (aa, a)
    df = _docs(spark, ["aaa aaa aaa"])
    merges = bpe_learn(df, rounds=2)
    assert merges[0] == (1, "a", "a", "aa", 6)  # 2 occurrences x 3 words
    assert merges[1] == (2, "aa", "a", "aaa", 3)


def test_bpe_learn_stops_when_dry(spark):
    # single-char words: no adjacent pair at all -> zero merges
    df = _docs(spark, ["a b c a b"])
    assert bpe_learn(df, rounds=3) == []


def test_bpe_apply_learned_order_per_document(spark):
    df = _docs(spark, ["abab xy", "ab"])
    merges = bpe_learn(df, rounds=2)
    # round 1: (a,b) count 5 -> ab; round 2: (ab,ab) count 2 -> abab
    assert [(m[1], m[2]) for m in merges] == [("a", "b"), ("ab", "ab")]
    out = {r.doc_id: r.toks for r in bpe_apply(df, merges)
           .selectExpr("doc_id", "bpe_tokens AS toks").collect()}
    assert out[0] == ["abab", "x", "y"]
    assert out[1] == ["ab"]


def test_bpe_apply_no_merges_is_char_split(spark):
    df = _docs(spark, ["hi"])
    out = bpe_apply(df, []).select("bpe_tokens").first()[0]
    assert out == ["h", "i"]
