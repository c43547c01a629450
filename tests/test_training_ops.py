"""Decontamination and stratified sampling: semantics on synthetic docs,
plan shape (broadcast, no corpus-side shuffle before the probe)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from monday_etl_spark.extensions.dedup import decontaminate
from monday_etl_spark.io import load_table

from .conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_decontaminate_flags_shingle_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about sparks and clusters"),
            (3, "short doc"),  # < k words: whole text is the shingle
        ],
    )
    ev = _docs(
        spark,
        [
            (100, "something something the quick brown end"),  # shares "the quick brown"
            (101, "short doc"),
        ],
    )
    got = {r.doc_id: (r.n_shared_shingles, r.is_contaminated)
           for r in decontaminate(train, ev).collect()}
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (1, True)


def test_decontaminate_broadcasts_eval_side(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = decontaminate(
        docs.filter(F.col("doc_id") % 41 != 0),
        docs.filter(F.col("doc_id") % 41 == 0),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan  # eval shingles probe map-side


def test_stratified_sample_exact_fraction_per_stratum(spark):
    import math

    from monday_etl_spark.queries.stats import stratified_sample

    docs = load_table(spark, SF_SMOKE, "documents")
    per_lang = {r.lang: r.n for r in
                docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sample = stratified_sample(spark, SF_SMOKE)
    got = {r.lang: r.n for r in
           sample.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == {lang: math.ceil(n * 0.2) for lang, n in per_lang.items()}

    # deterministic: a second run selects the identical membership
    a = sorted(r.doc_id for r in sample.collect())
    b = sorted(r.doc_id for r in stratified_sample(spark, SF_SMOKE).collect())
    assert a == b


def test_rolling_hash_recurrence_matches_direct_formula():
    """The O(1) Rabin-Karp recurrence must equal the closed-form polynomial
    sum the oracle uses — pure-Python pin of the identity."""
    from monday_etl_spark.extensions.rolling import B, P, rolling_hashes, token_int

    toks = ["the", "quick", "brown", "fox", "jumps", "over", "the", "lazy",
            "dog", "again", "and", "again"]
    w = 4
    got = rolling_hashes(toks, w)
    t = [token_int(x) for x in toks]
    want = [
        sum(t[i + j] * pow(B, w - 1 - j, P) for j in range(w)) % P
        for i in range(len(toks) - w + 1)
    ]
    assert got == want
    assert rolling_hashes(toks[:3], w) == []  # shorter than the window


def test_substring_dedup_rolling_equals_md5_variant(spark):
    """Same duplicate-span report as the md5-window variant (the 61-bit hash
    space makes a differing collision at this scale essentially impossible)."""
    from monday_etl_spark.queries.registry import REGISTRY

    from .conftest import SF_SMOKE

    a = sorted(map(tuple, REGISTRY["substring_dedup"].fn(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, REGISTRY["substring_dedup_rolling"].fn(spark, SF_SMOKE).collect()))
    assert a == b


def test_rolling_hash_property_random_tokens():
    """Property pin over random token streams and window widths: the
    recurrence equals the closed-form sum at every offset."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from monday_etl_spark.extensions.rolling import B, P, rolling_hashes, token_int

    @settings(max_examples=50, deadline=None)
    @given(
        toks=st.lists(st.text(alphabet="abcxyz ", min_size=0, max_size=6),
                      min_size=0, max_size=40),
        w=st.integers(min_value=1, max_value=8),
    )
    def check(toks, w):
        got = rolling_hashes(toks, w)
        t = [token_int(x) for x in toks]
        want = [
            sum(t[i + j] * pow(B, w - 1 - j, P) for j in range(w)) % P
            for i in range(max(len(toks) - w + 1, 0))
        ]
        assert got == want

    check()
