"""Python-oracle tests for the extension ops whose SQL oracle is impractical
(simhash bit votes, LSH hyperplanes), plus recall/threshold properties."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from monday_etl_spark.extensions.dedup import simhash64, word_shingles
from monday_etl_spark.extensions.similarity import brute_force_topk, lsh_bucket_topk
from monday_etl_spark.io import load_table

from .conftest import SF_SMOKE


def py_simhash64(text: str) -> int:
    """Independent 64-bit oracle: bit j's vote comes from bit j%16 of the
    16-bit word at hex digits [4*(j//16), 4*(j//16)+4) of the token md5;
    packed two's complement (signed int64, matching the Spark column)."""
    toks = re.split(r"\s+", re.sub(r"\s+", " ", text.strip().lower()))
    votes = [0] * 64
    for t in toks:
        hx = hashlib.md5(t.encode()).hexdigest()
        words = [int(hx[4 * k : 4 * k + 4], 16) for k in range(4)]
        for j in range(64):
            votes[j] += 1 if (words[j // 16] >> (j % 16)) & 1 else -1
    val = sum((1 << j) for j in range(64) if votes[j] > 0)
    return val - (1 << 64) if val >= (1 << 63) else val


def test_simhash_matches_python_oracle(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    got = {
        r.doc_id: r.sh
        for r in docs.select("doc_id", simhash64(F.col("text")).alias("sh")).collect()
    }
    want = {r.doc_id: py_simhash64(r.text) for r in docs.collect()}
    assert got == want


def py_shingles(text: str, k: int = 3) -> set[str]:
    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    if len(toks) <= k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_word_shingles_match_python_oracle(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    got = {
        r.doc_id: set(r.sh)
        for r in docs.select("doc_id", word_shingles(F.col("text")).alias("sh")).collect()
    }
    want = {r.doc_id: py_shingles(r.text) for r in docs.collect()}
    assert got == want


def test_lsh_topk_is_subset_of_brute_force_with_recall(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    bf = brute_force_topk(emb, queries, k=10)
    lsh = lsh_bucket_topk(emb, queries, dim=64, k=10, bits=4)

    bf_pairs = {(r.query_id, r.neighbor_id) for r in bf.collect()}
    lsh_rows = lsh.collect()
    lsh_pairs = {(r.query_id, r.neighbor_id) for r in lsh_rows}

    # sims reported by the LSH path must equal the brute-force sims for the
    # same pairs (same math, just fewer candidates)
    bf_sims = {(r.query_id, r.neighbor_id): r.cosine_sim for r in bf.collect()}
    for r in lsh_rows:
        if (r.query_id, r.neighbor_id) in bf_sims:
            assert r.cosine_sim == pytest.approx(
                bf_sims[(r.query_id, r.neighbor_id)], abs=1e-9
            )

    # recall of true top-10 within bucket-restricted search: nonzero and
    # bounded by construction
    recall = len(bf_pairs & lsh_pairs) / len(bf_pairs)
    assert 0.0 < recall <= 1.0


def test_near_dup_pairs_meet_threshold(spark):
    from monday_etl_spark.extensions.similarity import cosine, embedding_near_dup

    emb = load_table(spark, SF_SMOKE, "embeddings")
    # bits must match the registered query's pinned width (6 since r04)
    pairs = embedding_near_dup(emb, dim=64, threshold=0.4, bits=6).collect()
    assert pairs, "expected at least one candidate pair at threshold 0.4"
    # verify each reported pair's cosine independently (exact recompute)
    v = {
        r.vec_id: r.embedding
        for r in emb.select("vec_id", "embedding").collect()
    }
    import math

    def py_cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return d / (na * nb)

    for r in pairs:
        assert py_cos(v[r.id_a], v[r.id_b]) > 0.4 - 1e-6
        assert r.cosine_sim == pytest.approx(py_cos(v[r.id_a], v[r.id_b]), abs=1e-3)


def test_minhash_signatures_match_column_flavor(spark):
    """The codegen'd explode+agg signature path (minhash_signatures) must
    produce byte-identical signatures to the documented Column expression
    (minhash_signature) — the contract every minhash oracle depends on."""
    from pyspark.sql import functions as F

    from monday_etl_spark.extensions.dedup import (
        minhash_signature,
        minhash_signatures,
    )
    from monday_etl_spark.io import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    fast = {r.doc_id: list(r.sig) for r in minhash_signatures(docs).collect()}
    slow = {
        r.doc_id: list(r.sig)
        for r in docs.select(
            "doc_id", minhash_signature(F.col("text")).alias("sig")
        ).collect()
    }
    assert fast == slow


def test_bloom_decontaminate_never_misses_exact_hits(spark):
    """Bloom candidates are a SUPERSET of the exact contaminated set (no
    false negatives), and every bloom hit count >= the exact shared count."""
    from monday_etl_spark.extensions.dedup import decontaminate, decontaminate_bloom

    docs = load_table(spark, SF_SMOKE, "documents")
    train = docs.filter(F.col("doc_id") % 41 != 0)
    ev = docs.filter(F.col("doc_id") % 41 == 0)
    exact = {r.doc_id: r.n_shared_shingles
             for r in decontaminate(train, ev).collect()}
    bloom = {r.doc_id: r.n_bloom_hits
             for r in decontaminate_bloom(train, ev).collect()}
    assert set(exact) == set(bloom)  # one row per train doc on both paths
    for doc_id, n_exact in exact.items():
        assert bloom[doc_id] >= n_exact


def test_unigram_cross_entropy_tiny_corpus(spark):
    """Hand-computed check: corpus 'a a a b' -> P(a)=3/4, P(b)=1/4;
    surprisal(a)=0.415037... bits, surprisal(b)=2 bits exactly."""
    import math

    from monday_etl_spark.extensions.textanalysis import unigram_cross_entropy

    df = spark.createDataFrame(
        [(1, "a a a"), (2, "b"), (3, "  ")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in unigram_cross_entropy(df).collect()}
    q_a = math.floor(-math.log2(3 / 4) * 1e6 + 0.5)  # 415037
    q_b = math.floor(-math.log2(1 / 4) * 1e6 + 0.5)  # 2000000
    assert rows[1].n_tokens == 3 and rows[1].micro_bits == 3 * q_a
    assert rows[1].bits_per_token == (3 * q_a) / (3 * 1e6)
    assert rows[2].n_tokens == 1 and rows[2].micro_bits == q_b
    assert rows[2].bits_per_token == pytest.approx(2.0)
    assert rows[3].n_tokens == 0 and rows[3].micro_bits == 0
    assert rows[3].bits_per_token is None


def test_semantic_dedup_cluster_invariants(spark):
    """Every near-dup pair lands in one cluster; exactly one keeper per
    cluster; keepers are the cluster minimum."""
    from monday_etl_spark.extensions.similarity import embedding_near_dup
    from monday_etl_spark.queries.registry import REGISTRY

    out = {r.vec_id: r for r in
           REGISTRY["semantic_dedup"].fn(spark, SF_SMOKE).collect()}
    emb = load_table(spark, SF_SMOKE, "embeddings")
    # bits must match the registered query's pinned width (6 since r04)
    pairs = embedding_near_dup(emb, dim=64, threshold=0.4, bits=6).collect()
    for p in pairs:
        assert out[p.id_a].cluster_id == out[p.id_b].cluster_id
    clusters: dict[int, list] = {}
    for r in out.values():
        clusters.setdefault(r.cluster_id, []).append(r)
    for cid, members in clusters.items():
        keepers = [m for m in members if m.is_kept]
        assert len(keepers) == 1 and keepers[0].vec_id == cid == min(
            m.vec_id for m in members
        )
