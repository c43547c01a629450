"""Connected components vs a pure-Python union-find oracle, on synthetic
graphs and on the real LSH candidate pairs."""

from __future__ import annotations

from monday_etl_spark.extensions.cluster import connected_components, dedup_clusters
from monday_etl_spark.extensions.dedup import minhash_candidates
from monday_etl_spark.io import load_table

from .conftest import SF_SMOKE


def py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_components_match_union_find_on_chain_and_star(spark):
    # chain 1-2-3-4-5 (diameter > 1 round), star 10-(11,12,13), isolated pair
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13), (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert got == py_components(edges)


def test_components_on_real_lsh_pairs(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = minhash_candidates(docs).select("doc_a", "doc_b")
    edges = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    got = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert got == py_components(edges)
    assert len(got) > 0


def test_dedup_clusters_keepers(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long")
    rows = {r.doc_id: (r.component, r.is_keeper) for r in dedup_clusters(pairs).collect()}
    assert rows == {1: (1, True), 2: (1, False), 3: (1, False),
                    7: (7, True), 8: (7, False)}


def test_leakage_safe_split_clusters_never_straddle(spark):
    """Every document is assigned exactly once; a cluster's members all land
    in the same split (the leakage guard the query exists for); the split of
    a cluster equals the md5-derived label of its id."""
    from monday_etl_spark.queries.cluster_tfidf import leakage_safe_split

    docs = load_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    rows = leakage_safe_split(spark, SF_SMOKE).collect()
    assert len(rows) == n_docs
    assert {r.split for r in rows} <= {"train", "val", "test"}

    by_cluster: dict[int, set[str]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())

    # cluster labels agree with the union-find ground truth on the real pairs
    pairs = minhash_candidates(docs).select("doc_a", "doc_b")
    truth = py_components([(r.doc_a, r.doc_b) for r in pairs.collect()])
    for r in rows:
        assert r.cluster_id == truth.get(r.doc_id, r.doc_id)

    # deterministic hash boundary: recompute one cluster's split in Python
    import hashlib

    for r in rows[:50]:
        h = hashlib.md5(str(r.cluster_id).encode()).hexdigest()[0]
        want = "train" if "0" <= h <= "b" else ("val" if h in "cd" else "test")
        assert r.split == want
