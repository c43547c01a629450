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
