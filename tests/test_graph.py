"""pagerank_int: hand-computed small graphs + invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from monday_etl_spark.extensions.graph import pagerank_int


def _edges(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_two_node_symmetric_is_uniform_fixpoint(spark):
    # K2: each node passes 85% of 1e6 over outdeg 1; 150000 + 850000 = 1e6
    # forever — the uniform vector is the exact fixpoint, with no integer
    # truncation loss on this graph.
    got = {
        r.node: r.rank_ppm
        for r in pagerank_int(_edges(spark, [(1, 2)]), iterations=4).collect()
    }
    assert got == {1: 1_000_000, 2: 1_000_000}


def test_star_hand_computed(spark):
    # star 0-(1,2,3): after 1 iter (integer arithmetic, uniform start):
    #   center: 150000 + 3 * (1e6*85 div 100) = 150000 + 3*850000 = 2700000
    #   leaf:   150000 + (1e6*85) div (100*3) = 150000 + 283333 = 433333
    got = {
        r.node: r.rank_ppm
        for r in pagerank_int(
            _edges(spark, [(0, 1), (0, 2), (0, 3)]), iterations=1
        ).collect()
    }
    assert got == {0: 2_700_000, 1: 433_333, 2: 433_333, 3: 433_333}
    # more iterations keep the center dominant and leaves symmetric
    got3 = {
        r.node: r.rank_ppm
        for r in pagerank_int(
            _edges(spark, [(0, 1), (0, 2), (0, 3)]), iterations=3
        ).collect()
    }
    assert got3[0] > got3[1] == got3[2] == got3[3]


def test_mass_nearly_conserved(spark):
    # total rank stays within n * 1e6 and loses at most outdeg-1 ppm per
    # node per round to floor division
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
    ranks = pagerank_int(edges, iterations=3)
    total = ranks.agg(F.sum("rank_ppm")).collect()[0][0]
    n = 4
    assert total <= n * 1_000_000
    assert total >= n * 1_000_000 - 3 * 10 * n  # generous floor-loss bound
