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


def _und(spark, pairs):
    from monday_etl_spark.extensions.graph import triangle_stats

    df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "a long, b long"
    ).distinct()
    return triangle_stats(df).collect()[0].asDict()


def test_triangle_k4(spark):
    # K4: C(4,3)=4 triangles, wedges = 4*C(3,2)=12, clustering = 3*4/12 = 1.0
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    got = _und(spark, k4)
    assert got == {
        "n_nodes": 4,
        "n_edges": 6,
        "n_wedges": 12,
        "n_triangles": 4,
        "global_clustering_ppm": 1_000_000,
    }


def test_triangle_star_plus_one(spark):
    # hub 0 connected to 1..4, plus edge (1,2): exactly one triangle
    # (0,1,2); wedges = C(5,2)[hub? no, hub deg 4 -> C(4,2)=6] + deg1=2 ->1
    # + deg2=2 ->1 = 8; clustering = 3*1/8 -> 375000 ppm
    got = _und(spark, [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)])
    assert got == {
        "n_nodes": 5,
        "n_edges": 5,
        "n_wedges": 8,
        "n_triangles": 1,
        "global_clustering_ppm": 375_000,
    }


def test_triangle_free(spark):
    # path graph: wedges but no triangles
    got = _und(spark, [(0, 1), (1, 2), (2, 3)])
    assert got["n_triangles"] == 0
    assert got["n_wedges"] == 2
    assert got["global_clustering_ppm"] == 0
