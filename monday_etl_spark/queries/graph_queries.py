"""Registry entry for graph analytics: integer-exact PageRank over the
customer<->supplier interaction graph (extensions/graph.py).

The oracle unrolls the same three iterations as CTE stages; because every
operation is int64 (floor division per edge, exact integer sums), DuckDB
reproduces the Spark result bit-for-bit — including the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.graph import pagerank_int
from ..io import load_table
from .registry import register

_ITER_SQL = """
    r{n} AS (
        SELECT e.dst AS src,
               CAST(150000 + SUM((r.rank_ppm * 85) // (100 * e.outdeg))
                    AS BIGINT) AS rank_ppm
        FROM edges e JOIN r{p} r ON r.src = e.src
        GROUP BY e.dst
    )"""


@register(
    "pagerank_influence",
    oracle=f"""
    WITH pairs AS (
        SELECT o.o_custkey * 2 AS cust_node,
               l.l_suppkey * 2 + 1 AS supp_node
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    raw_edges AS (
        SELECT cust_node AS src, supp_node AS dst FROM pairs
        UNION ALL
        SELECT supp_node AS src, cust_node AS dst FROM pairs
    ),
    deg AS (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
        FROM raw_edges GROUP BY src
    ),
    edges AS (
        SELECT e.src, e.dst, d.outdeg
        FROM raw_edges e JOIN deg d ON d.src = e.src
    ),
    r0 AS (SELECT src, CAST(1000000 AS BIGINT) AS rank_ppm FROM deg),
    {_ITER_SQL.format(n=1, p=0)},
    {_ITER_SQL.format(n=2, p=1)},
    {_ITER_SQL.format(n=3, p=2)}
    SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           src // 2 AS entity_key,
           rank_ppm
    FROM r3
    """,
    doc="PageRank influence scores (3 iterations, d=0.85) over the "
        "symmetrized customer<->supplier graph derived from orders x "
        "lineitem, with multi-edges kept so influence is weighted by "
        "interaction count (and the edge build stays shuffle-free: broadcast "
        "join + explode, no distinct). Entirely int64 (ppm ranks, floor division, "
        "exact integer sums) so the iterative result is bit-deterministic "
        "at any parallelism and SQL-reproducible. Plan: each iteration is ONE hash join "
        "(edges pre-joined with out-degrees, persisted; node-sized ranks "
        "broadcast) + ONE aggregate — the cluster.py label-propagation "
        "shape applied to weighted scoring. Deep iteration flips on "
        "per-round lineage truncation (checkpoint=True).",
)
def pagerank_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
    )
    cn, sn = F.col("cust_node"), F.col("supp_node")
    edge = lambda s, d: F.struct(s.alias("src"), d.alias("dst"))  # noqa: E731
    edges = pairs.select(
        F.explode(F.array(edge(cn, sn), edge(sn, cn))).alias("e")
    ).select("e.src", "e.dst")
    # checkpoint=False: at 3 fixed iterations the lineage is 3 join+agg
    # stages — one lazy job, with the node-sized ranks relation broadcast
    # each round (only the groupBy(dst) shuffles). Per-round localCheckpoint
    # (the cluster.py pattern) only pays off for deep/unbounded iteration.
    ranks = pagerank_int(edges, iterations=3, damping_pct=85, checkpoint=False)
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("entity_key"),
        "rank_ppm",
    )


_ORIENT = "da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)"


@register(
    "triangle_census",
    oracle=f"""
    WITH hi AS (
        SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48
    ),
    edges AS (
        SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
        FROM hi x JOIN hi y
          ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
    ),
    both_ends AS (
        SELECT a AS node, b AS peer FROM edges
        UNION ALL
        SELECT b AS node, a AS peer FROM edges
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM both_ends GROUP BY node
    ),
    ed AS (
        SELECT CASE WHEN {_ORIENT} THEN e.a ELSE e.b END AS src,
               CASE WHEN {_ORIENT} THEN e.b ELSE e.a END AS dst,
               CASE WHEN {_ORIENT} THEN db.deg ELSE da.deg END AS ddeg
        FROM edges e
        JOIN deg da ON da.node = e.a
        JOIN deg db ON db.node = e.b
    ),
    wedges AS (
        SELECT e1.dst AS src, e2.dst AS dst
        FROM ed e1 JOIN ed e2 ON e1.src = e2.src
        WHERE e1.ddeg < e2.ddeg
           OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst)
    ),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM wedges w
        WHERE EXISTS (SELECT 1 FROM ed
                      WHERE ed.src = w.src AND ed.dst = w.dst)
    ),
    node_stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
        FROM deg
    ),
    edge_stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CAST(CASE WHEN n_wedges > 0
                     THEN (3 * n_triangles * 1000000) // n_wedges
                     ELSE 0 END AS BIGINT) AS global_clustering_ppm
    FROM node_stats, edge_stats, tri
    """,
    doc="Global triangle census + clustering coefficient over the supplier "
        "co-supply graph (edge = two suppliers sharing an order among "
        "high-quantity lineitems; the qty >= 48 cut keeps the bipartite "
        "projection sparse at every sf instead of collapsing to a clique). "
        "Degree-ordered orientation before the wedge self-join bounds every "
        "out-degree by O(sqrt(m)) regardless of hub skew — the standard "
        "scalable triangle-count shape — and each triangle is generated "
        "exactly once at its lowest-ordered vertex, then confirmed by one "
        "hash semi-join against the oriented edge list. All counts int64, "
        "clustering in ppm by floor division: bit-exact vs the SQL oracle.",
)
def triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.graph import triangle_stats

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 48)
        .select("l_orderkey", "l_suppkey")
    )
    x, y = li.alias("x"), li.alias("y")
    edges = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .select(F.col("x.l_suppkey").alias("a"), F.col("y.l_suppkey").alias("b"))
        .distinct()
    )
    return triangle_stats(edges)
