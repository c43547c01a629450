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
