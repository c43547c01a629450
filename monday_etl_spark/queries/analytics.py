"""Multi-join analytics queries (TPC-H Q3/Q5-shaped) — the join-tree shapes a
reference user's BigQuery reports would grow into, and the queries that
exercise Catalyst's join planning hardest.

Scale notes:
- dimension chains (region→nation→customer) broadcast: the fact table never
  shuffles for them;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once, and the
  revenue aggregate is partial+final so the shuffle after the join carries
  group rows;
- all revenue math in exact DECIMAL (functions.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


@register(
    "top_unshipped_orders",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: segment-filtered customers ⋈ orders ⋈ lineitem, "
        "revenue per unshipped order, top 10. Customer dim broadcasts after "
        "its filter; the orders⋈lineitem equi-join shuffles once on orderkey.",
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1998-03-15").cast("date")
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: region→nation→customer dimension chain broadcast "
        "onto orders⋈lineitem. The single fact-fact shuffle dominates; every "
        "dimension hop is a broadcast-hash join (verify: one Exchange in the "
        "plan below the aggregate).",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    dims = (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey")
    )
    return (
        o.join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "customer_order_stats",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value,
           MAX(CAST(o.o_orderdate AS DATE)) AS last_order_date
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="Customer lifetime rollup (parent ⟕ child + grouped aggregate): the "
        "per-project rollup pattern of the reference generalized. Group key "
        "equals the join key, so the aggregate reuses the join partitioning "
        "— no second shuffle.",
)
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("lifetime_value"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_order_date"),
        )
    )
