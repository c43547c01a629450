"""Flagship query: daily metrics with day-over-day delta.

Reproduces the reference's richest analytics query, ``get_daily_metrics``
(advanced_monitoring.py:51-81): left join parent->child, grouped
multi-aggregate (COUNT DISTINCT, conditional COUNT, SUM, AVG, MAX), then LAG
window deltas, ordered by day. Exercises SURVEY.md §2 operators
O-14/O-16/O-21/O-22/O-38/O-41 and F-6 in one plan.

Role mapping (FIXTURES.md §C): orders ≈ projects (parent), lineitem ≈ subitems
(child fact), o_orderdate ≈ extraction_date, l_extendedprice ≈ revenue_amount.

Scale notes:
- The join shuffles both sides on o_orderkey unless one side broadcasts; at
  100 TB the orders side of a date-sliced window is small enough that AQE picks
  broadcast-hash after the filter — we keep the plan declarative and let it.
- The grouped aggregate is partial (map-side) + final: the shuffle carries one
  row per (partition, order_date), not raw lineitems.
- The LAG window is over the *post-aggregate* frame (one row per day — tens of
  rows), so the single-partition window sort is trivially cheap; it would be
  partitioned by tenant/board in a multi-tenant generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import money_avg, money_sum, sql_money_avg, sql_money_sum
from ..io import load_table
from .registry import register

_ORACLE = f"""
WITH j AS (
    SELECT CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderkey, l.l_linenumber, l.l_extendedprice
    FROM orders o
    LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), daily AS (
    SELECT order_date,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           COUNT(l_linenumber) AS n_lineitems,
           COUNT(CASE WHEN l_extendedprice > 0 THEN l_linenumber END) AS n_with_revenue,
           {sql_money_sum('l_extendedprice')} AS total_revenue,
           {sql_money_avg('l_extendedprice')} AS avg_revenue
    FROM j
    GROUP BY order_date
)
SELECT order_date, n_orders, n_lineitems, n_with_revenue, total_revenue, avg_revenue,
       ROUND(total_revenue - LAG(total_revenue) OVER (ORDER BY order_date), 2)
           AS revenue_change,
       n_lineitems - LAG(n_lineitems) OVER (ORDER BY order_date) AS lineitem_change
FROM daily
ORDER BY order_date
"""


@register("daily_metrics", oracle=_ORACLE)
def daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("order_date"),
        "o_orderkey",
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )

    joined = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left")

    daily = joined.groupBy("order_date").agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.count("l_linenumber").alias("n_lineitems"),
        F.count(F.when(F.col("l_extendedprice") > 0, F.col("l_linenumber"))).alias(
            "n_with_revenue"
        ),
        money_sum(F.col("l_extendedprice")).alias("total_revenue"),
        money_avg(F.col("l_extendedprice")).alias("avg_revenue"),
    )

    w = Window.orderBy("order_date")
    return (
        daily.withColumn(
            "revenue_change",
            F.round(F.col("total_revenue") - F.lag("total_revenue").over(w), 2),
        )
        .withColumn(
            "lineitem_change",
            F.col("n_lineitems") - F.lag("n_lineitems").over(w),
        )
        .orderBy("order_date")
    )
