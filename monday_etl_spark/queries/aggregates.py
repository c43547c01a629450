"""Aggregation operators — SURVEY.md §2.4 (O-21..O-29) plus rollup.

Determinism: all money math happens in exact DECIMAL (products carry scale
s1+s2, sums are associative), cast to DOUBLE only at the output boundary.
Ratios are single IEEE divisions of bit-identical inputs. See functions.py.

Scale: every groupBy here plans partial (map-side) + final hash aggregation —
the shuffle carries one row per (task, group), not raw input. Grand-total
aggregates reduce to one row per partition before the single-row exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money_avg, money_sum, sql_money_avg, sql_money_sum
from ..io import load_table
from .registry import register

# ---------------------------------------------------------------------------
# O-21/O-22/O-23 + F-6: TPC-H Q1-shaped pricing summary (two-level grouping,
# conditional aggregates, derived measures in exact decimal).
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           {sql_money_sum('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           {sql_money_avg('l_quantity')} AS avg_qty,
           {sql_money_avg('l_extendedprice')} AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount)
               AS avg_disc,
           COUNT(*) AS count_order,
           COUNT(CASE WHEN l_discount > 0 THEN 1 END) AS n_discounted
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="O-21/O-22/O-23 grouped multi-aggregate with conditional count "
        "(ref: advanced_monitoring.py:54-68, :98). Shaped like TPC-H Q1. "
        "Derived measures price*(1-disc)*(1+tax) computed in exact DECIMAL "
        "(scales 2+2+2) so sums are order-insensitive.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
        money_avg(F.col("l_quantity")).alias("avg_qty"),
        money_avg(F.col("l_extendedprice")).alias("avg_price"),
        (F.sum(disc).cast("double") / F.count("l_discount")).alias("avg_disc"),
        F.count("*").alias("count_order"),
        F.count(F.when(F.col("l_discount") > 0, 1)).alias("n_discounted"),
    )


@register(
    "rollup_priority_status",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP grouping-sets (built-in extension; the circle×date reports of "
        "the reference are a natural rollup, SURVEY §2.4 note). One pass, "
        "Expand + single shuffle — not N separate scans.",
)
def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("total_price"),
    )


@register(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping-sets: all 4 grouping combinations in one pass "
        "(Expand + single shuffle), completing the rollup/cube family the "
        "reference's reports imply (SURVEY §2.4 note).",
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users_exact,
           COUNT(*) AS n_events,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="approx_count_distinct (HyperLogLog++) per event_type — the sketch "
        "path for distinct counts whose exact form (O-21 countDistinct) "
        "needs a full shuffle of the key at 100 TB. HLL estimates are "
        "engine-specific by construction, so the sketch value itself can't "
        "hash-match an oracle; the query instead EMITS the bound check — "
        "approx_within_5pct must come out TRUE on every group, which the "
        "oracle asserts literally. The exact count column doubles as the "
        "reference value (the production plan keeps only the sketch).",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.count_distinct("user_id")
    return ev.groupBy("event_type").agg(
        exact.alias("n_users_exact"),
        F.count("*").alias("n_events"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= 0.05 * exact.cast("double")
        ).alias("approx_within_5pct"),
    )


# ---------------------------------------------------------------------------
# O-24 + O-18: grand-total battery assembled as one row (scalar-subquery style)
# ---------------------------------------------------------------------------


@register(
    "global_aggs",
    oracle=f"""
    SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
           (SELECT COUNT(*) FROM lineitem) AS n_lineitems,
           (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_active_customers,
           (SELECT {sql_money_sum('o_totalprice')} FROM orders) AS total_order_value,
           (SELECT {sql_money_sum('l_extendedprice')} FROM lineitem) AS total_revenue
    """,
    doc="O-24 global aggregates ×5 laid side-by-side (ref: completeness "
        "battery advanced_monitoring.py:113-125 and compare CTEs "
        "monday_etl_automated.py:605-627 = O-18). ONE multi-agg pass per "
        "table (the r01 shape ran 5 separate scans — 3 of orders, 2 of "
        "lineitem — and crossed 5 one-row frames; at 100 TB each extra scan "
        "is a full table read), then a single 1×1 cross join.",
)
def global_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = o.agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_active_customers"),
        money_sum(F.col("o_totalprice")).alias("total_order_value"),
    )
    b = li.agg(
        F.count("*").alias("n_lineitems"),
        money_sum(F.col("l_extendedprice")).alias("total_revenue"),
    )
    return a.crossJoin(b).select(
        "n_orders", "n_lineitems", "n_active_customers",
        "total_order_value", "total_revenue",
    )


# ---------------------------------------------------------------------------
# O-25: duplicate detection
# ---------------------------------------------------------------------------


@register(
    "duplicate_detection",
    oracle="""
    SELECT (SELECT COUNT(*) FROM lineitem) AS n_rows,
           (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_unique_keys,
           (SELECT COUNT(*) FROM (
               SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
           ) d) AS n_duplicate_keys
    """,
    doc="O-25 duplicate detection (ref: GROUP BY subitem_id HAVING cnt>1, "
        "advanced_monitoring.py:146-154). ONE scan + one per-key count "
        "shuffle; row total, distinct-key count, and duplicate-key count all "
        "derive from the per-key counts (the r01 shape scanned lineitem 3×). "
        "Map-side partial counts keep the shuffle near |distinct keys|. "
        "COUNT(DISTINCT) excludes a NULL key, so the distinct count filters "
        "the null group explicitly — same semantics as the SQL oracle.",
)
def duplicate_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    return per_key.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count_if(F.col("l_orderkey").isNotNull()).alias("n_unique_keys"),
        F.count_if(F.col("cnt") > 1).alias("n_duplicate_keys"),
    )


# ---------------------------------------------------------------------------
# O-26: freshness
# ---------------------------------------------------------------------------


@register(
    "freshness",
    oracle="""
    SELECT MAX(CAST(l_shipdate AS DATE)) AS last_ship_date,
           date_diff('day', MAX(CAST(l_shipdate AS DATE)), DATE '2002-12-31')
               AS days_stale
    FROM lineitem
    """,
    doc="O-26 freshness aggregate (ref: MAX(extraction_date) + DATE_DIFF, "
        "advanced_monitoring.py:163-168). Fixed 'today' literal keeps the "
        "query deterministic (SURVEY F-9 note). MAX(date) is answerable from "
        "parquet footer stats via aggregate pushdown.",
)
def freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    last = F.max(F.col("l_shipdate").cast("date"))
    return li.agg(
        last.alias("last_ship_date"),
        F.datediff(F.lit("2002-12-31").cast("date"), last).alias("days_stale"),
    )


# ---------------------------------------------------------------------------
# O-28: derived KPI ratios
# ---------------------------------------------------------------------------


@register(
    "ratio_kpi",
    oracle=f"""
    WITH t AS (
        SELECT {sql_money_sum('l_extendedprice')} AS total_revenue,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) AS total_tax,
               COUNT(*) AS n_items,
               COUNT(CASE WHEN l_discount > 0 THEN 1 END) AS n_discounted
        FROM lineitem
    )
    SELECT total_revenue, total_tax,
           total_revenue - total_tax AS net_revenue,
           CASE WHEN total_revenue > 0
                THEN ((total_revenue - total_tax) / total_revenue) * 100 END
               AS net_margin_pct,
           (CAST(n_discounted AS DOUBLE) / n_items) * 100 AS discount_coverage_pct
    FROM t
    """,
    doc="O-28 ratio/derived KPI with divide-by-zero guard (ref: revenue "
        "coverage % and net margin, advanced_monitoring.py:140, :244-248). "
        "Column arithmetic over a 1-row metrics DF.",
)
def ratio_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    t = li.agg(
        money_sum(F.col("l_extendedprice")).alias("total_revenue"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * F.col("l_tax").cast("decimal(4,2)")
        ).cast("double").alias("total_tax"),
        F.count("*").alias("n_items"),
        F.count(F.when(F.col("l_discount") > 0, 1)).alias("n_discounted"),
    )
    rev, tax = F.col("total_revenue"), F.col("total_tax")
    return t.select(
        "total_revenue",
        "total_tax",
        (rev - tax).alias("net_revenue"),
        F.when(rev > 0, ((rev - tax) / rev) * 100).alias("net_margin_pct"),
        ((F.col("n_discounted").cast("double") / F.col("n_items")) * 100).alias(
            "discount_coverage_pct"
        ),
    )


# ---------------------------------------------------------------------------
# O-29: week-over-week threshold alert
# ---------------------------------------------------------------------------


@register(
    "weekly_threshold",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d,
               {sql_money_sum('l_extendedprice')} AS revenue
        FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
    ), latest AS (SELECT MAX(d) AS latest_date FROM daily)
    SELECT l.latest_date,
           (SELECT revenue FROM daily WHERE d = l.latest_date) AS latest_revenue,
           (SELECT revenue FROM daily WHERE d = l.latest_date - 7) AS prev_week_revenue,
           COALESCE((SELECT revenue FROM daily WHERE d = l.latest_date)
                    < 0.95 * (SELECT revenue FROM daily WHERE d = l.latest_date - 7),
                    FALSE) AS alert
    FROM latest l
    """,
    doc="O-29 week-over-week threshold (ref: alert if latest < 95% of "
        "7-days-ago, advanced_monitoring.py:398-405). ONE pass: the big "
        "table feeds a daily pre-aggregate (partial-agg shuffle), the "
        "|dates|-sized daily frame flows through a global max window onto "
        "a single partition (thousands of rows at any scale — the fact "
        "table is already reduced), and a conditional aggregation picks "
        "both the latest and the latest-7 revenue. No persist, no 1-row "
        "joins — r06 collapse of the former three-join plan.",
)
def weekly_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        money_sum(F.col("l_extendedprice")).alias("revenue")
    )
    w = Window.partitionBy()  # global: |dates| rows on one partition
    picked = (
        daily.withColumn("latest_date", F.max("d").over(w))
        .filter(
            (F.col("d") == F.col("latest_date"))
            | (F.col("d") == F.date_sub(F.col("latest_date"), 7))
        )
        .groupBy("latest_date")
        .agg(
            F.max(F.when(F.col("d") == F.col("latest_date"), F.col("revenue")))
            .alias("latest_revenue"),
            F.max(
                F.when(F.col("d") == F.date_sub(F.col("latest_date"), 7),
                       F.col("revenue"))
            ).alias("prev_week_revenue"),
        )
    )
    return picked.select(
        "latest_date",
        "latest_revenue",
        "prev_week_revenue",
        F.coalesce(
            F.col("latest_revenue") < F.lit(0.95) * F.col("prev_week_revenue"),
            F.lit(False),
        ).alias("alert"),
    )


@register(
    "grouping_sets_reports",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           COUNT(*) AS n_orders,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
    doc="Explicit GROUPING SETS: two independent one-dimensional reports "
        "(by priority, by status) in ONE pass — Expand + a single shuffle "
        "instead of two scans + a union. GROUPING() flags distinguish "
        "aggregated-away nulls from data nulls, completing the rollup/cube/"
        "grouping-sets family (SURVEY §2.4 note).",
)
def grouping_sets_reports(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"]],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping("o_orderpriority").cast("int").alias("g_pri"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("total_price"),
    )
