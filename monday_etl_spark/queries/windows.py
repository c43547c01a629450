"""Window-function operators — SURVEY.md §2.5 (O-38..O-40) plus the
row_number latest-snapshot view the reference's duplicate check implies.

Scale: every window here is partitioned (by key or by a grouping that was
pre-aggregated), so no single-partition global sorts over raw data. The only
global-ordered window (snapshot_diff/daily_metrics LAG) runs over a
post-aggregate frame of one row per day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import money_sum, sql_money_sum
from ..io import load_table
from .registry import register


@register(
    "latest_snapshot",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
           l_extendedprice
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_shipdate DESC, l_linenumber DESC,
                            l_extendedprice DESC) AS rn
        FROM lineitem
    ) t WHERE rn = 1
    """,
    doc="Latest-snapshot dedup view via row_number (SURVEY §2.5 note: implied "
        "by the duplicate check O-25 — keep the newest row per entity). "
        "Unique tie-break (l_linenumber) makes the winner deterministic. "
        "Partitioned window: shuffles once on the entity key.",
)
def latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the test data (deliberate
    # duplicate rows, FIXTURES.md A2) — l_extendedprice completes a total
    # order over every distinct row, making the rn=1 winner deterministic.
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_shipdate"), F.desc("l_linenumber"), F.desc("l_extendedprice")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("ship_date"),
            "l_extendedprice",
        )
    )


@register(
    "rank_topn_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn AS rank_in_priority
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t WHERE rn <= 3
    """,
    doc="Top-N per group via ranked window (ranking extension; reference has "
        "none, SURVEY §2.5). Spark rewrites rank-filter windows to per-"
        "partition top-k (WindowGroupLimit) before the shuffle — no full sort "
        "of each group at scale.",
)
def rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.col("rn").alias("rank_in_priority"),
        )
    )


@register(
    "running_total",
    oracle=f"""
    WITH daily AS (
        SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
               {sql_money_sum('l_extendedprice')} AS day_revenue
        FROM lineitem GROUP BY l_returnflag, CAST(l_shipdate AS DATE)
    )
    SELECT l_returnflag, d, day_revenue,
           CAST(SUM(CAST(day_revenue AS DECIMAL(18,2))) OVER (
                    PARTITION BY l_returnflag ORDER BY d
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cumulative_revenue
    FROM daily
    """,
    doc="Running total per group (frame-spec extension, SURVEY §2.5). "
        "Pre-aggregate to daily rows first (shrinks the window input by the "
        "fan-in), then a decimal cumulative sum — exact regardless of the "
        "engine's window-aggregation association order (DuckDB uses segment "
        "trees, Spark scans sequentially; doubles would diverge).",
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_returnflag", F.col("l_shipdate").cast("date").alias("d")
    ).agg(money_sum(F.col("l_extendedprice")).alias("day_revenue"))
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.withColumn(
        "cumulative_revenue",
        F.sum(F.col("day_revenue").cast("decimal(18,2)")).over(w).cast("double"),
    )


@register(
    "snapshot_diff",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_events,
               {sql_money_sum('value')} AS total_value
        FROM events GROUP BY CAST(ts AS DATE)
    ), latest AS (SELECT MAX(d) AS today FROM daily)
    SELECT t.d AS today, t.n_events AS events_today, t.total_value AS value_today,
           y.n_events AS events_yesterday, y.total_value AS value_yesterday,
           t.n_events - y.n_events AS events_change,
           ROUND(t.total_value - y.total_value, 2) AS value_change
    FROM latest l
    JOIN daily t ON t.d = l.today
    LEFT JOIN daily y ON y.d = l.today - 1
    """,
    doc="O-18/O-39/O-40 snapshot diff: today-vs-yesterday metrics laid "
        "side-by-side (ref: compare_with_previous_day CTE cross join, "
        "monday_etl_automated.py:605-627). ROUND after subtraction of exact "
        "2-decimal doubles is tie-safe (difference is never near a .005 "
        "boundary).",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("n_events"),
        money_sum(F.col("value")).alias("total_value"),
    ).persist()  # |dates|-sized; read by 3 branches — see weekly_threshold
    latest = daily.agg(F.max("d").alias("today"))
    t = latest.join(daily, daily.d == latest.today).select(
        F.col("d").alias("today"),
        F.col("n_events").alias("events_today"),
        F.col("total_value").alias("value_today"),
    )
    y = latest.join(daily, daily.d == F.date_sub(latest.today, 1), "left").select(
        F.col("today").alias("t2"),
        F.col("n_events").alias("events_yesterday"),
        F.col("total_value").alias("value_yesterday"),
    )
    return t.join(y, t.today == y.t2).select(
        "today",
        "events_today",
        "value_today",
        "events_yesterday",
        "value_yesterday",
        (F.col("events_today") - F.col("events_yesterday")).alias("events_change"),
        F.round(F.col("value_today") - F.col("value_yesterday"), 2).alias("value_change"),
    )


@register(
    "window_function_battery",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
               COUNT(*) AS n_orders, {sql_money_sum('o_totalprice')} AS rev
        FROM orders GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
    )
    SELECT pri, d, n_orders, rev,
           LEAD(rev) OVER wd AS next_rev,
           FIRST_VALUE(rev) OVER wd AS first_rev,
           LAST_VALUE(rev) OVER (PARTITION BY pri ORDER BY d
                                 ROWS BETWEEN CURRENT ROW
                                 AND UNBOUNDED FOLLOWING) AS final_rev,
           NTILE(4) OVER wd AS date_quartile,
           DENSE_RANK() OVER wr AS rev_dense_rank,
           PERCENT_RANK() OVER wr AS rev_pct_rank,
           CUME_DIST() OVER wr AS rev_cume_dist,
           CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER (
                    PARTITION BY pri ORDER BY d
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS rev_7row
    FROM daily
    WINDOW wd AS (PARTITION BY pri ORDER BY d),
           wr AS (PARTITION BY pri ORDER BY rev DESC, d)
    """,
    doc="The remaining window-function surface in one partitioned pass: "
        "lead, first/last_value (explicit frames), ntile, dense_rank, "
        "percent_rank, cume_dist, and a 7-row decimal moving sum. Runs over "
        "a per-(priority, day) pre-aggregate, so the windows see one row "
        "per day per group — the reporting shape, never raw-data global "
        "sorts. percent_rank/cume_dist are single integer divisions "
        "(bit-exact across engines); the moving sum is decimal to stay "
        "association-order-independent.",
)
def window_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("rev"),
    )
    wd = Window.partitionBy("pri").orderBy("d")
    wr = Window.partitionBy("pri").orderBy(F.desc("rev"), F.asc("d"))
    w_tail = wd.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    w_7 = wd.rowsBetween(-6, Window.currentRow)
    return daily.select(
        "pri",
        "d",
        "n_orders",
        "rev",
        F.lead("rev").over(wd).alias("next_rev"),
        F.first("rev").over(wd).alias("first_rev"),
        F.last("rev").over(w_tail).alias("final_rev"),
        F.ntile(4).over(wd).alias("date_quartile"),
        F.dense_rank().over(wr).alias("rev_dense_rank"),
        F.percent_rank().over(wr).alias("rev_pct_rank"),
        F.cume_dist().over(wr).alias("rev_cume_dist"),
        F.sum(F.col("rev").cast("decimal(18,2)")).over(w_7).cast("double")
        .alias("rev_7row"),
    )
