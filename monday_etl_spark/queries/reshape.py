"""Reshaping + distribution operators: pivot, unpivot, batch tumbling
windows, percentiles. Extensions beyond the reference surface (its EAV→wide
mapping is deliberately *not* a pivot — SURVEY O-7 note — but users of the
wide tables pivot/melt them constantly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money_sum, sql_money_sum
from ..io import load_table
from .registry import register

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def _pivot_case(t: str) -> str:
    return (
        f"ROUND(CAST(SUM(CASE WHEN event_type = '{t}' THEN "
        f"CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS {t}"
    )


@register(
    "pivot_event_values",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS event_date,
           {", ".join(_pivot_case(t) for t in _EVENT_TYPES)}
    FROM events GROUP BY CAST(ts AS DATE)
    """,
    doc="groupBy().pivot() with an explicit value list (explicit list keeps "
        "the plan single-pass — no extra distinct scan to discover columns, "
        "which matters when the fact table is 100 TB).",
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("ts").cast("date").alias("event_date"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(money_sum(F.col("value")))
    )


@register(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
    doc="unpivot/melt: wide measure columns to (measure, value) rows — the "
        "inverse reshaping, one Expand node (single scan, no join).",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@register(
    "tumbling_window_6h",
    oracle=f"""
    SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           {sql_money_sum('value')} AS total_value
    FROM events
    GROUP BY (epoch_us(ts) // 21600000000) * 21600000000, event_type
    """,
    doc="Batch tumbling window (F.window, 6h) per event_type — the batch "
        "twin of the streaming rollup at sub-day granularity; emitted as "
        "epoch-µs window starts (engine-portable).",
)
def tumbling_window_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "revenue_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.9) AS p90,
           quantile_cont(l_extendedprice, 0.99) AS p99,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles (Spark percentile == DuckDB "
        "quantile_cont, verified bit-equal). Exact percentiles sort per "
        "group; the sketch path for 100 TB is approx_percentile (same shape "
        "as approx_distinct_users).",
)
def revenue_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.9).alias("p90"),
        F.percentile("l_extendedprice", 0.99).alias("p99"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "timeseries_gap_fill",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {sql_money_sum('value')} AS total_value
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type, CAST(g.d AS DATE) AS d
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN bounds b,
        LATERAL (SELECT UNNEST(generate_series(b.lo, b.hi,
                                               INTERVAL 1 DAY)) AS d) g
    )
    SELECT s.event_type, s.d AS event_date,
           COALESCE(dd.n_events, 0) AS n_events,
           dd.total_value,
           last_value(dd.total_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.d
               ROWS UNBOUNDED PRECEDING) AS locf_value
    FROM spine s LEFT JOIN daily dd
      ON dd.event_type = s.event_type AND dd.d = s.d
    """,
    doc="Time-series gap filling: build the dense (event_type x day) spine "
        "with sequence()/generate_series between the observed bounds, left "
        "join the sparse daily aggregate onto it, zero-fill counts and "
        "carry the last observed value forward (LOCF via "
        "last(ignorenulls) over an unbounded-preceding frame) — the "
        "regularization step before any rolling-window or forecasting "
        "pass. Plan: one daily aggregate of the fact table; the spine is "
        "(types x days)-sized and broadcast; one window shuffle over the "
        "spine, never over raw events.",
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.count("*").alias("n_events"),
        money_sum(F.col("value")).alias("total_value"),
    )
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("d"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.col("d").alias("event_date"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "total_value",
            F.last("total_value", ignorenulls=True).over(w)
            .alias("locf_value"),
        )
    )


@register(
    "timeseries_moving_anomaly",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                   AS day_num,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                    AS BIGINT) AS revenue_cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
        GROUP BY 1, 2
    ),
    win AS (
        SELECT day, revenue_cents,
               CAST(COUNT(*) OVER w AS BIGINT) AS mov_n,
               CAST(SUM(revenue_cents) OVER w AS BIGINT) AS mov_s,
               SUM(CAST(revenue_cents AS HUGEINT) * revenue_cents) OVER w
                   AS mov_ss
        FROM daily
        WINDOW w AS (ORDER BY day_num
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, revenue_cents,
           mov_n,
           mov_s // mov_n AS mov_avg_cents,
           CAST(CASE WHEN mov_n >= 4
                      AND CAST(mov_n * revenue_cents - mov_s AS HUGEINT)
                          * (mov_n * revenue_cents - mov_s)
                        > 4 * (CAST(mov_n AS HUGEINT) * mov_ss
                               - CAST(mov_s AS HUGEINT) * mov_s)
                     THEN 1 ELSE 0 END AS INT) AS is_anomaly
    FROM win
    """,
    doc="Trailing 7-day moving average + 2-sigma anomaly flag over daily "
        "revenue, fully exact across engines: cents are integer, the "
        "moving sum-of-squares runs in DECIMAL(38,0)/HUGEINT, and the "
        "|x-mu| > 2*sigma test is rearranged to the integer comparison "
        "(n*x - s)^2 > 4*(n*ss - s^2) so no division or sqrt ever happens "
        "(2-sigma, not 3, because the trailing window includes the current "
        "point, which pulls the mean toward x and shrinks the deviation). "
        "Plan: the heavy work (orders -> one row per day) is a distributed "
        "partial+final aggregate with the date filter pushed to the scan; "
        "the RANGE-frame window then runs over the day spine only (365 "
        "rows here, ~36.5k rows per century at ANY corpus size), so the "
        "unpartitioned window is never the bottleneck at 100 TB.",
)
def timeseries_moving_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("o_orderdate").cast("date").alias("day"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            ).alias("day_num"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("revenue_cents")
        )
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    win = daily.select(
        "day",
        "revenue_cents",
        F.count("*").over(w).cast("long").alias("mov_n"),
        F.sum("revenue_cents").over(w).cast("long").alias("mov_s"),
        F.sum(F.col("revenue_cents").cast("decimal(38,0)") * F.col("revenue_cents"))
        .over(w)
        .alias("mov_ss"),
    )
    dev = (F.col("mov_n") * F.col("revenue_cents") - F.col("mov_s")).cast(
        "decimal(38,0)"
    )
    var_n2 = (
        F.col("mov_n").cast("decimal(38,0)") * F.col("mov_ss")
        - F.col("mov_s").cast("decimal(38,0)") * F.col("mov_s")
    )
    return win.select(
        "day",
        "revenue_cents",
        "mov_n",
        F.expr("mov_s div mov_n").alias("mov_avg_cents"),
        F.when((F.col("mov_n") >= 4) & (dev * dev > var_n2 * 4), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_anomaly"),
    )


@register(
    "hopping_window_6h_2h",
    oracle=f"""
    SELECT ((epoch_us(ts) // 7200000000) - k.k) * 7200000000
               AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           {sql_money_sum('value')} AS total_value
    FROM events, (SELECT UNNEST([0, 1, 2]) AS k) k
    GROUP BY 1, event_type
    """,
    doc="Batch hopping (sliding) window: 6h windows every 2h, so each event "
        "lands in exactly 3 overlapping windows — F.window(ts, '6 hours', "
        "'2 hours'), the same operator Structured Streaming uses, run in "
        "batch. Plan: one Expand node fans each row into its 3 window "
        "slots BEFORE the hash aggregate, so partial (map-side) "
        "aggregation still applies and the shuffle carries one row per "
        "(window, type) group, not per event — the overlap factor "
        "multiplies the pre-combine map output, never the shuffle. Oracle "
        "derives the same slots with integer epoch-us arithmetic "
        "(UNNEST([0,1,2]) hop offsets).",
)
def hopping_window_6h_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "2 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "revenue_equidepth_histogram",
    oracle="""
    WITH ranked AS (
        SELECT l_extendedprice,
               NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                               l_linenumber) AS decile
        FROM lineitem
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM ranked GROUP BY decile
    """,
    doc="Equi-depth (NTILE) histogram: 10 equal-population price buckets "
        "with per-decile count/min/max/revenue — the distribution profile "
        "equi-WIDTH histograms (revenue_histogram) distort under skew. "
        "Deterministic across engines because the NTILE ordering carries a "
        "unique (price, orderkey, linenumber) tie-break. The exact form "
        "globally sorts (fine to ~1e8 rows); at 100 TB swap the NTILE for "
        "approx_percentile boundaries + a broadcast range join — same "
        "output schema, sketch-merge instead of total order.",
)
def revenue_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    return (
        li.select("l_extendedprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
