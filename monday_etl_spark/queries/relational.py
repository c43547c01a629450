"""Relational operators: filters, joins, set ops, sorts, scalar functions.

Covers SURVEY.md §2.2 (O-12..O-15), §2.3 (O-16..O-20 + semi/anti/as-of
extensions), §2.6 (O-41..O-43), §2.7 (O-44), §2.8 (F-1..F-14).

Scale notes are per-query docstrings; the common themes:
- every filter/projection is declarative so Catalyst pushes it into the
  parquet scan (verify: PushedFilters/ReadSchema in .explain);
- dimension sides of joins stay broadcast-able, fact-fact joins shuffle on the
  join key and AQE handles skew;
- LIMIT queries carry a total order with a unique tie-break so the selected
  set is deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Filters (O-12..O-15)
# ---------------------------------------------------------------------------


@register(
    "filter_high_revenue",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
    FROM lineitem WHERE l_extendedprice > 50000
    """,
    doc="O-12 row filter on a measure (ref: revenue_amount > 0, "
        "advanced_monitoring.py:117). Predicate pushes to the parquet scan.",
)
def filter_high_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") > 50000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
    )


@register(
    "filter_inlist",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    doc="O-13 IN-list filter (ref: circolo IN (...), advanced_monitoring.py:97).",
)
def filter_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )


@register(
    "filter_daterange",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
           l_extendedprice
    FROM lineitem WHERE CAST(l_shipdate AS DATE) >= DATE '2000-01-01'
    """,
    doc="O-14 date-range filter (ref: extraction_date >= DATE_SUB(...), "
        "advanced_monitoring.py:66). On a date-partitioned historical table "
        "this predicate is the partition-pruning key.",
)
def filter_daterange(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate").cast("date") >= F.lit("2000-01-01").cast("date")).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_date"),
        "l_extendedprice",
    )


@register(
    "filter_snapshot_eq",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
    """,
    doc="O-15 equality snapshot filter (ref: extraction_date = yesterday, "
        "monday_etl_automated.py:616-619) — prunes to one partition.",
)
def filter_snapshot_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("ts").cast("date") == F.lit("2024-01-15").cast("date")).select(
        "event_id", "user_id", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# Joins (O-16..O-20, semi/anti)
# ---------------------------------------------------------------------------


@register(
    "join_left_single",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="O-17 left outer equi-join, single key (ref: projects ⟕ subitems, "
        "advanced_monitoring.py:190-192). Parent side is a dimension: at scale "
        "it broadcasts (AQE converts to broadcast-hash once the dim side "
        "measures small); the child side never shuffles in that plan.",
)
def join_left_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


@register(
    "join_left_composite",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, l.l_linenumber, l.l_extendedprice
    FROM orders o
    LEFT JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = l.l_linestatus
    """,
    doc="O-16 left outer equi-join on a composite key (ref: ON project_id AND "
        "extraction_date, advanced_monitoring.py:63-65). 'P' orders have no "
        "matching linestatus → exercises the null-extended side.",
)
def join_left_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (o.o_orderstatus == li.l_linestatus)
    return o.join(li, cond, "left").select(
        "o_orderkey", "o_orderstatus", "l_linenumber", "l_extendedprice"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Left-semi join (engine extension; reference has none, SURVEY §2.3). "
        "Semi joins ship only the key column of the probe side — at 100 TB "
        "prefer them over join+distinct.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (engine extension): customers with no orders — the "
        "orphan-detection dual of the reference's FK conventions (SURVEY §1.2).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "fk_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
    FROM events GROUP BY event_type
    """,
    doc="O-20/F-5 FK recovery via JSON path (ref: linkedPulseIds[0].linkedPulseId "
        "parsed from the raw value JSON, monday_etl_automated.py:390-395). "
        "get_json_object stays JVM-side — no Python UDF.",
)
def fk_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits (O-41..O-43)
# ---------------------------------------------------------------------------


@register(
    "top10_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="O-41/O-42 multi-key sort + limit (ref: ORDER BY date DESC, revenue "
        "DESC, advanced_monitoring.py:99). Spark plans TakeOrderedAndProject: "
        "per-partition top-k then a k-row merge on the driver — no full sort "
        "shuffle even at 100 TB. Unique tie-break (o_orderkey) makes the "
        "selected set deterministic.",
)
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations (O-44, intersect/except extensions)
# ---------------------------------------------------------------------------


@register(
    "union_counts",
    oracle="""
    SELECT 'orders' AS tbl, COUNT(*) AS n FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    """,
    doc="O-44 UNION ALL of per-table counts (ref: historical-count report, "
        "etl_final_fix.py:345-352). unionByName aligns by column name.",
)
def union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    dfs = []
    for t in ("orders", "lineitem", "customer", "part", "supplier"):
        dfs.append(
            load_table(spark, sf_dir, t).agg(F.count("*").alias("n")).select(
                F.lit(t).alias("tbl"), "n"
            )
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


@register(
    "setop_intersect",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (built-in extension; reference has none, SURVEY §2.7).",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    return c.intersect(s)


@register(
    "setop_except",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT (built-in extension): nations with customers but no suppliers.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    return c.exceptAll(s).distinct()


# ---------------------------------------------------------------------------
# Scalar function battery (F-1..F-14)
# ---------------------------------------------------------------------------


@register(
    "scalar_battery",
    oracle="""
    SELECT event_id,
           COALESCE(TRY_CAST(event_type AS DOUBLE), 0.0) AS f1_cast_default,
           CAST(strftime(ts, '%Y-%m-%d') AS DATE) AS f2_parsed_date,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS f5_json_k,
           ROUND(value, 2) AS f6_rounded,
           CAST(ts AS DATE) - 7 AS f7_week_ago,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS f8_days_since,
           NULLIF(TRIM(event_type), '') AS f12_nonempty,
           string_split(event_type, 'i')[1] AS f13_first_part,
           CAST(user_id AS VARCHAR) AS f14_id_str
    FROM events
    """,
    doc="Scalar function battery — F-1 (null-safe cast with default 0), F-2 "
        "(date parse), F-5 (JSON path), F-6 (round), F-7 (date_sub), F-8 "
        "(datediff), F-12 (empty-string guard), F-13 (first-of-array), F-14 "
        "(stringify). All built-in Catalyst expressions: the whole projection "
        "is one WholeStageCodegen span, no Python. Reference cites: "
        "monday_etl_automated.py:263-267/305-309/390-395, etl_final_fix.py:23-31.",
)
def scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tsd = F.col("ts").cast("date")
    return ev.select(
        "event_id",
        F.coalesce(F.col("event_type").cast("double"), F.lit(0.0)).alias("f1_cast_default"),
        F.to_date(F.date_format("ts", "yyyy-MM-dd"), "yyyy-MM-dd").alias("f2_parsed_date"),
        F.get_json_object("props", "$.k").cast("bigint").alias("f5_json_k"),
        F.round("value", 2).alias("f6_rounded"),
        F.date_sub(tsd, 7).alias("f7_week_ago"),
        F.datediff(tsd, F.lit("2024-01-01").cast("date")).alias("f8_days_since"),
        F.nullif(F.trim("event_type"), F.lit("")).alias("f12_nonempty"),
        F.element_at(F.split("event_type", "i"), 1).alias("f13_first_part"),
        F.col("user_id").cast("string").alias("f14_id_str"),
    )


# ---------------------------------------------------------------------------
# As-of join + sessionization (beyond-reference temporal extensions)
# ---------------------------------------------------------------------------


@register(
    "asof_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           epoch_us(c.ts) AS last_click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join (extension invited by the historical tables, SURVEY §2.3): "
        "each purchase paired with the same user's most recent click at-or-"
        "before it. Spark has no ASOF JOIN; we express it as a union-and-"
        "window plan: tag both streams, sort within user by time, carry the "
        "last click timestamp forward with last(ignorenulls) — one shuffle on "
        "user_id, no range-join explosion, linear in events at 100 TB.",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal_ops import asof_join as asof

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols={"ts": "last_click_ts"},
    )
    return out.select(
        "event_id",
        "user_id",
        # timestamps leave the query as epoch microseconds: the source
        # parquet is nanosecond-precision, so raw timestamp output would
        # compare differently across engines (SURVEY §1.3 type notes)
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.unix_micros("last_click_ts").alias("last_click_ts_us"),
    )


@register(
    "sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    )
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
    FROM flagged
    """,
    doc="Gap-based sessionization (extension; batch analogue of Structured "
        "Streaming session windows, SURVEY §2.10): new session when >30 min "
        "since the user's previous event. lag + running count of session "
        "starts — integer-only logic, deterministic; one shuffle on user_id.",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal_ops import sessionize as sess

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    out = sess(ev, key="user_id", ts="ts", gap=30 * 60, order_tiebreak="event_id")
    return out.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "session_no"
    )


@register(
    "salted_join_skew",
    oracle="""
    WITH l AS (
        SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
                    ELSE l_orderkey % 1000 END AS skey,
               l_extendedprice
        FROM lineitem
    ),
    d AS (SELECT range AS skey, 'grp_' || range AS grp_label FROM range(1000))
    SELECT d.grp_label, COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS revenue
    FROM l JOIN d USING (skey)
    GROUP BY d.grp_label
    """,
    doc="Salted join on a pathologically skewed key (~70% of lineitem rows "
        "collapse onto key 0): operators/join_ops.salted_join splits the hot "
        "key's probe rows across 8 salt buckets and replicates the dim rows "
        "into each, so no single shuffle partition owns the hot key — the "
        "explicit fallback for single-key skew beyond AQE's splitting. "
        "Salting is a pure partitioning change, so the result (and oracle) "
        "is the plain join's. bench.py times this against the unsalted plan "
        "with AQE skew handling and broadcast off (BENCH_DETAIL.json "
        "skew_demo).",
)
def salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.join_ops import salted_join

    left, dim = skewed_join_inputs(spark, sf_dir)
    joined = salted_join(left, dim, on="skey", how="inner", salt=8)
    return joined.groupBy("grp_label").agg(
        F.count("*").alias("n_rows"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
            2,
        ).alias("revenue"),
    )


def skewed_join_inputs(spark: SparkSession, sf_dir: str,
                       multiplier: int = 1, hot: int = 7):
    """(left, dim) for the skew demo: lineitem keyed so ~hot/10 of rows share
    key 0, against a 1000-row generated dimension. Shared by the registry
    query (salted plan, defaults matching its oracle) and bench.py's
    naive-vs-salted timing pair (which amplifies the input ``multiplier``×
    and raises ``hot`` so the hot key's single shuffle partition is large
    enough for task-level parallelism to dominate the salt overhead —
    miniature of the 100 TB case where that partition won't fit at all)."""
    left = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < hot, F.lit(0))
        .otherwise(F.col("l_orderkey") % 1000)
        .alias("skey"),
        "l_extendedprice",
    )
    if multiplier > 1:
        left = left.withColumn(
            "__m", F.explode(F.sequence(F.lit(1), F.lit(multiplier)))
        ).drop("__m")
    dim = spark.range(1000).select(
        F.col("id").alias("skey"),
        F.concat(F.lit("grp_"), F.col("id").cast("string")).alias("grp_label"),
    )
    return left, dim


@register(
    "hot_key_detection",
    oracle="""
    WITH l AS (
        SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
                    ELSE l_orderkey % 1000 END AS skey
        FROM lineitem
    ),
    tot AS (SELECT COUNT(*) AS n FROM l)
    SELECT l.skey, COUNT(*) AS n_rows,
           COUNT(*) / CAST(tot.n AS DOUBLE) AS share
    FROM l, tot GROUP BY l.skey, tot.n HAVING COUNT(*) > 0.01 * tot.n
    """,
    doc="Skew detection: keys holding >1% of the fact rows (here the 70%-hot "
        "synthetic key) — the cheap pre-pass operators/join_ops."
        "auto_salted_join decides with before paying salting's dim "
        "replication. One partial-aggregated count; the qualifying set is "
        "bounded at 1/threshold keys by construction.",
)
def hot_key_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, _ = skewed_join_inputs(spark, sf_dir)
    counts = left.groupBy("skey").agg(F.count("*").alias("n_rows"))
    total = left.count()
    return counts.filter(F.col("n_rows") > 0.01 * total).select(
        "skey", "n_rows",
        (F.col("n_rows") / F.lit(float(total))).alias("share"),
    )


@register(
    "join_auto_salted",
    oracle="""
    WITH l AS (
        SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
                    ELSE l_orderkey % 1000 END AS skey,
               l_extendedprice
        FROM lineitem
    ),
    d AS (SELECT range AS skey, 'grp_' || range AS grp_label FROM range(1000))
    SELECT d.grp_label, COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS revenue
    FROM l JOIN d USING (skey)
    GROUP BY d.grp_label
    """,
    doc="auto_salted_join end-to-end: detect hot keys (>1% of rows), salt "
        "only those, plain-join the cold remainder, union — the production "
        "form of salted_join_skew that does not replicate the dim for keys "
        "that don't need it. Partitioning-only change: the oracle is the "
        "plain join's.",
)
def join_auto_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.join_ops import auto_salted_join

    left, dim = skewed_join_inputs(spark, sf_dir)
    joined = auto_salted_join(left, dim, on="skey", salt=8,
                              threshold_frac=0.01)
    return joined.groupBy("grp_label").agg(
        F.count("*").alias("n_rows"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
            2,
        ).alias("revenue"),
    )


@register(
    "join_full_outer",
    oracle="""
    WITH hi_cust AS (
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
    ),
    o95 AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
        GROUP BY o_custkey
    )
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           c.c_mktsegment,
           o.n_orders,
           CASE WHEN c.c_custkey IS NULL THEN 'right_only'
                WHEN o.o_custkey IS NULL THEN 'left_only'
                ELSE 'both' END AS match_type
    FROM hi_cust c FULL OUTER JOIN o95 o ON o.o_custkey = c.c_custkey
    """,
    doc="FULL OUTER join — the one outer-join flavor the registry lacked: "
        "high-balance customers vs their 1995 order counts, so BOTH sides "
        "carry unmatched rows (rich customers who sat 1995 out; active "
        "customers below the balance cut). Shuffle hash join on the key "
        "with null-extended rows from each side; at scale the same plan "
        "as an inner join — full outer only forbids the broadcast "
        "fast-path for the preserved sides.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_mktsegment")
    )
    o95 = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )
    j = cust.join(o95, cust.c_custkey == o95.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_mktsegment",
        "n_orders",
        F.when(F.col("c_custkey").isNull(), F.lit("right_only"))
        .when(F.col("o_custkey").isNull(), F.lit("left_only"))
        .otherwise(F.lit("both"))
        .alias("match_type"),
    )


@register(
    "collection_battery",
    oracle="""
    WITH arrs AS (
        SELECT l_orderkey,
               list_sort(list(CAST(l_quantity AS BIGINT))) AS arr
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(arr) AS INT) AS n_items,
           CAST(list_reduce(arr, (a, b) -> a + b) AS BIGINT) AS total_qty,
           CAST(len([x for x in arr if x >= 25]) AS INT) AS n_big,
           CAST(len([x for x in arr if x <= 0]) = 0 AS INT) AS all_positive,
           CAST(len([x for x in arr if x = 50]) > 0 AS INT) AS any_max,
           CAST(list_reduce([arr[i] * i for i in range(1, len(arr) + 1)],
                            (a, b) -> a + b) AS BIGINT) AS rank_weighted
    FROM arrs
    """,
    doc="Higher-order collection functions end-to-end, each with a DuckDB "
        "list twin: transform/zip_with (rank-weighted sum), filter "
        "(conditional count), forall/exists (flags as INT for portable "
        "hashing), aggregate (ordered integer fold — order-insensitive "
        "ONLY because the array is sorted first and the elements are "
        "integers; the cross-engine rule that makes folds exact). Arrays "
        "built per order via sort_array(collect_list(...)): one shuffle, "
        "then the whole battery is a single codegen'd projection — the "
        "HOFs never leave the JVM (no Python, no explode round-trip).",
)
def collection_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    arrs = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.col("l_quantity").cast("long"))).alias("arr")
    )
    zero = F.lit(0).cast("long")
    return arrs.select(
        "l_orderkey",
        F.size("arr").alias("n_items"),
        F.aggregate("arr", zero, lambda a, x: a + x).alias("total_qty"),
        F.size(F.filter("arr", lambda x: x >= 25)).alias("n_big"),
        F.forall("arr", lambda x: x > 0).cast("int").alias("all_positive"),
        F.exists("arr", lambda x: x == 50).cast("int").alias("any_max"),
        F.aggregate(
            F.zip_with(
                "arr",
                F.sequence(F.lit(1).cast("long"), F.size("arr").cast("long")),
                lambda x, i: x * i,
            ),
            zero,
            lambda a, x: a + x,
        ).alias("rank_weighted"),
    )


_CORRELATED_SQL = """
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_small,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                  AS DOUBLE), 2) AS small_revenue
FROM {li} l
WHERE l.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity) FROM {li} l2
    WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_returnflag
"""


@register(
    "sql_correlated_subquery",
    oracle=_CORRELATED_SQL.replace("{li}", "lineitem"),
    doc="Raw ANSI SQL as the entry path (the reference's users write SQL "
        "against BigQuery; this engine accepts the same text via "
        "spark.sql with DataFrame named-argument substitution — no temp "
        "views, no session state). The query is the construct only SQL "
        "states directly: a CORRELATED scalar subquery (TPC-H Q17 shape "
        "— lineitems under half their part's average quantity). Catalyst "
        "DECORRELATES it into one per-part aggregate joined back onto "
        "the fact scan, so at 100 TB the 'per-row subquery' is a single "
        "partial+final aggregate plus one join — never re-executed per "
        "row. Bit-exact cross-engine because l_quantity is "
        "integer-valued: the AVG's double sum is exact (< 2^53), halving "
        "is exact in binary, and the oracle is the IDENTICAL text run by "
        "DuckDB.",
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return spark.sql(_CORRELATED_SQL, li=li)
