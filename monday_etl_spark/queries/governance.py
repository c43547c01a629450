"""Data-governance operators: declarative constraint auditing and SCD2
history builds.

The reference guards its tables with schema autodetect + drift checks at
load time (catalog.py twin of its DDL handling); production pipelines also
audit *values* after every load — null keys, range violations, duplicate
keys, orphaned foreign keys — and keep slowly-changing history for entities
whose attributes drift over time. Both are expressed here as plain
DataFrame plans so Catalyst keeps them single-scan / single-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

# (check_name, violation predicate as Spark Column fn / DuckDB SQL text).
# One entry per rule; both engines evaluate the same predicate text.
_LINEITEM_RULES = [
    ("li_quantity_range", "l_quantity <= 0 OR l_quantity > 50"),
    ("li_price_positive", "l_extendedprice <= 0"),
    ("li_discount_unit_interval", "l_discount < 0 OR l_discount > 1"),
    ("li_shipdate_null", "l_shipdate IS NULL"),
    ("li_orderkey_null", "l_orderkey IS NULL"),
]
_ORDERS_RULES = [
    ("ord_totalprice_positive", "o_totalprice <= 0"),
    ("ord_orderdate_null", "o_orderdate IS NULL"),
    ("ord_custkey_null", "o_custkey IS NULL"),
]


def _rule_scan(df: DataFrame, table: str, rules) -> DataFrame:
    """ONE full scan of ``df`` evaluating every rule as a conditional sum
    (map-side partial agg -> single final row), then unfolded to one row
    per rule with a stack — no per-rule rescans."""
    aggs = [F.count(F.lit(1)).alias("n_checked")] + [
        # coalesce: a NULL predicate (NULL operand) is NOT a violation —
        # same as the oracle's CASE ... ELSE 0, and keeps an all-NULL
        # column from summing to NULL instead of 0
        F.sum(F.coalesce(F.expr(pred).cast("long"), F.lit(0))).alias(name)
        for name, pred in rules
    ]
    one = df.agg(*aggs)
    stack = ", ".join(f"'{name}', {name}" for name, _ in rules)
    return one.select(
        F.lit(table).alias("table_name"),
        F.expr(f"stack({len(rules)}, {stack}) AS (check_name, n_violations)"),
        "n_checked",
    ).select("table_name", "check_name", "n_violations", "n_checked")


@register(
    "data_quality_audit",
    oracle="""
    WITH li AS (
        SELECT COUNT(*) AS n_checked,
               CAST(SUM(CASE WHEN l_quantity <= 0 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS li_quantity_range,
               CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS li_price_positive,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS li_discount_unit_interval,
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS li_shipdate_null,
               CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS li_orderkey_null
        FROM lineitem
    ),
    ord AS (
        SELECT COUNT(*) AS n_checked,
               CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS ord_totalprice_positive,
               CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ord_orderdate_null,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ord_custkey_null
        FROM orders
    ),
    li_rows AS (
        SELECT 'lineitem' AS table_name, u.check_name,
               CASE u.check_name
                   WHEN 'li_quantity_range' THEN li_quantity_range
                   WHEN 'li_price_positive' THEN li_price_positive
                   WHEN 'li_discount_unit_interval' THEN li_discount_unit_interval
                   WHEN 'li_shipdate_null' THEN li_shipdate_null
                   WHEN 'li_orderkey_null' THEN li_orderkey_null
               END AS n_violations, n_checked
        FROM li, UNNEST(['li_quantity_range', 'li_price_positive',
                         'li_discount_unit_interval', 'li_shipdate_null',
                         'li_orderkey_null']) AS u(check_name)
    ),
    ord_rows AS (
        SELECT 'orders' AS table_name, u.check_name,
               CASE u.check_name
                   WHEN 'ord_totalprice_positive' THEN ord_totalprice_positive
                   WHEN 'ord_orderdate_null' THEN ord_orderdate_null
                   WHEN 'ord_custkey_null' THEN ord_custkey_null
               END AS n_violations, n_checked
        FROM ord, UNNEST(['ord_totalprice_positive', 'ord_orderdate_null',
                          'ord_custkey_null']) AS u(check_name)
    ),
    fk_li AS (
        SELECT 'lineitem' AS table_name, 'li_orderkey_orphan' AS check_name,
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
                   AS n_violations,
               (SELECT COUNT(*) FROM lineitem) AS n_checked
    ),
    fk_ord AS (
        SELECT 'orders' AS table_name, 'ord_custkey_orphan' AS check_name,
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
                   AS n_violations,
               (SELECT COUNT(*) FROM orders) AS n_checked
    ),
    dup_ord AS (
        SELECT 'orders' AS table_name, 'ord_orderkey_unique' AS check_name,
               CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT)
                   AS n_violations,
               (SELECT COUNT(*) FROM orders) AS n_checked
    )
    SELECT * FROM li_rows
    UNION ALL SELECT * FROM ord_rows
    UNION ALL SELECT * FROM fk_li
    UNION ALL SELECT * FROM fk_ord
    UNION ALL SELECT * FROM dup_ord
    """,
    doc="Declarative data-quality audit (Deequ/expectations-style): every "
        "value rule on a table folds into ONE scan as conditional sums "
        "(map-side partial agg, then stack to one row per rule); "
        "referential rules are key-only anti-join counts (columns pruned "
        "to the join key before the shuffle, dim side broadcast when "
        "small); uniqueness is count - countDistinct in the same single "
        "agg. Scale: cost is one scan per table + one key-shuffle per FK, "
        "independent of rule count. Extends the reference's load-time "
        "schema drift guard (catalog autodetect) to value-level auditing.",
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    li_rows = _rule_scan(li, "lineitem", _LINEITEM_RULES)
    ord_rows = _rule_scan(orders, "orders", _ORDERS_RULES)

    n_li = li.count()
    n_ord = orders.count()
    # key-only anti joins: project to the key before shuffling so the
    # exchange carries 8 bytes/row; Catalyst broadcasts the small side
    li_orphans = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.lit("lineitem").alias("table_name"),
            F.lit("li_orderkey_orphan").alias("check_name"),
            "n_violations",
            F.lit(n_li).alias("n_checked"),
        )
    )
    ord_orphans = (
        orders.select("o_custkey")
        .join(cust.select("c_custkey"),
              F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.lit("orders").alias("table_name"),
            F.lit("ord_custkey_orphan").alias("check_name"),
            "n_violations",
            F.lit(n_ord).alias("n_checked"),
        )
    )
    dup_ord = (
        orders.agg(
            (F.count("o_orderkey") - F.countDistinct("o_orderkey"))
            .alias("n_violations")
        )
        .select(
            F.lit("orders").alias("table_name"),
            F.lit("ord_orderkey_unique").alias("check_name"),
            "n_violations",
            F.lit(n_ord).alias("n_checked"),
        )
    )
    return (
        li_rows.unionByName(ord_rows)
        .unionByName(li_orphans)
        .unionByName(ord_orphans)
        .unionByName(dup_ord)
    )


@register(
    "scd2_history",
    oracle="""
    WITH changes AS (
        SELECT user_id, event_type AS status, ts, event_id,
               LAG(event_type) OVER w AS prev_status
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    versions AS (
        SELECT user_id, status, ts, event_id
        FROM changes
        WHERE prev_status IS NULL OR status <> prev_status
    )
    SELECT user_id, status,
           ROW_NUMBER() OVER w AS version_n,
           epoch_us(ts) AS valid_from_us,
           epoch_us(LEAD(ts) OVER w) AS valid_to_us,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM versions
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD Type-2 history build from an event log: collapse consecutive "
        "equal statuses to change points (LAG), then version each change "
        "with valid_from/valid_to interval columns (LEAD) and an "
        "is_current flag — the standard dimension-history shape the "
        "reference's historical sink (write_historical) feeds but never "
        "derives. One shuffle on the entity key serves both window passes "
        "(same partition key, Catalyst reuses the sort); ties broken by "
        "event_id for a total order. Intervals emitted as epoch-us "
        "(engine-portable).",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", F.col("event_type").alias("status"), "ts",
                  "event_id")
        .withColumn("prev_status", F.lag("status").over(w))
        .filter(F.col("prev_status").isNull()
                | (F.col("status") != F.col("prev_status")))
    )
    return changes.select(
        "user_id",
        "status",
        F.row_number().over(w).alias("version_n"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey")


@register(
    "table_profile",
    oracle="""
    WITH vals AS (
        SELECT 'o_orderstatus' AS col_name, CAST(o_orderstatus AS VARCHAR) AS val FROM orders
        UNION ALL
        SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
    ),
    counts AS (
        SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS c
        FROM vals WHERE val IS NOT NULL GROUP BY col_name, val
    ),
    per_col AS (
        SELECT col_name,
               CAST(SUM(c) AS BIGINT) AS n_nonnull,
               CAST(COUNT(*) AS BIGINT) AS n_distinct
        FROM counts GROUP BY col_name
    ),
    top AS (
        SELECT col_name, val AS top_value, c AS top_count
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY col_name
                                           ORDER BY c DESC, val) AS rn
              FROM counts) t
        WHERE rn = 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders)
    SELECT p.col_name, n.n_rows, n.n_rows - p.n_nonnull AS n_nulls,
           p.n_distinct, t.top_value, t.top_count
    FROM per_col p JOIN top t USING (col_name) CROSS JOIN n
    """,
    doc="Column profiling (ANALYZE-style): one stacked (col, value) pass "
        "over the profiled columns -> single shuffle keyed on (col, value) "
        "-> per-column null/distinct/top-value stats from that one "
        "aggregate (WindowGroupLimit for the mode). The profile the "
        "reference's schema-autodetect stops short of: value-level stats "
        "that drive partition/bucket sizing decisions. Adding columns "
        "adds map-side stack rows, not scans. String-cast values only "
        "(strings + int keys) — float formatting is engine-specific.",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    stack = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _PROFILE_COLS
    )
    vals = orders.select(
        F.expr(f"stack({len(_PROFILE_COLS)}, {stack}) AS (col_name, val)")
    )
    counts = (
        vals.filter(F.col("val").isNotNull())
        .groupBy("col_name", "val")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()  # feeds per-column stats AND the mode window
    )
    per_col = counts.groupBy("col_name").agg(
        F.sum("c").alias("n_nonnull"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    w = Window.partitionBy("col_name").orderBy(F.desc("c"), F.asc("val"))
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("col_name", F.col("val").alias("top_value"),
                F.col("c").alias("top_count"))
    )
    n_rows = orders.count()
    return per_col.join(top, "col_name").select(
        "col_name",
        F.lit(n_rows).alias("n_rows"),
        (F.lit(n_rows) - F.col("n_nonnull")).alias("n_nulls"),
        "n_distinct",
        "top_value",
        "top_count",
    )
