"""Product-analytics operators over the event log: ordered funnels and
cohort retention — the two queries every event warehouse serves daily.

Both are expressed as join/agg plans on the ``events`` table with exact
integer counts; the only doubles are single IEEE divisions (ratios), so
results are bit-deterministic and SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

_FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "funnel_analysis",
    oracle="""
    WITH u1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    u2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN u1 ON u1.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > u1.t1
        GROUP BY e.user_id
    ),
    u3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN u2 ON u2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > u2.t2
        GROUP BY e.user_id
    ),
    steps AS (
        SELECT 1 AS step, 'view' AS step_name,
               CAST((SELECT COUNT(*) FROM u1) AS BIGINT) AS n_users
        UNION ALL
        SELECT 2, 'click', CAST((SELECT COUNT(*) FROM u2) AS BIGINT)
        UNION ALL
        SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM u3) AS BIGINT)
    )
    SELECT step, step_name, n_users,
           CAST(n_users AS DOUBLE)
           / (SELECT CAST(n_users AS DOUBLE) FROM steps WHERE step = 1)
               AS conv_from_first
    FROM steps
    """,
    doc="Ordered funnel (view -> click -> purchase): step k counts users "
        "whose first step-k event strictly follows their first step-(k-1) "
        "event. Each stage is a type-filtered scan (predicate pushed into "
        "the parquet scan) aggregated per user, semi-joined onto the "
        "previous stage's first-event times; inputs shrink monotonically "
        "down the funnel, and every join key is user_id so the shuffles "
        "are narrow. Ratios are single IEEE divisions of exact counts.",
)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    stage = None
    counts = []
    for step_name in _FUNNEL_STEPS:
        typed = ev.filter(F.col("event_type") == step_name)
        if stage is None:
            stage = typed.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            stage = (
                typed.join(stage.select("user_id", F.col("t").alias("t_prev")),
                           "user_id")
                .filter(F.col("ts") > F.col("t_prev"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        counts.append(stage.agg(F.count(F.lit(1)).alias("n_users")))

    rows = None
    for i, (step_name, c) in enumerate(zip(_FUNNEL_STEPS, counts), start=1):
        r = c.select(
            F.lit(i).alias("step"),
            F.lit(step_name).alias("step_name"),
            "n_users",
        )
        rows = r if rows is None else rows.unionByName(r)
    first = counts[0].select(F.col("n_users").cast("double").alias("n_first"))
    return rows.crossJoin(F.broadcast(first)).select(
        "step", "step_name", "n_users",
        (F.col("n_users").cast("double") / F.col("n_first"))
        .alias("conv_from_first"),
    )


@register(
    "cohort_retention",
    oracle="""
    WITH weeks AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ),
    cohorts AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM weeks GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM cohorts GROUP BY cohort_week
    ),
    activity AS (
        SELECT c.cohort_week,
               date_diff('day', c.cohort_week, w.wk) // 7 AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM weeks w JOIN cohorts c ON c.user_id = w.user_id
        GROUP BY 1, 2
    )
    SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
           CAST(a.n_active AS DOUBLE) / s.cohort_size AS retention
    FROM activity a JOIN sizes s ON s.cohort_week = a.cohort_week
    """,
    doc="Weekly cohort retention matrix: cohort = ISO week of a user's "
        "first event; cell (cohort, offset) = fraction of the cohort "
        "active offset weeks later. Plan: ONE distinct over (user, week) "
        "feeds both the cohort assignment (min per user) and the activity "
        "join, so the event log is scanned once; the per-cohort sizes "
        "table is weeks-sized and broadcast back. Counts are exact; "
        "retention is a single IEEE division.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    weeks = (
        ev.select(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        )
        .distinct()
        .persist()  # feeds both the cohort min and the activity join
    )
    cohorts = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    activity = (
        weeks.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("datediff(wk, cohort_week) div 7").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return activity.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week", "week_offset", "n_active", "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size"))
        .alias("retention"),
    )
