"""Advanced patterns: bucketed range join and an exact-oracle applyInPandas
grouped transform.

The range join completes the join family SURVEY §2.3 notes as absent from
the reference; the grouped z-score shows the §2.9 extension surface
(applyInPandas) with arithmetic designed to stay bit-identical to SQL.
"""

from __future__ import annotations

from collections.abc import Iterator  # noqa: F401  (doc parity with multimodal)

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load_table
from .registry import register

_WINDOW_US = 5 * 60 * 1_000_000  # 5 minutes


@register(
    "range_join_bucketed",
    oracle=f"""
    SELECT e.event_id, e.user_id,
           COUNT(p.event_id) AS n_recent_same_user
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN events p
      ON p.user_id = e.user_id
     AND p.event_id <> e.event_id
     AND epoch_us(p.ts) >  epoch_us(e.ts) - {_WINDOW_US}
     AND epoch_us(p.ts) <= epoch_us(e.ts)
    GROUP BY e.event_id, e.user_id
    """,
    doc="Range join done scale-safely: instead of the raw theta join "
        "(user_id equi + time range — the probe side would scan every user "
        "row), both sides are bucketed into 5-minute time buckets and the "
        "join key becomes (user_id, bucket) with the probe exploded to "
        "[bucket-1, bucket] — each error row meets only ~2 buckets of its "
        "user's events, then the exact range predicate filters. At 100 TB "
        "the bucket join is an equi-join Catalyst can shuffle/broadcast "
        "normally; the O(n·m) per-user blowup never happens.",
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    errors = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))
    )
    bucket = (F.col("ts_us") / _WINDOW_US).cast("long")
    # probe (errors) explodes to its bucket and the previous one: any event
    # within [t-5min, t] lives in one of those two buckets
    probe = errors.withColumn(
        "bucket", F.explode(F.array(bucket - 1, bucket))
    ).select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts_us").alias("e_ts"),
        "bucket",
    )
    build = ev.withColumn("bucket", bucket).select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("p_ts"),
        "bucket",
    )
    joined = probe.join(
        build,
        (probe.e_user == build.p_user)
        & (probe.bucket == build.bucket)
        & (build.p_id != probe.e_id)
        & (build.p_ts > probe.e_ts - _WINDOW_US)
        & (build.p_ts <= probe.e_ts),
        "left",
    )
    return joined.groupBy(
        F.col("e_id").alias("event_id"), F.col("e_user").alias("user_id")
    ).agg(F.count("p_id").alias("n_recent_same_user"))


_Z_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


@register(
    "grouped_zscore_pandas",
    oracle="""
    WITH stats AS (
        SELECT user_id,
               COUNT(*) AS n,
               SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sum_c,
               SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
                   * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sumsq_c
        FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id, e.value,
           CASE WHEN s.n > 1 AND
                     (CAST(s.sumsq_c AS DOUBLE) - CAST(s.sum_c AS DOUBLE)
                      * s.sum_c / s.n) > 0
                THEN (CAST(floor(e.value * 100 + 0.5) AS BIGINT) - CAST(s.sum_c AS DOUBLE) / s.n)
                     / sqrt((CAST(s.sumsq_c AS DOUBLE) - CAST(s.sum_c AS DOUBLE)
                             * s.sum_c / s.n) / (s.n - 1))
                ELSE 0.0 END AS zscore
    FROM events e JOIN stats s USING (user_id)
    """,
    doc="applyInPandas grouped transform (§2.9 extension surface, the "
        "SNIPPETS grouped-map pattern): per-user z-score of event values. "
        "Group sums are exact integer cents (numpy int64) so the pandas "
        "computation is bit-identical to the SQL formula — a demonstration "
        "that Python extension ops can still satisfy the exact oracle gate. "
        "Arrow-batched per group; shuffles once on user_id.",
)
def grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def zscore_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cents = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        d = pd.DataFrame({"u": pdf["user_id"].to_numpy(), "c": cents, "c2": cents * cents})
        g = d.groupby("u", sort=False)
        n = g["c"].transform("size").to_numpy().astype(np.int64)
        sum_c = g["c"].transform("sum").to_numpy()  # int64: exact
        sumsq_c = g["c2"].transform("sum").to_numpy()
        # same IEEE op order as the single-user branch: float(sumsq) - float(sum)*sum/n
        num = sumsq_c.astype(np.float64) - sum_c.astype(np.float64) * sum_c / n
        ok = (n > 1) & (num > 0)
        mean_c = sum_c.astype(np.float64) / n
        std_c = np.sqrt(np.where(ok, num, 1.0) / np.maximum(n - 1, 1))
        z = np.where(ok, (cents - mean_c) / std_c, 0.0)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "zscore": z,
            }
        )

    # salt-bucketed grouped-map: grouping directly by user_id makes one
    # Arrow batch + one Python call PER USER (1,500 calls of ~67 rows at
    # sf0.1 — per-call overhead dominated, 4.2 s warm). Grouping by a hash
    # bucket of the user and running a vectorized pandas groupby INSIDE the
    # batch keeps the math per-user and bit-identical while cutting Python
    # invocations to the bucket count. Same one shuffle; at 100 TB bucket
    # count scales with the cluster, and no bucket ever holds more than
    # ~|users|/buckets users (hash-balanced), so batches stay bounded.
    buckets = max(2, ev.sparkSession.sparkContext.defaultParallelism)
    return (
        ev.withColumn("__b", F.pmod(F.hash("user_id"), F.lit(buckets)))
        .groupBy("__b")
        .applyInPandas(zscore_bucket, schema=_Z_SCHEMA)
    )
