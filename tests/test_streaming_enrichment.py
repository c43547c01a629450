"""Drained-streaming == batch parity for the r04 streaming additions:
trending top-K and stream-static enrichment. Also: a second drain with no
new files emits nothing new (checkpointed exactly-once)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from monday_etl_spark.functions import money_sum
from monday_etl_spark.io import load_table
from monday_etl_spark.streaming.enriched import run_enriched_rollup
from monday_etl_spark.streaming.trending import run_trending_topk

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_trending_topk_equals_batch(spark):
    root = tempfile.mkdtemp(prefix="trend_t_")
    got = run_trending_topk(spark, SF, f"{root}/ckpt", f"{root}/out")

    from pyspark.sql import Window

    ev = load_table(spark, SF, "events")
    counts = ev.groupBy(
        F.window("ts", "6 hours").alias("w"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("w").orderBy(F.desc("n_events"), F.asc("event_type"))
    want = (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type", "n_events", "rnk",
        )
    )
    assert _rows(got) == _rows(want)

    # re-drain with the same checkpoint: no new input -> result unchanged
    again = run_trending_topk(spark, SF, f"{root}/ckpt", f"{root}/out")
    assert _rows(again) == _rows(want)


def test_enriched_rollup_equals_batch_join(spark):
    root = tempfile.mkdtemp(prefix="enr_t_")
    got = run_enriched_rollup(spark, SF, f"{root}/ckpt", f"{root}/out")

    ev = load_table(spark, SF, "events")
    cust = load_table(spark, SF, "customer")
    want = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy(F.col("ts").cast("date").alias("event_date"), "c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value")).alias("total_value"),
        )
    )
    assert _rows(got) == _rows(want)
    # every event joined (user_id domain is covered by the dimension)
    assert got.agg(F.sum("n_events")).collect()[0][0] == ev.count()
