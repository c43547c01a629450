"""Stateful streaming sessionization must agree with the batch sessionizer
on a drained source, and merge_upsert must behave like MERGE INTO."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from monday_etl_spark.io import load_table
from monday_etl_spark.operators.temporal_ops import sessionize
from monday_etl_spark.streaming.stateful_sessions import run_stateful_sessions
from monday_etl_spark.temporal import latest_snapshot_view, merge_upsert

from .conftest import SF_SMOKE


def test_stateful_sessions_match_batch(spark, tmp_path):
    streaming = run_stateful_sessions(
        spark, SF_SMOKE, str(tmp_path / "ckpt"), name="stateful_sessions_t1"
    )
    got = sorted(map(tuple, streaming.collect()))

    batch = sessionize(
        load_table(spark, SF_SMOKE, "events").select("user_id", "event_id", "ts"),
        key="user_id", ts="ts", gap=1800, order_tiebreak="event_id",
    ).select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "session_no")
    want = sorted(map(tuple, batch.collect()))
    assert got == want


def test_merge_upsert(spark, tmp_path):
    path = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "id string, v double"
    )
    merge_upsert(spark, path, base, key="id")

    updates = spark.createDataFrame(
        [("b", 20.0), ("d", 4.0)], "id string, v double"
    )
    merge_upsert(spark, path, updates, key="id")

    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {"a": 1.0, "b": 20.0, "c": 3.0, "d": 4.0}

    # idempotent re-apply
    merge_upsert(spark, path, updates, key="id")
    assert spark.read.parquet(path).count() == 4


def test_latest_snapshot_view(spark):
    hist = spark.createDataFrame(
        [
            ("s1", dt.datetime(2025, 6, 24, 9), 10.0),
            ("s1", dt.datetime(2025, 6, 25, 9), 11.0),
            ("s2", dt.datetime(2025, 6, 24, 9), 20.0),
        ],
        "subitem_id string, extraction_timestamp timestamp, revenue_amount double",
    )
    out = {r.subitem_id: r.revenue_amount
           for r in latest_snapshot_view(hist, "subitem_id").collect()}
    assert out == {"s1": 11.0, "s2": 20.0}
