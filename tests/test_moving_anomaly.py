"""Semantic pin for timeseries_moving_anomaly: the 2-sigma flag fires on a
crafted revenue spike and nowhere else (oracle parity is covered for the real
tables by test_queries_oracle)."""

from __future__ import annotations

import datetime as dt

from monday_etl_spark.queries.registry import REGISTRY


def _write_orders(spark, root, rows):
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{root}/orders.parquet")


def test_spike_day_flagged(spark, tmp_path):
    # 14 steady days at $1000 +/- small jitter, one 10x spike in the middle
    rows = []
    for i in range(14):
        day = dt.datetime(1995, 3, 1) + dt.timedelta(days=i)
        price = 10_000.0 if i == 9 else 1000.0 + (i % 3)
        rows.append((i, 1, "O", price, day, "1-URGENT"))
    _write_orders(spark, str(tmp_path), rows)

    out = REGISTRY["timeseries_moving_anomaly"].fn(spark, str(tmp_path)).collect()
    flags = {r["day"].isoformat(): r["is_anomaly"] for r in out}
    assert flags["1995-03-10"] == 1  # the spike
    assert sum(flags.values()) == 1  # nothing else fires
    by_day = {r["day"].isoformat(): r for r in out}
    # trailing window stats are exact integers
    assert by_day["1995-03-10"]["revenue_cents"] == 1_000_000
    assert by_day["1995-03-02"]["mov_n"] == 2


def test_short_history_never_flags(spark, tmp_path):
    # fewer than 4 points in every window -> flag suppressed even for a spike
    rows = [
        (0, 1, "O", 1000.0, dt.datetime(1995, 5, 1), "1-URGENT"),
        (1, 1, "O", 1000.0, dt.datetime(1995, 5, 2), "1-URGENT"),
        (2, 1, "O", 99_000.0, dt.datetime(1995, 5, 3), "1-URGENT"),
    ]
    _write_orders(spark, str(tmp_path), rows)
    out = REGISTRY["timeseries_moving_anomaly"].fn(spark, str(tmp_path)).collect()
    assert all(r["is_anomaly"] == 0 for r in out)
