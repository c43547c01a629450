"""Temporal layer: idempotent dual-write (the §2.10 double-append fix),
day-over-day compare, quality probes."""

from __future__ import annotations

import datetime as dt

import pytest

from monday_etl_spark.temporal import (
    check_completeness,
    check_duplicates,
    check_freshness,
    compare_with_previous_day,
    dual_write,
    health_report,
    read_historical,
)


def _snapshot(spark, day: str, ids, revenue=100.0):
    rows = [
        (dt.date.fromisoformat(day), str(i), float(revenue))
        for i in ids
    ]
    return spark.createDataFrame(
        rows, "extraction_date date, subitem_id string, revenue_amount double"
    )


def test_dual_write_same_day_rerun_is_idempotent(spark, tmp_path):
    base = str(tmp_path)
    df1 = _snapshot(spark, "2025-06-25", range(5))
    dual_write(df1, base, "subitems")
    # re-run the same day (the reference double-appends here: 2x rows)
    dual_write(df1, base, "subitems")
    hist = read_historical(spark, base, "subitems")
    assert hist.count() == 5  # not 10

    # a second day appends its own partition, leaving day 1 intact
    df2 = _snapshot(spark, "2025-06-26", range(7))
    dual_write(df2, base, "subitems")
    hist = read_historical(spark, base, "subitems")
    assert hist.count() == 12
    assert (
        hist.filter("extraction_date = DATE'2025-06-25'").count() == 5
    )

    # snapshot table always holds only the latest run
    snap = spark.read.parquet(f"{base}/subitems")
    assert snap.count() == 7


def test_compare_with_previous_day(spark, tmp_path):
    base = str(tmp_path)
    dual_write(_snapshot(spark, "2025-06-25", range(4), revenue=50.0), base, "s")
    dual_write(_snapshot(spark, "2025-06-26", range(6), revenue=75.0), base, "s")
    row = compare_with_previous_day(
        read_historical(spark, base, "s"), "subitem_id", "revenue_amount"
    ).first()
    assert row.today == dt.date(2025, 6, 26)
    assert row.entities_today == 6 and row.entities_yesterday == 4
    assert row.entities_change == 2
    assert row.measure_today == pytest.approx(450.0)
    assert row.measure_change == pytest.approx(450.0 - 200.0)


def test_compare_first_day_has_null_previous(spark, tmp_path):
    base = str(tmp_path)
    dual_write(_snapshot(spark, "2025-06-25", range(3)), base, "s")
    row = compare_with_previous_day(
        read_historical(spark, base, "s"), "subitem_id", "revenue_amount"
    ).first()
    assert row.entities_yesterday is None and row.measure_change is None


def test_quality_probes(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 0.0), ("b", 5.0)],
        "subitem_id string, revenue_amount double",
    )
    dup = check_duplicates(df, "subitem_id").first()
    assert dup.n_duplicate_keys == 1 and dup.n_rows_in_duplicates == 2

    comp = check_completeness(df, "revenue_amount").first()
    assert comp.n_rows == 3 and comp.n_with_measure == 2
    assert comp.coverage_pct == pytest.approx(200 / 3)
    assert comp.total_measure == pytest.approx(15.0)

    hist = spark.createDataFrame(
        [(dt.date(2025, 6, 24),)], "extraction_date date"
    )
    fresh = check_freshness(hist, "2025-06-26").first()
    assert fresh.days_stale == 2


def test_health_report_shape(spark, tmp_path):
    base = str(tmp_path)
    dual_write(_snapshot(spark, "2025-06-25", range(3)), base, "s")
    dual_write(_snapshot(spark, "2025-06-26", range(4)), base, "s")
    rep = health_report(
        spark.read.parquet(f"{base}/s"),
        read_historical(spark, base, "s"),
        "subitem_id",
        "revenue_amount",
        "2025-06-27",
    )
    assert rep["completeness"]["n_rows"] == 4
    assert rep["duplicates"]["n_duplicate_keys"] == 0
    assert rep["freshness"]["days_stale"] == 1
    assert rep["day_over_day"]["entities_change"] == 1
