"""Report rendering + alert thresholds (O-35/O-36/O-37 driver-side layer)."""

from __future__ import annotations

import datetime as dt

from monday_etl_spark.report import (
    check_alerts,
    console_notifier,
    render_health_report,
    trend_chart_png,
)

REPORT = {
    "completeness": {
        "n_rows": 805,
        "n_with_measure": 531,
        "total_measure": 2697768.06,
        "coverage_pct": 65.96,
    },
    "duplicates": {"n_duplicate_keys": 0, "n_rows_in_duplicates": 0},
    "freshness": {"last_extraction_date": dt.date(2025, 6, 25), "days_stale": 0},
    "day_over_day": {
        "entities_today": 805,
        "entities_change": 3,
        "measure_today": 2697768.06,
        "measure_change": 1200.5,
    },
}


def test_render_health_report():
    text = render_health_report(REPORT)
    assert "2,697,768.06" in text
    assert "66.0%" in text
    assert "+3 vs yesterday" in text
    assert "+1,200.50 vs yesterday" in text
    assert "duplicate keys: 0" in text


def test_render_handles_missing_sections():
    text = render_health_report({"completeness": {}, "day_over_day": None})
    assert "n/a" in text


def test_alerts_fire_on_thresholds():
    bad = {
        "completeness": {"coverage_pct": 42.0},
        "duplicates": {"n_duplicate_keys": 7},
        "freshness": {"days_stale": 5},
    }
    alerts = check_alerts(bad)
    assert len(alerts) == 3
    assert any("42.0%" in a for a in alerts)
    assert check_alerts(REPORT) == []


def test_console_notifier(capsys):
    console_notifier("subj", "body")
    out = capsys.readouterr().out
    assert "subj" in out and "body" in out


def test_trend_chart_gated(tmp_path):
    rows = [
        {"order_date": dt.date(2025, 6, d), "n_orders": d, "n_lineitems": d * 2,
         "total_revenue": 100.0 * d, "revenue_change": 1.0}
        for d in range(1, 8)
    ]
    out = trend_chart_png(rows, str(tmp_path / "trend.png"))
    # matplotlib may be absent: None is the documented gated result
    assert out is None or out.endswith("trend.png")
