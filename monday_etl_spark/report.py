"""Report/notification layer — the driver-side tail of the pipeline
(SURVEY.md §2.1 O-35/O-36/O-37).

The reference renders a text report and emails it with an optional trend PNG
(monday_etl_automated.py:647-691; advanced_monitoring.py:270-375). Here the
rendering is pure functions over collected 1-row results; delivery is a
``Notifier`` protocol (console implementation included, SMTP deliberately
out of scope — no credentials in this repo), and charting is gated behind a
matplotlib import-try since the container may not ship it.
"""

from __future__ import annotations

from collections.abc import Callable


def render_health_report(report: dict, title: str = "ETL HEALTH REPORT") -> str:
    """Text report from temporal.health_report output (mirrors the layout of
    the reference's generate_health_report, advanced_monitoring.py:204-268)."""
    comp = report.get("completeness") or {}
    dup = report.get("duplicates") or {}
    fresh = report.get("freshness") or {}
    dod = report.get("day_over_day")

    lines = [
        f"=== {title} ===",
        "",
        "-- Completeness --",
        f"rows: {comp.get('n_rows')}",
        f"with measure: {comp.get('n_with_measure')}"
        f" ({_fmt_pct(comp.get('coverage_pct'))})",
        f"total measure: {_fmt_money(comp.get('total_measure'))}",
        "",
        "-- Duplicates --",
        f"duplicate keys: {dup.get('n_duplicate_keys')}"
        f" (rows involved: {dup.get('n_rows_in_duplicates')})",
        "",
        "-- Freshness --",
        f"last extraction: {fresh.get('last_extraction_date')}"
        f" ({fresh.get('days_stale')} days ago)",
    ]
    if dod:
        lines += [
            "",
            "-- Day over day --",
            f"entities: {dod.get('entities_today')}"
            f" ({_fmt_signed(dod.get('entities_change'))} vs yesterday)",
            f"measure: {_fmt_money(dod.get('measure_today'))}"
            f" ({_fmt_money(dod.get('measure_change'), signed=True)} vs yesterday)",
        ]
    return "\n".join(lines)


def _fmt_money(v, signed: bool = False) -> str:
    if v is None:
        return "n/a"
    return f"{v:+,.2f}" if signed else f"{v:,.2f}"


def _fmt_pct(v) -> str:
    return "n/a" if v is None else f"{v:.1f}%"


def _fmt_signed(v) -> str:
    return "n/a" if v is None else f"{v:+d}"


def check_alerts(report: dict, coverage_floor: float = 60.0,
                 max_days_stale: int = 2) -> list[str]:
    """Threshold alerts (advanced_monitoring.py:377-407): coverage below
    floor, stale data, duplicates present."""
    alerts: list[str] = []
    comp = report.get("completeness") or {}
    if comp.get("coverage_pct") is not None and comp["coverage_pct"] < coverage_floor:
        alerts.append(
            f"coverage {comp['coverage_pct']:.1f}% below floor {coverage_floor:.0f}%"
        )
    dup = report.get("duplicates") or {}
    if (dup.get("n_duplicate_keys") or 0) > 0:
        alerts.append(f"{dup['n_duplicate_keys']} duplicate keys detected")
    fresh = report.get("freshness") or {}
    if (fresh.get("days_stale") or 0) > max_days_stale:
        alerts.append(f"data is {fresh['days_stale']} days stale")
    return alerts


Notifier = Callable[[str, str], None]
"""(subject, body) -> None. The email sink of the reference becomes any
callable; SMTP wiring is intentionally out of scope."""


def console_notifier(subject: str, body: str) -> None:
    print(f"[{subject}]\n{body}")


def trend_chart_png(metrics_rows: list[dict], path: str) -> str | None:
    """O-37 chart sink: daily metric trends → PNG. Returns the path, or None
    when matplotlib isn't available (gated import; the engine never depends
    on it)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None

    days = [r["order_date"] if "order_date" in r else r.get("today") for r in metrics_rows]
    fig, axes = plt.subplots(2, 2, figsize=(10, 6))
    panels = [
        ("n_orders", "entities"),
        ("n_lineitems", "child rows"),
        ("total_revenue", "revenue"),
        ("revenue_change", "revenue Δ"),
    ]
    for ax, (key, label) in zip(axes.flat, panels):
        ax.plot(days, [r.get(key) for r in metrics_rows])
        ax.set_title(label)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path
