"""Quality-gated write path: pass → snapshot promoted; fail → snapshot
untouched, day quarantined in historical, rerun after fix is clean."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from monday_etl_spark import fixtures as FX
from monday_etl_spark.pipeline import run_daily_etl
from monday_etl_spark.quality import (
    QualityGate,
    QualityGateViolation,
    gated_dual_write,
)
from monday_etl_spark.source_graphql import MondayConnector

from .test_pipeline import MultiBoardTransport


def _frame(spark, run_date, revenues):
    rows = [(i, f"p{i}", r) for i, r in enumerate(revenues)]
    return spark.createDataFrame(
        rows, "item_id bigint, name string, revenue double"
    ).select(
        F.lit(run_date).cast("date").alias("extraction_date"),
        "item_id",
        "name",
        "revenue",
    )


def test_pass_promotes_snapshot(spark, tmp_path):
    base = str(tmp_path)
    df = _frame(spark, "2025-06-25", [100.0, 200.0, None, 0.0])
    gate = QualityGate(min_rows=2, min_coverage_pct=50.0,
                       max_null_pct={"name": 0.0})
    metrics = gated_dual_write(df, base, "t", gate, "2025-06-25",
                               measure_col="revenue")
    assert metrics["n_rows"] == 4
    assert metrics["coverage_pct"] == 50.0  # null and 0.0 don't count

    snap = spark.read.parquet(f"{base}/t")
    assert snap.columns == df.columns  # promote restores column order
    assert sorted(map(tuple, snap.collect())) == sorted(map(tuple, df.collect()))


def test_fail_quarantines_without_publishing(spark, tmp_path):
    base = str(tmp_path)
    gate = QualityGate(min_rows=1, min_coverage_pct=60.0)

    good = _frame(spark, "2025-06-25", [100.0, 200.0, 300.0])
    gated_dual_write(good, base, "t", gate, "2025-06-25", measure_col="revenue")

    bad = _frame(spark, "2025-06-26", [100.0, None, None, None])
    with pytest.raises(QualityGateViolation) as ex:
        gated_dual_write(bad, base, "t", gate, "2025-06-26", measure_col="revenue")
    assert "coverage 25.0% below floor 60%" in str(ex.value)
    assert ex.value.metrics["n_rows"] == 4

    # snapshot still serves day 1; historical holds the quarantined day 2
    snap = spark.read.parquet(f"{base}/t")
    assert snap.select(F.max("extraction_date")).first()[0].isoformat() == "2025-06-25"
    hist = spark.read.parquet(f"{base}/t_historical")
    assert hist.filter("extraction_date = '2025-06-26'").count() == 4

    # post-fix rerun of day 2: partition overwrite replaces the quarantined
    # rows and the snapshot advances
    fixed = _frame(spark, "2025-06-26", [100.0, 200.0, 300.0])
    gated_dual_write(fixed, base, "t", gate, "2025-06-26", measure_col="revenue")
    hist = spark.read.parquet(f"{base}/t_historical")
    assert hist.filter("extraction_date = '2025-06-26'").count() == 3
    snap = spark.read.parquet(f"{base}/t")
    assert snap.select(F.max("extraction_date")).first()[0].isoformat() == "2025-06-26"


def test_row_floor_and_null_ceiling(spark, tmp_path):
    base = str(tmp_path)
    df = _frame(spark, "2025-06-25", [None])
    gate = QualityGate(min_rows=3, max_null_pct={"revenue": 50.0})
    with pytest.raises(QualityGateViolation) as ex:
        gated_dual_write(df, base, "t", gate, "2025-06-25")
    assert ex.value.violations == [
        "row count 1 below floor 3",
        "revenue null rate 100.0% above ceiling 50%",
    ]


def test_pipeline_with_gate(spark, tmp_path):
    base = str(tmp_path)
    c = MondayConnector(MultiBoardTransport())
    gate = QualityGate(min_rows=1, min_coverage_pct=30.0)
    stats = run_daily_etl(
        spark, c, base, "2025-06-25", FX.RUN_TS,
        gate=gate,
        gate_measures={"project_subitems": "revenue_amount"},
    )
    assert stats["tables"]["project_subitems"] == 3
    assert "coverage_pct" in stats["quality"]["project_subitems"]
    # gated run produces the same published tables as the ungated path
    snap = spark.read.parquet(f"{base}/project_subitems")
    assert snap.count() == 3
