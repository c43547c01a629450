"""Catalog (O-33): normalize outputs must conform to the declared schemas;
ensure_table is idempotent create-if-not-exists."""

from __future__ import annotations

import os

from monday_etl_spark import fixtures as FX
from monday_etl_spark.catalog import CATALOG, ensure_table, read_table
from monday_etl_spark.normalize import (
    board_df,
    extract_personnel_costs,
    extract_projects,
    extract_subitems,
    extract_supplier_costs,
    extract_travel_costs,
    items_df,
)


def test_normalize_outputs_match_catalog(spark):
    items = items_df(board_df(spark, FX.PROJECTS_BOARD))
    outputs = {
        "projects": extract_projects(items, FX.RUN_DATE, FX.RUN_TS),
        "project_subitems": extract_subitems(items, FX.RUN_DATE, FX.RUN_TS),
        "personnel_costs": extract_personnel_costs(
            items_df(board_df(spark, FX.PERSONNEL_BOARD)), FX.RUN_DATE, FX.RUN_TS
        ),
        "travel_costs": extract_travel_costs(
            items_df(board_df(spark, FX.TRAVEL_BOARD)), FX.RUN_DATE, FX.RUN_TS
        ),
        "supplier_costs": extract_supplier_costs(
            items_df(board_df(spark, FX.SUPPLIER_BOARD)), FX.RUN_DATE, FX.RUN_TS
        ),
    }
    for name, df in outputs.items():
        declared = [(f.name, f.dataType.simpleString()) for f in CATALOG[name]]
        actual = [(f.name, f.dataType.simpleString()) for f in df.schema]
        assert actual == declared, f"{name}: schema drift"


def test_ensure_table_idempotent(spark, tmp_path):
    base = str(tmp_path)
    p1 = ensure_table(spark, base, "projects")
    assert os.path.exists(p1)
    df = read_table(spark, base, "projects")
    assert df.count() == 0
    assert "extraction_date" in df.columns
    # second call: no-op, same path
    assert ensure_table(spark, base, "projects") == p1


def test_autodetect_load_matches_declared_schema(spark, tmp_path):
    """O-34: a parquet snapshot written by the normalize layer autodetects to
    exactly the declared schema (parquet carries its own types)."""
    from monday_etl_spark.catalog import autodetect_drift, load_autodetect
    from monday_etl_spark.fixtures import PROJECTS_BOARD, RUN_DATE, RUN_TS
    from monday_etl_spark.normalize import board_df, extract_projects, items_df

    path = str(tmp_path / "projects")
    extract_projects(items_df(board_df(spark, PROJECTS_BOARD)),
                     RUN_DATE, RUN_TS).write.parquet(path)
    assert autodetect_drift(spark, path, "projects") == []
    assert load_autodetect(spark, path).count() == 3


def test_autodetect_flags_drift_on_lossy_format(spark, tmp_path):
    """JSON inference is the BigQuery-autodetect behavior class: date and
    timestamp columns surface as strings, and the drift guard catches it
    before publish instead of letting it reach the warehouse."""
    from monday_etl_spark.catalog import autodetect_drift
    from monday_etl_spark.fixtures import PROJECTS_BOARD, RUN_DATE, RUN_TS
    from monday_etl_spark.normalize import board_df, extract_projects, items_df

    path = str(tmp_path / "projects_json")
    extract_projects(items_df(board_df(spark, PROJECTS_BOARD)),
                     RUN_DATE, RUN_TS).write.json(path)
    drift = autodetect_drift(spark, path, "projects", fmt="json")
    assert any(d.startswith("type drift: extraction_date") for d in drift)
