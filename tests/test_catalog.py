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
