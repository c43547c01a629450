"""Every registry query vs its DuckDB oracle, at sf0.001 (fast) — the same
check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from monday_etl_spark.queries import REGISTRY

from .conftest import SF_SMOKE
from .oracle import compare, duckdb_connection

NAMES = sorted(REGISTRY)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    compare(df, con, spec.oracle, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "order_date"
