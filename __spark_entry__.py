"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``monday_etl_spark.queries`` — the registry is the single
source of truth for query implementations and their DuckDB oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from monday_etl_spark import queries as q  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (daily metrics + LAG deltas) on sf0.001."""
    from monday_etl_spark.io import assert_known_events_vintage

    # fail fast, by name, if the testdata's events.ts physical type changed
    # to something normalize_event_ts can't decode (broke round 2 silently)
    assert_known_events_vintage(SF0001)
    return q.REGISTRY["daily_metrics"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
