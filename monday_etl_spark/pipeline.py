"""End-to-end daily ETL pipeline — the Spark-first rebuild of the reference's
``run_daily_etl`` (monday_etl_automated.py:693-754, E-1 in SURVEY.md §3).

Stage mapping:
  reference                      | here
  -------------------------------+------------------------------------------
  DDL create-if-not-exists       | implicit: parquet dirs + partitionBy
  4 GraphQL extracts (row loops) | MondayConnector fetch -> nested DF
  transform (list[dict] loops)   | normalize.extract_* Catalyst expressions
  load x5 (truncate + append)    | temporal.dual_write (idempotent)
  compare_with_previous_day      | temporal.compare_with_previous_day
  send_notification              | returned stats dict (transport-agnostic)

The IR between stages is a lazy DataFrame (Catalyst logical plan) instead of
driver-memory lists — extraction/transform/write all execute on executors;
only the final 1-row stats reach the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .quality import QualityGate, gated_dual_write
from .normalize import (
    extract_personnel_costs,
    extract_projects,
    extract_subitems,
    extract_supplier_costs,
    extract_travel_costs,
)
from .source_graphql import MondayConnector, fetch_board_items
from .temporal import compare_with_previous_day, dual_write, read_historical


@dataclass
class BoardConfig:
    """O-4 board multiplexing (ref: BOARDS dict, monday_etl_automated.py:28-33)."""

    projects: str = "projects-board"
    personnel: str = "personnel-board"
    travel: str = "travel-board"
    supplier: str = "supplier-board"


def run_daily_etl(
    spark: SparkSession,
    connector: MondayConnector,
    base_path: str,
    run_date: str,
    run_ts: str,
    boards: BoardConfig | None = None,
    gate: QualityGate | None = None,
    gate_measures: dict[str, str] | None = None,
) -> dict:
    """Extract → normalize → dual-write all 5 tables → day-over-day stats.

    With ``gate`` set, each table's write goes through the quality-gated
    path (quality.py): metrics observe on the historical write and the
    serving snapshot is only promoted when thresholds hold —
    QualityGateViolation aborts the run with the failing table quarantined.
    ``gate_measures`` maps table name → coverage measure column."""
    boards = boards or BoardConfig()
    gate_measures = gate_measures or {}

    proj_items = fetch_board_items(spark, connector, boards.projects)
    tables: dict[str, DataFrame] = {
        "projects": extract_projects(proj_items, run_date, run_ts),
        "project_subitems": extract_subitems(proj_items, run_date, run_ts),
        "personnel_costs": extract_personnel_costs(
            fetch_board_items(spark, connector, boards.personnel), run_date, run_ts
        ),
        "travel_costs": extract_travel_costs(
            fetch_board_items(spark, connector, boards.travel), run_date, run_ts
        ),
        "supplier_costs": extract_supplier_costs(
            fetch_board_items(spark, connector, boards.supplier), run_date, run_ts
        ),
    }

    stats: dict = {"run_date": run_date, "tables": {}}
    for name, df in tables.items():
        # O-27 as df.observe: run stats piggyback on the write pass instead
        # of a separate count scan (ref keeps driver-side fold stats,
        # monday_etl_automated.py:326-328; SURVEY §2.4 suggests observe)
        if gate is not None:
            metrics = gated_dual_write(
                df, base_path, name, gate, run_date,
                measure_col=gate_measures.get(name),
            )
            stats["tables"][name] = metrics["n_rows"]
            stats.setdefault("quality", {})[name] = metrics
        else:
            obs = Observation(f"stats_{name}_{run_date}")
            dual_write(df.observe(obs, F.count(F.lit(1)).alias("n")), base_path, name)
            stats["tables"][name] = obs.get["n"]

    dod = compare_with_previous_day(
        read_historical(spark, base_path, "project_subitems"),
        "subitem_id",
        "revenue_amount",
    ).first()
    stats["day_over_day"] = dod.asDict() if dod is not None else None
    return stats
