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
    # red in r02 (all the events.ts decode bug, fixed in r03) — re-green first
    "filter_snapshot_eq", "fk_json_extract", "scalar_battery", "asof_join",
    "sessionize", "pivot_event_values", "tumbling_window_6h", "snapshot_diff",
    "streaming_stateful_sessions", "approx_distinct_users",
    "range_join_bucketed", "grouped_zscore_pandas",
    # implemented in r02/r03, never driver-checked
    "decontaminate_bloom", "semantic_dedup", "text_perplexity",
    "streaming_incremental_dedup", "weighted_median_price",
    "dedup_minhash_store", "ann_ivf_store", "ann_recall_at_10",
    # r01 green is STALE (silent ts decode error in the streaming reader
    # between r01 and r02) — must be explicitly re-verified
    "streaming_daily_rollup",
    # green in r01 only, not re-checked since
    "daily_metrics", "normalize_projects", "normalize_subitems",
    "normalize_personnel_costs", "normalize_travel_costs",
    "normalize_supplier_costs", "filter_high_revenue", "filter_inlist",
    "filter_daterange", "ratio_kpi", "weekly_threshold",
    "grouping_sets_reports", "top_unshipped_orders", "revenue_by_nation",
    "customer_order_stats", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "ann_brute_force", "decontaminate",
    "doc_repetition_filter", "tfidf_top_terms", "text_fingerprint",
    "text_quality", "text_lang_id", "multimodal_decode",
    "multimodal_frame_sample", "token_stats", "sequence_packing",
    "chunk_dedup", "source_temperature_resample",
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
