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
    # r07: RESULTS or code paths CHANGED this round — evidence first.
    "delta_interop_roundtrip",      # NEW query (Delta export+append+replay)
    "delta_stats_pruning",          # NEW query (pruning via exported stats)
    "streaming_delta_sink",         # NEW query (exactly-once txn appends)
    "delta_source_stream",          # NEW query (version-tailing source)
    "distinct_count_sketch",        # NEW query (mergeable HLL audit)
    "sql_correlated_subquery",      # NEW query (raw-SQL entry path)
    "leakage_safe_split",           # NEW query (cluster-aware split)
    "tableformat_fieldid_reuse",    # NEW query (field-id name reuse)
    "revenue_percentiles_sketch",   # NEW oracle + result schema (was
                                    # rows-only; now hashed rank-window)
    "set_similarity_join",          # PPJoin positional filter + cache plan
    "triangle_census",              # eager materialize + cache release
    "tableformat_point_lookup", "governance_erasure",   # shared fixtures
    "streaming_decontaminate", "streaming_ivf_maintenance",  # shared fxt
    "tableformat_rename_evolution",  # field-id read resolution path
    "tableformat_merge_history", "tableformat_cdc_diff",  # field-id commits
    "tableformat_dataskip", "tableformat_health",         # field-id commits
    "join_auto_salted",              # one-scan/sampled hot-key detection
    # r03-latest evidence, never re-confirmed by an official driver run
    # since (the r06 run's 50-budget stopped at filter_daterange) — the
    # 40 stale rows the r06 verdict queued for refresh
    "filter_snapshot_eq", "fk_json_extract", "scalar_battery",
    "daily_metrics", "customer_order_stats", "snapshot_diff",
    "top_unshipped_orders", "ratio_kpi", "asof_join", "sessionize",
    "streaming_stateful_sessions", "streaming_daily_rollup",
    "streaming_incremental_dedup", "multimodal_decode",
    "multimodal_frame_sample", "dedup_exact", "dedup_minhash_lsh",
    "dedup_minhash_store", "dedup_ngram_jaccard", "decontaminate",
    "decontaminate_bloom", "text_fingerprint", "text_quality",
    "text_lang_id", "text_perplexity", "doc_repetition_filter",
    "tfidf_top_terms", "token_stats", "sequence_packing",
    "ann_brute_force", "ann_ivf_store", "ann_recall_at_10",
    "range_join_bucketed", "grouped_zscore_pandas", "approx_distinct_users",
    "grouping_sets_reports", "revenue_by_nation", "pivot_event_values",
    "tumbling_window_6h", "weighted_median_price",
    # everything below here (unlisted) holds r04-or-newer official
    # evidence, or was re-verified green by the r06 judge's full
    # driver_sim run (all 134 queries, FAILURES none)
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
