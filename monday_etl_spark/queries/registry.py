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
    # registered in r04, never driver-checked — these go first
    "tableformat_merge_history", "rollup_maintenance_drain",
    "semantic_dedup_auto", "zorder_key", "salted_join_skew",
    "ann_ivf_recall_sweep", "chunk_dedup_rewrite", "hot_key_detection",
    "join_auto_salted", "quality_classifier_score", "training_order_shuffle",
    "tableformat_cdc_diff", "dedup_minhash_quality",
    "data_quality_audit", "scd2_history", "search_index_build",
    "bm25_topk", "pagerank_influence", "streaming_trending_topk",
    "funnel_analysis", "cohort_retention", "table_profile",
    "bigram_lm_build", "mixture_token_allocation", "tableformat_dataskip",
    # results CHANGED in r04 (LSH re-pinned to 64 buckets) — r03 greens are
    # stale for these two; re-evidence before anything else carried forward
    "semantic_dedup", "embedding_near_dup", "timeseries_gap_fill",
    "revenue_percentiles_sketch", "streaming_enriched_rollup",
    "doc_chunking", "scd2_maintenance_drain",
    # oldest evidence: green in r01 only, never re-checked since
    "chunk_dedup", "source_temperature_resample",
    # r02-latest evidence (skipped by the r03 budget) — oldest-first refresh
    "pricing_summary", "rollup_priority_status", "cube_flag_status",
    "global_aggs", "duplicate_detection", "freshness", "dedup_simhash",
    "dedup_simhash_near", "ann_lsh_bucketed", "ann_ivf",
    "embedding_quantize_int8", "corpus_source_stats",
    "dedup_cluster_resolution", "substring_dedup", "substring_dedup_rolling",
    "sequence_packing_sharded", "join_left_single", "join_left_composite",
    "join_semi", "join_anti", "top10_orders", "union_counts",
    "setop_intersect", "setop_except", "unpivot_measures",
    "revenue_percentiles", "revenue_histogram", "price_quantity_corr",
    "deterministic_sample", "stratified_sample", "text_scrub",
    "training_set_selection", "corpus_curation", "latest_snapshot",
    "rank_topn_per_group", "running_total", "window_function_battery",
    # everything below here was re-verified green in r03; a driver budget of
    # ~50 reaches all 44 stale/new rows above before re-confirming these
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
