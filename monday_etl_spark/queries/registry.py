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
    # r08: RESULTS or code paths NEW/CHANGED this round — evidence first.
    "delta_column_mapping_roundtrip",  # NEW query (mode=name mapping)
    "iceberg_export_roundtrip",        # NEW query (Iceberg v2 bridge)
    "iceberg_import_external",         # NEW query (import half, field ids)
    "iceberg_append_pipeline",         # NEW query (append + pruning)
    "iceberg_stream_pipe",             # NEW query (streaming source+sink)
    "iceberg_merge_on_read",           # NEW query (v2 delete application)
    "iceberg_delete_compact",          # NEW query (DML write lifecycle)
    "delta_deletion_vectors",          # NEW query (DV reads, roaring/z85)
    "delta_delete_where",              # NEW query (DV-writing DELETE)
    # r03-latest evidence (11 rows; newest official driver confirmation is
    # CORRECTNESS_r03.json) — the r07 verdict queued these for refresh.
    "range_join_bucketed", "grouped_zscore_pandas", "approx_distinct_users",
    "grouping_sets_reports", "revenue_by_nation", "ann_brute_force",
    "pivot_event_values", "tumbling_window_6h", "weighted_median_price",
    "ann_ivf_store", "ann_recall_at_10",
    # r05-latest evidence (42 rows; newest official confirmation is
    # CORRECTNESS_r05.json).
    "ann_ivf", "ann_ivf_recall_sweep", "ann_lsh_bucketed", "bigram_lm_build",
    "bm25_topk", "chunk_dedup", "chunk_dedup_rewrite", "cohort_retention",
    "corpus_source_stats", "cube_flag_status", "data_quality_audit",
    "dedup_cluster_resolution", "dedup_minhash_quality", "dedup_simhash",
    "dedup_simhash_near", "doc_chunking", "duplicate_detection",
    "embedding_near_dup", "embedding_quantize_int8", "freshness",
    "funnel_analysis", "global_aggs", "hot_key_detection",
    "mixture_token_allocation", "pagerank_influence", "pricing_summary",
    "quality_classifier_score", "rollup_priority_status", "salted_join_skew",
    "scd2_history", "search_index_build", "semantic_dedup",
    "sequence_packing_sharded", "source_temperature_resample",
    "streaming_enriched_rollup", "streaming_trending_topk", "substring_dedup",
    "substring_dedup_rolling", "table_profile", "timeseries_gap_fill",
    "training_order_shuffle", "zorder_key",
    # everything below here (unlisted) holds r06-or-newer official
    # evidence, or was re-verified exact by the r07 judge's full 142-query
    # driver_sim run (FAILURES none, zero rows-only)
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
