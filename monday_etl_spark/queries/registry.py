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
    # r12: queries whose code paths CHANGED this round (streaming
    # changelog resolves MoR deletes — equality deletes + COW removals;
    # batch changelog merged-manifest entry filter + scoped-delete spec
    # refusal; O(range) CDF enablement replay; xxhash64 datetime zone)
    "iceberg_cow_update", "iceberg_changelog_stream_mor",
    "iceberg_changelog_stream", "iceberg_changelog", "delta_cdc_diff",
    "delta_cdf_stream", "tableformat_point_lookup",
    # r12: the 33 queries whose newest official driver row is r08 —
    # exactly four rounds old, the rotation invariant's edge
    "ann_brute_force", "ann_ivf", "ann_ivf_recall_sweep",
    "ann_ivf_store", "ann_lsh_bucketed", "ann_recall_at_10",
    "bigram_lm_build", "bm25_topk", "chunk_dedup", "chunk_dedup_rewrite",
    "cohort_retention", "corpus_source_stats", "data_quality_audit",
    "dedup_cluster_resolution", "dedup_minhash_quality", "dedup_simhash",
    "dedup_simhash_near", "delta_column_mapping_roundtrip",
    "doc_chunking", "embedding_near_dup", "embedding_quantize_int8",
    "funnel_analysis", "hot_key_detection", "iceberg_export_roundtrip",
    "iceberg_import_external", "mixture_token_allocation",
    "pagerank_influence", "pivot_event_values",
    "quality_classifier_score", "salted_join_skew", "scd2_history",
    "tumbling_window_6h", "weighted_median_price",
    # r12: the oldest r09 block starts the NEXT rotation (the driver's
    # ~50-query budget reaches the head of this list first)
    "collection_battery", "corpus_curation", "deterministic_sample",
    "filter_daterange", "filter_high_revenue", "filter_inlist",
    "hopping_window_6h_2h", "iceberg_append_pipeline",
    "iceberg_delete_compact", "iceberg_merge_on_read",
    "iceberg_partition_transforms",
    # everything below here (unlisted) holds r09-or-newer official
    # evidence, re-verified exact by the r11 judge's full 163-query
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
