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
    # r13: queries whose code paths CHANGED this round (NEW: BPE merge
    # learning + application, the hybrid backfill query, the stream's
    # _change_ordinal / batch _commit_timestamp twin columns; streaming
    # changelog ships decoded delete keys in unit payloads; batch
    # changelog dedupes multi-group eq deletes on row identity; COW
    # manifest rewrites carry prior tombstones; O(range)
    # commit_timestamps in windowed CDF reads; xxhash64 mktime-range
    # guard; store/scaffolding builds moved behind shared fixtures; the
    # recall sweep's one-pass explode+window rewrite)
    "dsir_importance_select",  # NEW r13: DSIR importance resampling
    "iceberg_partition_evolution",  # NEW r13: mixed-spec reads
    "bpe_learn", "bpe_tokenize_topk",
    "iceberg_backfill_hybrid", "iceberg_changelog_stream_mor",
    "iceberg_changelog_stream", "iceberg_changelog",
    "iceberg_cow_update", "delta_cdc_diff", "delta_cdf_stream",
    "tableformat_point_lookup", "tableformat_cdc_diff",
    "tableformat_dataskip", "dedup_minhash_store", "ann_ivf_store",
    "ann_ivf_recall_sweep",
    # r13: the 35 queries whose newest official driver row is r09 —
    # four rounds old, the rotation invariant's edge
    "iceberg_partition_transforms", "iceberg_wap_publish", "join_anti",
    "join_full_outer", "join_left_composite", "join_left_single",
    "join_semi", "latest_snapshot", "nested_bridge_roundtrip",
    "normalize_personnel_costs", "normalize_projects",
    "normalize_subitems", "normalize_supplier_costs",
    "normalize_travel_costs", "price_quantity_corr",
    "rank_topn_per_group", "revenue_equidepth_histogram",
    "revenue_histogram", "revenue_percentiles", "running_total",
    "search_index_build", "semantic_dedup", "semantic_dedup_auto",
    "sequence_packing_sharded", "setop_except", "setop_intersect",
    "source_temperature_resample", "streaming_enriched_rollup",
    "streaming_trending_topk", "substring_dedup",
    "substring_dedup_rolling", "table_profile", "timeseries_gap_fill",
    "training_order_shuffle", "zorder_key",
    # r13: the oldest r10 block starts the NEXT rotation (the driver's
    # ~50-query budget reaches the head of this list first)
    "asof_join", "daily_metrics", "decontaminate",
    "decontaminate_bloom", "delta_delete_where",
    "delta_deletion_vectors", "delta_interop_roundtrip",
    # everything below here (unlisted) holds r10-or-newer official
    # evidence, re-verified exact by the r12 judge's full 165-query
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
