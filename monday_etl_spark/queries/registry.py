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
    # r06: NEW queries or results/plans CHANGED this round — evidence first
    "set_similarity_join", "triangle_census",                 # new in r06
    "collection_battery",                                     # new in r06
    "governance_erasure", "timeseries_moving_anomaly",        # new in r06
    "hopping_window_6h_2h", "join_full_outer",                # new in r06
    "revenue_equidepth_histogram",                            # new in r06
    "streaming_interval_join", "tableformat_health",          # new in r06
    "streaming_decontaminate",                                # new in r06
    "tableformat_rename_evolution",                           # new in r06
    "streaming_ivf_maintenance",                              # new in r06
    "tableformat_point_lookup",                               # new in r06
    "tableformat_merge_history", "tableformat_cdc_diff",      # demo subset
    "tableformat_dataskip",                                   # demo subset
    "semantic_dedup_auto",                                    # oracle added
    "weekly_threshold",                                       # plan collapsed
    "rollup_maintenance_drain", "scd2_maintenance_drain",     # single-drain
    # r02-only official evidence (r04/r05 budgets never reached them —
    # three-plus rounds stale); oldest official rows in the registry
    "join_left_composite", "join_left_single", "join_semi", "join_anti",
    "top10_orders", "union_counts", "setop_intersect", "setop_except",
    "latest_snapshot", "rank_topn_per_group", "running_total",
    "window_function_battery", "unpivot_measures", "revenue_histogram",
    "revenue_percentiles", "price_quantity_corr", "deterministic_sample",
    "stratified_sample", "text_scrub", "training_set_selection",
    "corpus_curation",
    # r03-latest evidence, oldest-first (a ~50 budget reaches the first
    # ~20 of these after the 30 rows above; the rest lead round 7)
    "normalize_projects", "normalize_subitems", "normalize_personnel_costs",
    "normalize_travel_costs", "normalize_supplier_costs",
    "filter_high_revenue", "filter_inlist", "filter_daterange",
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
    # everything below here (unlisted) was re-verified green in r04/r05
    # official artifacts or by the r05 judge's full driver_sim run
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
