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


# Queries with no green correctness evidence yet (no CORRECTNESS_r01 row, or
# a red one) — surfaced FIRST in queries() iteration order so a driver that
# budgets its correctness pass (r01 checked 50 of 79 registrations) reaches
# them before re-confirming already-green entries. Purely an ordering hint;
# every query is still registered and runnable.
_EVIDENCE_PRIORITY = [
    # never checked in r01
    "substring_dedup", "sequence_packing_sharded", "filter_snapshot_eq",
    "join_left_single", "join_left_composite", "join_semi", "join_anti",
    "fk_json_extract", "top10_orders", "union_counts", "setop_intersect",
    "setop_except", "scalar_battery", "asof_join", "sessionize",
    "pivot_event_values", "unpivot_measures", "tumbling_window_6h",
    "revenue_percentiles", "revenue_histogram", "price_quantity_corr",
    "deterministic_sample", "stratified_sample", "text_scrub",
    "training_set_selection", "corpus_curation", "latest_snapshot",
    "rank_topn_per_group", "running_total", "snapshot_diff",
    "window_function_battery",
    # red or rows-only in r01, fixed/oracled in r02
    "embedding_quantize_int8", "corpus_source_stats",
    "streaming_stateful_sessions", "dedup_simhash", "dedup_simhash_near",
    "ann_lsh_bucketed", "embedding_near_dup", "dedup_cluster_resolution",
    "approx_distinct_users", "ann_ivf", "substring_dedup_rolling",
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
