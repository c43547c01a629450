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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
