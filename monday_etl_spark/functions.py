"""Scalar function layer — SURVEY.md §2.8 (F-1..F-14).

All of these compile to built-in Catalyst expressions (zero Python UDFs), so
they stay inside whole-stage codegen. Each helper documents the reference
semantics it reproduces (file:line cites are into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F-1: null-safe string->float with default 0
# (reference: float(text) in try/except -> 0; monday_etl_automated.py:305-309)
# Non-ANSI cast yields NULL on garbage; coalesce applies the reference default.
# ---------------------------------------------------------------------------


def to_double_or_zero(col: Column) -> Column:
    return F.coalesce(col.cast("double"), F.lit(0.0))


# F-2: '%Y-%m-%d' date parse, null on failure (monday_etl_automated.py:263-267)
def parse_date(col: Column) -> Column:
    return F.to_date(col, "yyyy-MM-dd")


# F-3: ISO-8601 'Z' timestamp parse (etl_final_fix.py:23-31)
def parse_iso_timestamp(col: Column) -> Column:
    return F.to_timestamp(F.regexp_replace(col, "Z$", "+00:00"))


# F-4: "start - end" two-field destructure; only when exactly 2 parts
# (monday_etl_automated.py:312-319)
def split_timeline(col: Column) -> tuple[Column, Column]:
    parts = F.split(col, " - ")
    ok = F.size(parts) == 2
    start = F.when(ok, F.to_date(F.element_at(parts, 1), "yyyy-MM-dd"))
    end = F.when(ok, F.to_date(F.element_at(parts, 2), "yyyy-MM-dd"))
    return start, end


# F-5: JSON path extraction (monday_etl_automated.py:390-395)
def json_linked_id(col: Column) -> Column:
    return F.get_json_object(col, "$.linkedPulseIds[0].linkedPulseId")


# F-12: truthiness/empty-string guard (monday_etl_automated.py:259-261)
def non_empty(col: Column) -> Column:
    return F.nullif(F.trim(col), F.lit(""))


# ---------------------------------------------------------------------------
# Deterministic money aggregation.
#
# The reference keeps money as FLOAT64 and rounds to 2 decimals in every SQL
# aggregate (F-6, advanced_monitoring.py:60-61). A plain SUM(double) is
# order-dependent across shuffle partitions, so its low bits differ run-to-run
# and engine-to-engine. We instead sum exact DECIMAL(18,2) values (associative,
# commutative, no rounding error) and cast the final result back to DOUBLE —
# same schema as the reference, fully deterministic at any parallelism.
# ---------------------------------------------------------------------------


def money_sum(col: Column) -> Column:
    return F.round(F.sum(col.cast("decimal(18,2)")).cast("double"), 2)


def money_avg(col: Column) -> Column:
    """Deterministic AVG: exact decimal sum / non-null count.

    Deliberately NOT rounded: rounding a double *after* an inexact division is
    engine-dependent near ties (Spark HALF_UPs the exact binary value, DuckDB
    scales-and-rounds), so cross-engine value-hashes would flip on .xx5 cases.
    A single IEEE division of bit-identical inputs is itself bit-identical.
    """
    total = F.sum(col.cast("decimal(18,2)")).cast("double")
    n = F.count(col)
    return F.when(n > 0, total / n)


# SQL-side twins for the DuckDB oracle (kept here so Spark and oracle stay in
# lock-step when the pattern changes).
def sql_money_sum(expr: str) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE), 2)"


def sql_money_avg(expr: str) -> str:
    return (
        f"CASE WHEN COUNT({expr}) > 0 THEN "
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({expr}) END"
    )
