"""Reusable temporal operator builders (generic forms of the query-registry
entries; SURVEY §2.3 as-of extension, §2.10 sessionization).

Both are union/window plans — one shuffle on the entity key, linear in rows,
no range-join explosion — which is why they hold at 100 TB where a
``l.ts BETWEEN r.ts - x AND r.ts`` theta join would not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` within the same ``on`` key (inclusive as-of).

    Implementation: tag both streams, union, sort within key by time (right
    rows before left rows at identical timestamps → inclusive semantics),
    then carry right values forward with last(ignorenulls). ``right_cols``
    maps right column → output alias.
    """
    lt = left.select(
        F.lit(1).alias("__is_left"),
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.struct(*left.columns).alias("__left_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    rt = right.select(
        F.lit(0).alias("__is_left"),
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(None).cast(lt.schema["__left_row"].dataType).alias("__left_row"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    both = lt.unionByName(rt)
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        "__is_left",
        "__left_row",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in right_cols
        ],
    ).filter(F.col("__is_left") == 1)
    return carried.select(
        F.col("__left_row.*"),
        *[F.col(f"__r_{c}").alias(alias) for c, alias in right_cols.items()],
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: Column | int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based session numbering per key: a new session starts when the
    time since the key's previous event exceeds ``gap`` seconds. Adds a
    ``session_no`` column (1-based, per key). Exact µs integer arithmetic."""
    gap_us = (gap if isinstance(gap, Column) else F.lit(gap)) * 1_000_000
    order = [ts] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(ts).over(w)
    is_new = F.when(
        prev.isNull() | ((F.unix_micros(F.col(ts)) - F.unix_micros(prev)) > gap_us), 1
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__is_new", is_new).withColumn(
        "session_no", F.sum("__is_new").over(wc)
    ).drop("__is_new")
