"""Multi-dimensional data layout: Z-order clustering for parquet tables.

Partition pruning handles ONE dimension (the partition key). When queries
filter on several columns — `user_id = X`, `ts BETWEEN a AND b`, or both —
a single-column sort leaves the other columns' parquet row-group min/max
stats spanning the full range, so nothing skips. Z-ordering sorts rows by
the Morton interleave of the clustered columns' bit-ranks: rows close in
z-value are close in EVERY clustered dimension, so each row group covers a
small hyper-rectangle and the reader's stats-based skipping works for
predicates on any clustered column (Delta OPTIMIZE ZORDER BY's mechanism).

All expression-level (shiftleft/shiftright/bitwiseOR — whole-stage codegen,
no UDF):

1. one stats pass collects each column's (min, max) — a 1-row driver
   result, the bounded-collect pattern;
2. each column maps to a ``bits``-bit integer rank by linear min-max
   scaling (timestamps via epoch-µs; already-integer columns keep their
   order exactly);
3. ranks interleave bit-by-bit into a single long z-value;
4. ``repartitionByRange(n_files, z)`` + ``sortWithinPartitions(z)`` gives
   contiguous z-ranges per output file AND per row group within each file.

Scale: the stats pass is a map-side-combined aggregate; the layout write is
one range shuffle of the data — the same cost as any global sort, paid once
at write time to make every later scan cheaper. ``bits=16`` puts ~65k
distinct cells per dimension, ample for row-group-level skipping; deeper
bits only matter when single row groups span fewer than (range/2^16) of a
column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_BITS = 16


def _to_long(col: Column, dtype: T.DataType) -> Column:
    """Order-preserving long view of a clusterable column."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col)
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01"))
    return col.cast("long")


def zorder_value(df: DataFrame, cols: list[str],
                 bits: int = DEFAULT_BITS) -> Column:
    """Morton z-value over ``cols`` as a Column (for inspection/tests);
    collects the 1-row min/max stats of ``df`` to scale each column."""
    # the interleave reaches bit index bits*len(cols)-1; keep it under 63 so
    # the z-value never touches the long's sign bit (rows with the top rank
    # bit set would sort FIRST) and never exceeds 63, where Java shiftleft
    # masks the count mod 64 and silently scrambles the value. Auto-reduce:
    # 4 cols -> 15 bits/col, 5 cols -> 12, etc. — still thousands of cells
    # per dimension, ample for row-group skipping.
    bits = min(bits, 63 // max(len(cols), 1))
    if bits < 1:
        raise ValueError(f"too many z-order columns ({len(cols)}): "
                         "need at least 1 bit per column within 63 total")
    longs = {c: _to_long(F.col(c), df.schema[c].dataType) for c in cols}
    stats = df.agg(
        *[f(longs[c]).alias(f"{n}_{c}")
          for c in cols for n, f in (("mn", F.min), ("mx", F.max))]
    ).first()

    max_rank = (1 << bits) - 1
    ranks = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = max((mx or 0) - (mn or 0), 1)
        # normalize BEFORE multiplying: (v-mn)*max_rank on a µs-epoch span
        # would overflow long for multi-decade ranges; the double ratio is
        # exact to far beyond 16-bit rank resolution
        ranks.append(
            ((longs[c] - F.lit(mn)) / F.lit(span) * max_rank).cast("long")
        )

    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, i * len(ranks) + j))
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 8, bits: int = DEFAULT_BITS) -> None:
    """Rewrite ``df`` to ``path`` clustered by the z-order of ``cols``:
    range-partitioned and sorted on the z-value, so row-group min/max stats
    are tight on every clustered column."""
    z = zorder_value(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
