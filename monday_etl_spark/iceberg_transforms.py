"""Iceberg partition transforms (spec §Partition Transforms + Appendix B).

The table spec defines six value transforms a partition spec can apply to
a source column — ``identity``, ``bucket[N]``, ``truncate[W]``,
``year``/``month``/``day``/``hour`` — and pins their semantics exactly so
every engine routes a row to the same partition tuple:

- ``bucket[N]`` = ``(murmur3_x86_32(v) & Integer.MAX_VALUE) % N`` where
  the hash input is the spec's Appendix-B byte form: int/long/date/
  timestamp hash as the 8-byte little-endian long (``hashLong``), strings
  as their UTF-8 bytes, seed 0 (NOT Spark's ``F.hash`` — that is murmur3
  with seed 42 and Spark's own layouts, and its seed is not settable).
- ``truncate[W]`` = ``v - (((v % W) + W) % W)`` for ints/longs (floored
  to the width multiple, negative-safe) and the first W characters for
  strings.
- ``year/month/day/hour`` = the floored ordinal since the Unix epoch
  (1970-01-01 / 1970-01) of the date or timestamp.

Everything except string-bucketing is a pure Spark column expression
(JVM-side, whole-stage-codegen): the murmur3 of an 8-byte input is two
fixed block rounds plus finalization, ~30 integer ops. The 32-bit
modular multiplies split each constant into 16-bit halves so no
intermediate exceeds 2^49 — exact under ANSI mode, no dependence on
silent 64-bit wraparound. String buckets go through ONE Arrow-batched
pandas UDF (murmur3 over variable-length UTF-8 needs a data-dependent
loop no static expression tree can express); values are memoized per
batch so low-cardinality partition strings hash once.

Reference scope: the reference's warehouse partitions tables by load
date only (monday_etl_automated.py:560-590, BigQuery ingestion-time
partitioning); these transforms give our Iceberg writer parity with how
external Flink/Spark tables are actually laid out (``days(ts)``,
``bucket(N, id)``).

Hash test vectors in tests/test_iceberg_transforms.py come from the
public spec's Appendix B table.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    TimestampNTZType,
    TimestampType,
)


class TransformError(ValueError):
    pass


_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNCATE_RE = re.compile(r"^truncate\[(\d+)\]$")
# metadata JSON writes the time transforms singular; older writers and
# SQL surfaces say days(ts) — accept both
_TIME_NAMES = {
    "year": "year", "years": "year",
    "month": "month", "months": "month",
    "day": "day", "days": "day",
    "hour": "hour", "hours": "hour",
}


def parse_transform(t: str) -> tuple[str, int | None]:
    """``(kind, param)`` for a partition-spec transform string."""
    if t == "identity":
        return "identity", None
    if t == "void":
        return "void", None
    m = _BUCKET_RE.match(t)
    if m:
        n = int(m.group(1))
        if n <= 0:
            raise TransformError(f"bucket[{n}]: N must be positive")
        return "bucket", n
    m = _TRUNCATE_RE.match(t)
    if m:
        w = int(m.group(1))
        if w <= 0:
            raise TransformError(f"truncate[{w}]: W must be positive")
        return "truncate", w
    if t in _TIME_NAMES:
        return _TIME_NAMES[t], None
    raise TransformError(f"unknown partition transform {t!r}")


# ---------------------------------------------------------- murmur3 seed 0

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _mul32(x: Column, c: Column) -> Column:
    """``(x * c) mod 2**32`` without any intermediate above 2^49: the
    constant splits into 16-bit halves, so the result is exact whether or
    not the engine wraps 64-bit overflow."""
    lo = c.bitwiseAND(F.lit(0xFFFF))
    hi = F.shiftright(c, 16)
    return (
        (x * lo)
        + F.shiftleft((x * hi).bitwiseAND(F.lit(0xFFFF)), 16)
    ).bitwiseAND(F.lit(_M32))


def _rotl32(x: Column, r: int) -> Column:
    return (
        F.shiftleft(x, r).bitwiseOR(F.shiftright(x, 32 - r))
    ).bitwiseAND(F.lit(_M32))


def _mix_k(h: Column, k: Column) -> Column:
    """One murmur3 block round. ``h``/``k`` arrive as FOLD VARIABLES
    (leaves), so the self-referencing chain inside stays bounded — see
    :func:`murmur3_long_col` on why that matters."""
    k = _mul32(k, F.lit(_C1))
    k = _rotl32(k, 15)
    k = _mul32(k, F.lit(_C2))
    h = h.bitwiseXOR(k)
    h = _rotl32(h, 13)
    return (h * F.lit(5) + F.lit(0xE6546B64)).bitwiseAND(F.lit(_M32))


def murmur3_long_col(v: Column) -> Column:
    """murmur3_x86_32(little-endian 8 bytes of ``v``), seed 0, as a SIGNED
    32-bit value in a bigint column — the spec's ``hashLong``. Pure
    expression: stays inside whole-stage codegen, no Python in the path.

    Built as nested ``F.aggregate`` folds rather than a flat chain of
    ``h = f(h)`` Column rebindings: every self-reference in a Column
    chain DUPLICATES the operand subtree (Column trees share nothing), so
    the flat form grows exponentially with the number of steps — ~10 s of
    analysis/codegen per job at this algorithm's depth (measured). A fold
    gives each step a lambda VARIABLE accumulator — a leaf — so the tree
    stays linear in the step count and planning is milliseconds."""
    v = v.cast("bigint")
    ks = F.array(
        v.bitwiseAND(F.lit(_M32)),
        F.shiftright(v, 32).bitwiseAND(F.lit(_M32)),
    )
    h = F.aggregate(ks, F.lit(0).cast("bigint"), _mix_k)
    # finalization: h ^= len; then (xor-shift, multiply) steps — the last
    # multiplier 1 makes the trailing xor-shift a plain fold step too
    fin = F.array(*[
        F.struct(F.lit(s).alias("s"), F.lit(c).cast("bigint").alias("c"))
        for s, c in ((16, 0x85EBCA6B), (13, 0xC2B2AE35), (16, 1))
    ])
    h = F.aggregate(
        fin, h.bitwiseXOR(F.lit(8)),
        # call_function: the SQL shiftright accepts a column bit count;
        # the python wrapper F.shiftright insists on an int literal
        lambda acc, st: _mul32(
            acc.bitwiseXOR(
                F.call_function("shiftright", acc, st.getField("s"))),
            st.getField("c"),
        ),
    )
    # reinterpret the unsigned 32-bit result as signed (Java int)
    return F.when(h >= F.lit(1 << 31), h - F.lit(1 << 32)).otherwise(h)


def murmur3_bytes(data: bytes, seed: int = 0) -> int:
    """Pure-python murmur3_x86_32 over ``data`` (signed 32-bit result).
    Used for string bucketing inside the Arrow-batched UDF and as the
    test oracle for the expression form."""
    h = seed
    n = len(data)
    for i in range(0, n - 3, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[n - (n & 3):]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _bucket_string_col(v: Column, n: int) -> Column:
    """Bucket id for a string column: ONE pandas UDF (Arrow batches),
    values memoized per batch so repeated partition strings hash once."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _bucket(s):  # type: ignore[no-untyped-def]
        import pandas as pd

        memo: dict[str, int] = {}

        def one(x):
            if x is None:
                return None
            b = memo.get(x)
            if b is None:
                b = (murmur3_bytes(x.encode("utf-8")) & 0x7FFFFFFF) % n
                memo[x] = b
            return b

        return pd.Series([one(x) for x in s], dtype="Int32")

    return _bucket(v)


# ---------------------------------------------------------- column builders

_EPOCH_MICROS_HOUR = 3_600_000_000
_HASHABLE_AS_LONG = (IntegerType, LongType, DateType,
                     TimestampType, TimestampNTZType)


def _as_epoch_micros(v: Column, dt) -> Column:
    # session TZ is pinned UTC (session.py), so the NTZ->TZ cast is
    # micros-preserving and both timestamp flavors share one path
    if isinstance(dt, TimestampNTZType):
        v = v.cast(TimestampType())
    return F.unix_micros(v)


def transform_column(kind: str, param: int | None, v: Column,
                     dt) -> Column:
    """The partition value of ``v`` (Spark type ``dt``) under the
    transform — the column the writer partitions freshly written data
    files by. Output types: bucket/year/month/day/hour -> int;
    truncate -> the source type; identity -> the source value."""
    if kind == "identity":
        return v
    if kind == "void":
        return F.lit(None).cast("int")
    if kind == "bucket":
        if isinstance(dt, StringType):
            return _bucket_string_col(v, param)
        if isinstance(dt, DateType):
            h = murmur3_long_col(F.datediff(v, F.lit("1970-01-01")))
        elif isinstance(dt, (TimestampType, TimestampNTZType)):
            h = murmur3_long_col(_as_epoch_micros(v, dt))
        elif isinstance(dt, (IntegerType, LongType)):
            h = murmur3_long_col(v)
        else:
            raise TransformError(
                f"bucket over {dt.simpleString()}: this writer buckets "
                "int/long/date/timestamp/string sources"
            )
        return (h.bitwiseAND(F.lit(0x7FFFFFFF)) % F.lit(param)).cast("int")
    if kind == "truncate":
        if isinstance(dt, (IntegerType, LongType)):
            w = F.lit(param)
            return (v - F.pmod(v, w)).cast(dt)
        if isinstance(dt, StringType):
            return F.substring(v, 1, param)
        raise TransformError(
            f"truncate over {dt.simpleString()}: this writer truncates "
            "int/long/string sources"
        )
    # time transforms: floored ordinals since the epoch
    if kind == "hour":
        if not isinstance(dt, (TimestampType, TimestampNTZType)):
            raise TransformError("hour requires a timestamp source")
        return F.floor(
            _as_epoch_micros(v, dt) / F.lit(_EPOCH_MICROS_HOUR)
        ).cast("int")
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        d = v.cast(TimestampType()).cast(DateType()) \
            if isinstance(dt, TimestampNTZType) else v.cast(DateType())
    elif isinstance(dt, DateType):
        d = v
    else:
        raise TransformError(f"{kind} requires a date or timestamp source")
    if kind == "day":
        return F.datediff(d, F.lit("1970-01-01")).cast("int")
    if kind == "month":
        return ((F.year(d) - F.lit(1970)) * F.lit(12)
                + F.month(d) - F.lit(1)).cast("int")
    if kind == "year":
        return (F.year(d) - F.lit(1970)).cast("int")
    raise TransformError(f"unknown transform kind {kind!r}")


def tuple_ice_type(kind: str, src_ice_type: str) -> str:
    """The Iceberg type of the partition-tuple value the transform
    produces (what the manifest's partition record carries). ``day``
    serializes as int — the Avro physical carrier of its logical date
    result, which is also what :func:`transform_column` computes."""
    if kind == "identity":
        return src_ice_type
    if kind == "truncate":
        return src_ice_type
    if kind == "void":
        return "int"
    return "int"  # bucket / year / month / day / hour
