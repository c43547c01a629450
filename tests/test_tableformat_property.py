"""Property test: a chain of versioned merges equals a dict fold.

The model: a table is a {key: row} dict; merge_versioned must behave as
dict.update, for ANY update sequence — while every intermediate version
stays readable as its own dict state (time travel).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from monday_etl_spark.tableformat import (
    merge_versioned,
    read_version,
    write_versioned,
)

_KEYS = st.integers(min_value=0, max_value=40)
_update_batch = st.dictionaries(_KEYS, st.integers(0, 1_000), min_size=1, max_size=8)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(_update_batch, min_size=1, max_size=3))
def test_merge_chain_equals_dict_fold(spark, tmp_path_factory, batches):
    path = str(tmp_path_factory.mktemp("vt") / "tbl")
    base = {k: -1 for k in range(10)}
    write_versioned(
        spark.createDataFrame(list(base.items()), "id bigint, v bigint"),
        path, key="id", n_buckets=4,
    )

    model = dict(base)
    states = [dict(model)]  # model state at each committed version
    for batch in batches:
        merge_versioned(
            spark,
            path,
            spark.createDataFrame(list(batch.items()), "id bigint, v bigint"),
        )
        model.update(batch)
        states.append(dict(model))

    for version, want in enumerate(states, start=1):
        got = {r.id: r.v for r in read_version(spark, path, version).collect()}
        assert got == want, f"version {version} diverged from the dict fold"


_op = st.one_of(
    st.tuples(st.just("merge"), _update_batch),
    st.tuples(st.just("delete"),
              st.lists(_KEYS, min_size=1, max_size=5, unique=True)),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("zorder"), st.none()),
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=4),
       lo=st.integers(0, 500), width=st.integers(0, 500))
def test_operation_mix_equals_dict_model(spark, tmp_path_factory, ops,
                                         lo, width):
    """ANY interleaving of merge/delete/compact/zorder behaves as the dict
    model; every committed version time-travels to its model snapshot; the
    stats-skipping read agrees with a plain model filter at every range."""
    from monday_etl_spark.tableformat import (
        compact_versioned,
        delete_versioned,
        optimize_zorder,
        read_where,
    )

    path = str(tmp_path_factory.mktemp("vtmix") / "tbl")
    model = {k: (k * 13) % 997 for k in range(20)}
    write_versioned(
        spark.createDataFrame(list(model.items()), "id bigint, v bigint"),
        path, key="id", n_buckets=4, stats_cols=["v"],
    )
    states = {1: dict(model)}

    for kind, arg in ops:
        if kind == "merge":
            v = merge_versioned(
                spark, path,
                spark.createDataFrame(list(arg.items()),
                                      "id bigint, v bigint"),
            )
            model.update(arg)
        elif kind == "delete":
            v = delete_versioned(
                spark, path,
                spark.createDataFrame([(k,) for k in arg], "id bigint"),
            )
            model = {k: x for k, x in model.items() if k not in arg}
        elif kind == "compact":
            v = compact_versioned(spark, path)
        else:
            v = optimize_zorder(spark, path, ["v"], files_per_bucket=2)
        states[v] = dict(model)  # compact/zorder: same rows, maybe same v

    for version, want in states.items():
        got = {r.id: r.v for r in read_version(spark, path, version).collect()}
        assert got == want, f"version {version} diverged"

    hi = lo + width
    got_rng = {r.id: r.v
               for r in read_where(spark, path, "v", lo, hi).collect()}
    want_rng = {k: x for k, x in model.items() if lo <= x <= hi}
    assert got_rng == want_rng


def test_python_xxhash64_matches_spark(spark):
    """The driver-side XXH64 port must be BIT-EXACT with Spark's
    xxhash64 for every key type read_key routes with — a mismatch
    silently sends a lookup to the wrong bucket (empty result, no
    error), so parity is pinned here across widths, signs, unicode,
    NULLs, chaining, and byte-length boundaries of the string path."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        IntegerType,
        LongType,
        StringType,
        TimestampType,
    )

    from monday_etl_spark.tableformat import _xxhash64_py

    longs = [0, 1, -1, 42, -42, 2**63 - 1, -(2**63), 2**31, -(2**31) - 1,
             982451653, -982451653]
    ints = [0, 1, -1, 2**31 - 1, -(2**31), 97, -12345]
    strings = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh",
               "abcdefghi", "x" * 31, "y" * 32, "z" * 33, "w" * 100,
               "héllo wörld", "日本語テキスト", "emoji \U0001F600 tail",
               "tab\tnl\n"]
    dates = [dt.date(1970, 1, 1), dt.date(1969, 12, 31),
             dt.date(2024, 2, 29), dt.date(1902, 7, 4)]
    stamps = [dt.datetime(1970, 1, 1), dt.datetime(2024, 6, 1, 12, 34, 56,
                                                   789012),
              dt.datetime(1969, 12, 31, 23, 59, 59, 999999)]
    bools = [True, False]

    cases = (
        [((v,), (LongType(),)) for v in longs]
        + [((v,), (IntegerType(),)) for v in ints]
        + [((v,), (StringType(),)) for v in strings]
        + [((v,), (DateType(),)) for v in dates]
        + [((v,), (TimestampType(),)) for v in stamps]
        + [((v,), (BooleanType(),)) for v in bools]
        + [((None,), (LongType(),)), ((None,), (StringType(),))]
        # chaining: composite keys seed each other in order
        + [((7, "abc"), (LongType(), StringType())),
           ((None, "abc"), (LongType(), StringType())),
           ((dt.date(2024, 1, 2), "evt"), (DateType(), StringType())),
           ((1, 2, 3), (LongType(), LongType(), LongType()))]
    )

    for vals, dtypes in cases:
        got = _xxhash64_py(vals, dtypes)
        ddl = ", ".join(f"`c{i}` {t.simpleString()}"
                        for i, t in enumerate(dtypes))
        want = spark.createDataFrame([tuple(vals)], ddl).select(
            F.xxhash64(*[F.col(f"c{i}") for i in range(len(vals))])
        ).collect()[0][0]
        assert got == want, f"mismatch for {vals!r}: {got} != {want}"

    # the fallback contract: unported types return None, never a guess
    from pyspark.sql.types import DoubleType

    assert _xxhash64_py((1.5,), (DoubleType(),)) is None


def test_python_xxhash64_datetime_non_utc_zones(spark):
    """Naive datetimes must hash EXACTLY as the one-row-job path
    converts them (TimestampType.toInternal: OS-LOCAL mktime — measured
    to ignore spark.sql.session.timeZone in classic createDataFrame),
    for any session zone AND any OS zone. The pre-r12 port assumed UTC
    and silently routed non-UTC hosts' lookups to a wrong bucket
    (ADVICE r11). Aware datetimes convert via their own zone."""
    import datetime as dt
    import os
    import time
    import zoneinfo

    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    from monday_etl_spark.tableformat import _xxhash64_py

    def want(v):
        return spark.createDataFrame([(v,)], "c0 timestamp").select(
            F.xxhash64(F.col("c0"))).collect()[0][0]

    vals = [dt.datetime(2024, 6, 1, 12, 34, 56, 789012),
            dt.datetime(1970, 1, 1),
            dt.datetime(2024, 1, 15, 23, 59, 59),
            # aware: converts via its own zone, both code paths
            dt.datetime(2024, 6, 1, 12, 0, 0,
                        tzinfo=zoneinfo.ZoneInfo("Asia/Kolkata"))]
    prev_session = spark.conf.get("spark.sql.session.timeZone")
    prev_tz = os.environ.get("TZ")
    try:
        # a non-UTC SESSION zone must not move either side
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        for v in vals:
            assert _xxhash64_py((v,), (TimestampType(),)) == want(v), v
        # a non-UTC OS zone moves BOTH sides together (mktime parity)
        os.environ["TZ"] = "America/New_York"
        time.tzset()
        for v in vals:
            assert _xxhash64_py((v,), (TimestampType(),)) == want(v), v
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_session)
        if prev_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = prev_tz
        time.tzset()


def test_timestamp_literal_outside_mktime_range_routes_to_job_path(
        monkeypatch):
    """A naive-datetime literal the platform's localtime cannot
    represent returns None (the unsupported-literal job-path fallback),
    never a crash — some libcs raise OverflowError/ValueError from
    mktime for pre-epoch or far-future dates (ADVICE r12)."""
    import time as _t
    from datetime import datetime

    from pyspark.sql.types import TimestampType

    from monday_etl_spark.tableformat import _xxhash64_py

    def boom(_tt):
        raise OverflowError("mktime argument out of range")

    monkeypatch.setattr(_t, "mktime", boom)
    assert _xxhash64_py((datetime(1900, 1, 1),),
                        (TimestampType(),)) is None
