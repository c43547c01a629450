"""Salted join must be result-identical to the plain join (partitioning
change only), including the skewed-key case it exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from monday_etl_spark.operators.join_ops import broadcast_dim, salted_join


def _dfs(spark):
    # skew: key 1 dominates the fact side
    fact = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 1000), (3, 2000), (99, 1)],
        "k int, v int",
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "warm"), (3, "cold")], "k int, name string")
    return fact, dim


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_salted_inner_join_matches_plain(spark):
    fact, dim = _dfs(spark)
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, on="k", salt=4)
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salted_left_join_matches_plain(spark):
    fact, dim = _dfs(spark)
    plain = fact.join(dim, "k", "left")
    salted = salted_join(fact, dim, on="k", how="left", salt=4)
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_broadcast_dim_plan_and_result(spark):
    fact, dim = _dfs(spark)
    out = broadcast_dim(fact, dim, "k")
    assert _sorted(out) == _sorted(fact.join(dim, "k"))
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    assert "BroadcastHashJoin" in buf.getvalue()


def test_approx_count_distinct_error_bound(spark):
    n = 20000
    df = spark.range(n).select((F.col("id") % 5000).alias("u"))
    approx = df.agg(F.approx_count_distinct("u", rsd=0.02).alias("a")).first().a
    assert abs(approx - 5000) / 5000 < 0.05


def test_hot_keys_detects_dominant_key(spark):
    from monday_etl_spark.operators.join_ops import hot_keys

    fact, _ = _dfs(spark)
    assert hot_keys(fact, "k", threshold_frac=0.5) == [1]
    # every key individually exceeds a tiny threshold except none above 1.0
    assert hot_keys(fact, "k", threshold_frac=1.0) == []


def test_auto_salted_inner_join_matches_plain(spark):
    from monday_etl_spark.operators.join_ops import auto_salted_join

    fact, dim = _dfs(spark)
    plain = fact.join(dim, "k")
    auto = auto_salted_join(fact, dim, on="k", salt=4, threshold_frac=0.1)
    assert _sorted(auto.select(*plain.columns)) == _sorted(plain)


def test_auto_salted_left_join_matches_plain(spark):
    from monday_etl_spark.operators.join_ops import auto_salted_join

    fact, dim = _dfs(spark)
    plain = fact.join(dim, "k", "left")
    auto = auto_salted_join(fact, dim, on="k", how="left", salt=4,
                            threshold_frac=0.1)
    assert _sorted(auto.select(*plain.columns)) == _sorted(plain)


def test_auto_salted_no_hot_keys_is_plain_join(spark):
    from monday_etl_spark.operators.join_ops import auto_salted_join

    fact = spark.createDataFrame([(i % 7, i) for i in range(70)], "k int, v int")
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(7)], "k int, name string")
    # uniform keys: nothing exceeds 50%, so the plan degenerates to the
    # plain join (no union, no salt column)
    auto = auto_salted_join(fact, dim, on="k", threshold_frac=0.5)
    assert _sorted(auto.select("k", "v", "name")) == _sorted(
        fact.join(dim, "k").select("k", "v", "name")
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        auto.explain()
    assert "Union" not in buf.getvalue()


def _null_key_dfs(spark):
    """Left side with a hot key AND frequent NULL keys — the r05 regression:
    ``isin(hot)`` is NULL (not false) for a NULL key, so before the fix a
    NULL-keyed left row failed BOTH the hot and cold filters and vanished
    from the left-join result. NULLs here are >1% of rows, so hot_keys also
    reports None as a 'hot key' — the exact interaction the fix routes
    around."""
    fact = spark.createDataFrame(
        [(1, i) for i in range(500)]
        + [(None, 9000 + i) for i in range(300)]
        + [(2, 1000), (3, 2000), (99, 1)],
        "k int, v int",
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (3, "cold")], "k int, name string"
    )
    return fact, dim


def _nsorted(df):
    """None-safe row sort (NULL keys are the point of these fixtures)."""
    return sorted(
        map(tuple, df.collect()),
        key=lambda r: tuple((v is None, v if v is not None else 0) for v in r),
    )


def test_auto_salted_left_join_keeps_null_keyed_rows(spark):
    from monday_etl_spark.operators.join_ops import auto_salted_join

    fact, dim = _null_key_dfs(spark)
    plain = fact.join(dim, "k", "left")
    auto = auto_salted_join(fact, dim, on="k", how="left", salt=4,
                            threshold_frac=0.1)
    got = _nsorted(auto.select(*plain.columns))
    assert got == _nsorted(plain)
    # the 300 NULL-keyed rows must survive with NULL right columns
    assert sum(1 for r in got if r[0] is None) == 300


def test_auto_salted_inner_join_with_null_keys_matches_plain(spark):
    from monday_etl_spark.operators.join_ops import auto_salted_join

    fact, dim = _null_key_dfs(spark)
    plain = fact.join(dim, "k")
    auto = auto_salted_join(fact, dim, on="k", salt=4, threshold_frac=0.1)
    assert _sorted(auto.select(*plain.columns)) == _sorted(plain)


def test_hot_keys_can_report_null_but_auto_join_stays_correct(spark):
    from monday_etl_spark.operators.join_ops import auto_salted_join, hot_keys

    fact, dim = _null_key_dfs(spark)
    # NULL holds ~37% of rows: hot_keys reports it (groupBy counts NULL as a
    # group), auto_salted_join must filter it out of the salt list — a NULL
    # key never equi-matches, so salting it is pointless and isin(NULL
    # member) stays three-valued-logic-safe
    hot = hot_keys(fact, "k", threshold_frac=0.3)
    assert None in hot and 1 in hot
    auto = auto_salted_join(fact, dim, on="k", how="left", salt=4,
                            threshold_frac=0.3)
    plain = fact.join(dim, "k", "left")
    assert _nsorted(auto.select(*plain.columns)) == _nsorted(plain)


def test_hot_keys_sampled_parity_on_skew_fixture(spark):
    """Sample-based detection finds the same hot set as the full pass on
    the bench's pathological skew fixture (70% of rows on one key), and
    the sampled auto_salted_join's RESULT equals the plain join exactly
    (the split is exact regardless of how detection was costed)."""
    from monday_etl_spark.operators.join_ops import auto_salted_join, hot_keys
    from monday_etl_spark.queries.relational import skewed_join_inputs

    left, dim = skewed_join_inputs(spark, "/root/testdata/sf0.001", hot=9)
    full = set(hot_keys(left, "skey", threshold_frac=0.1))
    sampled = set(
        hot_keys(left, "skey", threshold_frac=0.1, sample_fraction=0.3)
    )
    assert full == sampled and full  # same detected set, non-empty

    plain = sorted(map(tuple, left.join(dim, "skey").collect()))
    auto = sorted(map(tuple, auto_salted_join(
        left, dim, on="skey", salt=4, threshold_frac=0.1,
        sample_fraction=0.3,
    ).collect()))
    assert auto == plain


def test_hot_keys_empty_input(spark):
    from monday_etl_spark.operators.join_ops import hot_keys

    empty = spark.createDataFrame([], "k int, v int")
    assert hot_keys(empty, "k") == []
    assert hot_keys(empty, "k", sample_fraction=0.5) == []
