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
