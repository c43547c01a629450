"""Bucketed joins must produce identical results to plain joins AND plan
without a shuffle (no Exchange) on either side."""

from __future__ import annotations

import contextlib
import io
import uuid

import pytest

from monday_etl_spark.io import load_table
from monday_etl_spark.operators.bucketing import bucketed_join, write_bucketed

from .conftest import SF_SMOKE

# unique per-session names: stale spark-warehouse/ dirs from a crashed run
# have no catalog entry, so fixed names break saveAsTable on rerun
_SUF = uuid.uuid4().hex[:8]


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    lt, rt = f"orders_b_{_SUF}", f"lineitem_b_{_SUF}"
    o = load_table(spark, SF_SMOKE, "orders").withColumnRenamed("o_orderkey", "orderkey")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed("l_orderkey", "orderkey")
    write_bucketed(o, lt, "orderkey", buckets=8)
    write_bucketed(li, rt, "orderkey", buckets=8)
    yield lt, rt
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    # at test size the planner prefers broadcasting the small side (and
    # rightly ignores buckets); disable broadcast to simulate the at-scale
    # case the bucketing exists for — both sides too big to broadcast
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = bucketed_join(spark, lt, rt, "orderkey").select(
        "orderkey", "o_totalprice", "l_linenumber", "l_extendedprice"
    )
    o = load_table(spark, SF_SMOKE, "orders").withColumnRenamed("o_orderkey", "orderkey")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed("l_orderkey", "orderkey")
    plain = o.join(li, "orderkey").select(
        "orderkey", "o_totalprice", "l_linenumber", "l_extendedprice"
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
