"""Materialized IVF index store: store-vs-lazy exact parity, incremental
append, and dynamic-partition-pruned probe scans."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from monday_etl_spark.extensions.ivf import ivf_topk, kmeans_fit
from monday_etl_spark.extensions.ivf_store import (
    build_ivf_index,
    query_ivf_index,
    update_ivf_index,
)
from monday_etl_spark.io import load_table

from .conftest import SF_SMOKE

TABLE = "ivf_index_store_test"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def centroids(emb):
    return kmeans_fit(emb, k=8, iterations=3)


@pytest.fixture(scope="module")
def store(spark, emb, centroids):
    build_ivf_index(emb, centroids, table=TABLE)
    yield TABLE
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def _hits(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cosine_sim) for r in df.collect()
    )


def test_store_matches_lazy_path(spark, emb, centroids, store):
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    assert _hits(query_ivf_index(spark, queries, centroids, table=store)) == _hits(
        ivf_topk(emb, queries, centroids)
    )


def test_probe_scan_is_partition_pruned(spark, emb, centroids, store):
    """The probe join on the partition column must reach the store scan as
    a dynamic partition-pruning filter — at scale this is what keeps a
    query batch from reading the whole index."""
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    out = query_ivf_index(spark, queries, centroids, table=store)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), f"no DPP on the store scan:\n{plan}"


def test_incremental_update(spark, emb, centroids):
    table = TABLE + "_incr"
    try:
        old = emb.filter(F.col("vec_id") % 5 != 0)
        build_ivf_index(old, centroids, table=table)
        n_old = spark.table(table).count()

        # update with the FULL corpus: only the missing fifth is appended
        update_ivf_index(emb, centroids, table=table)
        incr = spark.table(table)
        assert incr.count() == emb.count() > n_old
        assert incr.groupBy("neighbor_id").count().filter("count > 1").count() == 0

        # a second update with no new vectors is a no-op
        update_ivf_index(emb, centroids, table=table)
        assert spark.table(table).count() == incr.count()

        # the incrementally-built store equals a from-scratch build
        build_ivf_index(emb, centroids, table=TABLE + "_full")
        full = spark.table(TABLE + "_full")
        assert sorted(map(repr, incr.collect())) == sorted(map(repr, full.collect()))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {TABLE}_full")
