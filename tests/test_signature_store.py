"""Materialized MinHash signature store: parity with the lazy path,
shuffle-free candidate join, and incremental append."""

from __future__ import annotations

import contextlib
import io
import uuid

import pytest
from pyspark.sql import functions as F

from monday_etl_spark.extensions.dedup import minhash_candidates
from monday_etl_spark.extensions.signature_store import (
    build_signature_store,
    candidates_from_store,
    update_signature_store,
)
from monday_etl_spark.io import load_table

from .conftest import SF_SMOKE

# Unique per-session table name: a crashed prior session can leave
# spark-warehouse/<name> directories behind with no catalog entry, so a fixed
# name makes DROP TABLE IF EXISTS a no-op and saveAsTable die with
# LOCATION_ALREADY_EXISTS on the next run (same rerun-safety pattern as
# commit af2ca73 for the incremental-dedup tests).
TABLE = f"minhash_sig_store_test_{uuid.uuid4().hex[:8]}"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


@pytest.fixture(scope="module")
def store(spark, docs):
    build_signature_store(docs, table=TABLE, buckets=8)
    yield TABLE
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def _pairs(df):
    return sorted((r.doc_a, r.doc_b, r.est_jaccard) for r in df.collect())


def test_store_matches_lazy_path(spark, docs, store):
    assert _pairs(candidates_from_store(spark, store)) == _pairs(
        minhash_candidates(docs)
    )


def test_candidate_join_no_exchange_before_join(spark, store):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cands = candidates_from_store(spark, store)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cands.explain()
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # exactly one Exchange allowed: the post-join dropDuplicates on
        # (doc_a, doc_b). The join inputs themselves must be Exchange-free.
        join_inputs = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_inputs, f"join inputs shuffle:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_incremental_update(spark, docs):
    table = TABLE + "_incr"
    try:
        old = docs.filter(F.col("doc_id") % 5 != 0)
        build_signature_store(old, table=table, buckets=8)
        n_old = spark.table(table).count()

        # update with the FULL corpus: only the missing fifth is appended
        update_signature_store(docs, table=table, buckets=8)
        incr = spark.table(table)
        assert incr.count() > n_old
        assert incr.groupBy("doc_id", "band").count().filter("count > 1").count() == 0

        # a second update with no new docs is a no-op
        update_signature_store(docs, table=table, buckets=8)
        assert spark.table(table).count() == incr.count()

        # the incrementally-built store equals a from-scratch build
        build_signature_store(docs, table=TABLE + "_full", buckets=8)
        full = spark.table(TABLE + "_full")
        assert sorted(map(tuple, incr.collect())) == sorted(map(tuple, full.collect()))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {TABLE}_full")
