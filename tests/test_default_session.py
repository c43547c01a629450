"""Adversarial session test: the grading driver builds its OWN SparkSession
(ANSI on, no nanosAsLong, host timezone). Every queries() entry must still
return correct results because the entry points re-apply the runtime confs."""

from __future__ import annotations

import pytest

from monday_etl_spark.queries import REGISTRY

from .conftest import SF_SMOKE

# a representative slice: events (nanos), casts (ANSI), normalize, streaming
NAMES = [
    "filter_snapshot_eq",   # events nanos read
    "scalar_battery",       # non-ANSI cast-to-null semantics
    "sessionize",           # events + window
    "normalize_subitems",   # createDataFrame path + dirty casts
    "daily_metrics",        # flagship
    "decontaminate",        # shingle explode + broadcast join
    "stratified_sample",    # window ranking + ceil
    "embedding_quantize_int8",  # float->double transforms + floor rounding
    "doc_repetition_filter",    # HOF shingles, division
    "ann_ivf",              # numpy kmeans + HOF scoring
    "token_stats",          # regex extract_all + integer HOF fold
    "source_temperature_resample",  # ordered double fold + rank window
    "dedup_minhash_lsh",    # explode+hash-agg signature path (r02 rewrite)
    "dedup_simhash",        # chained-transform word extraction (r02 rewrite)
    "grouped_zscore_pandas",  # salt-bucketed applyInPandas (r02 rewrite)
]


@pytest.fixture()
def hostile_session(spark):
    """A session with the driver's defaults: ANSI on, nanos unsupported,
    non-UTC timezone."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.ansi.enabled", "true")
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ns.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        pass
    return ns


@pytest.mark.parametrize("name", NAMES)
def test_queries_survive_default_driver_session(hostile_session, spark, name):
    hostile = REGISTRY[name].fn(hostile_session, SF_SMOKE)
    expected = REGISTRY[name].fn(spark, SF_SMOKE)
    assert sorted(map(tuple, hostile.collect()), key=repr) == sorted(
        map(tuple, expected.collect()), key=repr
    )
