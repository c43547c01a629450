"""Streaming rollup maintenance: incremental MERGE into a versioned table.

Two sequential drains over a growing ingest directory must leave the
versioned table equal to the batch rollup over everything ingested so far,
with the post-first-drain state still readable as its own version (time
travel), and a re-drain with no new files committing nothing (exactly-once
across runs).
"""

from __future__ import annotations

import shutil

import pyarrow.parquet as pq

from monday_etl_spark.streaming.rollup_maintenance import run_rollup_maintenance
from monday_etl_spark.tableformat import current_version, read_version

from .conftest import SF_SMOKE


def _batch_rollup(spark, *paths):
    from pyspark.sql import functions as F

    from monday_etl_spark.functions import money_sum
    from monday_etl_spark.io import normalize_event_ts

    ev = normalize_event_ts(spark.read.parquet(*paths))
    return {
        (str(r.event_date), r.event_type): (r.n_events, r.total_value)
        for r in ev.groupBy(
            F.col("ts").cast("date").alias("event_date"), "event_type"
        )
        .agg(F.count("*").alias("n_events"),
             money_sum(F.col("value")).alias("total_value"))
        .collect()
    }


def _table_state(df):
    return {
        (str(r.event_date), r.event_type): (r.n_events, r.total_value)
        for r in df.collect()
    }


def test_incremental_maintenance_matches_batch(spark, tmp_path):
    # split the smoke events by time: first ~half the rows, then the rest —
    # the second drain's events are all at or after the first's maximum, so
    # nothing is late past the watermark
    t = pq.read_table(f"{SF_SMOKE}/events.parquet").sort_by("ts")
    half = t.num_rows // 2
    ingest = tmp_path / "ingest"
    ingest.mkdir()
    f1 = ingest / "part1.events.parquet"
    pq.write_table(t.slice(0, half), f1)

    table = str(tmp_path / "rollup_table")
    ckpt = str(tmp_path / "ckpt")

    got1 = run_rollup_maintenance(
        spark, str(ingest), table, ckpt, glob="*.events.parquet")
    assert _table_state(got1) == _batch_rollup(spark, str(f1))
    v1 = current_version(table)

    # second file arrives; same checkpoint — only the new events process
    f2 = ingest / "part2.events.parquet"
    pq.write_table(t.slice(half), f2)
    got2 = run_rollup_maintenance(
        spark, str(ingest), table, ckpt, glob="*.events.parquet")
    assert _table_state(got2) == _batch_rollup(spark, str(f1), str(f2))
    v2 = current_version(table)
    assert v2 > v1

    # time travel: the post-first-drain serving state is still readable
    assert _table_state(read_version(spark, table, v1)) == \
        _batch_rollup(spark, str(f1))

    # exactly-once: re-draining with no new files commits nothing
    run_rollup_maintenance(
        spark, str(ingest), table, ckpt, glob="*.events.parquet")
    assert current_version(table) == v2
