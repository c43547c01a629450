"""One-source multi-view maintenance: a single drain maintains the
rollup and SCD2 views together; two sequential drains prove the additive
rollup and the SCD2 tail-rederive both stay equal to their batch builds,
and the rollup parity against the standalone update-mode flavor pins
that the multiplexed path changes cost, not values."""

from __future__ import annotations

import pyarrow.parquet as pq

from monday_etl_spark.streaming.multi_maintenance import (
    apply_rollup_batch,
    read_rollup,
    run_multi_maintenance,
)
from monday_etl_spark.streaming.rollup_maintenance import (
    run_rollup_maintenance,
)
from monday_etl_spark.streaming.scd2_maintenance import apply_scd2_batch
from monday_etl_spark.tableformat import current_version

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


def _rollup_state(df):
    return {
        (str(r.event_date), r.event_type): (r.n_events, r.total_value)
        for r in df.collect()
    }


def test_one_drain_maintains_both_views(spark, tmp_path):
    t = pq.read_table(f"{SF_SMOKE}/events.parquet").sort_by("ts")
    half = t.num_rows // 2
    ingest = tmp_path / "ingest"
    ingest.mkdir()
    f1 = ingest / "part1.events.parquet"
    pq.write_table(t.slice(0, half), f1)

    rollup = str(tmp_path / "rollup_table")
    scd2 = str(tmp_path / "scd2_table")
    ckpt = str(tmp_path / "ckpt")
    views = [(rollup, apply_rollup_batch), (scd2, apply_scd2_batch)]

    run_multi_maintenance(spark, str(ingest), views, ckpt,
                          glob="*.events.parquet")
    assert _rollup_state(read_rollup(spark, rollup)) \
        == _batch_rollup(spark, str(f1))
    v_r1, v_s1 = current_version(rollup), current_version(scd2)
    assert v_r1 is not None and v_s1 is not None

    # second file, same checkpoint: ONE drain advances BOTH views
    f2 = ingest / "part2.events.parquet"
    pq.write_table(t.slice(half), f2)
    run_multi_maintenance(spark, str(ingest), views, ckpt,
                          glob="*.events.parquet")
    assert _rollup_state(read_rollup(spark, rollup)) \
        == _batch_rollup(spark, str(f1), str(f2))
    assert current_version(rollup) > v_r1
    assert current_version(scd2) > v_s1

    # SCD2 equals the batch history build over everything ingested
    # (the ingest is the smoke events split time-ordered in two)
    from monday_etl_spark.queries import REGISTRY
    from monday_etl_spark.tableformat import read_version

    want = {
        (r.user_id, r.version_n): (r.status, r.valid_from_us,
                                   r.valid_to_us, r.is_current)
        for r in REGISTRY["scd2_history"].fn(spark, SF_SMOKE).collect()
    }
    got = {
        (r.user_id, r.version_n): (r.status, r.valid_from_us,
                                   r.valid_to_us, r.is_current)
        for r in read_version(spark, scd2).collect()
    }
    assert got == want

    # re-drain with no new files: nothing commits on either view
    run_multi_maintenance(spark, str(ingest), views, ckpt,
                          glob="*.events.parquet")
    assert current_version(rollup) == 2 and current_version(scd2) == 2


def test_multiplexed_rollup_matches_standalone(spark, tmp_path):
    """Value parity: the additive multiplexed rollup serves exactly what
    the standalone update-mode flavor serves over the same ingest."""
    t = pq.read_table(f"{SF_SMOKE}/events.parquet")
    ingest = tmp_path / "ingest"
    ingest.mkdir()
    pq.write_table(t, ingest / "part1.events.parquet")

    multi = str(tmp_path / "multi_rollup")
    solo = str(tmp_path / "solo_rollup")
    run_multi_maintenance(
        spark, str(ingest), [(multi, apply_rollup_batch)],
        str(tmp_path / "ck1"), glob="*.events.parquet")
    solo_df = run_rollup_maintenance(
        spark, str(ingest), solo, str(tmp_path / "ck2"),
        glob="*.events.parquet", n_buckets=4)
    assert _rollup_state(read_rollup(spark, multi)) \
        == _rollup_state(solo_df)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-applying the SAME (app, batch_id)
    — a crash after one view committed but before the checkpoint recorded
    the batch — must NOT double-count the additive rollup or append
    spurious SCD2 versions. The txn stamp commits atomically with each
    view's change and makes the replay a no-op."""
    from monday_etl_spark.io import normalize_event_ts
    from monday_etl_spark.tableformat import (
        last_versioned_txn,
        read_version,
    )

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").sort_by("ts")
    src = tmp_path / "events.parquet"
    pq.write_table(t.slice(0, t.num_rows // 2), src)
    batch = normalize_event_ts(spark.read.parquet(str(src)))

    rollup = str(tmp_path / "rollup_table")
    scd2 = str(tmp_path / "scd2_table")

    apply_rollup_batch(spark, rollup, batch, txn=("app-r", 0))
    apply_scd2_batch(spark, scd2, batch, txn=("app-s", 0))
    want_rollup = _rollup_state(read_rollup(spark, rollup))
    want_scd2 = read_version(spark, scd2).count()
    assert last_versioned_txn(rollup, "app-r") == 0
    assert last_versioned_txn(scd2, "app-s") == 0

    # replay the identical batch id: both views no-op (no new version,
    # no value drift)
    apply_rollup_batch(spark, rollup, batch, txn=("app-r", 0))
    apply_scd2_batch(spark, scd2, batch, txn=("app-s", 0))
    assert current_version(rollup) == 1 and current_version(scd2) == 1
    assert _rollup_state(read_rollup(spark, rollup)) == want_rollup
    assert read_version(spark, scd2).count() == want_scd2

    # a NEW batch id still applies — and the stamp survives the commit
    batch2 = normalize_event_ts(spark.read.parquet(str(src))).limit(50)
    apply_rollup_batch(spark, rollup, batch2, txn=("app-r", 1))
    assert current_version(rollup) == 2
    assert last_versioned_txn(rollup, "app-r") == 1
    # an unknown app has no stamp
    assert last_versioned_txn(rollup, "other-app") is None
