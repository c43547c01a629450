"""Exactly-once streaming appends into Delta via transaction identifiers.

The hazard under test is foreachBatch's at-least-once delivery: a replayed
batch (checkpoint recovery, or a full checkpoint reset over an unchanged
source) must commit exactly once, decided from the table's OWN log — the
spec's txn actions — not from producer-side memory."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from monday_etl_spark.delta_export import export_delta_log
from monday_etl_spark.delta_import import (
    append_delta,
    delta_versions,
    last_txn_version,
    read_delta,
)
from monday_etl_spark.streaming.delta_sink import run_delta_append_stream
from monday_etl_spark.tableformat import write_versioned

_SCHEMA = "id bigint, v double"


def _mk_table(spark, root) -> str:
    path = str(root / "tbl")
    base = spark.createDataFrame([(i, float(i)) for i in range(10)], _SCHEMA)
    write_versioned(base, path, key="id", n_buckets=2)
    export_delta_log(path)
    return path


def test_append_txn_idempotent(spark, tmp_path):
    path = _mk_table(spark, tmp_path)
    b0 = spark.createDataFrame([(100, 100.0)], _SCHEMA)

    v1 = append_delta(spark, b0, path, app_id="app", txn_version=0)
    assert v1 == 1 and last_txn_version(spark, path, "app") == 0
    # replay of batch 0: skipped, version unchanged, no duplicate rows
    v_again = append_delta(spark, b0, path, app_id="app", txn_version=0)
    assert v_again == 1
    assert read_delta(spark, path).filter(F.col("id") == 100).count() == 1

    b1 = spark.createDataFrame([(101, 101.0)], _SCHEMA)
    v2 = append_delta(spark, b1, path, app_id="app", txn_version=1)
    assert v2 == 2 and last_txn_version(spark, path, "app") == 1

    with pytest.raises(ValueError, match="together"):
        append_delta(spark, b1, path, app_id="app")


def test_stream_drain_exactly_once(spark, tmp_path):
    path = _mk_table(spark, tmp_path)
    src = tmp_path / "ingest"
    os.makedirs(src)
    for i, base in enumerate((100, 200)):
        stage = str(tmp_path / f"_stage_{i}")
        spark.createDataFrame(
            [(base + j, float(j)) for j in range(5)], _SCHEMA
        ).coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.replace(os.path.join(stage, part), str(src / f"f{i}.parquet"))

    got = run_delta_append_stream(
        spark, str(src), path, app_id="drain",
        checkpoint_dir=str(tmp_path / "ckpt"),
        glob="*.parquet", max_files_per_trigger=1,
    )
    assert got.count() == 20  # 10 base + 2 files x 5
    assert delta_versions(path) == [0, 1, 2]
    assert last_txn_version(spark, path, "drain") == 1

    # same checkpoint, no new files: the stream emits nothing
    run_delta_append_stream(
        spark, str(src), path, app_id="drain",
        checkpoint_dir=str(tmp_path / "ckpt"),
        glob="*.parquet", max_files_per_trigger=1,
    )
    assert delta_versions(path) == [0, 1, 2]

    # checkpoint LOST: every batch replays from id 0 — the table-side txn
    # check must skip them all (this is the at-least-once hazard)
    run_delta_append_stream(
        spark, str(src), path, app_id="drain",
        checkpoint_dir=str(tmp_path / "ckpt_fresh"),
        glob="*.parquet", max_files_per_trigger=1,
    )
    after = read_delta(spark, path)
    assert after.count() == 20
    assert delta_versions(path) == [0, 1, 2]
    # distinct ids: nothing duplicated
    assert after.select("id").distinct().count() == 20


def test_append_race_retries_at_next_version(spark, tmp_path):
    from monday_etl_spark.tableformat import LogStore, set_log_store

    path = _mk_table(spark, tmp_path)

    class OneShotRace(LogStore):
        def __init__(self):
            self.raced = False

        def put_if_absent(self, final_path, payload):
            if "_delta_log" in final_path and not self.raced:
                self.raced = True  # interloper publishes this version first
                with open(final_path, "w") as fh:
                    fh.write('{"commitInfo":{"operation":"WRITE"}}\n')
            super().put_if_absent(final_path, payload)

    prev = set_log_store(OneShotRace())
    try:
        df = spark.createDataFrame([(300, 300.0)], _SCHEMA)
        v = append_delta(spark, df, path, app_id="app", txn_version=0,
                         retries=2)
    finally:
        set_log_store(prev)
    # the interloper took version 1; our commit re-derived and landed at 2
    assert v == 2
    assert delta_versions(path) == [0, 1, 2]
    assert read_delta(spark, path).filter(F.col("id") == 300).count() == 1
    assert last_txn_version(spark, path, "app") == 0


def test_reset_appid_rule_documented_behavior(spark, tmp_path):
    """Lower txn_version after a higher one = replay by contract: skipped.
    (The documented delta-spark rule: a new query needs a new appId.)"""
    path = _mk_table(spark, tmp_path)
    append_delta(spark, spark.createDataFrame([(1000, 0.0)], _SCHEMA),
                 path, app_id="app", txn_version=5)
    v = append_delta(spark, spark.createDataFrame([(2000, 0.0)], _SCHEMA),
                     path, app_id="app", txn_version=3)
    assert v == 1  # skipped
    assert read_delta(spark, path).filter(F.col("id") == 2000).count() == 0


def test_write_checkpoint_bounds_replay(spark, tmp_path):
    """Writer-side checkpoint: latest state compacts into one parquet +
    _last_checkpoint; the JSON commits it covers can be deleted and the
    table (including txn state) still replays; later appends land in the
    tail; time travel below the checkpoint correctly reports the hole."""
    import json as _json

    from monday_etl_spark.delta_import import write_checkpoint

    path = _mk_table(spark, tmp_path)
    append_delta(spark, spark.createDataFrame([(100, 1.0)], _SCHEMA),
                 path, app_id="app", txn_version=0)
    append_delta(spark, spark.createDataFrame([(101, 2.0)], _SCHEMA),
                 path, app_id="app", txn_version=1)

    ckpt = write_checkpoint(spark, path, clean_commits=True)
    assert os.path.basename(ckpt) == f"{2:020d}.checkpoint.parquet"
    with open(os.path.join(path, "_delta_log", "_last_checkpoint")) as fh:
        assert _json.load(fh)["version"] == 2
    # the covered JSON commits are gone; replay is checkpoint-only
    assert not [f for f in os.listdir(os.path.join(path, "_delta_log"))
                if f.endswith(".json")]
    got = read_delta(spark, path)
    assert got.count() == 12
    assert got.filter(F.col("id").isin(100, 101)).count() == 2
    assert last_txn_version(spark, path, "app") == 1  # txn survived

    # the tail applies on top of the checkpoint
    append_delta(spark, spark.createDataFrame([(102, 3.0)], _SCHEMA),
                 path, app_id="app", txn_version=2)
    assert read_delta(spark, path).count() == 13
    assert delta_versions(path) == [2, 3]

    with pytest.raises(FileNotFoundError, match="hole"):
        read_delta(spark, path, version=1)


def test_stream_checkpoint_every(spark, tmp_path):
    """checkpoint_every=2 on the drain: versions 2 and 4 get checkpoints,
    and a fresh reader needs only the newest checkpoint + empty tail."""
    path = _mk_table(spark, tmp_path)
    src = tmp_path / "ingest"
    os.makedirs(src)
    for i in range(4):
        stage = str(tmp_path / f"_stage_{i}")
        spark.createDataFrame([(100 * (i + 1), float(i))], _SCHEMA) \
            .coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.replace(os.path.join(stage, part), str(src / f"f{i}.parquet"))

    run_delta_append_stream(
        spark, str(src), path, app_id="drain",
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1, checkpoint_every=2,
    )
    log = os.path.join(path, "_delta_log")
    ckpts = sorted(f for f in os.listdir(log)
                   if f.endswith(".checkpoint.parquet"))
    assert ckpts == [f"{2:020d}.checkpoint.parquet",
                     f"{4:020d}.checkpoint.parquet"]
    got = read_delta(spark, path)
    assert got.count() == 14
    assert last_txn_version(spark, path, "drain") == 3
