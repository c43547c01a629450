"""Batch-split invariance of the stateful sessionizer (round-2 fix).

The r01 operator folded each micro-batch in arrival order, so an
out-of-order event landing in a later batch regressed last_ts and silently
renumbered sessions — the result depended on how the source split batches.
The rewrite buffers per-user events in state and finalizes only at or below
the event-time watermark, making session numbering invariant to any batch
split that respects the watermark contract; late-beyond-watermark events are
dropped (counted out), never renumbered.

These tests drive the drain one file per micro-batch (maxFilesPerTrigger=1)
with deliberately disordered files — the exact adversarial scenario.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000
BASE_US = 1_735_689_600_000_000  # 2025-01-01 00:00:00 UTC, second-aligned


def _write_events(path: str, rows: list[tuple[int, int, int]], mtime: int) -> None:
    """rows: (event_id, user_id, minute). Schema matches events.parquet."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [(BASE_US + r[2] * MIN_US) * 1000 for r in rows], pa.int64()
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array([json.dumps({})] * len(rows)),
        }
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def _drain(spark, src_dir, ckpt, name, delay):
    from pyspark.sql import functions as F

    from monday_etl_spark.streaming.snapshot_stream import read_events_stream
    from monday_etl_spark.streaming.stateful_sessions import stateful_sessionize

    ev = (
        read_events_stream(
            spark, str(src_dir), max_files_per_trigger=1, glob="*.parquet"
        )
        .withWatermark("ts", delay)
        .select("ts", "user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            stateful_sessionize(ev, gap_seconds=1800)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return {
        r.event_id: (r.ts_us, r.session_no) for r in spark.table(name).collect()
    }


def test_out_of_order_across_batches_within_watermark(spark, tmp_path):
    """An event arriving in a later micro-batch, older than already-seen
    events but within the watermark delay, must slot into the correct
    session — identical numbering to the batch sessionizer."""
    src = tmp_path / "src"
    src.mkdir()
    # file A: u1 at minutes 0,10,100,200; u2 at 5,15
    _write_events(
        str(src / "a.parquet"),
        [(1, 1, 0), (2, 1, 10), (3, 1, 100), (4, 1, 200), (10, 2, 5), (11, 2, 15)],
        mtime=1_000_000,
    )
    # file B: u1 minute 90 — OLDER than A's max (the adversarial event) —
    # plus 300 and 400
    _write_events(
        str(src / "b.parquet"),
        [(5, 1, 90), (6, 1, 300), (7, 1, 400)],
        mtime=1_000_100,
    )
    got = _drain(spark, src, tmp_path / "ck1", "adv_sessions_1", delay="1 hour")

    # final watermark = max ts (400 min) - 1 h delay -> events after minute
    # 340 are not yet final and stay buffered (the streaming contract)
    # u1 timeline 0,10,90,100,200,300,400 with 30-min gap:
    # sessions 1,1,2,2,3,4,(5 unfinalized); u2: 5,15 -> 1,1
    want = {
        1: (BASE_US + 0 * MIN_US, 1),
        2: (BASE_US + 10 * MIN_US, 1),
        5: (BASE_US + 90 * MIN_US, 2),
        3: (BASE_US + 100 * MIN_US, 2),
        4: (BASE_US + 200 * MIN_US, 3),
        6: (BASE_US + 300 * MIN_US, 4),
        10: (BASE_US + 5 * MIN_US, 1),
        11: (BASE_US + 15 * MIN_US, 1),
    }
    assert got == want


def test_late_beyond_watermark_dropped_not_renumbered(spark, tmp_path):
    """With zero delay, a cross-batch regression is late data: it is dropped
    per the watermark contract, and the numbering of everything else is what
    the batch sessionizer gives over the surviving events — no silent
    renumbering."""
    src = tmp_path / "src"
    src.mkdir()
    _write_events(
        str(src / "a.parquet"),
        [(1, 1, 0), (2, 1, 10), (3, 1, 100), (4, 1, 200)],
        mtime=1_000_000,
    )
    _write_events(str(src / "b.parquet"), [(6, 1, 300)], mtime=1_000_100)
    # minute 90 arrives only after batch B finalized through minute 200 —
    # it is now behind the emitted frontier
    _write_events(
        str(src / "c.parquet"), [(5, 1, 90), (7, 1, 400)], mtime=1_000_200
    )
    got = _drain(spark, src, tmp_path / "ck2", "adv_sessions_2", delay="0 seconds")

    # batch B runs with wm = minute 200 and finalizes 0,10,100,200; batch C's
    # minute-90 event is behind that frontier -> dropped; 300,400 flush by
    # drain end. Surviving timeline 0,10,100,200,300,400 -> sessions
    # 1,1,2,3,4,5 (every later gap > 30 min)
    want = {
        1: (BASE_US + 0 * MIN_US, 1),
        2: (BASE_US + 10 * MIN_US, 1),
        3: (BASE_US + 100 * MIN_US, 2),
        4: (BASE_US + 200 * MIN_US, 3),
        6: (BASE_US + 300 * MIN_US, 4),
        7: (BASE_US + 400 * MIN_US, 5),
    }
    assert got == want


def test_suggest_watermark_delay_covers_observed_disorder(spark, tmp_path):
    """Auto-tuned delay: the p99 arrival lag of a source with a known
    disorder bound must cover that bound, and draining with the suggested
    delay under an adversarial one-file-per-batch split finalizes the full
    in-watermark timeline with correct numbering."""
    from monday_etl_spark.streaming.snapshot_stream import read_events_batch
    from monday_etl_spark.streaming.stateful_sessions import suggest_watermark_delay

    src = tmp_path / "src"
    src.mkdir()
    # arrival order (file mtime) vs event time: file B carries an event 20
    # minutes OLDER than file A's max — observed disorder is 20 minutes
    _write_events(
        str(src / "a.parquet"),
        [(1, 1, 0), (2, 1, 10), (3, 1, 40)],
        mtime=1_000_000,
    )
    _write_events(
        str(src / "b.parquet"),
        [(4, 1, 20), (5, 1, 50), (6, 1, 60)],
        mtime=1_000_100,
    )
    batch = read_events_batch(spark, str(src), glob="*.parquet")
    delay = suggest_watermark_delay(batch)
    secs = int(delay.split()[0])
    assert secs >= 20 * 60  # covers the 20-minute regression
    assert secs <= 40 * 60  # ...but is data-derived, not a blanket horizon

    got = _drain(spark, src, tmp_path / "ck_auto", "auto_sessions", delay=delay)
    # in-order timeline 0,10,20,40,50,60 (30-min gap -> one session); the
    # suggested delay keeps every event within the final watermark except
    # those inside `delay` of the max (60 min): events past 60-delay wait
    final_min = 60 - secs // 60
    want = {
        eid: (BASE_US + m * MIN_US, 1)
        for eid, m in [(1, 0), (2, 10), (4, 20), (3, 40), (5, 50), (6, 60)]
        if m <= final_min
    }
    assert got == want


def test_in_order_source_suggests_zero_delay(spark, tmp_path):
    from monday_etl_spark.streaming.snapshot_stream import read_events_batch
    from monday_etl_spark.streaming.stateful_sessions import suggest_watermark_delay

    src = tmp_path / "src"
    src.mkdir()
    _write_events(
        str(src / "a.parquet"), [(1, 1, 0), (2, 1, 10), (3, 1, 20)], mtime=1_000_000
    )
    assert suggest_watermark_delay(read_events_batch(spark, str(src), glob="*.parquet")) == "0 seconds"
