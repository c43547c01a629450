"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.10 — the extension point for stateful
semantics Spark's built-in windows can't express).

Batch-split invariance (round-2 fix): the naive fold (assign sessions to
each micro-batch's rows as they arrive) silently renumbers sessions when an
out-of-order event lands in a later micro-batch — the result depended on how
the source happened to split batches. This version buffers events in state
and only *finalizes* (assigns session numbers and emits) the prefix of the
per-user timeline at or below the current event-time watermark; events newer
than the watermark wait in the buffer, and events arriving *behind* the
finalized frontier are dropped per the standard watermark late-data
contract. Per-user state:

    (frontier_us, session_no, last_ts_us, buf_ts[], buf_eid[])

- ``frontier_us``: everything at or below this event time has been emitted;
  a late event at or below it is counted out (dropped), never renumbered.
- finalization happens in event-time order regardless of arrival order, so
  any batch split that respects the watermark contract yields byte-identical
  session numbering.
- an event-time timeout (armed at the earliest buffered event) guarantees
  the buffer flushes on the terminal no-data micro-batch of an AvailableNow
  drain, when the watermark jumps to the source max event time.

With ``delay="0 seconds"`` (the default) a single-batch drain emits every
event and equals the batch window sessionizer
(``operators/temporal_ops.sessionize``) exactly — that twin is the SQL
oracle. With a positive delay the operator tolerates cross-batch disorder up
to the delay; events within ``delay`` of the source maximum remain buffered
at drain end (the streaming contract — they are not yet final).

Scale: state per user is two scalars plus the not-yet-final event buffer,
which the watermark bounds to the disorder horizon — not the user's history.
Keys partition across the cluster; micro-batches ship Arrow frames per key
group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("session_no", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("frontier_us", T.LongType()),
        T.StructField("session_no", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
    ]
)


def make_session_fn(gap_seconds: int = 1800):
    gap_us = gap_seconds * 1_000_000

    def assign_sessions(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            frontier, session_no, last_ts, buf_ts, buf_eid = state.get
            buf_ts = list(buf_ts) if buf_ts is not None else []
            buf_eid = list(buf_eid) if buf_eid is not None else []
        else:
            frontier, session_no, last_ts = -1, 0, None
            buf_ts, buf_eid = [], []

        if not state.hasTimedOut:
            for pdf in pdfs:
                for ts, eid in zip(pdf["ts_us"], pdf["event_id"]):
                    ts = int(ts)
                    if ts <= frontier:
                        continue  # late beyond watermark: drop, never renumber
                    buf_ts.append(ts)
                    buf_eid.append(int(eid))

        # watermark is ms-truncated; cover the sub-ms tail of the same slot
        wm_ms = state.getCurrentWatermarkMs()
        cutoff = (wm_ms + 1) * 1000 - 1 if wm_ms > 0 else -1

        out_eid: list[int] = []
        out_ts: list[int] = []
        out_sess: list[int] = []
        if buf_ts and cutoff >= 0:
            order = sorted(range(len(buf_ts)), key=lambda i: (buf_ts[i], buf_eid[i]))
            remain_ts: list[int] = []
            remain_eid: list[int] = []
            for i in order:
                ts, eid = buf_ts[i], buf_eid[i]
                if ts <= cutoff:
                    if last_ts is None or ts - last_ts > gap_us:
                        session_no += 1
                    out_eid.append(eid)
                    out_ts.append(ts)
                    out_sess.append(session_no)
                    last_ts = ts
                else:
                    remain_ts.append(ts)
                    remain_eid.append(eid)
            buf_ts, buf_eid = remain_ts, remain_eid
            frontier = max(frontier, cutoff)

        state.update((frontier, session_no, last_ts, buf_ts, buf_eid))
        if buf_ts:
            # arm a flush for when the watermark passes the oldest buffered
            # event; ms-aligned data keeps min_ms-1 strictly above the
            # current watermark (remaining events are all beyond `cutoff`)
            min_ms = min(buf_ts) // 1000
            state.setTimeoutTimestamp(max(min_ms - 1, wm_ms + 1))

        if out_eid:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": out_eid,
                    "ts_us": out_ts,
                    "session_no": out_sess,
                }
            )

    return assign_sessions


def stateful_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """events must carry (user_id, event_id, ts_us) plus the watermarked
    timestamp column. Returns finalized rows with per-user session numbers,
    maintained in streaming state; emission is watermark-gated so the
    numbering is invariant to micro-batch splits."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def suggest_watermark_delay(events: DataFrame, ts_col: str = "ts",
                            quantile: float = 0.99,
                            max_sample: int = 1_000_000) -> str:
    """Pick the watermark delay from the data's observed disorder instead of
    a manual knob (TODO r02 #4): the delay that would finalize ``quantile``
    of events is the p-quantile of *arrival lag* — how far each event's
    event-time trails the running maximum seen so far in arrival order.

    Arrival order for a file-ingest source is (file modification time, row
    position) — the same order the streaming file source replays files in —
    taken from the hidden ``_metadata`` column when the frame is file-backed
    (falls back to read order otherwise).

    Calibration pass, not a hot-path operator: it samples the first
    ``max_sample`` rows (same bounded-sample split as the IVF trainer — the
    sample cost is O(max_sample) on the driver-adjacent path, never
    corpus-sized), computes the running max with one ordered window, and
    takes percentile_approx. Returns a Spark interval string (whole seconds,
    rounded up) for ``withWatermark``; ``"0 seconds"`` for in-order data."""
    import math

    from pyspark.sql import Window
    from pyspark.sql.utils import AnalysisException

    try:
        e = events.select(
            F.unix_micros(ts_col).alias("ts_us"),
            F.col("_metadata.file_modification_time").alias("fm"),
        )
    except AnalysisException:  # not file-backed: fall back to read order
        e = events.select(F.unix_micros(ts_col).alias("ts_us"), F.lit(0).alias("fm"))
    e = e.limit(max_sample).withColumn("arr", F.monotonically_increasing_id())
    w = Window.orderBy("fm", "arr").rowsBetween(Window.unboundedPreceding, 0)
    lag = e.withColumn("lag_us", F.max("ts_us").over(w) - F.col("ts_us"))
    p = lag.agg(
        F.expr(f"percentile_approx(lag_us, {quantile}, 10000)").alias("p")
    ).first()["p"]
    return f"{math.ceil((p or 0) / 1_000_000)} seconds"


def run_stateful_sessions(spark, sf_dir: str, checkpoint_dir: str,
                          name: str, gap_seconds: int = 1800,
                          delay: str = "0 seconds",
                          max_files_per_trigger: int | None = None,
                          out_path: str | None = None) -> DataFrame:
    """AvailableNow drive of the stateful sessionizer over the events table.

    With the default ``delay="0 seconds"`` the drained result equals the
    batch sessionizer on every event. ``max_files_per_trigger`` exists for
    the adversarial multi-batch test (tests/test_streaming_sessions.py).

    ``delay="auto"`` calibrates the watermark from the data itself via
    ``suggest_watermark_delay`` over a batch read of the same files.

    With ``out_path`` the append-mode output lands in a durable parquet
    streaming sink and the return value is a LAZY read of those files —
    nothing passes through the driver, and a restart against the same
    checkpoint recovers exactly-once (a second drain with no new input
    emits zero rows, verified). Without it the memory sink is used (test
    convenience; driver-materialized by nature, and it does NOT support
    checkpoint restart — Spark raises AnalysisException by design)."""
    from .snapshot_stream import read_events_batch, read_events_stream

    if delay == "auto":
        delay = suggest_watermark_delay(read_events_batch(spark, sf_dir))

    ev = read_events_stream(
        spark, sf_dir, max_files_per_trigger=max_files_per_trigger
    ).withWatermark("ts", delay).select(
        "ts", "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    # see run_available_now: state stores per shuffle partition; 8 is plenty
    # for the user-key cardinality here, conf restored after the drain
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        sessions = stateful_sessionize(ev, gap_seconds)
        if out_path is not None:
            writer = (
                sessions.writeStream.format("parquet")
                .option("path", out_path)
            )
        else:
            writer = sessions.writeStream.format("memory").queryName(name)
        q = (
            writer.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(out_path) if out_path is not None \
        else spark.table(name)
