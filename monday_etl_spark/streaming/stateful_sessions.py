"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.10 — the extension point for stateful
semantics Spark's built-in windows can't express).

Per user, state carries (last event time, current session number) across
micro-batches; a new session starts when the gap since the user's previous
event exceeds the threshold. The batch twin is
``operators/temporal_ops.sessionize`` — on a single drained batch the two
agree exactly (tested), which is the correctness contract for the stateful
implementation.

Scale: state is one tiny tuple per user key, partitioned by user across the
cluster; each micro-batch ships Arrow frames per key group. Watermarking
would bound state for inactive users in production.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
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
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_no", T.LongType()),
    ]
)


def make_session_fn(gap_seconds: int = 1800):
    gap_us = gap_seconds * 1_000_000

    def assign_sessions(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_ts, session_no = state.get if state.exists else (None, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        # micro-batch rows arrive unordered; session logic needs time order
        rows = rows.sort_values(["ts_us", "event_id"], kind="mergesort")
        out_sessions = []
        for ts in rows["ts_us"]:
            if last_ts is None or ts - last_ts > gap_us:
                session_no += 1
            out_sessions.append(session_no)
            last_ts = int(ts)
        state.update((last_ts, session_no))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": rows["event_id"].values,
                "ts_us": rows["ts_us"].values,
                "session_no": out_sessions,
            }
        )

    return assign_sessions


def stateful_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """events must carry (user_id, event_id, ts_us). Returns the same rows
    with per-user session numbers, maintained in streaming state."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_sessions(spark, sf_dir: str, checkpoint_dir: str,
                          name: str, gap_seconds: int = 1800) -> DataFrame:
    """AvailableNow drive of the stateful sessionizer over the events table.

    Note: the memory sink used here (test/driver harness convenience) does
    NOT support restarting from an existing checkpoint — Spark raises
    AnalysisException by design. The durable path (format('parquet') with
    the same checkpoint) recovers exactly-once: a second drain with no new
    input emits zero rows (verified)."""
    from pyspark.sql import functions as F

    from .snapshot_stream import read_events_stream

    ev = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    # see run_available_now: state stores per shuffle partition; 8 is plenty
    # for the user-key cardinality here, conf restored after the drain
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stateful_sessionize(ev, gap_seconds)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
