"""Stream-stream watermarked interval join: purchase→view attribution.

The one Structured Streaming join flavor the engine didn't exercise until
r06 (stream-STATIC enrichment lives in ``enriched.py``): both sides are
unbounded streams, so neither can be materialized — each purchase must meet
the views that arrived (possibly in earlier micro-batches) within its
attribution window, from JOIN STATE, not from a table.

Shape: ``purchase`` events join ``view`` events by the same user with the
view inside [purchase_ts - window, purchase_ts] — the attribution query
every event pipeline runs (SURVEY §2.3 names interval joins as the
free-from-Spark extension; the reference itself is batch-only,
advanced_monitoring.py:63-65 pulls pre-joined snapshots).

State bound (the part that matters at 100 TB/day): BOTH sides carry an
event-time watermark and the join condition bounds view_ts from below by
purchase_ts - window, so Spark derives a state watermark for each side —
buffered views are evicted once the purchase-side watermark passes
``view_ts + window + delay``, buffered purchases once the view side passes
them. State is therefore O(events in the last window + delay horizon) per
side, independent of stream history. An UNBOUNDED stream-stream join (no
watermark, or an unbounded condition) would buffer both streams forever;
this module never builds that plan.

Micro-batch invariance: a time-ordered ingest split cannot lose pairs —
after batch N the view-side state keeps every view with
``view_ts >= watermark - window - delay``, and any batch-N+1 purchase
(ts >= the batch-N max by the time-ordered contract) only needs views
``>= purchase_ts - window``, which that retention bound covers
(tests/test_interval_join.py pins the 2-batch cross-boundary case).

On a drained AvailableNow source the appended sink equals the batch range
join — the SQL oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshot_stream import read_events_stream

_OUT_SCHEMA = ("purchase_id bigint, view_id bigint, user_id bigint, "
               "purchase_ts_us bigint, view_ts_us bigint")


def attributed_purchases(
    events: DataFrame,
    window: str = "1 hour",
    delay: str = "1 hour",
) -> DataFrame:
    """Purchases joined to every prior view by the same user within
    ``window`` (closed interval on both ends). ``events`` is a STREAMING
    frame; the two sides are filters of it (a self-join — Spark scans the
    source once per side), each watermarked with ``delay`` of tolerated
    disorder. Returns the appendable joined stream."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", delay)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", delay)
    )
    return purchases.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts")
           >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}")),
        "inner",
    ).select(
        "purchase_id",
        "view_id",
        "user_id",
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        F.unix_micros("view_ts").alias("view_ts_us"),
    )


def run_view_purchase_attribution(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    out_path: str,
    window: str = "1 hour",
    delay: str = "1 hour",
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """AvailableNow drain of the interval join into a durable append-mode
    parquet sink (exactly-once via the checkpoint; a re-drain with no new
    files appends nothing). Returns a LAZY read of the sink — the joined
    stream never transits the driver."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # one join-state store per shuffle partition; 8 is plenty for the
    # local drain (same pin as every other streaming runner here)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        events = read_events_stream(
            spark, sf_dir, max_files_per_trigger=max_files_per_trigger,
            glob=glob,
        )
        q = (
            attributed_purchases(events, window=window, delay=delay)
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    if not os.path.isdir(out_path):
        # zero input: no batch fired, nothing committed
        return spark.createDataFrame([], _OUT_SCHEMA)
    return spark.read.parquet(out_path).select(
        "purchase_id", "view_id", "user_id", "purchase_ts_us", "view_ts_us"
    )
