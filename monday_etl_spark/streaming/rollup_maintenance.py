"""Streaming materialized-view maintenance: update-mode rollup → versioned
table MERGE.

``snapshot_stream.run_available_now`` answers "what is the rollup NOW" by
re-emitting the complete result each drain — fine for a report, wrong for
maintaining a long-lived serving table at 100 TB, where a day's drain
should cost the day's changes, not a full-history re-emit.

This module is the incremental flavor: the same watermarked, dedup-guarded
daily rollup runs in UPDATE output mode, so each micro-batch hands
``foreachBatch`` ONLY the (event_date, event_type) rows whose aggregates
changed, and those rows MERGE into a manifest-versioned table
(``tableformat.merge_versioned``, composite key). The pieces compose into
the lakehouse maintenance loop:

- cost per drain ∝ changed groups (update mode) and touched buckets
  (file-reuse MERGE) — both independent of table history;
- every drain commits a table VERSION: yesterday's serving state remains
  readable (time travel) while today's lands atomically;
- the checkpoint gives exactly-once across drains: a re-run with no new
  files emits nothing and commits nothing.

Late data past the watermark is dropped by the stream (the standard
contract); within the watermark, a group's re-emit simply overwrites its
row in the next MERGE — upsert semantics make the maintenance idempotent
per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money_sum
from ..tableformat import current_version, merge_versioned, write_versioned
from .snapshot_stream import read_events_stream

ROLLUP_KEY = ["event_date", "event_type"]


def _rollup_updates(events: DataFrame) -> DataFrame:
    """Watermarked daily rollup shaped for update-mode emission."""
    return (
        events.withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(F.window("ts", "1 day").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("day.start").cast("date").alias("event_date"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_rollup_maintenance(
    spark: SparkSession,
    sf_dir: str,
    table_path: str,
    checkpoint_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 16,
) -> DataFrame:
    """AvailableNow drain that MERGEs each micro-batch's changed rollup rows
    into the versioned table at ``table_path`` (created on first commit).
    Returns a lazy read of the table's current version."""
    from ..tableformat import read_version

    stream = read_events_stream(
        spark, sf_dir, max_files_per_trigger=max_files_per_trigger, glob=glob
    )

    def handle(batch: DataFrame, _bid: int) -> None:
        if current_version(table_path) is None:
            write_versioned(batch, table_path, key=ROLLUP_KEY,
                            n_buckets=n_buckets)
        else:
            merge_versioned(spark, table_path, batch)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            _rollup_updates(stream)
            .writeStream.foreachBatch(handle)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    if current_version(table_path) is None:
        # zero input: no batch fired, nothing committed
        return spark.createDataFrame(
            [], "event_date date, event_type string, n_events bigint, "
                "total_value double")
    return read_version(spark, table_path)
