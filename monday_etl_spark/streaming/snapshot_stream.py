"""Structured Streaming flavor of the snapshot pipeline (SURVEY.md §2.10).

The reference's temporal model — one batch per day appended to a historical
table — is the batch analogue of a daily tumbling window. This module gives
the streaming equivalent over the ``events`` table:

- ``Trigger.AvailableNow``: drain everything currently in the source, then
  stop — the streaming version of a scheduled daily batch, with checkpointed
  exactly-once progress across runs;
- watermark + ``dropDuplicatesWithinWatermark`` replaces the reference's
  detect-but-not-prevent duplicate handling (O-25) with prevention;
- windowed aggregation = the daily snapshot rollup.

Scale: state is bounded by the watermark horizon (1 day of event ids for
dedup, open windows for the agg); partitioned by window start when written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import money_sum
from ..io import normalize_event_ts


def _events_on_disk_schema(spark: SparkSession, sf_dir: str,
                           glob: str) -> T.StructType:
    """Peek the physical schema with a metadata-only batch read so the stream
    (which requires an explicit schema) decodes the vintage actually on disk
    instead of assuming one. Footer-only: no data pages are read."""
    return spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    glob: str = "events.parquet",
) -> DataFrame:
    """File-source stream over the events parquet (new files in the directory
    would be picked up incrementally — the ingest-directory pattern).
    ``max_files_per_trigger`` splits the drain into adversarial micro-batches
    for batch-invariance tests; production leaves it unset (single batch per
    AvailableNow drain of a static directory)."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    schema = _events_on_disk_schema(spark, sf_dir, glob)
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return normalize_event_ts(reader.parquet(sf_dir))


def read_events_batch(spark: SparkSession, sf_dir: str,
                      glob: str = "events.parquet") -> DataFrame:
    """Batch twin of ``read_events_stream`` (same files, same ts decode) —
    used for watermark calibration (``suggest_watermark_delay``)."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    raw = spark.read.option("pathGlobFilter", glob).parquet(sf_dir)
    return normalize_event_ts(raw)


def daily_rollup(events: DataFrame) -> DataFrame:
    """Watermarked, dedup-protected daily tumbling rollup per event_type —
    the streaming twin of the daily snapshot aggregate (O-21)."""
    return (
        events.withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(
            F.window("ts", "1 day").alias("day"),
            "event_type",
        )
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


def run_available_now(spark: SparkSession, sf_dir: str, checkpoint_dir: str,
                      out_table: str = "daily_rollup_stream",
                      out_path: str | None = None) -> DataFrame:
    """Drain the source with Trigger.AvailableNow and return the result.
    Complete mode: windows re-emit on update, exactly like re-running the
    reference's daily report.

    With ``out_path`` the drain lands executor-side: complete-mode output
    can't go to a parquet streaming sink directly, so ``foreachBatch``
    overwrites ``out_path`` with each (re-)emitted full result — the last
    batch's overwrite is the final rollup — and the return value is a LAZY
    read of those files. Nothing passes through the driver, so the result
    can be 100x larger without driver memory risk. Without ``out_path`` the
    memory sink is used (test convenience; driver-materialized by nature).

    State-store partition count is pinned low for the drain: each stateful
    operator initializes one RocksDB/HDFS store per shuffle partition, and
    at this cardinality (days × event types) 32 stores are pure overhead.
    The conf is restored afterwards; a high-volume deployment would size it
    to the key cardinality instead."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        rollup = daily_rollup(read_events_stream(spark, sf_dir))
        if out_path is not None:
            writer = rollup.writeStream.foreachBatch(
                lambda batch_df, _bid:
                    batch_df.write.mode("overwrite").parquet(out_path)
            )
        else:
            writer = rollup.writeStream.format("memory").queryName(out_table)
        q = (
            writer.outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(out_path) if out_path is not None \
        else spark.table(out_table)
