"""Streaming flavor of the snapshot dual-write (TODO #7; SURVEY §2.10).

``foreachBatch`` is the bridge between Structured Streaming and the batch
write layer: each micro-batch is a normal DataFrame handed to the same
idempotent ``dual_write`` the daily pipeline uses — snapshot overwrite +
historical partition overwrite. Batch id + checkpoint give exactly-once
sink semantics even though the writes themselves are plain parquet: a
replayed batch overwrites the same partitions with the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..temporal import dual_write
from .snapshot_stream import read_events_stream


def stream_dual_write(spark: SparkSession, sf_dir: str, base_path: str,
                      checkpoint_dir: str, table: str = "events_rollup") -> None:
    """Drain the events source, rolling each micro-batch up to per-day
    per-type rows stamped with extraction_date, dual-written like the
    daily ETL tables."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rolled = (
            batch_df.groupBy(
                F.col("ts").cast("date").alias("extraction_date"),
                "event_type",
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                .alias("total_value"),
            )
        )
        dual_write(rolled, base_path, table)

    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
