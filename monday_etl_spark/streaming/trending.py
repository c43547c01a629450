"""Streaming trending-now: top-K event types per tumbling window.

The dashboard shape every event platform runs: "what's hot right now",
maintained continuously. Structured Streaming can't rank inside a streaming
aggregation (no windows-over-aggregates in update/complete mode), so the
canonical pattern is: watermarked windowed counts as the streaming agg,
then the per-window rank applied to each complete-mode emission inside
``foreachBatch`` — the rank is a batch computation over the (windows x
event_types)-sized aggregate, not over raw events, so it is tiny at any
ingest scale.

Scale: streaming state = open windows x event types (bounded by the
watermark horizon); the foreachBatch rank shuffles only the aggregate.
The AvailableNow drain of a static directory makes the final emission equal
the batch tumbling-window top-K — the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .snapshot_stream import read_events_stream


def windowed_counts(events: DataFrame, window: str = "6 hours") -> DataFrame:
    return (
        events.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )


def _rank_topk(batch: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("w").orderBy(F.desc("n_events"), F.asc("event_type"))
    return (
        batch.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "rnk",
        )
    )


def run_trending_topk(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    out_path: str,
    k: int = 3,
    window: str = "6 hours",
) -> DataFrame:
    """AvailableNow drain -> complete-mode windowed counts -> top-K per
    window ranked inside foreachBatch -> durable parquet overwrite; returns
    a LAZY read of the sink (executor-side end to end, driver never holds
    the result)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # one state store per shuffle partition; cardinality here is (windows x
    # event types), so 32 stores are pure overhead — same pin as the rollup
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        counts = windowed_counts(read_events_stream(spark, sf_dir), window)
        q = (
            counts.writeStream.foreachBatch(
                lambda batch_df, _bid: _rank_topk(batch_df, k)
                .write.mode("overwrite")
                .parquet(out_path)
            )
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(out_path)
