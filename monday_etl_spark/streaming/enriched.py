"""Stream-static enrichment: the events stream joined to a static dimension
before aggregating — the canonical "enrich the firehose with reference data"
pattern (Structured Streaming's stream-static join is STATELESS: the static
side is planned like any batch relation, broadcast here, and re-resolved per
micro-batch, so dimension updates between batches are picked up free).

The rollup then groups the enriched stream by (day, segment) under a
watermark. On an AvailableNow drain of a static directory the result equals
the batch join + aggregate — the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money_sum
from ..io import load_table
from .snapshot_stream import read_events_stream


def enriched_daily_rollup(events: DataFrame, customer: DataFrame) -> DataFrame:
    joined = events.withWatermark("ts", "1 day").join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        events.user_id == F.col("c_custkey"),
    )
    return (
        joined.groupBy(
            F.window("ts", "1 day").alias("day"),
            "c_mktsegment",
        )
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("day.start").cast("date").alias("event_date"),
            "c_mktsegment",
            "n_events",
            "total_value",
        )
    )


def run_enriched_rollup(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    out_path: str,
) -> DataFrame:
    """AvailableNow drain of the enriched rollup to a durable parquet sink;
    returns a LAZY read (executor-side end to end)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        rollup = enriched_daily_rollup(
            read_events_stream(spark, sf_dir),
            load_table(spark, sf_dir, "customer"),
        )
        q = (
            rollup.writeStream.foreachBatch(
                lambda batch_df, _bid: batch_df.write.mode("overwrite")
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
