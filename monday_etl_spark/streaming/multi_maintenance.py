"""One-source multi-view streaming maintenance: a SINGLE AvailableNow
drain of an ingest directory keeps N materialized views current.

``rollup_maintenance`` and ``scd2_maintenance`` each run their own
stream over the same ingest — correct, but at scale that re-reads the
source N times and pays the streaming fixed cost (micro-batch planning,
checkpoint I/O, runner spawn) N times per drain cycle. This module is
the production shape: ONE file-source stream, ONE checkpoint, and a
``foreachBatch`` that fans the SAME cached micro-batch into each view's
incremental apply step. Adding a view costs its apply step only.

The rollup view here is maintained ADDITIVELY (classic incremental view
maintenance): each batch's partial aggregate — exact ``DECIMAL(18,2)``
sums, so cross-batch addition is associative and loses nothing —
combines with the table's existing rows for the touched groups and
MERGEs back. Cost per drain ∝ the batch's groups and touched buckets,
never table history; the drained table equals the batch rollup over all
events ingested so far. (The standalone update-mode flavor additionally
drops duplicate event_ids ACROSS batches via stream state; this flavor
dedups within each batch and relies on the file source's exactly-once
file delivery — the right trade when the ingest is append-only files.)

The SCD2 view reuses ``scd2_maintenance.apply_scd2_batch`` unchanged —
same sufficient-state contract (affected users' open rows), same MERGE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tableformat import current_version, merge_versioned, write_versioned
from .snapshot_stream import read_events_stream

ROLLUP_KEY = ["event_date", "event_type"]


def apply_rollup_batch(spark: SparkSession, table_path: str,
                       batch: DataFrame, n_buckets: int = 4,
                       txn: tuple | None = None) -> None:
    """Additive incremental maintenance of the daily rollup: the batch's
    exact-decimal partial aggregate folds into the existing rows of the
    touched groups. ``sum_dec`` stays DECIMAL in the table so cross-batch
    addition is exact; readers cast to the money-rounded double at the
    edge (``read_rollup``).

    ``txn = (app_id, batch_id)`` makes the ADDITIVE fold replay-safe:
    foreachBatch is at-least-once, and re-folding an already-applied
    batch would double-count n_events/sum_dec. The stamp commits
    ATOMICALLY with the fold (same manifest), and an already-applied
    batch id no-ops — the Delta ``txn`` action pattern."""
    from ..tableformat import last_versioned_txn, read_version

    if txn is not None:
        last = last_versioned_txn(table_path, txn[0])
        if last is not None and last >= int(txn[1]):
            return  # replayed micro-batch: already folded in
    if not batch.take(1):
        return
    delta = (
        batch.dropDuplicates(["event_id"])
        .groupBy(F.col("ts").cast("date").alias("event_date"),
                 "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(28,2)").alias("sum_dec"),
        )
    )
    if current_version(table_path) is None:
        write_versioned(delta, table_path, key=ROLLUP_KEY,
                        n_buckets=n_buckets, txn=txn)
        return
    existing = (
        read_version(spark, table_path)
        .join(F.broadcast(delta.select(*ROLLUP_KEY).distinct()),
              ROLLUP_KEY, "left_semi")
        .select(*ROLLUP_KEY,
                F.col("n_events").alias("__old_n"),
                F.col("sum_dec").alias("__old_sum"))
    )
    combined = (
        delta.join(existing, ROLLUP_KEY, "left")
        .select(
            *ROLLUP_KEY,
            (F.col("n_events")
             + F.coalesce(F.col("__old_n"), F.lit(0))).alias("n_events"),
            (F.col("sum_dec")
             + F.coalesce(F.col("__old_sum"),
                          F.lit(0).cast("decimal(28,2)")))
            .cast("decimal(28,2)").alias("sum_dec"),
        )
    )
    merge_versioned(spark, table_path, combined, txn=txn)


def read_rollup(spark: SparkSession, table_path: str) -> DataFrame:
    """The maintained rollup in its serving shape: exact decimal totals
    cast to the money-rounded double at the read edge — identical values
    to the batch ``money_sum`` over all ingested events."""
    from ..tableformat import read_version

    if current_version(table_path) is None:
        return spark.createDataFrame(
            [], "event_date date, event_type string, n_events bigint, "
                "total_value double")
    return read_version(spark, table_path).select(
        "event_date", "event_type", "n_events",
        F.round(F.col("sum_dec").cast("double"), 2).alias("total_value"),
    )


def run_multi_maintenance(
    spark: SparkSession,
    ingest_dir: str,
    views: list,
    checkpoint_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> None:
    """ONE AvailableNow drain maintaining every view in ``views`` —
    ``[(table_path, apply_fn), ...]`` where ``apply_fn(spark,
    table_path, batch)`` is that view's incremental step. The micro-batch
    is cached once and fanned out, so the source is read once per drain
    regardless of view count.

    Replay-safe: foreachBatch is at-least-once (a crash — or a LATER
    view's apply_fn throwing — after one view committed but before the
    checkpoint records the batch re-delivers the same micro-batch on
    restart). Apply fns that accept a ``txn`` keyword get ``(app_id,
    batch_id)`` — app_id derived from this drain's checkpoint + the
    view's table, stable across restarts — and no-op on already-applied
    batch ids via the stamp their own commit carries
    (``tableformat.last_versioned_txn``)."""
    import inspect

    stream = read_events_stream(
        spark, ingest_dir, glob=glob,
        max_files_per_trigger=max_files_per_trigger,
    )
    ckpt = os.path.abspath(checkpoint_dir)
    takes_txn = {
        id(fn): "txn" in inspect.signature(fn).parameters
        for _p, fn in views
    }

    def handle(batch: DataFrame, bid: int) -> None:
        if not batch.take(1):
            return
        batch.persist()
        try:
            for table_path, apply_fn in views:
                if takes_txn[id(apply_fn)]:
                    app = f"multi:{ckpt}:{os.path.abspath(table_path)}"
                    apply_fn(spark, table_path, batch, txn=(app, bid))
                else:
                    apply_fn(spark, table_path, batch)
        finally:
            batch.unpersist()

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
