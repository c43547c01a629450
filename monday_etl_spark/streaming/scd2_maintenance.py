"""Streaming SCD2 maintenance: keep a Type-2 dimension-history table
current as events arrive, instead of rebuilding it per run.

``queries/governance.scd2_history`` is the batch build (full scan each
time). This module is the incremental flavor: each micro-batch
``foreachBatch`` handler

1. reads ONLY the affected users' OPEN rows (``is_current``) from the
   versioned table — the open row is the sufficient state: its status
   decides whether the batch's first event is a change, its version_n
   anchors the numbering;
2. unions the open rows (as position-zero markers) with the batch's
   events, collapses consecutive equal statuses per user (LAG), and
   re-derives intervals (LEAD) — the same window shapes as the batch
   build, but over (open rows + batch), never over history;
3. MERGEs the changed rows — the possibly-closed previous open row plus
   any new versions — into the versioned table on (user_id, version_n).

Cost per drain tracks the batch's users, not table history (pruned read +
file-reuse MERGE). A re-drain with no new files emits nothing and commits
nothing (stream checkpoint). Ordering contract: events must arrive with
ts >= the open row's valid_from per user (enforce upstream with a
watermark; the time-ordered ingest split in the registered query
guarantees it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tableformat import current_version, merge_versioned, write_versioned
from .snapshot_stream import read_events_stream

SCD2_KEY = ["user_id", "version_n"]

_SCHEMA = ("user_id bigint, status string, version_n int, "
           "valid_from_us bigint, valid_to_us bigint, is_current boolean")


def _scd2_upserts(batch: DataFrame, open_rows: DataFrame) -> DataFrame:
    """Rows to MERGE for this batch: each affected user's re-derived tail
    (their open row, possibly closed now, plus new versions)."""
    evs = batch.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id").cast("long").alias("event_id"),
        F.lit(None).cast("int").alias("base_version"),
        F.lit(False).alias("is_marker"),
    )
    markers = open_rows.select(
        "user_id",
        "status",
        F.col("valid_from_us").alias("ts_us"),
        F.lit(-1).cast("long").alias("event_id"),  # sorts before any event at the same us
        F.col("version_n").alias("base_version"),
        F.lit(True).alias("is_marker"),
    )
    both = markers.unionByName(evs)

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        both.withColumn("prev_status", F.lag("status").over(w))
        .withColumn(
            "is_change",
            F.col("is_marker")
            | F.col("prev_status").isNull()
            | (F.col("status") != F.col("prev_status")),
        )
        .filter(F.col("is_change"))
    )
    # version numbering: the marker carries the open row's version_n; new
    # change points count up from it (or from 1 for first-seen users)
    anchor = F.max("base_version").over(
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = changes.withColumn(
        "version_n",
        F.coalesce(anchor, F.lit(0))
        + F.sum((~F.col("is_marker")).cast("int")).over(
            Window.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return numbered.select(
        "user_id",
        "status",
        F.col("version_n").cast("int").alias("version_n"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w2).alias("valid_to_us"),
        F.lead("ts_us").over(w2).isNull().alias("is_current"),
    )


def apply_scd2_batch(spark: SparkSession, table_path: str,
                     batch: DataFrame, n_buckets: int = 8,
                     txn: tuple | None = None) -> None:
    """One micro-batch's SCD2 maintenance step against ``table_path`` —
    the foreachBatch body, factored out so a multiplexed drain
    (``multi_maintenance``) can apply it to a batch it shares with other
    views.

    ``txn = (app_id, batch_id)`` makes replays no-ops: foreachBatch is
    at-least-once, and re-applying a batch whose events already closed a
    user's row would append spurious SCD2 versions. The stamp commits
    atomically with the MERGE (same manifest)."""
    from ..tableformat import last_versioned_txn, read_version

    if txn is not None:
        last = last_versioned_txn(table_path, txn[0])
        if last is not None and last >= int(txn[1]):
            return  # replayed micro-batch: already applied
    if not batch.take(1):
        return
    if current_version(table_path) is None:
        ups = _scd2_upserts(
            batch, spark.createDataFrame([], _SCHEMA).select(
                "user_id", "status", "valid_from_us", "version_n")
        )
        write_versioned(ups, table_path, key=SCD2_KEY,
                        n_buckets=n_buckets, txn=txn)
    else:
        users = batch.select("user_id").distinct()
        open_rows = (
            read_version(spark, table_path)
            .filter(F.col("is_current"))
            .join(F.broadcast(users), "user_id", "left_semi")
            .select("user_id", "status", "valid_from_us", "version_n")
        )
        merge_versioned(spark, table_path, _scd2_upserts(batch, open_rows),
                        txn=txn)


def run_scd2_maintenance(
    spark: SparkSession,
    sf_dir: str,
    table_path: str,
    checkpoint_dir: str,
    glob: str = "events.parquet",
    n_buckets: int = 8,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """AvailableNow drain MERGEing each batch's SCD2 tail updates into the
    versioned table; returns a lazy read of the current version."""
    from ..tableformat import read_version

    stream = read_events_stream(
        spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
    )

    def handle(batch: DataFrame, _bid: int) -> None:
        apply_scd2_batch(spark, table_path, batch, n_buckets=n_buckets)

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
    if current_version(table_path) is None:
        return spark.createDataFrame([], _SCHEMA)
    return read_version(spark, table_path).select(
        "user_id", "status", "version_n", "valid_from_us", "valid_to_us",
        "is_current",
    )
