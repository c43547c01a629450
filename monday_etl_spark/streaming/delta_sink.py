"""Exactly-once streaming appends into a Delta table (txn identifiers).

Structured Streaming's ``foreachBatch`` is at-least-once: after a driver
failure (or a deleted checkpoint) the sink sees a batch again. The Delta
protocol's answer is *Transaction Identifiers* (PROTOCOL.md §Transaction
Identifiers): each commit records ``(appId, version)`` and an idempotent
writer skips any batch whose version the table has already absorbed.
delta-spark exposes this as the ``txnAppId``/``txnVersion`` writer
options; this module is the same contract over our library-free bridge —
``delta_import.append_delta(app_id=..., txn_version=batch_id)`` does the
replay-side check, so the sink body is one call.

Guarantees and their boundary, stated honestly:

- a batch REPLAYED with the same id (checkpoint recovery, or a full
  checkpoint reset over an unchanged source) commits exactly once — the
  skip is decided from the table's own log, not from sink-side state, so
  it survives anything that loses the producer's memory;
- the appId owns a monotone batch sequence. Re-pointing an existing appId
  at a NEW source while keeping old batch ids would mis-classify the new
  batches as replays (exactly the documented delta-spark rule: new
  query ⇒ new appId).

Scale: the drain itself is a pure per-batch append — no streaming state
store, no shuffle beyond what the batch transform needs; the log-replay
check reads the JSON tail (checkpoint-compacted at scale) once per batch.

Reference scope: the reference streams rows into BigQuery tables that are
immediately readable by any client (monday_etl_automated.py:571-590);
this gives the streaming ingest path the same open-ecosystem property —
every committed micro-batch is instantly visible to any Delta reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..delta_import import append_delta, read_delta, write_checkpoint


def run_delta_append_stream(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    app_id: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
    transform=None,
    max_files_per_trigger: int | None = None,
    retries: int = 3,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """AvailableNow drain of ``source_dir`` appended into the Delta table
    at ``table_path``, one commit per micro-batch, exactly-once under
    replay via ``(app_id, batch_id)`` txn identifiers. ``transform``
    (DataFrame -> DataFrame, optional) maps each batch onto the table
    schema. ``checkpoint_every=N`` compacts the log into a parquet
    checkpoint whenever the committed version divides N — the Delta
    writers' ~10-commit cadence that keeps replay O(tail) under a
    forever-appending stream. Returns the table's post-drain snapshot
    (lazy)."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    schema = spark.read.option("pathGlobFilter", glob).parquet(source_dir).schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)

    def handle(batch: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch = transform(batch)
        v = append_delta(
            spark, batch, table_path,
            app_id=app_id, txn_version=batch_id, retries=retries,
        )
        if checkpoint_every and v % checkpoint_every == 0:
            write_checkpoint(spark, table_path)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_delta(spark, table_path)
