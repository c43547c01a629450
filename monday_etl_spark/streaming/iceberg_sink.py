"""Exactly-once streaming appends into an Iceberg table.

The Iceberg twin of ``streaming/delta_sink``: Structured Streaming's
``foreachBatch`` is at-least-once, and the table-side answer here is the
snapshot summary — each commit stamps ``(app_id, batch_id)`` into its
snapshot's summary map and a replayed batch whose id the table already
absorbed is skipped (``iceberg_import.append_iceberg`` decides from the
table's own metadata, not sink-side state). This is the public pattern
Flink's Iceberg sink ships in production as
``flink.max-committed-checkpoint-id``; the same appId-ownership caveat
applies: a NEW query needs a NEW app_id, or its batch ids would be
mis-read as replays.

Scale: the drain is a pure per-batch append — no streaming state store;
the replay check reads the latest metadata.json once per batch; each
commit is one conditional-put publish. Every committed micro-batch is
immediately visible to any Iceberg reader (the reference's analogous
property: rows stream into BigQuery tables readable by every client,
monday_etl_automated.py:571-590).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..iceberg_import import append_iceberg, read_iceberg_table


def run_iceberg_append_stream(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    app_id: str,
    checkpoint_dir: str,
    glob: str = "*.parquet",
    transform=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """AvailableNow drain of ``source_dir`` appended into the Iceberg
    table at ``table_path``, one snapshot per micro-batch, exactly-once
    under replay via ``(app_id, batch_id)`` summary stamps. ``transform``
    (DataFrame -> DataFrame, optional) maps each batch onto the table
    schema. Returns the table's post-drain snapshot (lazy)."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    schema = spark.read.option(
        "pathGlobFilter", glob).parquet(source_dir).schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)

    def handle(batch: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch = transform(batch)
        append_iceberg(
            spark, batch, table_path,
            app_id=app_id, txn_version=batch_id,
        )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_iceberg_table(spark, table_path)
