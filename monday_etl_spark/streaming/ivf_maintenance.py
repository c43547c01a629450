"""Streaming maintenance of the materialized IVF index store.

``extensions/ivf_store.py`` gives the batch shape: one corpus-linear
assignment pass builds the cell-partitioned index, and appends reuse the
FROZEN quantizer so old and new rows stay comparable. At crawl scale the
embedding corpus is append-heavy and continuous — new vectors should reach
the index per micro-batch, not per rebuild. This module drains the
embedding ingest with Structured Streaming and maintains the store
incrementally:

- per micro-batch cost: one pure-map cell assignment over the BATCH plus an
  anti-join against the stored id column (membership check) — never a
  corpus re-assignment. Appends keep the cell partition layout, so query
  probes stay dynamic-partition-pruned to nprobe cells regardless of how
  many drains built the store.
- replay safety: foreachBatch is at-least-once; the anti-join on stored ids
  makes a replayed batch a no-op, so decisions are exactly-once in effect.
- split invariance is structural: a vector's cell depends only on the
  vector and the frozen centroids (exact int64 argmin), never on batch
  boundaries or arrival order — ANY drain schedule produces the same store
  as one batch ``build_ivf_index``, which is therefore the exact oracle
  (the same ``_sql_ivf`` unrolled-CTE oracle the lazy and store query paths
  already share).
- quantizer refresh stays a FULL-CORPUS decision (standard IVF practice):
  re-train + rebuild when drift accumulates; the running stream keeps the
  old quantizer until the operator swaps the store.

Scale: the assignment is whole-stage-codegen map work; the membership
anti-join reads one column of the store. State lives in the store table
itself — no streaming state store, so checkpoint size is file-progress
only.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..extensions.ivf_store import build_ivf_index, update_ivf_index


def run_ivf_maintenance(
    spark: SparkSession,
    source_dir: str,
    centroids: list[tuple[int, list[int]]],
    table: str,
    checkpoint_dir: str,
    glob: str = "embeddings.parquet",
    max_files_per_trigger: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """AvailableNow drain of ``source_dir``'s embedding files into the
    cell-partitioned index ``table`` (created by the first batch, appended
    by the rest). Returns the number of indexed vectors after the drain.
    Checkpointed: a re-drain with no new files changes nothing."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    on_disk = spark.read.option("pathGlobFilter", glob).parquet(source_dir)
    reader = spark.readStream.schema(on_disk.schema).option(
        "pathGlobFilter", glob
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)

    def handle(batch, _bid: int) -> None:
        if not spark.catalog.tableExists(table):
            build_ivf_index(batch, centroids, table=table,
                            vec_col=vec_col, id_col=id_col)
        else:
            update_ivf_index(batch, centroids, table=table,
                             vec_col=vec_col, id_col=id_col)
        # the microbatch execution context does not invalidate the cached
        # table file listing on append — without the refresh the NEXT
        # batch's membership anti-join (and any same-session reader) sees
        # the pre-append file set and could re-insert ids
        spark.catalog.refreshTable(table)

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
    if not spark.catalog.tableExists(table):
        return 0
    return spark.table(table).count()
