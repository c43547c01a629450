"""Hybrid backfill: initial snapshot through the JVM batch reader,
incremental tail through the Python DataSource stream.

The streaming sources (``iceberg_source`` / ``delta_source``) move
every row across the Python/Arrow boundary — measured at ~6× the JVM
batch read's wall for the same rows (SCALE.md, streaming-MoR rehearsal).
That tax is inherent to a Python-planned source, and it is the WRONG
price for a backfill: the initial state of a table is a plain snapshot
the JVM parquet scan serves at full speed. These helpers split the work
at a pinned boundary:

- the BOUNDARY is the table's current snapshot/version, captured once;
- the SNAPSHOT half is a normal batch DataFrame (whole-stage codegen,
  predicate pushdown, no Python in the scan) pinned AT the boundary —
  a commit racing the call cannot smear across the halves;
- the STREAM half starts EXCLUSIVE of the boundary (Iceberg:
  ``after_snapshot_id``; Delta: ``starting_version = boundary + 1``),
  so the union of the two halves is exactly-once: every row is served
  by precisely one side.

In changelog/CDF mode the snapshot half is stamped with the stream's
meta columns (``_change_type = 'insert'`` at the boundary commit) so
the two halves union by name — the Debezium-style "initial snapshot
reads as inserts" convention.

Reference parity: the public reference re-extracts the FULL board
every run through the same API surface that serves its increments and
appends it to the ``*_historical`` tables
(monday_etl_automated.py:196 extract + :583-589 historical append);
this engine splits that replay onto the scan path instead — bulk state
via the batch reader, only genuine increments via the stream — the
Spark-first shape of the same snapshot-plus-history contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def backfill_iceberg(
    spark: SparkSession,
    path: str,
    skip_rewrites: bool = False,
    max_files_per_batch: int | None = None,
    changelog: bool = False,
) -> tuple[DataFrame, DataFrame, int]:
    """``(snapshot_df, tail_stream_df, boundary_snapshot_id)`` for an
    Iceberg table: the snapshot half is ``read_iceberg_table`` PINNED
    at the current snapshot, the stream half is ``stream_iceberg``
    starting after it. With ``changelog=True`` the snapshot half
    carries ``_change_type``/``_commit_snapshot_id``/
    ``_commit_timestamp`` (inserts at the boundary commit) matching the
    changelog stream's schema, so ``snapshot_df.unionByName(...)``
    against a drained tail is the full change history from the
    boundary's point of view."""
    from ..iceberg_import import read_iceberg_table, read_metadata
    from ..iceberg_source import _seq_snapshots, stream_iceberg

    meta = read_metadata(path)
    snaps = _seq_snapshots(meta)
    if not snaps:
        raise ValueError(f"{path}: table has no snapshots")
    boundary = snaps[-1]
    sid = boundary["snapshot-id"]
    batch = read_iceberg_table(spark, path, snapshot_id=sid)
    if changelog:
        batch = (
            batch.withColumn("_change_type", F.lit("insert"))
            # one synthetic emitting commit: the boundary snapshot's
            # full state, numbered 0 like the only commit of a batch
            .withColumn("_change_ordinal", F.lit(0).cast("int"))
            .withColumn("_commit_snapshot_id",
                        F.lit(sid).cast("long"))
            .withColumn("_commit_timestamp", F.timestamp_millis(
                F.lit(int(boundary.get("timestamp-ms", 0)))))
        )
    tail = stream_iceberg(
        spark, path, after_snapshot_id=sid,
        skip_rewrites=skip_rewrites,
        max_files_per_batch=max_files_per_batch,
        changelog=changelog,
    )
    return batch, tail, sid


def backfill_delta(
    spark: SparkSession,
    path: str,
    ignore_deletes: bool = False,
    max_files_per_batch: int | None = None,
    read_change_feed: bool = False,
) -> tuple[DataFrame, DataFrame, int]:
    """``(snapshot_df, tail_stream_df, boundary_version)`` for a Delta
    table: the snapshot half is ``read_delta`` PINNED at the current
    version, the stream half is ``stream_delta`` from the next version
    (exclusive of the boundary — a commit landing between the two calls
    streams, it does not duplicate). With ``read_change_feed=True`` the
    snapshot half carries ``_change_type``/``_commit_version``/
    ``_commit_timestamp`` (inserts at the boundary version) matching
    the CDF stream's schema."""
    import os

    from ..delta_import import (
        _snapshot_state,
        commit_timestamps,
        read_delta,
    )
    from ..delta_source import stream_delta

    path = os.path.abspath(path)
    version = _snapshot_state(spark, path, None).version
    batch = read_delta(spark, path, version=version)
    if read_change_feed:
        ts = commit_timestamps(path, version, version)
        batch = (
            batch.withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version",
                        F.lit(version).cast("long"))
            .withColumn("_commit_timestamp", F.timestamp_millis(
                F.lit(ts.get(version))))
        )
    tail = stream_delta(
        spark, path, starting_version=version + 1,
        ignore_deletes=ignore_deletes,
        max_files_per_batch=max_files_per_batch,
        read_change_feed=read_change_feed,
    )
    return batch, tail, version
