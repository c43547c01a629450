"""Hybrid backfill: JVM batch snapshot + Python-DataSource tail with
exactly-once parity against the all-stream drain — the split that keeps
the Arrow-boundary tax off the bulk history (VERDICT r12 next-round #4).
"""

from __future__ import annotations

import os

import pytest

from monday_etl_spark.iceberg_import import (
    append_iceberg,
    create_iceberg_table,
    iceberg_history,
    upsert_iceberg,
)
from monday_etl_spark.iceberg_source import stream_iceberg
from monday_etl_spark.streaming.backfill import (
    backfill_delta,
    backfill_iceberg,
)


def _drain(spark, stream, root):
    out = os.path.join(root, "rows")

    def handle(batch, bid):
        batch.write.mode("overwrite").parquet(
            os.path.join(out, f"batch={bid}"))

    q = (stream.writeStream.foreachBatch(handle)
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return out


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_backfill_iceberg_exactly_once(spark, tmp_path):
    """snapshot-half ∪ tail-half == the all-stream drain, as a
    MULTISET: every row served by exactly one side, none twice."""
    path = str(tmp_path / "tbl")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, v double"), path)
    append_iceberg(spark, spark.createDataFrame(
        [(3, 3.0)], "id long, v double"), path)
    first = iceberg_history(path)[0]["snapshot_id"]

    batch, tail, sid = backfill_iceberg(spark, path)
    assert sid == iceberg_history(path)[-1]["snapshot_id"]
    # the boundary is PINNED: a commit after the call streams, it does
    # not smear into the snapshot half
    append_iceberg(spark, spark.createDataFrame(
        [(4, 4.0)], "id long, v double"), path)

    got_batch = _rows(batch, "id", "v")
    assert got_batch == [(1, 1.0), (2, 2.0), (3, 3.0)]
    out = _drain(spark, tail, str(tmp_path / "tail"))
    got_tail = _rows(spark.read.parquet(out), "id", "v")
    assert got_tail == [(4, 4.0)]

    allstream = stream_iceberg(spark, path, starting_snapshot_id=first)
    out2 = _drain(spark, allstream, str(tmp_path / "all"))
    assert sorted(got_batch + got_tail) == _rows(
        spark.read.parquet(out2), "id", "v")

    with pytest.raises(ValueError, match="not both"):
        stream_iceberg(spark, path, starting_snapshot_id=first,
                       after_snapshot_id=sid)
    with pytest.raises(ValueError, match="not in metadata"):
        stream_iceberg(spark, path, after_snapshot_id=123456)


def test_backfill_iceberg_changelog_stamped(spark, tmp_path):
    """changelog mode: the snapshot half carries the stream's meta
    columns (inserts at the boundary commit) and the tail serves
    exactly the post-boundary changes the batch changelog reports."""
    from monday_etl_spark.iceberg_changes import read_iceberg_changes

    path = str(tmp_path / "cl")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, v double"), path)

    batch, tail, sid = backfill_iceberg(spark, path, changelog=True)
    assert batch.columns == ["id", "v", "_change_type", "_change_ordinal",
                             "_commit_snapshot_id", "_commit_timestamp"]
    assert batch.columns == tail.columns
    assert _rows(batch, "id", "v", "_change_type",
                 "_commit_snapshot_id") == [
        (1, 1.0, "insert", sid), (2, 2.0, "insert", sid)]

    upsert_iceberg(spark, spark.createDataFrame(
        [(2, 99.0)], "id long, v double"), path, key=["id"])
    out = _drain(spark, tail, str(tmp_path / "tail"))
    got_tail = _rows(spark.read.parquet(out), "id", "v", "_change_type")
    want = _rows(read_iceberg_changes(spark, path, from_snapshot_id=sid),
                 "id", "v", "_change_type")
    assert got_tail == want == [(2, 2.0, "delete"), (2, 99.0, "insert")]


def test_backfill_delta_exactly_once(spark, tmp_path):
    """Delta twin: pinned read_delta at the boundary version + stream
    from version+1, multiset-equal to the all-stream drain."""
    from monday_etl_spark.delta_import import append_delta
    from monday_etl_spark.delta_source import stream_delta

    from .test_delta_cdf import _cdf_table

    table = _cdf_table(spark, tmp_path)           # v0: ids 0..9
    append_delta(spark, spark.createDataFrame(
        [(100, 1.0)], "id long, v double"), table)  # v1

    batch, tail, version = backfill_delta(spark, table)
    assert version == 1
    append_delta(spark, spark.createDataFrame(
        [(101, 2.0)], "id long, v double"), table)  # v2: tail-only

    got_batch = _rows(batch, "id", "v")
    assert (100, 1.0) in got_batch and len(got_batch) == 11
    out = _drain(spark, tail, str(tmp_path / "tail"))
    got_tail = _rows(spark.read.parquet(out), "id", "v")
    assert got_tail == [(101, 2.0)]

    allstream = stream_delta(spark, table, starting_version=0)
    out2 = _drain(spark, allstream, str(tmp_path / "all"))
    assert sorted(got_batch + got_tail) == _rows(
        spark.read.parquet(out2), "id", "v")


def test_backfill_delta_cdf_stamped(spark, tmp_path):
    """CDF mode: the snapshot half carries the feed's meta columns at
    the boundary version; the tail matches read_delta_changes over the
    post-boundary range."""
    from monday_etl_spark.delta_cdf import read_delta_changes
    from monday_etl_spark.delta_import import (
        append_delta,
        delete_delta_where,
    )

    from .test_delta_cdf import _cdf_table

    table = _cdf_table(spark, tmp_path)           # v0: ids 0..9

    batch, tail, version = backfill_delta(spark, table,
                                          read_change_feed=True)
    assert version == 0
    assert batch.columns == ["id", "v", "_change_type",
                             "_commit_version", "_commit_timestamp"]
    assert batch.columns == tail.columns
    assert {(r.id, r._change_type, r._commit_version)
            for r in batch.collect()} == {
        (i, "insert", 0) for i in range(10)}

    append_delta(spark, spark.createDataFrame(
        [(100, 1.0)], "id long, v double"), table)  # v1
    delete_delta_where(spark, table, "id", 0, 1)    # v2: cdc files
    out = _drain(spark, tail, str(tmp_path / "tail"))
    got_tail = _rows(spark.read.parquet(out),
                     "id", "_change_type", "_commit_version")
    want = _rows(read_delta_changes(spark, table, 1, 2),
                 "id", "_change_type", "_commit_version")
    assert got_tail == want
    assert (100, "insert", 1) in got_tail
    assert (0, "delete", 2) in got_tail
