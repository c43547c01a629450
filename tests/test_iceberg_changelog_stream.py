"""Streaming the Iceberg changelog: inserts per append snapshot,
position-delete files resolved to the rows they name, compaction
invisible, equality deletes refused, exactly-once across drains."""

from __future__ import annotations

import os

import pytest

from monday_etl_spark.iceberg_import import (
    append_iceberg,
    compact_iceberg,
    create_iceberg_table,
    delete_iceberg_where,
    iceberg_history,
    upsert_iceberg,
)
from monday_etl_spark.iceberg_source import stream_iceberg


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


def test_changelog_stream_inserts_deletes_compaction(spark, tmp_path):
    path = str(tmp_path / "tbl")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(i, float(i)) for i in range(4)], "id long, v double"), path)
    first = iceberg_history(path)[0]["snapshot_id"]
    append_iceberg(spark, spark.createDataFrame(
        [(10, 10.0), (11, 11.0)], "id long, v double"), path)
    delete_iceberg_where(spark, path, "v", 0.0, 1.5)  # kills ids 0,1
    compact_iceberg(spark, path)                      # must emit nothing

    stream = stream_iceberg(spark, path, starting_snapshot_id=first,
                            changelog=True)
    assert stream.columns == ["id", "v", "_change_type",
                              "_commit_snapshot_id", "_commit_timestamp"]
    out = _drain(spark, stream, str(tmp_path / "d1"))
    rows = {(r.id, r.v, r._change_type)
            for r in spark.read.parquet(out).collect()}
    assert rows == {
        (0, 0.0, "insert"), (1, 1.0, "insert"),
        (2, 2.0, "insert"), (3, 3.0, "insert"),
        (10, 10.0, "insert"), (11, 11.0, "insert"),
        (0, 0.0, "delete"), (1, 1.0, "delete"),
    }
    # each change row is stamped with its commit's snapshot id
    sids = {r._commit_snapshot_id
            for r in spark.read.parquet(out).collect()}
    hist_ids = {h["snapshot_id"] for h in iceberg_history(path)}
    assert sids <= hist_ids and len(sids) == 3  # two appends + delete

    # same checkpoint, no new snapshots: nothing re-delivers
    stream2 = stream_iceberg(spark, path, starting_snapshot_id=first,
                             changelog=True)
    _drain(spark, stream2, str(tmp_path / "d1"))
    assert spark.read.parquet(out).count() == 8


def test_changelog_stream_refuses_equality_deletes(spark, tmp_path):
    path = str(tmp_path / "up")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, v double"), path)
    first = iceberg_history(path)[0]["snapshot_id"]
    upsert_iceberg(spark, spark.createDataFrame(
        [(2, 99.0)], "id long, v double"), path, key=["id"])
    with pytest.raises(Exception, match="equality-delete"):
        stream = stream_iceberg(spark, path, starting_snapshot_id=first,
                                changelog=True)
        _drain(spark, stream, str(tmp_path / "r1"))


def test_changelog_stream_refuses_identity_partitioned(spark, tmp_path):
    path = str(tmp_path / "pt")
    create_iceberg_table(path, [("id", "long"), ("cat", "string")],
                         partition_by=[("cat", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, "a")], "id long, cat string"), path)
    first = iceberg_history(path)[0]["snapshot_id"]
    with pytest.raises(Exception, match="identity-partitioned"):
        stream = stream_iceberg(spark, path, starting_snapshot_id=first,
                                changelog=True)
        _drain(spark, stream, str(tmp_path / "r2"))
