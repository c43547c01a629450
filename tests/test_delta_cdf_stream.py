"""Streaming the Delta change feed: cdc commits stream their change
files, appends stream as inserts, stamps ride every row, refusals are
loud, and the checkpoint gives exactly-once across drains."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from monday_etl_spark.delta_import import (
    append_delta,
    delete_delta_where,
)
from monday_etl_spark.delta_source import stream_delta

from .test_delta_cdf import _add, _cdf_table, _commit, _write_file


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


def test_change_feed_streams_inserts_and_deletes(spark, tmp_path):
    table = _cdf_table(spark, tmp_path)           # v0: ids 0..9
    append_delta(spark, spark.createDataFrame(
        [(100, 1.0), (101, 2.0)], "id long, v double"), table)  # v1
    delete_delta_where(spark, table, "id", 0, 2)  # v2: cdc files

    stream = stream_delta(spark, table, starting_version=1,
                          read_change_feed=True)
    assert stream.columns == ["id", "v", "_change_type",
                              "_commit_version", "_commit_timestamp"]
    out = _drain(spark, stream, str(tmp_path / "d1"))
    rows = {(r.id, r._change_type, r._commit_version)
            for r in spark.read.parquet(out).collect()}
    assert rows == {
        (100, "insert", 1), (101, "insert", 1),
        (0, "delete", 2), (1, "delete", 2), (2, "delete", 2),
    }
    ts = {r._commit_version: r._commit_timestamp
          for r in spark.read.parquet(out).collect()}
    assert ts[1] <= ts[2]

    # same checkpoint, no new commits: nothing re-delivers
    stream2 = stream_delta(spark, table, starting_version=1,
                           read_change_feed=True)
    _drain(spark, stream2, str(tmp_path / "d1"))
    n = spark.read.parquet(out).count()
    assert n == 5


def test_change_feed_refusals(spark, tmp_path):
    # CDF not enabled on the table
    plain = str(tmp_path / "plain")
    os.makedirs(plain)
    f0 = _write_file(spark, plain, "f0", [(1, 1.0)])
    _commit(plain, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "x",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": (
                          '{"type":"struct","fields":['
                          '{"name":"id","type":"long","nullable":true,'
                          '"metadata":{}},'
                          '{"name":"v","type":"double","nullable":true,'
                          '"metadata":{}}]}'),
                      "partitionColumns": [], "configuration": {}}},
        _add(f0),
    ])
    with pytest.raises(Exception, match="enableChangeDataFeed"):
        stream = stream_delta(spark, plain, starting_version=0,
                              read_change_feed=True)
        _drain(spark, stream, str(tmp_path / "r1"))

    # an external DV-update commit WITHOUT change files: the drain
    # traversing it fails loudly instead of inventing rows
    table = _cdf_table(spark, tmp_path, name="dvup")
    from monday_etl_spark.roaring import write_dv_file

    dv_path = os.path.join(table, "ext_dv.bin")
    (off, size), = write_dv_file(dv_path, [[0]])
    readd = _add("data/f0.parquet")
    readd["add"]["deletionVector"] = {
        "storageType": "p", "pathOrInlineDv": dv_path,
        "offset": off, "sizeInBytes": size, "cardinality": 1}
    _commit(table, 1, [
        {"remove": {"path": "data/f0.parquet", "dataChange": True}},
        readd,
    ])
    with pytest.raises(Exception, match="change-data|change data"):
        stream = stream_delta(spark, table, starting_version=1,
                              read_change_feed=True)
        _drain(spark, stream, str(tmp_path / "r2"))


def test_change_feed_rate_limited_resumable_drain(spark, tmp_path):
    """max_files_per_batch counts CHANGE-FEED units; repeated bounded
    drains walk the feed to completion with no duplicates."""
    table = _cdf_table(spark, tmp_path, name="rl")
    append_delta(spark, spark.createDataFrame(
        [(200, 1.0)], "id long, v double"), table)   # v1
    append_delta(spark, spark.createDataFrame(
        [(201, 2.0)], "id long, v double"), table)   # v2
    delete_delta_where(spark, table, "id", 0, 1)     # v3: cdc

    root = str(tmp_path / "rl_drain")
    seen = []
    for _ in range(6):
        stream = stream_delta(spark, table, starting_version=1,
                              read_change_feed=True,
                              max_files_per_batch=1)
        out = _drain(spark, stream, root)
        seen = [(r.id, r._change_type) for r in
                spark.read.parquet(out).collect()]
        if len(seen) >= 4:
            break
    assert sorted(seen) == [(0, "delete"), (1, "delete"),
                            (200, "insert"), (201, "insert")]


def test_change_feed_stream_refuses_pre_enablement_start(spark, tmp_path):
    """Starting the CDF stream below the version where CDF was enabled
    refuses at stream start (the batch reader's enablement-floor
    contract, session-free): pre-enablement commits carry no change
    files, so reconstruction would over-report rewrites."""
    import json as _json

    table = str(tmp_path / "latestream")
    os.makedirs(table)
    f0 = _write_file(spark, table, "f0", [(1, 1.0)])
    f1 = _write_file(spark, table, "f1", [(2, 2.0)])
    md = {"metaData": {"id": "ls",
                       "format": {"provider": "parquet", "options": {}},
                       "schemaString": (
                           '{"type":"struct","fields":['
                           '{"name":"id","type":"long","nullable":true,'
                           '"metadata":{}},'
                           '{"name":"v","type":"double","nullable":true,'
                           '"metadata":{}}]}'),
                       "partitionColumns": [], "configuration": {}}}
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        md, _add(f0),
    ])
    md_on = _json.loads(_json.dumps(md))
    md_on["metaData"]["configuration"] = {
        "delta.enableChangeDataFeed": "true"}
    _commit(table, 1, [md_on])
    _commit(table, 2, [_add(f1)])

    with pytest.raises(Exception, match="off at version 0"):
        stream = stream_delta(spark, table, starting_version=0,
                              read_change_feed=True)
        _drain(spark, stream, str(tmp_path / "c0"))

    # starting at/above the enablement serves
    out = _drain(
        spark,
        stream_delta(spark, table, starting_version=1,
                     read_change_feed=True),
        str(tmp_path / "c1"))
    assert {(r.id, r._change_type)
            for r in spark.read.parquet(out).collect()} \
        == {(2, "insert")}


def test_change_feed_streams_column_mapped_table(spark, tmp_path):
    """CDF streaming over a column-mapped table (previously refused):
    the arrow read path resolves data columns by physicalName (and the
    partition value by its physical key); cdc files' literal
    _change_type column rides through untouched."""
    import pyarrow as pa

    from tests.test_delta_cdf import _mapped_schema, _write_phys_file

    table = str(tmp_path / "mapped_stream")
    os.makedirs(table)
    schema_json = _mapped_schema([
        ("id", "col-aaa", 1, "long"),
        ("v", "col-bbb", 2, "double"),
        ("region", "col-ccc", 3, "string"),
    ])
    f0 = _write_phys_file(
        table, "f0",
        [("col-aaa", pa.int64(), [1, 2]),
         ("col-bbb", pa.float64(), [1.0, 2.0])])
    c0 = _write_phys_file(
        table, "c0",
        [("col-aaa", pa.int64(), [2]),
         ("col-bbb", pa.float64(), [2.0]),
         ("_change_type", pa.string(), ["delete"])])
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "ms",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema_json,
                      "partitionColumns": ["region"],
                      "configuration": {
                          "delta.enableChangeDataFeed": "true",
                          "delta.columnMapping.mode": "name",
                          "delta.columnMapping.maxColumnId": "3"}}},
        {"add": {"path": f0, "partitionValues": {"col-ccc": "EU"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    _commit(table, 1, [
        {"cdc": {"path": c0, "partitionValues": {"col-ccc": "EU"},
                 "size": 1, "dataChange": False}},
        {"remove": {"path": f0, "dataChange": True}},
    ])
    out = _drain(
        spark,
        stream_delta(spark, table, starting_version=0,
                     read_change_feed=True),
        str(tmp_path / "ck"))
    rows = {(r.id, r.v, r.region, r._change_type, r._commit_version)
            for r in spark.read.parquet(out).collect()}
    assert rows == {
        (1, 1.0, "EU", "insert", 0),
        (2, 2.0, "EU", "insert", 0),
        (2, 2.0, "EU", "delete", 1),
    }
