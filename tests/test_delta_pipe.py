"""Table-to-table streaming pipe: delta_source → delta_sink.

The two halves of the interop bridge composed: a Delta table is tailed as
a stream (delta_source.stream_delta) and every micro-batch is appended
into a second Delta table exactly-once (delta_import.append_delta with
txn identifiers, batch id = txn version). The pipe's entire state lives
in the two tables' logs plus the stream checkpoint — no external state
store — so any Delta-capable engine can sit on either end.
"""

from __future__ import annotations

from monday_etl_spark.delta_export import export_delta_log
from monday_etl_spark.delta_import import (
    append_delta,
    last_txn_version,
    read_delta,
)
from monday_etl_spark.delta_source import stream_delta
from monday_etl_spark.tableformat import write_versioned

_SCHEMA = "id bigint, v double"


def _rows(spark, path):
    return sorted((r.id, r.v) for r in read_delta(spark, path).collect())


def _pipe(spark, src, dst, ckpt, app_id="pipe"):
    stream = stream_delta(spark, src, starting_version=0)

    def handle(batch, batch_id):
        append_delta(spark, batch, dst,
                     app_id=app_id, txn_version=batch_id, retries=3)

    q = (stream.writeStream.foreachBatch(handle)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def test_pipe_mirrors_source_incrementally_exactly_once(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    base = spark.createDataFrame([(i, float(i)) for i in range(8)], _SCHEMA)
    write_versioned(base, src, key="id", n_buckets=2)
    export_delta_log(src)
    # destination starts as an empty delta table with the same schema
    write_versioned(base.limit(0), dst, key="id", n_buckets=2)
    export_delta_log(dst)

    ckpt = str(tmp_path / "ckpt")
    _pipe(spark, src, dst, ckpt)
    assert _rows(spark, dst) == _rows(spark, src)

    # tail: two more source commits flow through the SAME checkpoint
    append_delta(spark, spark.createDataFrame([(100, 1.0)], _SCHEMA), src)
    append_delta(spark, spark.createDataFrame([(101, 2.0)], _SCHEMA), src)
    _pipe(spark, src, dst, ckpt)
    assert _rows(spark, dst) == _rows(spark, src)

    # idle re-run: nothing new in src → no new commit in dst
    before = last_txn_version(spark, dst, "pipe")
    n_before = len(_rows(spark, dst))
    _pipe(spark, src, dst, ckpt)
    assert last_txn_version(spark, dst, "pipe") == before
    assert len(_rows(spark, dst)) == n_before

    # replayed batch (checkpoint loss, unchanged source): the txn
    # identifier in dst's own log dedupes the re-delivered batch
    _pipe(spark, src, dst, str(tmp_path / "ckpt2"))
    assert _rows(spark, dst) == _rows(spark, src)
