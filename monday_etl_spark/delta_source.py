"""Stream FROM a Delta table: version-tailing micro-batch source.

The consumer half of the streaming interop story (``streaming/delta_sink``
produces commits; this turns a Delta table INTO a stream). Semantics match
delta-spark's streaming source: each micro-batch is the set of files ADDED
between two log versions, offsets are log versions, and a ``remove``
inside the tailed range is refused loudly (a compacted/deleted table
cannot be replayed as an append stream — delta's own
``ignoreDeletes``-off behavior).

Spark-shaped despite the Python DataSource API:

- planning is driver-side file-listing + JSON-tail replay (cheap by
  construction: the tail is short when writers checkpoint; the initial
  snapshot reads the parquet checkpoint via pyarrow);
- data moves through ``read(partition)`` as **pyarrow RecordBatches** —
  one InputPartition per data file, so a micro-batch scans its files in
  parallel and rows cross the Python boundary Arrow-columnar, never
  row-at-a-time;
- the batch-read path stays ``delta_import.read_delta`` (JVM scan); this
  source exists for the *streaming* contract, where the per-batch file
  set is exactly what the log names.

Offsets: ``{"version": v}`` = the last log version fully processed. The
``starting_version`` option (default: the table's current version, i.e.
only NEW commits stream) rewinds to include history; ``0`` replays the
table from its first commit — with our exporter that first commit IS the
full initial snapshot, delta-spark's initial-snapshot batch.

Partitioned tables are refused for now (constant-injection into arrow
batches is mechanical but untested territory; read_delta handles them
batch-side).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .delta_import import (
    DeltaProtocolError,
    _list_checkpoints,
    _list_commits,
    _log_dir,
)

_ARROW_TYPES = {
    "bigint": pa.int64(), "int": pa.int32(), "smallint": pa.int16(),
    "tinyint": pa.int8(), "double": pa.float64(), "float": pa.float32(),
    "string": pa.string(), "boolean": pa.bool_(), "date": pa.date32(),
    "binary": pa.binary(),
}


def _local_meta(path: str) -> dict:
    """Latest metaData action without a SparkSession: scan the JSON
    commits newest-first, fall back to the newest checkpoint (pyarrow)."""
    commits = _list_commits(path)
    for v in sorted(commits, reverse=True):
        with open(commits[v]) as fh:
            for line in fh:
                if line.strip():
                    a = json.loads(line)
                    if "metaData" in a:
                        return a["metaData"]
    ckpts = _list_checkpoints(path)
    for v in sorted(ckpts, reverse=True):
        t = pq.read_table(ckpts[v], columns=["metaData"])
        for m in t.column("metaData").to_pylist():
            if m is not None:
                return m
    raise DeltaProtocolError(f"{path}: no metaData action in log")


def _current_version(path: str) -> int:
    vs = set(_list_commits(path)) | set(_list_checkpoints(path))
    if not vs:
        raise FileNotFoundError(f"{path}: empty _delta_log/")
    return max(vs)


def _adds_between(path: str, after: int, upto: int,
                  allow_removes: bool) -> list[dict]:
    """add actions of versions (after, upto], replayed in order. A commit
    missing (checkpoint-cleaned hole) or a remove (without opt-in) refuses
    loudly — an append stream cannot represent either."""
    commits = _list_commits(path)
    adds: list[dict] = []
    for v in range(after + 1, upto + 1):
        f = commits.get(v)
        if f is None:
            ckpt_note = (" (log cleaned by a checkpoint? start the stream "
                         "at a retained version)")
            raise FileNotFoundError(
                f"{path}: cannot stream version {v}: commit missing"
                + ckpt_note
            )
        with open(f) as fh:
            for line in fh:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "add" in a:
                    adds.append(a["add"])
                elif "remove" in a and not allow_removes:
                    raise DeltaProtocolError(
                        f"{path}: version {v} removes "
                        f"{a['remove']['path']}: a delete/compaction "
                        "cannot replay as an append stream (set "
                        "ignore_deletes to skip removes)"
                    )
    return adds


class DeltaFilePartition(InputPartition):
    def __init__(self, abs_path: str):
        self.abs_path = abs_path


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("delta_stream source requires the 'path' option")
        self.ignore_deletes = (
            str(options.get("ignore_deletes", "false")).lower() == "true"
        )
        meta = _local_meta(self.path)
        if meta.get("partitionColumns"):
            raise DeltaProtocolError(
                "streaming from a PARTITIONED Delta table is not supported "
                "by this source yet; use delta_import.read_delta for "
                "batch reads"
            )
        self.schema = StructType.fromJson(json.loads(meta["schemaString"]))
        start = options.get("starting_version")
        # offset = last processed version; current → only NEW commits
        self._initial = (int(start) - 1 if start is not None
                         else _current_version(self.path))

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        return {"version": _current_version(self.path)}

    def partitions(self, start: dict, end: dict):
        import urllib.parse

        adds = _adds_between(
            self.path, start["version"], end["version"], self.ignore_deletes
        )
        parts = []
        for a in adds:
            rel = urllib.parse.unquote(a["path"])
            absf = rel if os.path.isabs(rel) else os.path.join(self.path, rel)
            parts.append(DeltaFilePartition(absf))
        # an empty batch still needs ≥1 partition for the API contract
        return parts or [DeltaFilePartition("")]

    def read(self, partition: DeltaFilePartition):
        if not partition.abs_path:
            return iter([])
        fields = self.schema.fields
        want = [(f.name, _ARROW_TYPES.get(f.dataType.simpleString()))
                for f in fields]
        for name, at in want:
            if at is None:
                raise DeltaProtocolError(
                    f"column {name}: type "
                    f"{self.schema[name].dataType.simpleString()} not "
                    "supported by the arrow stream reader"
                )

        def batches():
            pf = pq.ParquetFile(partition.abs_path)
            present = set(pf.schema_arrow.names)
            for rb in pf.iter_batches():
                n = rb.num_rows
                cols = []
                for name, at in want:
                    if name in present:
                        cols.append(rb.column(rb.schema.get_field_index(name))
                                    .cast(at))
                    else:
                        # pre-evolution file: the column surfaces as NULLs,
                        # same contract as read_delta
                        cols.append(pa.nulls(n, type=at))
                yield pa.RecordBatch.from_arrays(
                    cols, names=[w[0] for w in want]
                )

        return batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are log versions; nothing to clean up


class DeltaStreamDataSource(DataSource):
    """Usage:
        spark.dataSource.register(DeltaStreamDataSource)
        spark.readStream.format("delta_stream")
             .option("path", table).option("starting_version", "0").load()
    """

    @classmethod
    def name(cls) -> str:
        return "delta_stream"

    def schema(self):
        return StructType.fromJson(
            json.loads(_local_meta(self.options["path"])["schemaString"])
        )

    def streamReader(self, schema) -> DeltaStreamReader:
        return DeltaStreamReader(self.options)


def stream_delta(spark: SparkSession, path: str,
                 starting_version: int | None = None,
                 ignore_deletes: bool = False) -> DataFrame:
    """readStream over a Delta table's commit log: one micro-batch per
    range of new versions, file-parallel Arrow reads. Pair with any
    writeStream sink; with ``streaming/delta_sink`` on the other side this
    is a table-to-table streaming pipe whose state lives entirely in the
    two tables' logs."""
    from .session import ensure_session_confs

    ensure_session_confs(spark)
    spark.dataSource.register(DeltaStreamDataSource)
    reader = spark.readStream.format("delta_stream").option("path", path)
    if starting_version is not None:
        reader = reader.option("starting_version", str(starting_version))
    if ignore_deletes:
        reader = reader.option("ignore_deletes", "true")
    return reader.load()
