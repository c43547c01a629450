"""Partition transforms: spec Appendix-B hash vectors, expression/python
parity, transform value semantics, and the append path over a
``day(ts) + bucket(N, id)`` table (the layout external Flink/Spark
Iceberg tables commonly use)."""

from __future__ import annotations

import datetime
import json
import os
import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    TimestampNTZType,
)

from monday_etl_spark.iceberg_transforms import (
    TransformError,
    murmur3_bytes,
    murmur3_long_col,
    parse_transform,
    transform_column,
    tuple_ice_type,
)

pytestmark = pytest.mark.usefixtures("spark")


def _hash_long(v: int) -> int:
    return murmur3_bytes(struct.pack("<q", v))


def test_spec_appendix_b_vectors():
    # iceberg.apache.org/spec §Appendix B (public test vectors)
    assert _hash_long(34) == 2017239379           # int and long 34
    assert _hash_long(17486) == -653330422        # date 2017-11-16
    assert _hash_long(1510871468000000) == -2047944441  # its timestamp
    assert murmur3_bytes(b"iceberg") == 1210000089
    # bucket routing from those hashes
    assert (_hash_long(34) & 0x7FFFFFFF) % 16 == 3


def test_parse_transform():
    assert parse_transform("identity") == ("identity", None)
    assert parse_transform("bucket[16]") == ("bucket", 16)
    assert parse_transform("truncate[10]") == ("truncate", 10)
    for s, kind in [("day", "day"), ("days", "day"), ("hour", "hour"),
                    ("month", "month"), ("years", "year")]:
        assert parse_transform(s) == (kind, None)
    with pytest.raises(TransformError):
        parse_transform("zorder[2]")
    with pytest.raises(TransformError):
        parse_transform("bucket[0]")


def test_expression_hash_matches_python(spark):
    # the JVM expression form and the python reference must agree on a
    # sign-crossing spread of longs (including the 32-bit boundaries the
    # two-block split exercises)
    vals = [0, 1, -1, 34, 17486, 2**31 - 1, -(2**31), 2**32, -(2**32),
            2**62, -(2**62), 1510871468000000, -1510871468000000]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = {r["v"]: r["h"] for r in
           df.select("v", murmur3_long_col(F.col("v")).alias("h")).collect()}
    for v in vals:
        assert got[v] == _hash_long(v), v


def test_transform_values(spark):
    ts = datetime.datetime(2017, 11, 16, 22, 31, 8)
    rows = [(34, 2**33 + 7, "iceberg", datetime.date(2017, 11, 16), ts),
            (-5, -7, "ab", datetime.date(1969, 12, 25), None)]
    df = spark.createDataFrame(
        rows, "i int, l bigint, s string, d date, ts timestamp_ntz")
    out = df.select(
        transform_column("bucket", 16, F.col("i"), IntegerType()).alias("bi"),
        transform_column("bucket", 7, F.col("s"), StringType()).alias("bs"),
        transform_column("bucket", 5, F.col("d"), DateType()).alias("bd"),
        transform_column("truncate", 10, F.col("l"), LongType()).alias("tl"),
        transform_column("truncate", 3, F.col("s"), StringType()).alias("ts3"),
        transform_column("day", None, F.col("ts"),
                         TimestampNTZType()).alias("day"),
        transform_column("hour", None, F.col("ts"),
                         TimestampNTZType()).alias("hr"),
        transform_column("month", None, F.col("d"), DateType()).alias("mo"),
        transform_column("year", None, F.col("d"), DateType()).alias("yr"),
    ).collect()
    r0, r1 = out
    assert r0["bi"] == (_hash_long(34) & 0x7FFFFFFF) % 16 == 3
    assert r0["bs"] == (murmur3_bytes(b"iceberg") & 0x7FFFFFFF) % 7
    assert r0["bd"] == (_hash_long(17486) & 0x7FFFFFFF) % 5
    assert r0["tl"] == (2**33 + 7) - ((2**33 + 7) % 10)
    assert r0["ts3"] == "ice"
    assert r0["day"] == 17486
    assert r0["hr"] == 1510871468000000 // 3_600_000_000
    assert r0["mo"] == (2017 - 1970) * 12 + 10
    assert r0["yr"] == 47
    # negative-safe floor truncate; pre-epoch day/month ordinals
    assert r1["tl"] == -10
    assert r1["mo"] == -1
    assert r1["yr"] == -1
    assert r1["day"] is None and r1["hr"] is None  # null propagates


def test_tuple_ice_types():
    assert tuple_ice_type("identity", "string") == "string"
    assert tuple_ice_type("truncate", "long") == "long"
    for k in ("bucket", "day", "hour", "month", "year"):
        assert tuple_ice_type(k, "timestamp") == "int"


_SCHEMA = {"type": "struct", "schema-id": 0, "fields": [
    {"id": 1, "name": "id", "required": False, "type": "long"},
    {"id": 2, "name": "v", "required": False, "type": "string"},
    {"id": 3, "name": "ts", "required": False, "type": "timestamp"},
]}


def _empty_table(path: str, spec: dict) -> None:
    from tests._iceberg_builders import metadata

    os.makedirs(path)
    metadata(path, [_SCHEMA], [], [], None, specs=[spec])


def test_append_to_day_bucket_table(spark, tmp_path):
    """The verdict's done-bar: append to a hand-built day(ts)+bucket(4,id)
    table; partition tuples route per spec, reads return exactly the
    appended rows, and manifest bounds still prune."""
    from monday_etl_spark.iceberg_import import (
        append_iceberg,
        iceberg_files_where,
        read_iceberg_table,
        read_iceberg_where,
    )

    path = str(tmp_path / "daybucket")
    spec = {
        "spec-id": 0,
        "fields": [
            {"name": "ts_day", "transform": "day", "source-id": 3,
             "field-id": 1000},
            {"name": "id_bucket", "transform": "bucket[4]", "source-id": 1,
             "field-id": 1001},
        ],
    }
    _empty_table(path, spec)

    ts = [datetime.datetime(2024, 1, d, h) for d, h in
          [(5, 1), (5, 9), (6, 3), (7, 0), (7, 23), (8, 12)]]
    rows = [(i, f"v{i}", ts[i]) for i in range(6)]
    df = spark.createDataFrame(rows, "id bigint, v string, ts timestamp_ntz")
    append_iceberg(spark, df, path)

    got = sorted(
        (r["id"], r["v"], r["ts"])
        for r in read_iceberg_table(spark, path).collect()
    )
    assert got == rows

    # the manifest's partition tuples carry the spec-exact transform values
    from monday_etl_spark.avro_ocf import read_ocf
    from monday_etl_spark.iceberg_import import read_metadata

    meta = read_metadata(path)
    snap = meta["snapshots"][-1]
    mdir = os.path.join(path, "metadata")
    list_file = snap["manifest-list"].rsplit("/", 1)[1]
    _, _, mans = read_ocf(os.path.join(mdir, list_file))
    tuples = set()
    for m in mans:
        mf = m["manifest_path"].rsplit("/", 1)[1]
        _, mkv, entries = read_ocf(os.path.join(mdir, mf))
        assert json.loads(mkv["partition-spec"])[0]["transform"] == "day"
        for e in entries:
            p = e["data_file"]["partition"]
            tuples.add((p["ts_day"], p["id_bucket"]))
    epoch = datetime.date(1970, 1, 1).toordinal()
    want = {(t.date().toordinal() - epoch, (_hash_long(i) & 0x7FFFFFFF) % 4)
            for (i, _v, t) in rows}
    assert tuples == want

    # bounds pruning on the (in-file) source columns still works (a
    # partition dir may hold several task files, so compare against the
    # live FILE count, not the tuple count)
    keep, total = iceberg_files_where(
        spark, path, "id", 0, 1)
    assert total >= len(tuples) and 0 < len(keep) < total
    pruned = read_iceberg_where(spark, path, "id", 0, 1)
    assert sorted(r["id"] for r in pruned.collect()) == [0, 1]

    # a second append composes (tuples route consistently across commits)
    df2 = spark.createDataFrame(
        [(0, "again", datetime.datetime(2024, 1, 5, 1))],
        "id bigint, v string, ts timestamp_ntz")
    append_iceberg(spark, df2, path)
    assert read_iceberg_table(spark, path).count() == 7


def test_append_truncate_string_table(spark, tmp_path):
    from monday_etl_spark.iceberg_import import (
        append_iceberg,
        read_iceberg_table,
    )

    path = str(tmp_path / "truncstr")
    spec = {
        "spec-id": 0,
        "fields": [
            {"name": "v_trunc", "transform": "truncate[2]", "source-id": 2,
             "field-id": 1000},
        ],
    }
    _empty_table(path, spec)
    df = spark.createDataFrame(
        [(1, "alpha", None), (2, "albatross", None), (3, "beta", None)],
        "id bigint, v string, ts timestamp_ntz").coalesce(1)
    append_iceberg(spark, df, path)
    got = read_iceberg_table(spark, path)
    assert got.count() == 3
    # same-prefix strings co-locate in one partition tuple (one writer
    # task -> exactly one file per tuple)
    from monday_etl_spark.iceberg_import import iceberg_files_where
    _, total = iceberg_files_where(spark, path, "id", 1, 3)
    assert total == 2  # "al" and "be"


def test_create_iceberg_table_then_append(spark, tmp_path):
    """create_iceberg_table lays down a transform-partitioned empty table
    any append/read/DML path then treats like an external one."""
    from monday_etl_spark.iceberg_import import (
        ConcurrentCommitError,
        append_iceberg,
        create_iceberg_table,
        read_iceberg_table,
        read_metadata,
    )

    path = str(tmp_path / "created")
    v = create_iceberg_table(
        path,
        [("id", "long"), ("v", "string"), ("ts", "timestamp")],
        partition_by=[("ts", "day"), ("id", "bucket[4]")],
    )
    assert v == 1
    meta = read_metadata(path)
    spec = meta["partition-specs"][0]["fields"]
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("ts_day", "day"), ("id_bucket", "bucket[4]")]
    assert read_iceberg_table(spark, path).count() == 0

    df = spark.createDataFrame(
        [(1, "a", datetime.datetime(2024, 3, 1, 5)),
         (2, "b", datetime.datetime(2024, 3, 2, 6))],
        "id bigint, v string, ts timestamp_ntz")
    append_iceberg(spark, df, path)
    got = read_iceberg_table(spark, path)
    assert sorted((r.id, r.v) for r in got.collect()) == [(1, "a"), (2, "b")]

    # a second creator loses the conditional put
    with pytest.raises(ConcurrentCommitError):
        create_iceberg_table(path, [("id", "long")])
