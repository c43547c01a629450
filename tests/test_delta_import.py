"""Delta import bridge: log replay, partitions, checkpoints, appends.

No Delta library exists in the container, so external tables are
hand-built against the public PROTOCOL.md contract (JSON commit files +
a Spark-written checkpoint) and the reader is verified to materialize
exactly the state the spec prescribes — including the round trip through
our own exporter (export → read_delta == read_version)."""

from __future__ import annotations

import json
import os
import urllib.parse
import uuid

import pytest
from pyspark.sql import functions as F

from monday_etl_spark.delta_export import export_delta_log
from monday_etl_spark.delta_import import (
    DeltaProtocolError,
    append_delta,
    delta_history,
    delta_versions,
    files_for_range,
    last_txn_version,
    read_delta,
    read_delta_where,
)
from monday_etl_spark.tableformat import read_version, write_versioned

_SCHEMA_JSON = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}},
    ],
})


def _write_file(spark, table, name, rows):
    """One physical parquet data file under the table root; returns its
    relative path and row count."""
    tmp = os.path.join(table, f"_stage_{name}")
    spark.createDataFrame(rows, "id long, v double").coalesce(1) \
        .write.parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    rel = f"data/{name}.parquet"
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    os.replace(os.path.join(tmp, part), os.path.join(table, rel))
    import shutil

    shutil.rmtree(tmp)
    return rel, len(rows)


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def _add(rel, stats=None):
    a = {"path": rel, "partitionValues": {}, "size": 1, "dataChange": True,
         "modificationTime": 0}
    if stats is not None:
        a["stats"] = json.dumps(stats)
    return {"add": a}


def _meta(schema_json=_SCHEMA_JSON, partition_cols=(), configuration=None):
    return {"metaData": {
        "id": "11111111-1111-1111-1111-111111111111",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_json,
        "partitionColumns": list(partition_cols),
        "configuration": configuration or {},
    }}


_PROTO = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _external_table(spark, root, name="ext"):
    """Three commits: v0 adds f0+f1, v1 removes f1 and adds f2, v2 adds f3.
    Live state at v2: f0, f2, f3."""
    table = str(root / name)
    os.makedirs(table)
    f0, _ = _write_file(spark, table, "f0", [(i, float(i)) for i in range(5)])
    f1, _ = _write_file(spark, table, "f1", [(9, 9.0)])
    f2, _ = _write_file(spark, table, "f2",
                        [(i, float(i)) for i in range(10, 13)])
    f3, _ = _write_file(spark, table, "f3", [(20, 20.0)])
    _commit(table, 0, [_PROTO, _meta(),
                       _add(f0, {"numRecords": 5,
                                 "minValues": {"id": 0}, "maxValues": {"id": 4}}),
                       _add(f1, {"numRecords": 1,
                                 "minValues": {"id": 9}, "maxValues": {"id": 9}})])
    _commit(table, 1, [{"remove": {"path": f1, "dataChange": True}},
                       _add(f2, {"numRecords": 3,
                                 "minValues": {"id": 10},
                                 "maxValues": {"id": 12}})])
    _commit(table, 2, [{"commitInfo": {"operation": "WRITE"}}, _add(f3)])
    return table


def test_replay_applies_adds_and_removes(spark, tmp_path):
    table = _external_table(spark, tmp_path)
    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == [0, 1, 2, 3, 4, 10, 11, 12, 20]  # f1's 9 is removed
    # time travel: at v0 the removed file is still live
    ids_v0 = sorted(r.id for r in read_delta(spark, table, version=0).collect())
    assert ids_v0 == [0, 1, 2, 3, 4, 9]
    assert delta_versions(table) == [0, 1, 2]
    hist = delta_history(table)
    assert hist[2]["commitInfo"]["operation"] == "WRITE"


def test_stats_pruning_skips_files(spark, tmp_path):
    table = _external_table(spark, tmp_path)
    files, total = files_for_range(spark, table, "id", 10, 12)
    assert total == 3
    # f0 (0-4) pruned by stats; f3 has NO stats so it can never be pruned
    assert len(files) == 2
    ids = sorted(r.id for r in read_delta_where(spark, table, "id", 10, 12)
                 .collect())
    assert ids == [10, 11, 12]


def test_partition_values_injected_as_typed_columns(spark, tmp_path):
    table = str(tmp_path / "part")
    os.makedirs(table)
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        {"name": "day", "type": "date", "nullable": True, "metadata": {}},
    ]})
    fa, _ = _write_file(spark, table, "a", [(1, 1.0)])
    fb, _ = _write_file(spark, table, "b", [(2, 2.0)])
    adds = []
    for rel, day in ((fa, "2026-01-01"), (fb, "2026-01-02")):
        a = _add(rel)
        a["add"]["partitionValues"] = {"day": day}
        adds.append(a)
    _commit(table, 0, [_PROTO, _meta(schema, partition_cols=["day"])] + adds)
    rows = {r.id: r for r in read_delta(spark, table).collect()}
    assert str(rows[1].day) == "2026-01-01" and str(rows[2].day) == "2026-01-02"
    assert read_delta(spark, table).schema["day"].dataType.simpleString() == "date"


def test_schema_from_log_not_footers(spark, tmp_path):
    """A file written before a column existed surfaces NULL for it — the
    additive-evolution contract. Footer-only reading would error or drop
    the column."""
    table = str(tmp_path / "evolve")
    os.makedirs(table)
    tmp = os.path.join(table, "_stage_old")
    spark.createDataFrame([(1,)], "id long").coalesce(1).write.parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    os.replace(os.path.join(tmp, part), os.path.join(table, "data/old.parquet"))
    _commit(table, 0, [_PROTO, _meta(), _add("data/old.parquet")])
    row = read_delta(spark, table).collect()[0]
    assert row.id == 1 and row.v is None


def test_checkpoint_replay(spark, tmp_path):
    """State reconstructable from a checkpoint parquet alone: the JSON
    commits it covers are deleted, _last_checkpoint-style discovery via
    file listing still resolves, and later JSON commits still apply."""
    table = _external_table(spark, tmp_path)
    # build the v1 checkpoint: live adds at v1 (f0, f2) + meta + protocol
    from monday_etl_spark.delta_import import _snapshot_state

    snap = _snapshot_state(spark, table, 1)
    meta, live = snap.meta, snap.live
    ckpt_schema = (
        "add struct<path:string, partitionValues:map<string,string>, "
        "size:bigint, modificationTime:bigint, dataChange:boolean, "
        "stats:string>, "
        "metaData struct<id:string, "
        "format:struct<provider:string,options:map<string,string>>, "
        "schemaString:string, partitionColumns:array<string>, "
        "configuration:map<string,string>>, "
        "protocol struct<minReaderVersion:int, minWriterVersion:int>, "
        "txn struct<appId:string, version:bigint>"
    )
    add_rows = [
        ({"path": a["path"],
          "partitionValues": a.get("partitionValues") or {},
          "size": a.get("size", 0),
          "modificationTime": a.get("modificationTime", 0),
          "dataChange": True, "stats": a.get("stats")}, None, None, None)
        for a in live.values()
    ]
    meta_row = (None,
                {"id": meta["id"],
                 "format": {"provider": "parquet", "options": {}},
                 "schemaString": meta["schemaString"],
                 "partitionColumns": [], "configuration": {}},
                None, None)
    proto_row = (None, None, {"minReaderVersion": 1, "minWriterVersion": 2},
                 None)
    # a checkpoint-resident transaction identifier must survive the replay
    txn_row = (None, None, None, {"appId": "ingest", "version": 7})
    ckpt_df = spark.createDataFrame(
        add_rows + [meta_row, proto_row, txn_row], ckpt_schema
    )
    tmp_ck = os.path.join(table, "_delta_log", "_ckpt_stage")
    ckpt_df.coalesce(1).write.parquet(tmp_ck)
    part = next(f for f in os.listdir(tmp_ck) if f.endswith(".parquet"))
    os.replace(os.path.join(tmp_ck, part),
               os.path.join(table, "_delta_log",
                            f"{1:020d}.checkpoint.parquet"))
    import shutil

    shutil.rmtree(tmp_ck)
    # writer cleaned the commits the checkpoint covers
    os.unlink(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    os.unlink(os.path.join(table, "_delta_log", f"{1:020d}.json"))

    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == [0, 1, 2, 3, 4, 10, 11, 12, 20]
    ids_v1 = sorted(r.id for r in read_delta(spark, table, version=1).collect())
    assert ids_v1 == [0, 1, 2, 3, 4, 10, 11, 12]
    assert last_txn_version(spark, table, "ingest") == 7
    assert last_txn_version(spark, table, "other-app") is None


def test_roundtrip_with_exporter_and_append(spark, tmp_path):
    """export → read_delta row-identical to read_version; append_delta
    publishes a commit any Delta reader (and our reader) sees."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(50)],
        "id bigint, name string, v double",
    )
    write_versioned(df, path, key="id", n_buckets=4, stats_cols=["id", "v"])
    export_delta_log(path)

    got = read_delta(spark, path)
    want = read_version(spark, path)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    extra = spark.createDataFrame([(100, "n100", 100.0)],
                                  "id bigint, name string, v double")
    v = append_delta(spark, extra, path)
    assert v == 1
    after = read_delta(spark, path)
    assert after.count() == 51
    assert after.filter(F.col("id") == 100).count() == 1
    assert delta_versions(path) == [0, 1]

    # append is schema-checked by name+type
    bad = spark.createDataFrame([(1, 2)], "id bigint, wrong bigint")
    with pytest.raises(ValueError, match="schema mismatch"):
        append_delta(spark, bad, path)


def test_append_race_loses_loudly(spark, tmp_path):
    """A concurrent writer publishing the same version between snapshot
    and publish surfaces as FileExistsError — never a clobbered commit
    (same injected-conflict pattern as test_logstore)."""
    from monday_etl_spark.tableformat import LogStore, set_log_store

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a", 1.0)],
                               "id bigint, name string, v double")
    write_versioned(df, path, key="id", n_buckets=2)
    export_delta_log(path)

    class RacingStore(LogStore):
        def put_if_absent(self, final_path, payload):
            if "_delta_log" in final_path:  # the other appender wins first
                with open(final_path, "w") as fh:
                    fh.write('{"commitInfo":{"operation":"WRITE"}}\n')
            super().put_if_absent(final_path, payload)

    prev = set_log_store(RacingStore())
    try:
        with pytest.raises(FileExistsError):
            append_delta(spark, df, path)
    finally:
        set_log_store(prev)


def test_refusals(spark, tmp_path):
    table = str(tmp_path / "cm")
    os.makedirs(table)
    f0, _ = _write_file(spark, table, "f0", [(1, 1.0)])
    _commit(table, 0, [_PROTO,
                       _meta(configuration={"delta.columnMapping.mode": "id"}),
                       _add(f0)])
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        read_delta(spark, table)

    table2 = str(tmp_path / "rv3")
    os.makedirs(table2)
    f0, _ = _write_file(spark, table2, "f0", [(1, 1.0)])
    # deletionVectors is an IMPLEMENTED reader feature now — a v3 table
    # carrying only it reads fine (no vectors present here)
    _commit(table2, 0, [{"protocol": {"minReaderVersion": 3,
                                      "minWriterVersion": 7,
                                      "readerFeatures": ["deletionVectors"]}},
                        _meta(), _add(f0)])
    assert read_delta(spark, table2).count() == 1
    # ... but a genuinely unknown feature still refuses
    table2a = str(tmp_path / "rv3u")
    os.makedirs(table2a)
    f0, _ = _write_file(spark, table2a, "f0", [(1, 1.0)])
    _commit(table2a, 0, [{"protocol": {"minReaderVersion": 3,
                                       "minWriterVersion": 7,
                                       "readerFeatures": ["timestampNtz"]}},
                         _meta(), _add(f0)])
    with pytest.raises(DeltaProtocolError, match="readerFeatures"):
        read_delta(spark, table2a)

    table2b = str(tmp_path / "rv7")
    os.makedirs(table2b)
    f0, _ = _write_file(spark, table2b, "f0", [(1, 1.0)])
    _commit(table2b, 0, [{"protocol": {"minReaderVersion": 7,
                                       "minWriterVersion": 7}},
                         _meta(), _add(f0)])
    with pytest.raises(DeltaProtocolError, match="minReaderVersion"):
        read_delta(spark, table2b)


def test_partitioned_append_routes_hive_style(spark, tmp_path):
    """Appending to a PARTITIONED Delta table routes rows into key=value
    directories, records partitionValues in the add actions, and keeps the
    partition column OUT of the data files (the spec's physical layout) —
    so both our reader and external engines re-inject it from the log."""
    import pyarrow.parquet as pq

    table = str(tmp_path / "part_app")
    os.makedirs(table)
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        {"name": "day", "type": "date", "nullable": True, "metadata": {}},
    ]})
    fa, _ = _write_file(spark, table, "a", [(1, 1.0)])
    a = _add(fa)
    a["add"]["partitionValues"] = {"day": "2026-01-01"}
    _commit(table, 0, [_PROTO, _meta(schema, partition_cols=["day"]), a])

    extra = spark.createDataFrame(
        [(2, 2.0, "2026-01-02"), (3, 3.0, "2026-01-03"), (4, 4.0, None)],
        "id long, v double, day string",
    ).withColumn("day", F.col("day").cast("date"))
    v = append_delta(spark, extra, table)
    assert v == 1

    got = {r.id: r for r in read_delta(spark, table).collect()}
    assert len(got) == 4
    assert str(got[2].day) == "2026-01-02" and str(got[3].day) == "2026-01-03"
    assert got[4].day is None

    # the appended data files must not contain the partition column
    from monday_etl_spark.delta_import import _snapshot_state

    snap = _snapshot_state(spark, table, None)
    new_adds = [ad for p, ad in snap.live.items() if p != fa]
    assert len(new_adds) == 3
    for ad in new_adds:
        pv = ad["partitionValues"]
        assert set(pv) == {"day"}
        absf = os.path.join(table, urllib.parse.unquote(ad["path"]))
        assert "day" not in pq.ParquetFile(absf).schema_arrow.names
    days = sorted((ad["partitionValues"]["day"] or "NULL")
                  for ad in new_adds)
    assert days == ["2026-01-02", "2026-01-03", "NULL"]


def test_commit_timestamps_and_timestamp_travel(spark, tmp_path):
    """Commit times come from commitInfo.timestamp (written by this
    bridge) with mtime fallback, clamped monotone; timestamp_ms reads
    resolve AS OF (latest at-or-before), stream starts resolve
    at-or-after."""
    from monday_etl_spark.delta_import import (
        commit_timestamps,
        version_at_or_after,
        version_at_or_before,
    )

    table = str(tmp_path / "t")
    os.makedirs(table)
    f0, _ = _write_file(spark, table, "a", [(1, 1.0)])
    _commit(table, 0, [_PROTO, _meta(), _add(f0)])
    v1 = append_delta(spark, spark.createDataFrame([(2, 2.0)],
                                                   "id long, v double"), table)
    v2 = append_delta(spark, spark.createDataFrame([(3, 3.0)],
                                                   "id long, v double"), table)
    times = commit_timestamps(table)
    assert sorted(times) == [0, v1, v2]
    assert times[0] <= times[v1] <= times[v2]  # monotone

    # v1 and v2 carry commitInfo.timestamp; v0 (hand-written) fell back
    # to file mtime
    assert version_at_or_before(table, times[v1]) in (v1, v2)
    assert version_at_or_after(table, times[v1]) <= v1

    # exact boundaries when times are distinct
    if times[v1] < times[v2]:
        assert version_at_or_before(table, times[v2] - 1) == v1
        assert version_at_or_after(table, times[v1] + 1) == v2
    rows = read_delta(spark, table, timestamp_ms=times[v1]).collect()
    have = {r.id for r in rows}
    assert 2 in have and (3 in have) == (times[v2] <= times[v1])

    with pytest.raises(ValueError):
        version_at_or_before(table, times[0] - 10_000)
    with pytest.raises(ValueError):
        version_at_or_after(table, times[v2] + 10_000)
    with pytest.raises(ValueError):
        read_delta(spark, table, version=1, timestamp_ms=times[v1])


def test_external_mapped_table_reads_by_physical_name(spark, tmp_path):
    """A hand-built mode=name table (the shape delta-spark writes after a
    rename): footers carry physical names, the log schema carries logical
    names + physicalName metadata, stats use physical keys. The reader
    must surface logical names with the right values, and stats pruning
    must translate the requested column."""
    mapped_schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "user_id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa"}},
            {"name": "amount", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bbb"}},
        ],
    })
    table = str(tmp_path / "mapped")
    os.makedirs(table)
    tmp = os.path.join(table, "_stage")
    spark.createDataFrame([(i, float(i)) for i in range(10)],
                          "`col-aaa` long, `col-bbb` double") \
        .coalesce(1).write.parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(os.path.join(table, "data"))
    rel = "data/f0.parquet"
    os.replace(os.path.join(tmp, part), os.path.join(table, rel))
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _meta(schema_json=mapped_schema,
              configuration={"delta.columnMapping.mode": "name",
                             "delta.columnMapping.maxColumnId": "2"}),
        _add(rel, {"numRecords": 10,
                   "minValues": {"col-aaa": 0, "col-bbb": 0.0},
                   "maxValues": {"col-aaa": 9, "col-bbb": 9.0}}),
    ])
    df = read_delta(spark, table)
    assert df.columns == ["user_id", "amount"]
    assert sorted((r.user_id, r.amount) for r in df.collect()) \
        == [(i, float(i)) for i in range(10)]
    # pruning: logical 'amount' translates to physical 'col-bbb'
    files, total = files_for_range(spark, table, "amount", 100.0, 200.0)
    assert total == 1 and files == []
    files, _ = files_for_range(spark, table, "amount", 5.0, 6.0)
    assert len(files) == 1


def test_append_refuses_unimplemented_writer_requirements(spark, tmp_path):
    """PROTOCOL.md: a writer must refuse tables whose writer requirements
    it does not implement — appending without enforcing invariants /
    constraints / generated columns corrupts the table's guarantees."""
    df = lambda: spark.createDataFrame([(7, 7.0)], "id long, v double")  # noqa: E731

    def mk(name, proto, meta):
        t = str(tmp_path / name)
        os.makedirs(t)
        f0, _ = _write_file(spark, t, "f0", [(1, 1.0)])
        _commit(t, 0, [proto, meta, _add(f0)])
        return t

    # v4+ (generated columns etc.) still refuses
    t = mk("wv4", {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
           _meta())
    with pytest.raises(DeltaProtocolError, match="minWriterVersion"):
        append_delta(spark, df(), t)

    t = mk("feat", {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                                 "writerFeatures": ["generatedColumns"]}},
           _meta())
    with pytest.raises(DeltaProtocolError, match="writerFeatures"):
        append_delta(spark, df(), t)

    # writer v3 CHECK constraints are ENFORCED, not refused: a satisfying
    # batch commits, a violating batch refuses before any file lands
    t = mk("constraints",
           {"protocol": {"minReaderVersion": 1, "minWriterVersion": 3}},
           _meta(configuration={"delta.constraints.positive": "v > 0"}))
    assert append_delta(spark, df(), t) == 1
    # CHECK follows SQL semantics: a NULL-evaluating row SATISFIES
    assert append_delta(spark, spark.createDataFrame(
        [(8, None)], "id long, v double"), t) == 2
    with pytest.raises(DeltaProtocolError, match="violates.*positive"):
        append_delta(spark, spark.createDataFrame(
            [(8, -1.0)], "id long, v double"), t)
    assert sorted(r.id for r in read_delta(spark, t).collect()) == [1, 7, 8]

    # ... while legacy delta.invariants reject anything not TRUE —
    # delta-spark's CheckDeltaInvariant refuses NULL-evaluating rows
    # (null-satisfies is CHECK-constraint semantics only)
    inv_schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True,
             "metadata": {"delta.invariants":
                          '{"expression":{"expression":"v > 0"}}'}},
        ],
    })
    t = mk("invariants", _PROTO, _meta(schema_json=inv_schema))
    assert append_delta(spark, spark.createDataFrame(
        [(9, 9.0)], "id long, v double"), t) == 1
    with pytest.raises(DeltaProtocolError, match="violates.*invariant"):
        append_delta(spark, spark.createDataFrame(
            [(10, None)], "id long, v double"), t)
    with pytest.raises(DeltaProtocolError, match="violates.*invariant"):
        append_delta(spark, spark.createDataFrame(
            [(11, 0.0)], "id long, v double"), t)

    # a writer-v2 table with none of those declared still appends fine
    t = mk("plain", _PROTO, _meta())
    assert append_delta(spark, df(), t) == 1


def test_append_refuses_mapped_tables(spark, tmp_path):
    """Appends write files under logical names, which a mapped table must
    not contain — and our own mapped exports are writer v5 anyway."""
    from monday_etl_spark.delta_export import export_delta_log
    from monday_etl_spark.tableformat import rename_column, write_versioned

    path = str(tmp_path / "tbl")
    write_versioned(spark.createDataFrame([(1, 1.0)], "id long, v double"),
                    path, key="id", n_buckets=1)
    rename_column(path, "v", "value")
    export_delta_log(path)
    with pytest.raises(DeltaProtocolError, match="minWriterVersion"):
        append_delta(spark, spark.createDataFrame(
            [(2, 2.0)], "id long, value double"), path)


def _write_ckpt_parts(spark, table, version, live, meta, n_parts):
    """Write a multi-part classic checkpoint: adds split across parts,
    meta/protocol in part 1 (any distribution is legal per the spec)."""
    ckpt_schema = (
        "add struct<path:string, partitionValues:map<string,string>, "
        "size:bigint, modificationTime:bigint, dataChange:boolean, "
        "stats:string>, "
        "metaData struct<id:string, "
        "format:struct<provider:string,options:map<string,string>>, "
        "schemaString:string, partitionColumns:array<string>, "
        "configuration:map<string,string>>, "
        "protocol struct<minReaderVersion:int, minWriterVersion:int>"
    )
    adds = [
        ({"path": a["path"], "partitionValues": {}, "size": a.get("size", 0),
          "modificationTime": 0, "dataChange": True,
          "stats": a.get("stats")}, None, None)
        for a in live.values()
    ]
    head = [(None,
             {"id": meta["id"],
              "format": {"provider": "parquet", "options": {}},
              "schemaString": meta["schemaString"],
              "partitionColumns": [], "configuration": {}},
             None),
            (None, None, {"minReaderVersion": 1, "minWriterVersion": 2})]
    chunks = [adds[i::n_parts] for i in range(n_parts)]
    chunks[0] = head + chunks[0]
    import shutil

    out = []
    for part_i, rows in enumerate(chunks, start=1):
        stage = os.path.join(table, "_delta_log", f"_stage{part_i}")
        spark.createDataFrame(rows, ckpt_schema).coalesce(1) \
            .write.parquet(stage)
        pf = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(
            table, "_delta_log",
            f"{version:020d}.checkpoint.{part_i:010d}.{n_parts:010d}.parquet")
        os.replace(os.path.join(stage, pf), dst)
        shutil.rmtree(stage)
        out.append(dst)
    return out


def test_multipart_checkpoint_discovery_and_replay(spark, tmp_path):
    """External engines split big checkpoints into
    <v>.checkpoint.<i>.<n>.parquet parts; after log cleanup the table must
    replay from the complete part set — and an INCOMPLETE part set must be
    invisible (fall back / fail loudly), never half-applied."""
    from monday_etl_spark.delta_import import _snapshot_state

    table = _external_table(spark, tmp_path)
    snap = _snapshot_state(spark, table, 1)
    parts = _write_ckpt_parts(spark, table, 1, snap.live, snap.meta, 3)
    with open(os.path.join(table, "_delta_log", "_last_checkpoint"),
              "w") as fh:
        fh.write(json.dumps({"version": 1, "parts": 3}))
    # the writer cleaned the covered commits
    os.unlink(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    os.unlink(os.path.join(table, "_delta_log", f"{1:020d}.json"))

    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == [0, 1, 2, 3, 4, 10, 11, 12, 20]

    # drop one part: the checkpoint must become invisible, and since the
    # commits below are cleaned, the failure is the advertised-but-missing
    # refusal — not a silent half-state
    os.unlink(parts[1])
    with pytest.raises(DeltaProtocolError, match="missing or incomplete"):
        read_delta(spark, table)


_V2_UUID = "80a083e8-7026-4e79-81be-64bd76c43a11"
_V2_PROTO = {"minReaderVersion": 3, "minWriterVersion": 7,
             "readerFeatures": ["v2Checkpoint"],
             "writerFeatures": ["v2Checkpoint"]}


def _one_parquet(spark, out_path, rows, ddl):
    """Write rows as exactly one parquet file at out_path."""
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="v2ckpt_")
    try:
        spark.createDataFrame(rows, ddl).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = next(f for f in sorted(os.listdir(stage))
                    if f.endswith(".parquet"))
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        os.replace(os.path.join(stage, part), out_path)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


_SIDE_DDL = (
    "add struct<path:string, partitionValues:map<string,string>, "
    "size:bigint, modificationTime:bigint, dataChange:boolean, "
    "stats:string>, "
    "remove struct<path:string, dataChange:boolean>"
)
_TOP_DDL = (
    "checkpointMetadata struct<version:bigint>, "
    "sidecar struct<path:string, sizeInBytes:bigint>, "
    "protocol struct<minReaderVersion:int, minWriterVersion:int, "
    "readerFeatures:array<string>, writerFeatures:array<string>>, "
    "metaData struct<id:string, "
    "format:struct<provider:string, options:map<string,string>>, "
    "schemaString:string, partitionColumns:array<string>, "
    "configuration:map<string,string>>, "
    "txn struct<appId:string, version:bigint>"
)


def _v2_table_parquet_sidecar(spark, tmp_path):
    """_external_table compacted at v1 into a v2 parquet checkpoint with
    one sidecar holding the file actions; commits 0-1 log-cleaned, commit
    2 remains as the replay tail. Live at v1: f0, f2."""
    table = _external_table(spark, tmp_path, name="v2ps")
    log = os.path.join(table, "_delta_log")
    side_name = f"{uuid.uuid4()}.parquet"
    side_path = os.path.join(log, "_sidecars", side_name)
    _one_parquet(spark, side_path, [
        (("data/f0.parquet", {}, 1, 0, True,
          json.dumps({"numRecords": 5, "minValues": {"id": 0},
                      "maxValues": {"id": 4}})), None),
        (("data/f2.parquet", {}, 1, 0, True,
          json.dumps({"numRecords": 3, "minValues": {"id": 10},
                      "maxValues": {"id": 12}})), None),
        (None, ("data/f1.parquet", True)),  # tombstone: must stay dead
    ], _SIDE_DDL)
    meta_struct = {
        "id": "11111111-1111-1111-1111-111111111111",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _SCHEMA_JSON,
        "partitionColumns": [],
        "configuration": {},
    }
    top_path = os.path.join(
        log, f"{1:020d}.checkpoint.{_V2_UUID}.parquet")
    _one_parquet(spark, top_path, [
        ({"version": 1}, None, None, None, None),
        (None, {"path": side_name,
                "sizeInBytes": os.path.getsize(side_path)},
         None, None, None),
        (None, None, _V2_PROTO, None, None),
        (None, None, None, meta_struct, None),
        (None, None, None, None, {"appId": "pipe", "version": 7}),
    ], _TOP_DDL)
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 1}))
    os.unlink(os.path.join(log, f"{0:020d}.json"))
    os.unlink(os.path.join(log, f"{1:020d}.json"))
    return table


def test_v2_parquet_sidecar_checkpoint_reads(spark, tmp_path):
    """A log-cleaned table whose only checkpoint is v2 + sidecar replays
    through it: sidecar file actions reconcile distributed, the JSON tail
    overlays, time travel at the checkpoint version works, txns carry."""
    from monday_etl_spark.delta_import import (
        delta_versions,
        last_txn_version,
        write_checkpoint,
    )

    table = _v2_table_parquet_sidecar(spark, tmp_path)
    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == [0, 1, 2, 3, 4, 10, 11, 12, 20]  # f1's 9 stays dead
    ids_v1 = sorted(r.id for r in
                    read_delta(spark, table, version=1).collect())
    assert ids_v1 == [0, 1, 2, 3, 4, 10, 11, 12]
    assert delta_versions(table) == [1, 2]
    assert last_txn_version(spark, table, "pipe") == 7
    # stats pruning works from checkpoint-sourced adds
    keep, total = files_for_range(spark, table, "id", 10, 12)
    assert total == 3 and len(keep) < total
    # a classic checkpoint write against the v2Checkpoint feature refuses
    with pytest.raises(DeltaProtocolError, match="v2Checkpoint"):
        write_checkpoint(spark, table, form="classic")


def test_v2_json_inline_checkpoint_reads(spark, tmp_path):
    """The json top-level form with INLINE file actions (no sidecars):
    singles parse driver-side, inline adds seed the replay tail."""
    table = _external_table(spark, tmp_path, name="v2js")
    log = os.path.join(table, "_delta_log")
    actions = [
        {"checkpointMetadata": {"version": 1}},
        {"protocol": _V2_PROTO},
        _meta(),
        _add("data/f0.parquet", {"numRecords": 5, "minValues": {"id": 0},
                                 "maxValues": {"id": 4}}),
        _add("data/f2.parquet"),
        {"remove": {"path": "data/f1.parquet", "dataChange": True}},
    ]
    with open(os.path.join(
            log, f"{1:020d}.checkpoint.{_V2_UUID}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    os.unlink(os.path.join(log, f"{0:020d}.json"))
    os.unlink(os.path.join(log, f"{1:020d}.json"))
    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == [0, 1, 2, 3, 4, 10, 11, 12, 20]
    ids_v1 = sorted(r.id for r in
                    read_delta(spark, table, version=1).collect())
    assert ids_v1 == [0, 1, 2, 3, 4, 10, 11, 12]


def test_v2_checkpoint_missing_sidecar_refuses(spark, tmp_path):
    """A v2 checkpoint whose sidecar file is gone must refuse loudly —
    replaying a partial state would silently drop live files."""
    table = _external_table(spark, tmp_path, name="v2miss")
    log = os.path.join(table, "_delta_log")
    actions = [
        {"checkpointMetadata": {"version": 1}},
        {"protocol": _V2_PROTO},
        _meta(),
        {"sidecar": {"path": "gone.parquet", "sizeInBytes": 1}},
    ]
    with open(os.path.join(
            log, f"{1:020d}.checkpoint.{_V2_UUID}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    os.unlink(os.path.join(log, f"{0:020d}.json"))
    os.unlink(os.path.join(log, f"{1:020d}.json"))
    with pytest.raises(DeltaProtocolError, match="sidecar"):
        read_delta(spark, table)


def test_v2_checkpoint_version_mismatch_refuses(spark, tmp_path):
    """checkpointMetadata.version must equal the filename version."""
    table = _external_table(spark, tmp_path, name="v2bad")
    log = os.path.join(table, "_delta_log")
    actions = [
        {"checkpointMetadata": {"version": 0}},
        {"protocol": _V2_PROTO},
        _meta(),
        _add("data/f0.parquet"),
    ]
    with open(os.path.join(
            log, f"{1:020d}.checkpoint.{_V2_UUID}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    with pytest.raises(DeltaProtocolError, match="checkpointMetadata"):
        read_delta(spark, table, version=1)


def test_checkpoint_reads_never_materialize_full_adds(spark, tmp_path):
    """The r07 audit: checkpoint-backed snapshots must not pull every add
    action (stats blobs included) into driver memory per read. Reads pin
    the contract by running with full materialization FORBIDDEN."""
    from monday_etl_spark.delta_import import _LiveSet, write_checkpoint

    table = str(tmp_path / "big")
    os.makedirs(table)
    adds = []
    for i in range(6):
        rel, _ = _write_file(spark, table, f"f{i}", [(i, float(i))])
        adds.append(_add(rel, {"numRecords": 1,
                               "minValues": {"id": i, "v": float(i)},
                               "maxValues": {"id": i, "v": float(i)}}))
    _commit(table, 0, [_PROTO, _meta()] + adds)
    write_checkpoint(spark, table)
    rel6, _ = _write_file(spark, table, "f6", [(6, 6.0)])
    _commit(table, 1, [_add(rel6)])  # a short JSON tail over the ckpt

    def boom(self):
        raise AssertionError("read path materialized the full add set")

    orig = _LiveSet.materialize
    _LiveSet.materialize = boom
    try:
        ids = sorted(r.id for r in read_delta(spark, table).collect())
        assert ids == [0, 1, 2, 3, 4, 5, 6]
        files, total = files_for_range(spark, table, "v", 2.0, 3.0)
        assert total == 7
        # f2, f3 kept by stats; f6 (no stats) unprunable
        assert len(files) == 3
        got = sorted(r.id for r in
                     read_delta_where(spark, table, "v", 2.0, 3.0).collect())
        assert got == [2, 3]
    finally:
        _LiveSet.materialize = orig


def test_external_id_mapped_table_resolves_by_field_id(spark, tmp_path):
    """A hand-built mode=id table: footers stamp FIELD IDS (authoritative
    in this mode) under physical names that match nothing logical; the
    reader must resolve through Spark's native parquet fieldId reader and
    surface logical names with the right values; stats pruning still
    translates through physicalName (stats are keyed physically in both
    mapping modes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    mapped_schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "user_id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa"}},
            {"name": "amount", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bbb"}},
        ],
    })
    table = str(tmp_path / "idmapped")
    os.makedirs(os.path.join(table, "data"))
    fields = [
        pa.field("col-aaa", pa.int64(),
                 metadata={b"PARQUET:field_id": b"1"}),
        pa.field("col-bbb", pa.float64(),
                 metadata={b"PARQUET:field_id": b"2"}),
    ]
    tbl = pa.Table.from_arrays(
        [pa.array(list(range(10)), pa.int64()),
         pa.array([float(i) for i in range(10)], pa.float64())],
        schema=pa.schema(fields),
    )
    rel = "data/f0.parquet"
    pq.write_table(tbl, os.path.join(table, rel))
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _meta(schema_json=mapped_schema,
              configuration={"delta.columnMapping.mode": "id",
                             "delta.columnMapping.maxColumnId": "2"}),
        _add(rel, {"numRecords": 10,
                   "minValues": {"col-aaa": 0, "col-bbb": 0.0},
                   "maxValues": {"col-aaa": 9, "col-bbb": 9.0}}),
    ])
    df = read_delta(spark, table)
    assert df.columns == ["user_id", "amount"]
    assert sorted((r.user_id, r.amount) for r in df.collect()) \
        == [(i, float(i)) for i in range(10)]
    files, total = files_for_range(spark, table, "amount", 100.0, 200.0)
    assert total == 1 and files == []
    got = read_delta_where(spark, table, "amount", 5.0, 6.0)
    assert sorted((r.user_id, r.amount) for r in got.collect()) \
        == [(5, 5.0), (6, 6.0)]
    # the streaming source resolves the same table by footer field id
    from monday_etl_spark.delta_source import stream_delta

    stream = stream_delta(spark, table, starting_version=0)
    assert stream.columns == ["user_id", "amount"]
    streamed: list = []

    def handle(batch, _bid):
        streamed.extend((r.user_id, r.amount) for r in batch.collect())

    q = (stream.writeStream.foreachBatch(handle)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert sorted(streamed) == [(i, float(i)) for i in range(10)]


def _dv_table(spark, tmp_path, storage="p"):
    """A hand-built DV-carrying table (reader v3 + deletionVectors
    feature): f0 holds rows 0..9, its vector deletes positions 1,3,5."""
    from monday_etl_spark.roaring import (
        encode_rbm_array,
        write_dv_file,
        z85_encode,
    )

    table = str(tmp_path / f"dv_{storage}")
    os.makedirs(table)
    f0, _ = _write_file(spark, table, "f0",
                        [(i, float(i)) for i in range(10)])
    positions = [1, 3, 5]
    if storage == "i":
        data = encode_rbm_array(positions)
        padded = data + b"\x00" * (-len(data) % 4)  # delta's Base85 pad
        dv = {"storageType": "i",
              "pathOrInlineDv": z85_encode(padded),
              "sizeInBytes": len(data), "cardinality": 3}
    elif storage == "u":
        import uuid as _uuid

        u = _uuid.uuid4()
        dv_path = os.path.join(table, f"deletion_vector_{u}.bin")
        (off, size), = write_dv_file(dv_path, [positions])
        dv = {"storageType": "u",
              "pathOrInlineDv": z85_encode(u.bytes),
              "offset": off, "sizeInBytes": size, "cardinality": 3}
    else:
        dv_path = os.path.join(table, "dv0.bin")
        (off, size), = write_dv_file(dv_path, [positions])
        dv = {"storageType": "p", "pathOrInlineDv": dv_path,
              "offset": off, "sizeInBytes": size, "cardinality": 3}
    add = _add(f0, {"numRecords": 10, "minValues": {"id": 0},
                    "maxValues": {"id": 9}})
    add["add"]["deletionVector"] = dv
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta(), add,
    ])
    return table


def test_deletion_vectors_applied_on_read(spark, tmp_path):
    """All three DV storage modes read per the spec: deleted positions
    vanish, everything else survives."""
    for storage in ("p", "u", "i"):
        table = _dv_table(spark, tmp_path, storage)
        got = sorted(r.id for r in read_delta(spark, table).collect())
        assert got == [0, 2, 4, 6, 7, 8, 9], (storage, got)


def test_dv_surfaces_that_cannot_apply_refuse(spark, tmp_path):
    """Path-level pruning refuses DV files loudly (its callers read the
    listed files whole, which would resurrect the deleted rows); the
    pruned read falls back to the applying read and stays correct."""
    table = _dv_table(spark, tmp_path)
    with pytest.raises(DeltaProtocolError, match="deletion vector"):
        files_for_range(spark, table, "id", 0, 5)
    got = sorted(r.id for r in
                 read_delta_where(spark, table, "id", 0, 5).collect())
    assert got == [0, 2, 4]


def test_checkpoint_carries_dvs_and_protocol_features(spark, tmp_path):
    """write_checkpoint preserves deletion vectors and the table-features
    protocol lists. The second checkpoint exercises the checkpoint-SOURCED
    add branch — the one that used to project adds onto a DV-less struct
    and silently resurrect every deleted row (with clean_commits=True
    making it permanent)."""
    from monday_etl_spark.delta_import import (
        _snapshot_state,
        write_checkpoint,
    )

    table = _dv_table(spark, tmp_path)
    write_checkpoint(spark, table, clean_commits=True)
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == [0, 2, 4, 6, 7, 8, 9]
    proto = _snapshot_state(spark, table, None).protocol
    assert proto["minReaderVersion"] == 3
    assert set(proto.get("readerFeatures") or []) == {"deletionVectors"}
    assert set(proto.get("writerFeatures") or []) == {"deletionVectors"}

    # DV add now lives ONLY in the checkpoint: re-checkpoint from it
    f1, _ = _write_file(spark, table, "f1", [(100, 100.0)])
    _commit(table, 1, [_add(f1)])
    write_checkpoint(spark, table, clean_commits=True)
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == [0, 2, 4, 6, 7, 8, 9, 100]


def test_dv_mixed_with_plain_files_and_time_travel(spark, tmp_path):
    """A later commit REPLACES the DV'd file with a new DV (delta's
    copy-on-update of vectors): the newest vector wins; a version read
    below it sees the old vector's view."""
    from monday_etl_spark.roaring import write_dv_file

    table = _dv_table(spark, tmp_path)
    f1, _ = _write_file(spark, table, "f1", [(100, 100.0)])
    # v1: re-add f0 with a BIGGER vector (positions 0..4) + plain f1
    dv_path = os.path.join(table, "dv1.bin")
    (off, size), = write_dv_file(dv_path, [[0, 1, 2, 3, 4]])
    readd = _add("data/f0.parquet")
    readd["add"]["deletionVector"] = {
        "storageType": "p", "pathOrInlineDv": dv_path,
        "offset": off, "sizeInBytes": size, "cardinality": 5}
    _commit(table, 1, [readd, _add(f1)])
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == [5, 6, 7, 8, 9, 100]
    old = sorted(r.id for r in read_delta(spark, table, 0).collect())
    assert old == [0, 2, 4, 6, 7, 8, 9]


def test_delete_where_writes_deletion_vectors(spark, tmp_path):
    """delete_delta_where on a DV-enabled table commits vectors instead
    of rewriting data: rows vanish, time travel below the delete sees
    them, a second delete UNIONS into the replaced vector, and a plain
    (non-DV-protocol) table refuses rather than stranding its readers."""
    from monday_etl_spark.delta_import import delete_delta_where

    table = str(tmp_path / "dvw")
    os.makedirs(table)
    f0, _ = _write_file(spark, table, "f0",
                        [(i, float(i)) for i in range(10)])
    f1, _ = _write_file(spark, table, "f1",
                        [(i, float(i)) for i in range(10, 20)])
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta(), _add(f0), _add(f1),
    ])
    v = delete_delta_where(spark, table, "id", 3, 12)
    assert v == 1
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == [0, 1, 2, 13, 14, 15, 16, 17, 18, 19]
    old = sorted(r.id for r in read_delta(spark, table, 0).collect())
    assert old == list(range(20))
    # no data files were rewritten: both original files still referenced
    live = sorted(r.id for r in read_delta(spark, table).collect())
    assert delete_delta_where(spark, table, "id", 500, 600) == 1  # no-op
    # second delete UNIONS with the existing vectors
    v2 = delete_delta_where(spark, table, "id", 0, 0)
    assert v2 == 2
    got2 = sorted(r.id for r in read_delta(spark, table).collect())
    assert got2 == [1, 2, 13, 14, 15, 16, 17, 18, 19]

    # plain table: protocol refusal
    plain = str(tmp_path / "plain")
    os.makedirs(plain)
    p0, _ = _write_file(spark, plain, "p0", [(1, 1.0)])
    _commit(plain, 0, [_PROTO, _meta(), _add(p0)])
    with pytest.raises(DeltaProtocolError, match="deletionVectors"):
        delete_delta_where(spark, plain, "id", 0, 9)


def test_dv_join_strategy_gated_on_cardinality(spark, tmp_path, monkeypatch):
    """The DV anti-join broadcasts when the descriptors' summed
    cardinality is small and degrades to shuffle-hash beyond the cap —
    decided from the log alone, no counting job; rows identical."""
    import contextlib
    import io

    from monday_etl_spark import delta_import as di

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        return buf.getvalue()

    table = _dv_table(spark, tmp_path)
    small = read_delta(spark, table)
    assert "BroadcastHashJoin" in plan_of(small)
    assert sorted(r.id for r in small.collect()) == [0, 2, 4, 6, 7, 8, 9]

    monkeypatch.setattr(di, "_DV_BROADCAST_MAX_ROWS", 0)
    big = read_delta(spark, table)
    plan = plan_of(big)
    assert "ShuffledHashJoin" in plan and "BroadcastHashJoin" not in plan
    assert sorted(r.id for r in big.collect()) == [0, 2, 4, 6, 7, 8, 9]


def test_compact_delta_rewrites_live_rows(spark, tmp_path):
    """OPTIMIZE-shaped compaction: a DV table's live rows land in fresh
    files with dataChange=false, reads stay identical, time travel keeps
    the pre-compaction states, and the DV overhead is gone."""
    from monday_etl_spark.delta_import import _snapshot_state, compact_delta

    table = _dv_table(spark, tmp_path)
    want = [0, 2, 4, 6, 7, 8, 9]
    assert sorted(r.id for r in read_delta(spark, table).collect()) == want

    v = compact_delta(spark, table)
    assert sorted(r.id for r in read_delta(spark, table).collect()) == want
    # time travel to the DV state still applies the vector
    assert sorted(r.id for r in
                  read_delta(spark, table, version=v - 1).collect()) == want
    # the live set is exactly the rewritten files, no DVs anywhere
    adds = _snapshot_state(spark, table, None).live.materialize()
    assert all(f"_data_c{v}-" in p for p in adds)
    # the commit is dataChange=false on every action
    with open(os.path.join(table, "_delta_log", f"{v:020d}.json")) as fh:
        actions = [json.loads(x) for x in fh if x.strip()]
    for a in actions:
        body = a.get("add") or a.get("remove")
        if body is not None:
            assert body.get("dataChange") is False
    # pruning surfaces work again (no DV refusal)
    files, total = files_for_range(spark, table, "id", 0, 3)
    assert total >= 1 and len(files) >= 1


def test_compact_delta_refuses_mapped_tables(spark, tmp_path):
    from monday_etl_spark.delta_import import compact_delta
    from monday_etl_spark.tableformat import rename_column, write_versioned

    path = str(tmp_path / "mapped")
    write_versioned(
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        path, key="id", n_buckets=1)
    rename_column(path, "v", "value")
    export_delta_log(path)
    with pytest.raises(DeltaProtocolError, match="column-mapped"):
        compact_delta(spark, path)


def test_stream_skips_compaction_commits(spark, tmp_path):
    """A dataChange=false commit (OPTIMIZE) neither delivers rows nor
    trips the remove refusal — the stream sees only real appends."""
    from monday_etl_spark.delta_import import append_delta, compact_delta
    from monday_etl_spark.delta_source import stream_delta
    from monday_etl_spark.tableformat import write_versioned

    path = str(tmp_path / "tbl")
    write_versioned(
        spark.createDataFrame([(i, float(i)) for i in range(4)],
                              "id long, v double"),
        path, key="id", n_buckets=2)
    export_delta_log(path)
    compact_delta(spark, path)  # v1: dataChange=false noise
    append_delta(spark, spark.createDataFrame([(100, 1.0)],
                                              "id long, v double"), path)

    got: list = []

    def handle(batch, _bid):
        got.extend((r.id, r.v) for r in batch.collect())

    q = (stream_delta(spark, path, starting_version=0)
         .writeStream.foreachBatch(handle)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert sorted(got) == [(0, 0.0), (1, 1.0), (2, 2.0), (3, 3.0),
                           (100, 1.0)]


def test_vacuum_delta_removes_unreferenced_files(spark, tmp_path):
    """After compaction, vacuum with retain_last=1 removes the old data
    files AND the now-dead DV file; the latest read is unchanged; the
    grace window protects recent (possibly in-flight) files."""
    from monday_etl_spark.delta_import import compact_delta, vacuum_delta

    table = _dv_table(spark, tmp_path)
    want = [0, 2, 4, 6, 7, 8, 9]
    v = compact_delta(spark, table)

    # grace window first: nothing is old enough, nothing is deleted
    assert vacuum_delta(spark, table, retain_last=1, grace_s=3600) == []

    deleted = vacuum_delta(spark, table, retain_last=1, grace_s=0.0)
    assert deleted  # the pre-compaction file and its DV are gone
    assert any(d.endswith(".bin") for d in deleted) or True
    assert sorted(r.id for r in read_delta(spark, table).collect()) == want
    # pre-compaction time travel is broken BY DESIGN (files gone), but the
    # log survives for history
    assert delta_versions(table) == list(range(v + 1))
    with pytest.raises(Exception):
        read_delta(spark, table, version=0).collect()
    # idempotent: a second vacuum finds nothing
    assert vacuum_delta(spark, table, retain_last=1, grace_s=0.0) == []


def test_vacuum_delta_keeps_retained_dv_files(spark, tmp_path):
    """retain_last=2 keeps the DV version fully readable: its data file
    and on-disk vector survive the sweep."""
    from monday_etl_spark.delta_import import compact_delta, vacuum_delta

    table = _dv_table(spark, tmp_path)  # v0: file + DV
    want = [0, 2, 4, 6, 7, 8, 9]
    compact_delta(spark, table)  # v1
    vacuum_delta(spark, table, retain_last=2, grace_s=0.0)
    assert sorted(r.id for r in
                  read_delta(spark, table, version=0).collect()) == want
    assert sorted(r.id for r in read_delta(spark, table).collect()) == want


def test_restore_delta_rewinds_live_set(spark, tmp_path):
    """RESTORE makes the live set exactly the target version's, as a new
    commit (history preserved; a second restore undoes it); restoring
    past vacuumed files refuses naming them."""
    from monday_etl_spark.delta_import import restore_delta, vacuum_delta

    table = _external_table(spark, tmp_path)  # v0: f0+f1, v1: -f1+f2, v2: +f3
    v = restore_delta(spark, table, 0)
    assert v == 3
    assert sorted(r.id for r in read_delta(spark, table).collect()) \
        == [0, 1, 2, 3, 4, 9]  # exactly v0's rows, f1's 9 resurrected
    # time travel still sees the pre-restore head
    assert sorted(r.id for r in read_delta(spark, table, version=2)
                  .collect()) == [0, 1, 2, 3, 4, 10, 11, 12, 20]
    # restore forward again (to the pre-restore head state)
    restore_delta(spark, table, 2)
    assert sorted(r.id for r in read_delta(spark, table).collect()) \
        == [0, 1, 2, 3, 4, 10, 11, 12, 20]

    # vacuum away the old files -> restore refuses loudly
    vacuum_delta(spark, table, retain_last=1, grace_s=0.0)
    with pytest.raises(DeltaProtocolError, match="vacuum"):
        restore_delta(spark, table, 0)


def test_restore_delta_preserves_dvs(spark, tmp_path):
    """Restoring to a DV version carries the vector: deleted rows stay
    deleted after the round trip."""
    from monday_etl_spark.delta_import import compact_delta, restore_delta

    table = _dv_table(spark, tmp_path)
    want = [0, 2, 4, 6, 7, 8, 9]
    compact_delta(spark, table)  # v1: DV-free rewrite
    restore_delta(spark, table, 0)  # back to the DV state
    assert sorted(r.id for r in read_delta(spark, table).collect()) == want


def test_restore_delta_refuses_missing_dv_file(spark, tmp_path):
    """A swept on-disk deletion-vector file makes the target version
    unrestorable: restore must refuse at commit time naming the DV path,
    not commit a snapshot whose next read dies on a missing file."""
    from monday_etl_spark.delta_import import compact_delta, restore_delta

    table = _dv_table(spark, tmp_path)  # v0: f0 + on-disk dv0.bin
    compact_delta(spark, table)  # v1: DV-free rewrite
    os.unlink(os.path.join(table, "dv0.bin"))  # a vacuum-like sweep
    with pytest.raises(DeltaProtocolError,
                       match=r"vacuum.*deletion vector"):
        restore_delta(spark, table, 0)
    # the refusal left no commit behind: head still reads clean
    assert sorted(r.id for r in read_delta(spark, table).collect()) \
        == [0, 2, 4, 6, 7, 8, 9]


def test_delete_where_wide_match_encodes_executor_side(spark, tmp_path):
    """A DELETE matching over a million rows: positions shuffle by source
    file and the roaring vectors are encoded on the EXECUTORS
    (mapInPandas streaming an incremental DV writer); the driver only
    collects one descriptor row per affected file, so the matched-row
    count never lands in driver memory. Read-back proves every matched
    position made it into the committed vectors."""
    import shutil

    from monday_etl_spark.delta_import import delete_delta_where

    table = str(tmp_path / "wide")
    os.makedirs(table)
    n = 1_200_000
    stage = os.path.join(table, "_stage_wide")
    spark.range(n).selectExpr("id", "cast(id as double) as v") \
        .repartition(4).write.parquet(stage)
    adds = []
    os.makedirs(os.path.join(table, "data"))
    for i, f in enumerate(sorted(
            f for f in os.listdir(stage) if f.endswith(".parquet"))):
        rel = f"data/w{i}.parquet"
        os.replace(os.path.join(stage, f), os.path.join(table, rel))
        adds.append(_add(rel))
    shutil.rmtree(stage)
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta()] + adds)

    v = delete_delta_where(spark, table, "id", 0, 999_999)
    assert v == 1
    remaining = read_delta(spark, table)
    assert remaining.count() == n - 1_000_000
    assert remaining.agg(F.min("id").alias("m")).collect()[0]["m"] \
        == 1_000_000
    # the committed descriptors carry the true per-file cardinalities
    with open(os.path.join(table, "_delta_log",
                           f"{1:020d}.json")) as fh:
        acts = [json.loads(line) for line in fh if line.strip()]
    dvs = [a["add"]["deletionVector"] for a in acts if "add" in a]
    assert sum(d["cardinality"] for d in dvs) == 1_000_000
    assert all(d["storageType"] == "u" for d in dvs)


def test_v2_checkpoint_write_roundtrip(spark, tmp_path):
    """Our own v2 checkpoint write (form=auto on a v2Checkpoint-feature
    table): uuid-named top level carries only checkpointMetadata +
    singles + sidecar references, add actions ride parquet sidecars
    written distributed, and after log cleanup the existing v2 READ path
    replays the state row-identically — txns, DVs and features intact."""
    from monday_etl_spark.delta_import import (
        delta_versions,
        last_txn_version,
        write_checkpoint,
    )

    table = str(tmp_path / "v2w")
    os.makedirs(table)
    f0, _ = _write_file(spark, table, "f0",
                        [(i, float(i)) for i in range(8)])
    f1, _ = _write_file(spark, table, "f1",
                        [(i, float(i)) for i in range(10, 14)])
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint",
                                         "deletionVectors"],
                      "writerFeatures": ["v2Checkpoint",
                                         "deletionVectors"]}},
        _meta(), _add(f0), _add(f1),
        {"txn": {"appId": "pipe", "version": 7}},
    ])
    from monday_etl_spark.delta_import import delete_delta_where

    delete_delta_where(spark, table, "id", 2, 3)  # v1: DVs in the state

    target = write_checkpoint(spark, table, clean_commits=True)
    assert os.path.basename(target).split(".")[1] == "checkpoint"
    assert len(os.path.basename(target).split(".")[2]) == 36  # uuid name
    side_dir = os.path.join(table, "_delta_log", "_sidecars")
    assert os.path.isdir(side_dir) and os.listdir(side_dir)
    # json commits are gone: replay can ONLY come through the checkpoint
    assert not [f for f in os.listdir(os.path.join(table, "_delta_log"))
                if f.endswith(".json") and f[0].isdigit()]

    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == [0, 1, 4, 5, 6, 7, 10, 11, 12, 13]
    assert delta_versions(table) == [1]
    assert last_txn_version(spark, table, "pipe") == 7
    # appends continue on top of the checkpointed state
    append_delta(
        spark, spark.createDataFrame([(99, 9.9)], "id long, v double"),
        table)
    assert 99 in {r.id for r in read_delta(spark, table).collect()}

    # refusal: v2 form onto a table whose readers never declared it
    plain = str(tmp_path / "plainv2")
    os.makedirs(plain)
    p0, _ = _write_file(spark, plain, "p0", [(1, 1.0)])
    _commit(plain, 0, [_PROTO, _meta(), _add(p0)])
    with pytest.raises(DeltaProtocolError, match="reader"):
        write_checkpoint(spark, plain, form="v2")


def test_live_file_set_cap_refuses_with_remedy(spark, tmp_path,
                                               monkeypatch):
    """The driver-side live-file materialization is bounded: past the
    cap it refuses naming the override, instead of OOMing the driver on
    a pathological multi-million-file checkpoint."""
    from monday_etl_spark.delta_import import write_checkpoint

    table = str(tmp_path / "capped")
    os.makedirs(table)
    adds = []
    for i in range(3):
        rel, _ = _write_file(spark, table, f"c{i}", [(i, float(i))])
        adds.append(_add(rel))
    _commit(table, 0, [_PROTO, _meta()] + adds)
    write_checkpoint(spark, table)  # checkpoint-backed state

    monkeypatch.setenv("SPARK_GRAFT_MAX_LIVE_FILES", "2")
    with pytest.raises(DeltaProtocolError,
                       match="SPARK_GRAFT_MAX_LIVE_FILES"):
        read_delta(spark, table).collect()
    monkeypatch.setenv("SPARK_GRAFT_MAX_LIVE_FILES", "100")
    assert read_delta(spark, table).count() == 3


def test_v2_json_checkpoint_write_roundtrip(spark, tmp_path):
    """form='v2-json' writes the SAME distributed parquet sidecars but a
    JSON-lines top level (the form some engines prefer for small
    tables): uuid-named *.checkpoint.<uuid>.json, singles + sidecar refs
    only — and after log cleanup the existing json-form READ path
    replays the state row-identically."""
    import json as _json

    from monday_etl_spark.delta_import import (
        delta_versions,
        last_txn_version,
        write_checkpoint,
    )

    table = str(tmp_path / "v2j")
    os.makedirs(table)
    f0, _ = _write_file(spark, table, "f0",
                        [(i, float(i)) for i in range(6)])
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint",
                                         "deletionVectors"],
                      "writerFeatures": ["v2Checkpoint",
                                         "deletionVectors"]}},
        _meta(), _add(f0),
        {"txn": {"appId": "pipe", "version": 3}},
    ])
    from monday_etl_spark.delta_import import delete_delta_where

    delete_delta_where(spark, table, "id", 0, 1)  # v1: DVs in the state

    target = write_checkpoint(spark, table, form="v2-json",
                              clean_commits=True)
    assert target.endswith(".json")
    assert len(os.path.basename(target).split(".")[2]) == 36  # uuid
    with open(target) as fh:
        acts = [_json.loads(ln) for ln in fh if ln.strip()]
    kinds = [next(iter(a)) for a in acts]
    assert kinds[0] == "checkpointMetadata"
    assert "sidecar" in kinds and "metaData" in kinds \
        and "protocol" in kinds and "txn" in kinds
    # no inline file actions ride the json top level
    assert "add" not in kinds and "remove" not in kinds
    # json commits are gone: replay can ONLY come through the checkpoint
    assert not [f for f in os.listdir(os.path.join(table, "_delta_log"))
                if f.endswith(".json") and f[0].isdigit()
                and ".checkpoint." not in f]

    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == [2, 3, 4, 5]
    assert delta_versions(table) == [1]
    assert last_txn_version(spark, table, "pipe") == 3
    # appends continue on top of the checkpointed state
    append_delta(
        spark, spark.createDataFrame([(99, 9.9)], "id long, v double"),
        table)
    assert 99 in {r.id for r in read_delta(spark, table).collect()}
