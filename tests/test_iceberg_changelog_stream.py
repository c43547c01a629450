"""Streaming the Iceberg changelog: inserts per append snapshot,
position-delete files resolved to the rows they name, equality deletes
resolved to the parent rows they match (the Flink-CDC upsert shape),
copy-on-write removals resolved to live-at-parent rows, compaction
invisible, exactly-once across drains."""

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
    assert stream.columns == ["id", "v", "_change_type", "_change_ordinal",
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


def test_changelog_stream_resolves_equality_deletes(spark, tmp_path):
    """A Flink-CDC-shaped upsert (ONE snapshot: global equality delete
    + appended rows) streams BOTH halves: the delete resolved against
    the parent's live rows (old values) and the new rows as inserts —
    exactly the batch changelog's emission (previously refused)."""
    from monday_etl_spark.iceberg_changes import read_iceberg_changes

    path = str(tmp_path / "up")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "id long, v double"), path)
    first = iceberg_history(path)[0]["snapshot_id"]
    upsert_iceberg(spark, spark.createDataFrame(
        [(2, 99.0), (50, 5.0)], "id long, v double"), path, key=["id"])
    # a second upsert hits BOTH the base append and the first upsert's
    # rows — parent state resolution must see the accumulated table
    upsert_iceberg(spark, spark.createDataFrame(
        [(50, 77.0)], "id long, v double"), path, key=["id"])

    stream = stream_iceberg(spark, path, starting_snapshot_id=first,
                            changelog=True)
    out = _drain(spark, stream, str(tmp_path / "d_eq"))
    rows = {(r.id, r.v, r._change_type)
            for r in spark.read.parquet(out).collect()}
    assert rows == {
        (1, 1.0, "insert"), (2, 2.0, "insert"), (3, 3.0, "insert"),
        (2, 2.0, "delete"), (2, 99.0, "insert"), (50, 5.0, "insert"),
        (50, 5.0, "delete"), (50, 77.0, "insert"),
    }
    # stream/batch parity: identical multiset of (row, change, commit)
    batch = {(r.id, r.v, r._change_type, r._commit_snapshot_id)
             for r in read_iceberg_changes(spark, path).collect()}
    streamed = {(r.id, r.v, r._change_type, r._commit_snapshot_id)
                for r in spark.read.parquet(out).collect()}
    assert streamed == batch


def test_changelog_stream_resolves_cow_removals(spark, tmp_path):
    """A copy-on-write DELETE (status-2 removals + rewritten survivors)
    streams the removed files' live-at-parent rows as deletes and the
    survivor files as inserts — the gross COW shape the batch changelog
    emits. A row a parent MoR delete had already killed does not
    resurrect."""
    from monday_etl_spark.iceberg_changes import read_iceberg_changes
    from monday_etl_spark.iceberg_import import delete_iceberg_cow

    path = str(tmp_path / "cow")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(i, float(i)) for i in range(5)],
        "id long, v double").coalesce(1), path)
    first = iceberg_history(path)[0]["snapshot_id"]
    # MoR delete kills id=0 first; the COW delete then rewrites the file
    delete_iceberg_where(spark, path, "v", 0.0, 0.5)
    delete_iceberg_cow(spark, path, "v", 3.0, 4.0)

    stream = stream_iceberg(spark, path, starting_snapshot_id=first,
                            changelog=True)
    out = _drain(spark, stream, str(tmp_path / "d_cow"))
    rows = {(r.id, r.v, r._change_type)
            for r in spark.read.parquet(out).collect()}
    assert rows == {
        (0, 0.0, "insert"), (1, 1.0, "insert"), (2, 2.0, "insert"),
        (3, 3.0, "insert"), (4, 4.0, "insert"),
        (0, 0.0, "delete"),                       # the MoR posdel
        # the COW removal: live-at-parent rows of the removed file (id=0
        # already dead — it must NOT re-die) ...
        (1, 1.0, "delete"), (2, 2.0, "delete"),
        (3, 3.0, "delete"), (4, 4.0, "delete"),
        # ... and the survivors re-inserted (gross emission)
        (1, 1.0, "insert"), (2, 2.0, "insert"),
    }
    batch = {(r.id, r.v, r._change_type, r._commit_snapshot_id)
             for r in read_iceberg_changes(spark, path).collect()}
    streamed = {(r.id, r.v, r._change_type, r._commit_snapshot_id)
                for r in spark.read.parquet(out).collect()}
    assert streamed == batch


def test_changelog_stream_refuses_expired_parent(spark, tmp_path):
    """A delete-bearing commit whose parent snapshot has been expired is
    genuinely unreconstructable: the stream must refuse loudly, not
    serve a partial diff."""
    from monday_etl_spark.iceberg_import import expire_iceberg_snapshots

    path = str(tmp_path / "exp")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, v double").coalesce(1), path)
    upsert_iceberg(spark, spark.createDataFrame(
        [(2, 99.0)], "id long, v double"), path, key=["id"])
    up_snap = iceberg_history(path)[-1]["snapshot_id"]
    expire_iceberg_snapshots(path, keep_last=1)
    with pytest.raises(Exception, match="expired"):
        stream = stream_iceberg(spark, path,
                                starting_snapshot_id=up_snap,
                                changelog=True)
        _drain(spark, stream, str(tmp_path / "r_exp"))


def test_changelog_stream_identity_partitioned(spark, tmp_path):
    """Identity-partitioned changelog streaming (previously refused):
    position-delete targets omit the partition column (Hive layout), so
    each target's tuple rides in the plan and injects per file — the
    delete rows carry the partition value exactly like the batch
    reader's."""
    from monday_etl_spark.iceberg_changes import read_iceberg_changes

    path = str(tmp_path / "pt")
    create_iceberg_table(path, [("id", "long"), ("cat", "string"),
                                ("v", "double")],
                         partition_by=[("cat", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "b", 4.0)],
        "id long, cat string, v double").coalesce(1), path)
    first = iceberg_history(path)[0]["snapshot_id"]
    delete_iceberg_where(spark, path, "v", 1.5, 3.5)  # kills ids 2, 3

    stream = stream_iceberg(spark, path, starting_snapshot_id=first,
                            changelog=True)
    out = _drain(spark, stream, str(tmp_path / "d_pt"))
    rows = {(r.id, r.cat, r.v, r._change_type)
            for r in spark.read.parquet(out).collect()}
    assert rows == {
        (1, "a", 1.0, "insert"), (2, "a", 2.0, "insert"),
        (3, "b", 3.0, "insert"), (4, "b", 4.0, "insert"),
        (2, "a", 2.0, "delete"), (3, "b", 3.0, "delete"),
    }
    batch = {(r.id, r.cat, r.v, r._change_type, r._commit_snapshot_id)
             for r in read_iceberg_changes(spark, path).collect()}
    streamed = {(r.id, r.cat, r.v, r._change_type, r._commit_snapshot_id)
                for r in spark.read.parquet(out).collect()}
    assert streamed == batch


def test_changelog_stream_deleted_at_birth(spark, tmp_path):
    """A commit adding a data file AND a position delete naming rows of
    that same new file (valid Iceberg — same sequence number): the
    deleted-at-birth rows were never visible in any snapshot, so the
    stream emits them as NEITHER inserts nor deletes — matching the
    batch changelog."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests._iceberg_builders import entry, manifest, metadata, \
        write_data_file
    from tests.test_iceberg_changes import _mlist

    path = str(tmp_path / "birth")
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)
    schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "long"},
    ]}
    f1 = write_data_file(os.path.join(data_dir, "f1.parquet"),
                         ["id", "v"], [1, 2], [[1, 2], [10, 20]])
    f2 = write_data_file(os.path.join(data_dir, "f2.parquet"),
                         ["id", "v"], [1, 2], [[5, 6], [50, 60]])
    pd1 = os.path.join(data_dir, "pd1.parquet")
    pq.write_table(pa.table({
        "file_path": pa.array(["file://" + f2, "file://" + f1],
                              pa.string()),
        "pos": pa.array([0, 0], pa.int64()),
    }), pd1)
    m1 = manifest(meta_dir, [entry(f1, 2, 100, seq=1)], schema)
    m2 = manifest(meta_dir, [entry(f2, 2, 200, seq=2)], schema)
    mp = manifest(meta_dir,
                  [entry(pd1, 2, 200, seq=2, content=1)], schema)
    l1 = _mlist(meta_dir, 100, [(m1, 0, 1, 100)])
    l2 = _mlist(meta_dir, 200, [(m1, 0, 1, 100), (m2, 0, 2, 200),
                                (mp, 1, 2, 200)])
    snaps = [
        {"snapshot-id": 100, "sequence-number": 1, "timestamp-ms": 1000,
         "manifest-list": "file://" + l1, "schema-id": 0,
         "summary": {"operation": "append"}},
        {"snapshot-id": 200, "sequence-number": 2, "timestamp-ms": 2000,
         "parent-snapshot-id": 100,
         "manifest-list": "file://" + l2, "schema-id": 0,
         "summary": {"operation": "overwrite"}},
    ]
    metadata(path, [schema], snaps,
             [{"snapshot-id": 100, "timestamp-ms": 1000},
              {"snapshot-id": 200, "timestamp-ms": 2000}], current=200)

    stream = stream_iceberg(spark, path, starting_snapshot_id=100,
                            changelog=True)
    out = _drain(spark, stream, str(tmp_path / "d_birth"))
    rows = {(r.id, r.v, r._change_type)
            for r in spark.read.parquet(out).collect()}
    # (5,50) was added AND position-deleted by snapshot 200: absent both
    # ways. (6,60) survives as an insert; (1,10) is a real delete of a
    # parent row; snapshot 100's own rows stream as inserts.
    assert rows == {(1, 10, "insert"), (2, 20, "insert"),
                    (6, 60, "insert"), (1, 10, "delete")}


def test_changelog_stream_posdel_already_dead_rows(spark, tmp_path):
    """A position delete naming a row a PARENT posdel had already killed
    must not re-emit it (the batch reader resolves posdels against the
    parent's live state; the stream now masks the same way)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monday_etl_spark.iceberg_changes import read_iceberg_changes
    from tests._iceberg_builders import entry, manifest, metadata, \
        write_data_file
    from tests.test_iceberg_changes import _mlist

    path = str(tmp_path / "redead")
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)
    schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "long"},
    ]}
    f1 = write_data_file(os.path.join(data_dir, "f1.parquet"),
                         ["id", "v"], [1, 2],
                         [[1, 2, 3], [10, 20, 30]])
    # commit 200: posdel naming row 0 (id=1)
    pd1 = os.path.join(data_dir, "pd1.parquet")
    pq.write_table(pa.table({
        "file_path": pa.array(["file://" + f1], pa.string()),
        "pos": pa.array([0], pa.int64())}), pd1)
    # commit 300: posdel naming rows 0 AND 1 — row 0 is already dead
    pd2 = os.path.join(data_dir, "pd2.parquet")
    pq.write_table(pa.table({
        "file_path": pa.array(["file://" + f1] * 2, pa.string()),
        "pos": pa.array([0, 1], pa.int64())}), pd2)
    m1 = manifest(meta_dir, [entry(f1, 3, 100, seq=1)], schema)
    mp1 = manifest(meta_dir,
                   [entry(pd1, 1, 200, seq=2, content=1)], schema)
    mp2 = manifest(meta_dir,
                   [entry(pd2, 2, 300, seq=3, content=1)], schema)
    l1 = _mlist(meta_dir, 100, [(m1, 0, 1, 100)])
    l2 = _mlist(meta_dir, 200, [(m1, 0, 1, 100), (mp1, 1, 2, 200)])
    l3 = _mlist(meta_dir, 300, [(m1, 0, 1, 100), (mp1, 1, 2, 200),
                                (mp2, 1, 3, 300)])
    snaps = [
        {"snapshot-id": 100, "sequence-number": 1, "timestamp-ms": 1000,
         "manifest-list": "file://" + l1, "schema-id": 0,
         "summary": {"operation": "append"}},
        {"snapshot-id": 200, "sequence-number": 2, "timestamp-ms": 2000,
         "parent-snapshot-id": 100,
         "manifest-list": "file://" + l2, "schema-id": 0,
         "summary": {"operation": "delete"}},
        {"snapshot-id": 300, "sequence-number": 3, "timestamp-ms": 3000,
         "parent-snapshot-id": 200,
         "manifest-list": "file://" + l3, "schema-id": 0,
         "summary": {"operation": "delete"}},
    ]
    metadata(path, [schema], snaps,
             [{"snapshot-id": 100, "timestamp-ms": 1000},
              {"snapshot-id": 200, "timestamp-ms": 2000},
              {"snapshot-id": 300, "timestamp-ms": 3000}], current=300)

    stream = stream_iceberg(spark, path, starting_snapshot_id=100,
                            changelog=True)
    out = _drain(spark, stream, str(tmp_path / "d_redead"))
    rows = {(r.id, r.v, r._change_type, r._commit_snapshot_id)
            for r in spark.read.parquet(out).collect()}
    want = {(1, 10, "insert", 100), (2, 20, "insert", 100),
            (3, 30, "insert", 100),
            (1, 10, "delete", 200),   # the first posdel
            (2, 20, "delete", 300)}   # row 0 must NOT re-die at 300
    assert rows == want
    # and the batch reader agrees exactly
    batch = {(r.id, r.v, r._change_type, r._commit_snapshot_id)
             for r in read_iceberg_changes(
                 spark, path, from_snapshot_id=100).collect()} | {
        (r.id, r.v, "insert", 100)
        for r in read_iceberg_changes(spark, path,
                                      to_snapshot_id=100).collect()}
    assert rows == batch


def test_changelog_stream_identity_partitioned_upsert(spark, tmp_path):
    """Equality deletes over an identity-partitioned table stream with
    the partition column injected from each parent file's tuple (the
    eqdel/cowdel paths share std_full's injection)."""
    from monday_etl_spark.iceberg_changes import read_iceberg_changes

    path = str(tmp_path / "ptup")
    create_iceberg_table(path, [("id", "long"), ("cat", "string"),
                                ("v", "double")],
                         partition_by=[("cat", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)],
        "id long, cat string, v double").coalesce(1), path)
    first = iceberg_history(path)[0]["snapshot_id"]
    upsert_iceberg(spark, spark.createDataFrame(
        [(2, "b", 99.0)], "id long, cat string, v double"),
        path, key=["id"])

    stream = stream_iceberg(spark, path, starting_snapshot_id=first,
                            changelog=True)
    out = _drain(spark, stream, str(tmp_path / "d_ptup"))
    streamed = {(r.id, r.cat, r.v, r._change_type, r._commit_snapshot_id)
                for r in spark.read.parquet(out).collect()}
    batch = {(r.id, r.cat, r.v, r._change_type, r._commit_snapshot_id)
             for r in read_iceberg_changes(spark, path).collect()}
    assert streamed == batch
    assert {(r[0], r[1], r[2], r[3]) for r in streamed} == {
        (1, "a", 1.0, "insert"), (2, "b", 2.0, "insert"),
        (2, "b", 2.0, "delete"), (2, "b", 99.0, "insert")}


def test_changelog_stream_refuses_expired_parent_posdel(spark, tmp_path):
    """Position-delete commits need the parent too (masking + liveness):
    an expired parent refuses exactly like the batch reader, instead of
    serving unmasked rows."""
    from monday_etl_spark.iceberg_import import expire_iceberg_snapshots

    path = str(tmp_path / "expp")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, v double").coalesce(1), path)
    delete_iceberg_where(spark, path, "v", 0.0, 1.5)
    del_snap = iceberg_history(path)[-1]["snapshot_id"]
    expire_iceberg_snapshots(path, keep_last=1)
    with pytest.raises(Exception, match="expired"):
        stream = stream_iceberg(spark, path,
                                starting_snapshot_id=del_snap,
                                changelog=True)
        _drain(spark, stream, str(tmp_path / "r_expp"))


def test_changelog_multi_group_equality_deletes_once(spark, tmp_path):
    """ONE commit carrying equality-delete files with DIFFERENT
    equality_ids sets (two delete groups) kills an overlapping parent
    row ONCE in BOTH readers: the batch changelog dedupes the per-group
    semi-joins on row identity (file, pos), matching the streaming
    resolver's hit-union semantics exactly (ADVICE r12 #1 — previously
    the batch side emitted one delete per matching group)."""
    import pyarrow  # noqa: F401  (builders need pyarrow installed)

    from monday_etl_spark.iceberg_changes import read_iceberg_changes
    from tests._iceberg_builders import (
        entry,
        manifest,
        metadata,
        write_data_file,
    )
    from tests.test_iceberg_changes import _mlist

    path = str(tmp_path / "multigroup")
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)
    schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "k", "required": False, "type": "long"},
    ]}
    fa = write_data_file(os.path.join(data_dir, "a.parquet"),
                         ["id", "k"], [1, 2],
                         [[1, 2, 3, 4], [10, 20, 30, 40]])
    # group 1 deletes by id (kills ids 2,3); group 2 deletes by k
    # (kills k=30,40 -> ids 3,4): row id=3 is matched by BOTH groups
    ed1 = write_data_file(os.path.join(data_dir, "ed1.parquet"),
                          ["id"], [1], [[2, 3]])
    ed2 = write_data_file(os.path.join(data_dir, "ed2.parquet"),
                          ["k"], [2], [[30, 40]])
    m_data = manifest(meta_dir, [entry(fa, 4, 100, seq=1)], schema)
    m_del = manifest(meta_dir, [
        entry(ed1, 2, 200, seq=2, content=2, equality_ids=[1]),
        entry(ed2, 2, 200, seq=2, content=2, equality_ids=[2]),
    ], schema)
    l1 = _mlist(meta_dir, 100, [(m_data, 0, 1, 100)])
    l2 = _mlist(meta_dir, 200, [(m_data, 0, 1, 100), (m_del, 1, 2, 200)])
    snaps = [
        {"snapshot-id": 100, "sequence-number": 1, "timestamp-ms": 1000,
         "manifest-list": "file://" + l1, "schema-id": 0,
         "summary": {"operation": "append"}},
        {"snapshot-id": 200, "sequence-number": 2, "timestamp-ms": 2000,
         "parent-snapshot-id": 100,
         "manifest-list": "file://" + l2, "schema-id": 0,
         "summary": {"operation": "overwrite"}},
    ]
    metadata(path, [schema], snaps,
             [{"snapshot-id": 100, "timestamp-ms": 1000},
              {"snapshot-id": 200, "timestamp-ms": 2000}],
             current=200)

    batch = sorted((r.id, r.k, r._change_type) for r in
                   read_iceberg_changes(
                       spark, path, from_snapshot_id=100).collect())
    assert batch == [(2, 20, "delete"), (3, 30, "delete"),
                     (4, 40, "delete")], batch

    stream = stream_iceberg(spark, path, starting_snapshot_id=200,
                            changelog=True)
    out = _drain(spark, stream, str(tmp_path / "d_mg"))
    streamed = sorted((r.id, r.k, r._change_type) for r in
                      spark.read.parquet(out).collect())
    assert streamed == batch, (streamed, batch)


def test_changelog_units_decode_once_and_fallback(spark, tmp_path,
                                                  monkeypatch):
    """Under the payload cap the planner decodes each delete file ONCE
    for the whole commit and ships positions/keys in the unit payloads
    — read tasks open no delete file at all, so an upsert against an
    N-file parent no longer re-reads the delete files N times (VERDICT
    r12 next-round #2). Over the cap the units fall back to file-list
    payloads (per-task reads, bounded payloads); both paths resolve to
    identical rows."""
    from monday_etl_spark import iceberg_source as isrc
    from monday_etl_spark.iceberg_import import read_metadata
    from monday_etl_spark.iceberg_source import (
        IcebergFilePartition,
        IcebergStreamReader,
        _changelog_units,
        _seq_snapshots,
    )

    path = str(tmp_path / "fanout")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    # two appends -> (at least) two parent live data files
    append_iceberg(spark, spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, v double"), path)
    append_iceberg(spark, spark.createDataFrame(
        [(3, 3.0), (4, 4.0)], "id long, v double"), path)
    # one upsert commit touching keys in BOTH parent files
    upsert_iceberg(spark, spark.createDataFrame(
        [(2, 22.0), (3, 33.0)], "id long, v double"), path, key=["id"])

    meta = read_metadata(path)
    snap = _seq_snapshots(meta)[-1]
    reader = IcebergStreamReader({"path": path, "changelog": "true"})

    opened: list[str] = []
    real_pf = isrc.pq.ParquetFile
    real_rt = isrc.pq.read_table

    def count_pf(p, *a, **kw):
        opened.append(str(p))
        return real_pf(p, *a, **kw)

    def count_rt(p, *a, **kw):
        opened.append(str(p))
        return real_rt(p, *a, **kw)

    monkeypatch.setattr(isrc.pq, "ParquetFile", count_pf)
    monkeypatch.setattr(isrc.pq, "read_table", count_rt)

    units_ship, _ = _changelog_units(path, snap, meta, reader.fields)
    eq_ship = [u for u in units_ship if u[0] == "eqdel"]
    assert len(eq_ship) >= 2  # one per parent live file
    assert all(u[3].get("decoded") and "commit_eq_keys" in u[3]
               for u in eq_ship)

    def rows_of(units):
        out = []
        for kind, absf, pj, payload in units:
            part = IcebergFilePartition(
                absf, pj, kind=kind, snap_id=snap["snapshot-id"],
                ts_ms=snap.get("timestamp-ms", 0), payload=payload)
            for rb in reader.read(part):
                out.extend((r["id"], r["v"], r["_change_type"])
                           for r in rb.to_pylist())
        return sorted(out)

    expected = [(2, 2.0, "delete"), (2, 22.0, "insert"),
                (3, 3.0, "delete"), (3, 33.0, "insert")]

    plan_opens = list(opened)
    assert rows_of(units_ship) == expected
    read_opens = opened[len(plan_opens):]

    # the delete files: every file in the fallback units' commit_eq
    monkeypatch.setattr(isrc, "_PAYLOAD_KEYS_MAX_ROWS", -1)
    units_fb, _ = _changelog_units(path, snap, meta, reader.fields)
    eq_fb = [u for u in units_fb if u[0] == "eqdel"]
    assert all(not u[3].get("decoded") and "commit_eq" in u[3]
               for u in eq_fb)
    del_files = sorted({f for u in eq_fb
                        for _n, files in u[3]["commit_eq"]
                        for f in files})
    assert del_files
    # ship path: each delete file decoded ONCE at planning, and the
    # unit reads open NO delete file despite >= 2 eqdel units
    for f in del_files:
        assert plan_opens.count(f) == 1, (f, plan_opens)
        assert f not in read_opens, (f, read_opens)

    # fallback path: same rows, delete files read per unit task
    before = len(opened)
    assert rows_of(units_fb) == expected
    fb_opens = opened[before:]
    for f in del_files:
        assert fb_opens.count(f) == len(eq_fb), (f, fb_opens)


def test_changelog_stream_ordinal_batch_parity(spark, tmp_path):
    """A full one-batch drain carries the SAME _change_ordinal /
    _commit_timestamp stamps as read_iceberg_changes over the same
    range: ordinals dense over emitting commits, compaction consuming
    none — the streaming twin is column-for-column exact."""
    from monday_etl_spark.iceberg_changes import read_iceberg_changes

    path = str(tmp_path / "tbl")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(i, float(i)) for i in range(4)], "id long, v double"), path)
    first = iceberg_history(path)[0]["snapshot_id"]
    append_iceberg(spark, spark.createDataFrame(
        [(10, 10.0)], "id long, v double"), path)
    upsert_iceberg(spark, spark.createDataFrame(
        [(2, 22.0)], "id long, v double"), path, key=["id"])
    delete_iceberg_where(spark, path, "v", 0.0, 0.5)  # kills id 0
    compact_iceberg(spark, path)                      # no ordinal
    append_iceberg(spark, spark.createDataFrame(
        [(20, 20.0)], "id long, v double"), path)

    def key(r):
        return (r.id, r.v, r._change_type, r._change_ordinal,
                r._commit_snapshot_id, r._commit_timestamp)

    batch = {key(r) for r in read_iceberg_changes(spark, path).collect()}
    stream = stream_iceberg(spark, path, starting_snapshot_id=first,
                            changelog=True)
    out = _drain(spark, stream, str(tmp_path / "d"))
    streamed = {key(r) for r in spark.read.parquet(out).collect()}
    assert streamed == batch
    ords = sorted({r[3] for r in streamed})
    assert ords == [0, 1, 2, 3, 4]  # dense; the replace consumed none


def test_changelog_stream_zero_unit_commit_consumes_ordinal(spark,
                                                            tmp_path):
    """An equality delete SCOPED to a partition with no parent live
    file plans ZERO stream units but still consumes a changelog ordinal
    (the batch reader numbers its empty piece) — the following commit's
    rows must carry the same ordinal on both surfaces."""
    import pyarrow as pa

    from monday_etl_spark.iceberg_changes import read_iceberg_changes
    from tests._iceberg_builders import (
        entry,
        manifest,
        metadata,
        write_data_file,
    )
    from tests.test_iceberg_changes import _mlist

    path = str(tmp_path / "scoped")
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)

    schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "region", "required": False, "type": "string"},
    ]}
    fa = write_data_file(
        os.path.join(data_dir, "eu.parquet"), ["id", "region"], [1, 2],
        [[1, 2], ["EU", "EU"]], types=[pa.int64(), pa.string()])
    # S2: equality delete on id=1 scoped to AP — no parent file there
    ed = write_data_file(
        os.path.join(data_dir, "ed.parquet"), ["id"], [1], [[1]])
    fb = write_data_file(
        os.path.join(data_dir, "eu2.parquet"), ["id", "region"], [1, 2],
        [[7], ["EU"]], types=[pa.int64(), pa.string()])
    m1 = manifest(meta_dir, [entry(fa, 2, 100, seq=1,
                                   partition={"region": "EU"})],
                  schema, partition={"region": "string"})
    m2 = manifest(meta_dir, [entry(ed, 1, 200, seq=2, content=2,
                                   equality_ids=[1],
                                   partition={"region": "AP"})],
                  schema, partition={"region": "string"})
    m3 = manifest(meta_dir, [entry(fb, 1, 300, seq=3,
                                   partition={"region": "EU"})],
                  schema, partition={"region": "string"})
    l1 = _mlist(meta_dir, 100, [(m1, 0, 1, 100)])
    l2 = _mlist(meta_dir, 200, [(m1, 0, 1, 100), (m2, 1, 2, 200)])
    l3 = _mlist(meta_dir, 300, [(m1, 0, 1, 100), (m2, 1, 2, 200),
                                (m3, 0, 3, 300)])
    spec = [{"spec-id": 0, "fields": [
        {"name": "region", "transform": "identity",
         "source-id": 2, "field-id": 1000}]}]
    snaps = [
        {"snapshot-id": 100, "sequence-number": 1, "timestamp-ms": 1000,
         "manifest-list": "file://" + l1, "schema-id": 0,
         "summary": {"operation": "append"}},
        {"snapshot-id": 200, "sequence-number": 2, "timestamp-ms": 2000,
         "parent-snapshot-id": 100,
         "manifest-list": "file://" + l2, "schema-id": 0,
         "summary": {"operation": "overwrite"}},
        {"snapshot-id": 300, "sequence-number": 3, "timestamp-ms": 3000,
         "parent-snapshot-id": 200,
         "manifest-list": "file://" + l3, "schema-id": 0,
         "summary": {"operation": "append"}},
    ]
    metadata(path, [schema], snaps,
             [{"snapshot-id": s["snapshot-id"],
               "timestamp-ms": s["timestamp-ms"]} for s in snaps],
             current=300, specs=spec)

    def key(r):
        return (r.id, r.region, r._change_type, r._change_ordinal,
                r._commit_snapshot_id)

    batch = {key(r) for r in read_iceberg_changes(spark, path).collect()}
    # S2's empty piece consumed ordinal 1: S3's insert is ordinal 2
    assert (7, "EU", "insert", 2, 300) in batch
    stream = stream_iceberg(spark, path, starting_snapshot_id=100,
                            changelog=True)
    out = _drain(spark, stream, str(tmp_path / "d"))
    streamed = {key(r) for r in spark.read.parquet(out).collect()}
    assert streamed == batch
