"""Iceberg changelog scan: per-commit inserts, MoR deletes resolved to
concrete rows, compaction invisibility, range windows, refusals."""

from __future__ import annotations

import pytest

from monday_etl_spark.iceberg_changes import read_iceberg_changes
from monday_etl_spark.iceberg_import import (
    IcebergProtocolError,
    append_iceberg,
    compact_iceberg,
    create_iceberg_table,
    delete_iceberg_where,
    iceberg_history,
    read_metadata,
    upsert_iceberg,
)


def _feed(spark, path, **kw):
    return {
        (r.id, r.v, r._change_type, r._change_ordinal)
        for r in read_iceberg_changes(spark, path, **kw).collect()
    }


def test_changelog_inserts_deletes_and_compaction(spark, tmp_path):
    path = str(tmp_path / "tbl")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(i, float(i)) for i in range(4)], "id long, v double"), path)
    append_iceberg(spark, spark.createDataFrame(
        [(i, float(i)) for i in range(10, 13)], "id long, v double"), path)
    hist = iceberg_history(path)
    snap_a, snap_b = hist[0]["snapshot_id"], hist[1]["snapshot_id"]

    got = _feed(spark, path)
    want = {(i, float(i), "insert", 0) for i in range(4)} \
        | {(i, float(i), "insert", 1) for i in range(10, 13)}
    assert got == want

    # a MoR DELETE's position-delete files resolve to the actual rows
    delete_iceberg_where(spark, path, "v", 0.0, 1.5)  # kills ids 0,1
    got = _feed(spark, path, from_snapshot_id=snap_b)
    assert got == {(0, 0.0, "delete", 0), (1, 1.0, "delete", 0)}

    # compaction commits a replace snapshot: NO logical change emitted
    pre_compact = iceberg_history(path)[-1]["snapshot_id"]
    compact_iceberg(spark, path)
    assert _feed(spark, path, from_snapshot_id=pre_compact) == set()

    # windows: (from=snap_a, to=snap_b] sees only the second append
    got = _feed(spark, path, from_snapshot_id=snap_a,
                to_snapshot_id=snap_b)
    assert got == {(i, float(i), "insert", 0) for i in range(10, 13)}

    # full-history walk across all four snapshots stays consistent
    got = _feed(spark, path)
    n_ins = sum(1 for *_x, t, _o in got if t == "insert")
    n_del = sum(1 for *_x, t, _o in got if t == "delete")
    assert (n_ins, n_del) == (7, 2)

    with pytest.raises(ValueError, match="not an ancestor"):
        read_iceberg_changes(spark, path, from_snapshot_id=12345)


def _mlist(meta_dir, snap_id, items):
    """Manifest list with per-item (manifest, content, seq, added_by[,
    spec_id]) — the shape foreign multi-snapshot histories need
    (manifests carried forward keep their ORIGINAL added_snapshot_id)."""
    import os

    from monday_etl_spark.avro_ocf import write_ocf
    from monday_etl_spark.iceberg_export import _MANIFEST_FILE

    items = [tuple(it) + (0,) * (5 - len(it)) for it in items]
    p = os.path.join(meta_dir, f"snap-{snap_id}-{snap_id}.avro")
    write_ocf(p, _MANIFEST_FILE, [
        {"manifest_path": "file://" + m,
         "manifest_length": os.path.getsize(m),
         "partition_spec_id": spec_id, "content": content,
         "sequence_number": seq, "min_sequence_number": seq,
         "added_snapshot_id": added_by,
         "added_files_count": 1, "existing_files_count": 0,
         "deleted_files_count": 0, "added_rows_count": 1,
         "existing_rows_count": 0, "deleted_rows_count": 0,
         "partitions": None}
        for m, content, seq, added_by, spec_id in items
    ], metadata={"format-version": "2",
                 "snapshot-id": str(snap_id),
                 "sequence-number": str(max(
                     s for _m, _c, s, _a, _sp in items)),
                 "parent-snapshot-id": "null"})
    return p


def test_changelog_ordinals_consecutive_across_compaction(spark, tmp_path):
    """A replace snapshot BETWEEN two DML commits consumes no ordinal:
    iceberg-spark's changelog ordinals are consecutive over emitted
    commits, so a compaction in the middle must yield {0, 1}, not
    {0, 2}."""
    path = str(tmp_path / "ord")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, v double"), path)
    compact_iceberg(spark, path)
    append_iceberg(spark, spark.createDataFrame(
        [(3, 3.0)], "id long, v double"), path)
    got = _feed(spark, path)
    assert got == {(1, 1.0, "insert", 0), (2, 2.0, "insert", 0),
                   (3, 3.0, "insert", 1)}


def test_changelog_delete_join_gated_on_record_count(spark, tmp_path,
                                                     monkeypatch):
    """The delete-resolution join strategy is sized from the manifests'
    record_count sums (zero jobs): broadcast under the cap, shuffle-hash
    above it — never an ungated multi-GB broadcast."""
    from monday_etl_spark import iceberg_changes as ic

    path = str(tmp_path / "gate")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "id long, v double"), path)
    first = read_metadata(path)["current-snapshot-id"]
    delete_iceberg_where(spark, path, "v", 0.0, 2.5)  # pos-delete file

    under = read_iceberg_changes(spark, path, from_snapshot_id=first)
    plan = under._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    monkeypatch.setattr(ic, "_DELETE_BROADCAST_MAX_ROWS", 0)
    over = read_iceberg_changes(spark, path, from_snapshot_id=first)
    plan = over._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "BroadcastHashJoin" not in plan
    # both sides of the gate produce the same rows
    assert ({(r.id, r.v, r._change_type) for r in over.collect()}
            == {(r.id, r.v, r._change_type) for r in under.collect()}
            == {(0, 0.0, "delete"), (1, 1.0, "delete"),
                (2, 2.0, "delete")})


def test_changelog_commit_range_cap(spark, tmp_path, monkeypatch):
    """Past the commit cap the reader refuses loudly, naming the remedy
    (bounded windows) — the plan grows one scan per commit, so an
    unbounded full-history walk must not plan thousands of scans."""
    from monday_etl_spark import iceberg_changes as ic

    path = str(tmp_path / "cap")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    for i in range(3):
        append_iceberg(spark, spark.createDataFrame(
            [(i, float(i))], "id long, v double"), path)
    monkeypatch.setattr(ic, "_CHANGELOG_MAX_COMMITS", 2)
    with pytest.raises(IcebergProtocolError, match="bounded windows"):
        read_iceberg_changes(spark, path)
    # a windowed walk under the cap still works
    hist = iceberg_history(path)
    assert _feed(spark, path, to_snapshot_id=hist[1]["snapshot_id"]) \
        == {(0, 0.0, "insert", 0), (1, 1.0, "insert", 1)}


def test_changelog_deleted_at_birth_rows_not_reported(spark, tmp_path):
    """A snapshot that adds a data file AND a position-delete referencing
    that same new file (valid Iceberg, same sequence number — foreign
    engines write this shape) must report the surviving rows as inserts
    and the deleted-at-birth rows as NOTHING: they were never visible in
    any snapshot."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from monday_etl_spark.avro_ocf import write_ocf
    from monday_etl_spark.iceberg_export import _MANIFEST_FILE
    from tests._iceberg_builders import (
        entry,
        manifest,
        metadata,
        write_data_file,
    )

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
    # position delete written IN snapshot 200: row 0 of the file the
    # same snapshot adds (deleted at birth) + row 0 of the parent's file
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

    mlist = lambda snap_id, items: _mlist(meta_dir, snap_id, items)  # noqa: E731

    l1 = mlist(100, [(m1, 0, 1, 100)])
    l2 = mlist(200, [(m1, 0, 1, 100), (m2, 0, 2, 200),
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

    got = _feed(spark, path, from_snapshot_id=100)
    # (5,50) was added and position-deleted by the SAME snapshot: absent.
    # (6,60) survives as an insert; (1,10) is a real delete of a parent
    # row. The parent's (2,20) is untouched.
    assert got == {(6, 60, "insert", 0), (1, 10, "delete", 0)}


def test_changelog_partition_scoped_equality_deletes(spark, tmp_path):
    """A Flink-CDC-shaped table whose equality-delete file is scoped to
    ONE partition tuple: only parent rows in that partition die — the
    same-keyed row in the other partition survives (previously this
    shape refused loudly)."""
    import os

    from monday_etl_spark.avro_ocf import write_ocf
    from monday_etl_spark.iceberg_export import _MANIFEST_FILE
    from tests._iceberg_builders import (
        entry,
        manifest,
        metadata,
        write_data_file,
    )

    path = str(tmp_path / "scoped")
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)
    import pyarrow as pa

    schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "region", "required": False, "type": "string"},
    ]}
    fa = write_data_file(
        os.path.join(data_dir, "eu.parquet"), ["id", "region"], [1, 2],
        [[1, 2], ["EU", "EU"]], types=[pa.int64(), pa.string()])
    fb = write_data_file(
        os.path.join(data_dir, "us.parquet"), ["id", "region"], [1, 2],
        [[1, 3], ["US", "US"]], types=[pa.int64(), pa.string()])
    # equality delete on id=1, SCOPED to the EU partition tuple
    ed = write_data_file(
        os.path.join(data_dir, "ed.parquet"), ["id"], [1], [[1]])
    m_data = manifest(
        meta_dir,
        [entry(fa, 2, 100, seq=1, partition={"region": "EU"}),
         entry(fb, 2, 100, seq=1, partition={"region": "US"})],
        schema, partition={"region": "string"})
    m_del = manifest(
        meta_dir,
        [entry(ed, 1, 200, seq=2, content=2, equality_ids=[1],
               partition={"region": "EU"})],
        schema, partition={"region": "string"})

    mlist = lambda snap_id, items: _mlist(meta_dir, snap_id, items)  # noqa: E731

    l1 = mlist(100, [(m_data, 0, 1, 100)])
    l2 = mlist(200, [(m_data, 0, 1, 100), (m_del, 1, 2, 200)])
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
    ]
    metadata(path, [schema], snaps,
             [{"snapshot-id": 100, "timestamp-ms": 1000},
              {"snapshot-id": 200, "timestamp-ms": 2000}],
             current=200, specs=spec)

    got = {
        (r.id, r.region, r._change_type, r._change_ordinal)
        for r in read_iceberg_changes(
            spark, path, from_snapshot_id=100).collect()
    }
    # only the EU id=1 row dies; US id=1 survives untouched
    assert got == {(1, "EU", "delete", 0)}


def test_changelog_resolves_global_equality_deletes(spark, tmp_path):
    """An upsert's single snapshot emits BOTH halves: the equality
    delete resolved against the parent (old row values) and the
    appended rows as inserts."""
    path = str(tmp_path / "up")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "id long, v double"), path)
    first = read_metadata(path)["current-snapshot-id"]
    upsert_iceberg(spark, spark.createDataFrame(
        [(2, 99.0), (50, 5.0)], "id long, v double"), path, key=["id"])
    got = _feed(spark, path, from_snapshot_id=first)
    assert got == {
        (2, 2.0, "delete", 0),     # the old value of the upserted key
        (2, 99.0, "insert", 0),
        (50, 5.0, "insert", 0),
    }


def test_changelog_timestamp_addressing(spark, tmp_path):
    """Timestamp bounds resolve against snapshot commit times:
    from_timestamp_ms serves changes strictly AFTER it (newest ancestor
    at/before becomes the exclusive start), to_timestamp_ms through the
    newest ancestor at/before it — iceberg-spark's changelog
    start/end-timestamp contract."""
    path = str(tmp_path / "tsaddr")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    for i in range(3):
        append_iceberg(spark, spark.createDataFrame(
            [(i, float(i))], "id long, v double"), path)
    meta = read_metadata(path)
    by_id = {s["snapshot-id"]: s["timestamp-ms"] for s in meta["snapshots"]}
    hist = iceberg_history(path)
    t0, t1, t2 = (by_id[h["snapshot_id"]] for h in hist)
    assert t0 <= t1 <= t2

    # from exactly t0: strictly-after semantics exclude snapshot 0
    got = _feed(spark, path, from_timestamp_ms=t0, to_timestamp_ms=t2)
    assert {r[0] for r in got} == ({1, 2} if t1 > t0 else {2})
    # from before the first snapshot: everything
    got = _feed(spark, path, from_timestamp_ms=t0 - 1)
    assert {r[0] for r in got} == {0, 1, 2}
    # to before the first snapshot: loud error
    with pytest.raises(ValueError, match="predates the first snapshot"):
        read_iceberg_changes(spark, path, to_timestamp_ms=t0 - 1)
    # one bound kind per side
    with pytest.raises(ValueError, match="not both"):
        read_iceberg_changes(spark, path,
                             from_snapshot_id=hist[0]["snapshot_id"],
                             from_timestamp_ms=t0)


def test_changelog_copy_on_write_overwrite(spark, tmp_path):
    """A foreign engine's COPY-ON-WRITE DELETE: the commit marks the old
    data file DELETED (status 2) and adds the rewritten survivor file.
    The changelog must emit the removed file's live-at-parent rows as
    deletes — with the parent's own delete files applied, so a row a
    parent position-delete had already masked does not resurrect — and
    the added file's rows as inserts (gross emission, iceberg-spark's
    COW changelog shape). Previously this commit read as inserts only."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests._iceberg_builders import entry, manifest, metadata, \
        write_data_file

    path = str(tmp_path / "cow")
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
                         [[1, 2, 3, 4], [10, 20, 30, 40]])
    # parent MoR posdel: row 0 of f1 (id=1) already dead at the parent
    pd1 = os.path.join(data_dir, "pd1.parquet")
    pq.write_table(pa.table({
        "file_path": pa.array(["file://" + f1], pa.string()),
        "pos": pa.array([0], pa.int64()),
    }), pd1)
    # the COW rewrite: survivors of f1 minus id=2
    g = write_data_file(os.path.join(data_dir, "g.parquet"),
                        ["id", "v"], [1, 2], [[3, 4], [30, 40]])

    m1 = manifest(meta_dir, [entry(f1, 4, 100, seq=1)], schema)
    mp = manifest(meta_dir,
                  [entry(pd1, 1, 100, seq=1, content=1)], schema)
    # snapshot 200's manifests: f1 marked DELETED + g added
    m_rm = manifest(meta_dir,
                    [entry(f1, 4, 200, seq=1, status=2)], schema)
    m_g = manifest(meta_dir, [entry(g, 2, 200, seq=2)], schema)

    mlist = lambda snap_id, items: _mlist(meta_dir, snap_id, items)  # noqa: E731
    l1 = mlist(100, [(m1, 0, 1, 100), (mp, 1, 1, 100)])
    l2 = mlist(200, [(m_rm, 0, 1, 200), (m_g, 0, 2, 200),
                     (mp, 1, 1, 100)])
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

    got = _feed(spark, path, from_snapshot_id=100)
    # deletes: f1's live-at-parent rows (2,3,4) — id=1 was already dead
    # at the parent so it does NOT resurrect; inserts: g's rows (3,4)
    assert got == {(2, 20, "delete", 0), (3, 30, "delete", 0),
                   (4, 40, "delete", 0),
                   (3, 30, "insert", 0), (4, 40, "insert", 0)}


def test_changelog_merged_manifest_entries_not_recounted(spark, tmp_path):
    """A foreign writer with commit.manifest.merge.enabled (Iceberg's
    default) merges older manifests into the one its commit adds: the
    merged manifest's added_snapshot_id is the NEW snapshot, but it
    carries unexpired ADDED/DELETED entries stamped with OLDER
    snapshot_ids. Those entries must not re-emit as the new commit's
    changes — only entries whose own snapshot_id is the commit count
    (iceberg-spark's changelog entry filter)."""
    import os

    from tests._iceberg_builders import entry, manifest, metadata, \
        write_data_file

    path = str(tmp_path / "merged")
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
                         ["id", "v"], [1, 2], [[5], [50]])
    f3 = write_data_file(os.path.join(data_dir, "f3.parquet"),
                         ["id", "v"], [1, 2], [[7], [70]])

    # snap 100: append f1. snap 200: COW delete removes f1, adds f2.
    m1 = manifest(meta_dir, [entry(f1, 2, 100, seq=1)], schema)
    m2 = manifest(meta_dir,
                  [entry(f1, 2, 200, seq=1, status=2),
                   entry(f2, 1, 200, seq=2)], schema)
    # snap 300: appends f3 and MERGES manifests — its one manifest
    # (added_snapshot_id=300) carries snap 200's unexpired DELETED entry
    # for f1 and ADDED entry for f2, each stamped with snapshot_id=200
    m3 = manifest(meta_dir,
                  [entry(f3, 1, 300, seq=3),
                   entry(f2, 1, 200, seq=2),
                   entry(f1, 2, 200, seq=1, status=2)], schema)

    mlist = lambda snap_id, items: _mlist(meta_dir, snap_id, items)  # noqa: E731
    l1 = mlist(100, [(m1, 0, 1, 100)])
    l2 = mlist(200, [(m2, 0, 2, 200)])
    l3 = mlist(300, [(m3, 0, 3, 300)])
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
             [{"snapshot-id": 100, "timestamp-ms": 1000},
              {"snapshot-id": 200, "timestamp-ms": 2000},
              {"snapshot-id": 300, "timestamp-ms": 3000}], current=300)

    # snap 300's window: ONLY f3's insert — the carried f1 DELETED entry
    # must not re-emit f1's rows as snap-300 deletes, and the carried f2
    # ADDED entry must not re-insert f2's row
    got = _feed(spark, path, from_snapshot_id=200)
    assert got == {(7, 70, "insert", 0)}

    # full history stays the true story: snap 200 emitted the deletes
    got = _feed(spark, path, from_snapshot_id=100)
    assert got == {(1, 10, "delete", 0), (2, 20, "delete", 0),
                   (5, 50, "insert", 0), (7, 70, "insert", 1)}


def test_changelog_scoped_delete_partition_field_order(spark, tmp_path):
    """Partition tuples compare CANONICALLY: a foreign writer whose
    delete-file manifest stores the partition record's fields in a
    different order than the data manifests must still match (raw
    string comparison of as-written JSON silently missed — ADVICE
    r11). And a scoped delete under a DIFFERENT partition spec id than
    the parent's data manifests refuses loudly instead of silently
    dropping the delete rows."""
    import os

    import pyarrow as pa

    from tests._iceberg_builders import entry, manifest, metadata, \
        write_data_file

    path = str(tmp_path / "order")
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)
    schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "region", "required": False, "type": "string"},
        {"id": 3, "name": "yr", "required": False, "type": "long"},
    ]}
    fa = write_data_file(
        os.path.join(data_dir, "a.parquet"), ["id", "region", "yr"],
        [1, 2, 3], [[1, 2], ["EU", "EU"], [2024, 2024]],
        types=[pa.int64(), pa.string(), pa.int64()])
    ed = write_data_file(
        os.path.join(data_dir, "ed.parquet"), ["id"], [1], [[1]])
    # data manifest partition record: (region, yr); delete manifest
    # partition record: (yr, region) — same tuple, different field order
    m_data = manifest(
        meta_dir,
        [entry(fa, 2, 100, seq=1,
               partition={"region": "EU", "yr": 2024})],
        schema, partition={"region": "string", "yr": "long"})
    m_del = manifest(
        meta_dir,
        [entry(ed, 1, 200, seq=2, content=2, equality_ids=[1],
               partition={"yr": 2024, "region": "EU"})],
        schema, partition={"yr": "long", "region": "string"})

    mlist = lambda snap_id, items: _mlist(meta_dir, snap_id, items)  # noqa: E731
    l1 = mlist(100, [(m_data, 0, 1, 100)])
    l2 = mlist(200, [(m_data, 0, 1, 100), (m_del, 1, 2, 200)])
    spec = [{"spec-id": 0, "fields": [
        {"name": "region", "transform": "identity",
         "source-id": 2, "field-id": 1000},
        {"name": "yr", "transform": "identity",
         "source-id": 3, "field-id": 1001}]}]
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
             current=200, specs=spec)

    got = {
        (r.id, r.region, r._change_type)
        for r in read_iceberg_changes(
            spark, path, from_snapshot_id=100).collect()
    }
    assert got == {(1, "EU", "delete")}

    # now the same table but the delete manifest claims spec id 1 while
    # the data manifests are spec 0: refuse loudly, never a silent miss
    m_del_b = manifest(
        meta_dir,
        [entry(ed, 1, 201, seq=2, content=2, equality_ids=[1],
               partition={"yr": 2024, "region": "EU"})],
        schema, partition={"yr": "long", "region": "string"})
    l2b = mlist(201, [(m_data, 0, 1, 100), (m_del_b, 1, 2, 201, 1)])
    snaps_b = snaps[:1] + [
        {"snapshot-id": 201, "sequence-number": 2, "timestamp-ms": 2000,
         "parent-snapshot-id": 100,
         "manifest-list": "file://" + l2b, "schema-id": 0,
         "summary": {"operation": "overwrite"}},
    ]
    metadata(path, [schema], snaps_b,
             [{"snapshot-id": 100, "timestamp-ms": 1000},
              {"snapshot-id": 201, "timestamp-ms": 2000}],
             current=201, specs=spec, version=2)
    with pytest.raises(IcebergProtocolError, match="spec id"):
        read_iceberg_changes(spark, path, from_snapshot_id=100).collect()


def test_delete_iceberg_cow_writer(spark, tmp_path):
    """delete_iceberg_cow commits ONE overwrite snapshot: affected files
    marked DELETED in rewritten manifests (original snapshot ids and
    explicit sequence numbers on carried EXISTING entries), survivors
    rewritten as fresh files. The table reads right before/after, time
    travel still serves the parent, and the changelog emits the gross
    COW shape (removed live-at-parent rows as deletes + survivors as
    inserts)."""
    from monday_etl_spark.iceberg_import import (
        delete_iceberg_cow,
        read_iceberg_table,
    )

    path = str(tmp_path / "cowtbl")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(i, float(i)) for i in range(6)],
        "id long, v double").coalesce(1), path)
    append_iceberg(spark, spark.createDataFrame(
        [(i, float(i)) for i in range(10, 13)],
        "id long, v double").coalesce(1), path)
    pre = read_metadata(path)["current-snapshot-id"]

    # nothing matches: no commit
    v0 = max(iceberg_history(path), key=lambda h: h["snapshot_id"])
    before_v = delete_iceberg_cow(spark, path, "v", 500.0, 600.0)
    assert read_metadata(path)["current-snapshot-id"] == pre

    # kill v in [1, 4]: file 1 (ids 0-5) is affected, file 2 (10-12) not
    delete_iceberg_cow(spark, path, "v", 1.0, 4.0)
    got = sorted((r.id, r.v)
                 for r in read_iceberg_table(spark, path).collect())
    assert got == [(0, 0.0), (5, 5.0), (10, 10.0), (11, 11.0),
                   (12, 12.0)]
    meta = read_metadata(path)
    snap = max(meta["snapshots"], key=lambda s: s["sequence-number"])
    assert (snap["summary"]["operation"] == "overwrite"
            and snap["summary"]["deleted-data-files"] == "1")
    # time travel to the parent still serves the pre-delete rows
    old = sorted(r.id for r in read_iceberg_table(
        spark, path, snapshot_id=pre).collect())
    assert old == [0, 1, 2, 3, 4, 5, 10, 11, 12]

    # the changelog emits the gross COW shape for the overwrite commit
    got = _feed(spark, path, from_snapshot_id=pre)
    assert got == {(i, float(i), "delete", 0) for i in range(6)} \
        | {(0, 0.0, "insert", 0), (5, 5.0, "insert", 0)}

    # NULL column values survive a COW delete (between() is null there)
    path2 = str(tmp_path / "cownull")
    create_iceberg_table(path2, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "id long, v double"), path2)
    delete_iceberg_cow(spark, path2, "v", 0.0, 2.0)
    got = sorted((r.id, r.v)
                 for r in read_iceberg_table(spark, path2).collect())
    assert got == [(2, None), (3, 3.0)]


def test_delete_iceberg_cow_partitioned(spark, tmp_path):
    """COW delete over an identity-partitioned table: survivors route
    back through the per-tuple writer (Hive layout, typed tuples in the
    manifest entries), untouched partitions carry, and the batch
    changelog emits the gross shape with the partition column injected
    from the tuples."""
    from monday_etl_spark.iceberg_import import (
        delete_iceberg_cow,
        read_iceberg_table,
    )

    path = str(tmp_path / "cowpart")
    create_iceberg_table(
        path, [("id", "long"), ("cat", "string"), ("v", "double")],
        partition_by=[("cat", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "b", 4.0)],
        "id long, cat string, v double").coalesce(1), path)
    pre = read_metadata(path)["current-snapshot-id"]

    delete_iceberg_cow(spark, path, "v", 1.5, 3.5)  # kills ids 2, 3
    got = sorted((r.id, r.cat, r.v)
                 for r in read_iceberg_table(spark, path).collect())
    assert got == [(1, "a", 1.0), (4, "b", 4.0)]
    # time travel still serves the parent
    old = sorted(r.id for r in read_iceberg_table(
        spark, path, snapshot_id=pre).collect())
    assert old == [1, 2, 3, 4]
    # the changelog: both partitions' files were affected -> gross
    # emission of their live rows as deletes + survivors as inserts
    got = {(r.id, r.cat, r.v, r._change_type)
           for r in read_iceberg_changes(
               spark, path, from_snapshot_id=pre).collect()}
    assert got == {
        (1, "a", 1.0, "delete"), (2, "a", 2.0, "delete"),
        (3, "b", 3.0, "delete"), (4, "b", 4.0, "delete"),
        (1, "a", 1.0, "insert"), (4, "b", 4.0, "insert"),
    }


def test_update_iceberg_cow_writer(spark, tmp_path):
    """update_iceberg_cow rewrites matching rows copy-on-write: one
    overwrite snapshot, assignments evaluated over the PRE-update row,
    non-matching rows of affected files carried verbatim, untouched
    files untouched; the changelog emits the gross delete+insert shape
    and the stream agrees."""
    from monday_etl_spark.iceberg_import import (
        read_iceberg_table,
        update_iceberg_cow,
    )
    from monday_etl_spark.iceberg_source import stream_iceberg

    path = str(tmp_path / "cowupd")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, None)],
        "id long, v double").coalesce(1), path)
    append_iceberg(spark, spark.createDataFrame(
        [(10, 10.0)], "id long, v double").coalesce(1), path)
    first = iceberg_history(path)[0]["snapshot_id"]

    # swap semantics: both assignments see the PRE-update row
    update_iceberg_cow(spark, path, "v", 1.5, 2.5,
                       {"v": "v * 100", "id": "id + 1000"})
    got = sorted(((r.id, r.v)
                  for r in read_iceberg_table(spark, path).collect()),
                 key=lambda t: (t[0], t[1] is None, t[1]))
    # id=2 matched: id->1002, v->200; NULL v and id=1 carried verbatim;
    # the second file (id=10) untouched
    assert got == [(1, 1.0), (3, None), (10, 10.0), (1002, 200.0)]
    meta = read_metadata(path)
    snap = max(meta["snapshots"], key=lambda s: s["sequence-number"])
    assert snap["summary"]["operation"] == "overwrite"

    # changelog: the affected file's live rows as deletes + the
    # rewritten file's rows as inserts (gross emission); stream parity
    from monday_etl_spark.iceberg_changes import read_iceberg_changes

    batch = {(r.id, r.v, r._change_type, r._commit_snapshot_id)
             for r in read_iceberg_changes(spark, path).collect()}
    want_update = {(1, 1.0, "delete"), (2, 2.0, "delete"),
                   (3, None, "delete"),
                   (1, 1.0, "insert"), (3, None, "insert"),
                   (1002, 200.0, "insert")}
    assert {(i, v, c) for i, v, c, _s in batch
            if c == "delete" or i in (1002,)} >= {
        t for t in want_update if t[2] == "delete"}

    import os

    out_root = str(tmp_path / "d_upd")

    def _sink(b, bid, _root=out_root, _os=os):
        b.write.mode("overwrite").parquet(
            _os.path.join(_root, f"batch={bid}"))

    q = (stream_iceberg(spark, path, starting_snapshot_id=first,
                        changelog=True)
         .writeStream.foreachBatch(_sink)
         .option("checkpointLocation", str(tmp_path / "ck_upd"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = {(r.id, r.v, r._change_type, r._commit_snapshot_id)
                for r in spark.read.parquet(out_root).collect()}
    assert streamed == batch

    # no match: no commit
    pre = read_metadata(path)["current-snapshot-id"]
    update_iceberg_cow(spark, path, "v", 9999.0, 10000.0, {"v": "v"})
    assert read_metadata(path)["current-snapshot-id"] == pre
