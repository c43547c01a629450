"""Branch writes / write-audit-publish and the inspection (metadata)
tables over the Iceberg bridge."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from monday_etl_spark.iceberg_import import (
    ConcurrentCommitError,  # noqa: F401  (imported for API surface)
    append_iceberg,
    create_iceberg_branch,
    create_iceberg_table,
    fast_forward_iceberg,
    iceberg_metadata_table,
    read_iceberg_table,
    read_metadata,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, tmp_path, n=4):
    path = str(tmp_path / "tbl")
    create_iceberg_table(path, [("id", "long"), ("v", "double")])
    append_iceberg(spark, spark.createDataFrame(
        [(i, float(i)) for i in range(n)], "id bigint, v double"), path)
    return path


def test_wap_branch_append_then_fast_forward(spark, tmp_path):
    """The write-audit-publish workflow: staged rows land on a branch
    (main unchanged, time travel unchanged), the audit reads the branch,
    and fast-forward publishes atomically."""
    path = _mk(spark, tmp_path)
    create_iceberg_branch(path, "audit")
    append_iceberg(spark, spark.createDataFrame(
        [(100, 1.5)], "id bigint, v double"), path, branch="audit")

    # main untouched: current read and current-snapshot-id see 4 rows
    assert read_iceberg_table(spark, path).count() == 4
    # the staged state is readable via the ref
    staged = read_iceberg_table(spark, path, ref="audit")
    assert sorted(r.id for r in staged.collect()) == [0, 1, 2, 3, 100]

    fast_forward_iceberg(path, "audit")
    assert sorted(r.id for r in
                  read_iceberg_table(spark, path).collect()) \
        == [0, 1, 2, 3, 100]
    # publish wrote a snapshot-log entry (time travel sees the instant)
    meta = read_metadata(path)
    assert meta["snapshot-log"][-1]["snapshot-id"] == \
        meta["refs"]["audit"]["snapshot-id"]


def test_fast_forward_stamps_publish_instant(spark, tmp_path):
    """The snapshot-log entry a publish appends carries the PUBLISH
    wall-clock, not the staged snapshot's original write time — so
    as_of_ms time travel between stage and publish still resolves to
    what main actually showed then (iceberg-java stamps history entries
    with the update time)."""
    import time as _time

    path = _mk(spark, tmp_path)
    create_iceberg_branch(path, "audit")
    append_iceberg(spark, spark.createDataFrame(
        [(100, 1.5)], "id bigint, v double"), path, branch="audit")
    _time.sleep(0.02)
    t_between = int(_time.time() * 1000)
    _time.sleep(0.02)
    fast_forward_iceberg(path, "audit")

    meta = read_metadata(path)
    entry = meta["snapshot-log"][-1]
    staged = next(s for s in meta["snapshots"]
                  if s["snapshot-id"] == entry["snapshot-id"])
    assert entry["timestamp-ms"] > t_between > staged["timestamp-ms"]
    assert meta["last-updated-ms"] >= entry["timestamp-ms"]
    # the semantic consequence: between stage and publish, main showed 4
    assert read_iceberg_table(spark, path, as_of_ms=t_between).count() == 4
    assert read_iceberg_table(
        spark, path, as_of_ms=int(_time.time() * 1000)).count() == 5


def test_rollback_stamps_publish_instant(spark, tmp_path):
    """rollback's snapshot-log entry likewise records when the rewind
    became visible, not the pre-rollback last-updated-ms."""
    import time as _time

    from monday_etl_spark.iceberg_import import rollback_iceberg

    path = _mk(spark, tmp_path)
    append_iceberg(spark, spark.createDataFrame(
        [(77, 7.7)], "id bigint, v double"), path)
    before = read_metadata(path)["last-updated-ms"]
    first = read_metadata(path)["snapshots"][0]["snapshot-id"]
    _time.sleep(0.02)
    t0 = int(_time.time() * 1000)
    rollback_iceberg(path, first)
    meta = read_metadata(path)
    assert meta["snapshot-log"][-1]["timestamp-ms"] >= t0 > before
    assert meta["last-updated-ms"] >= t0
    # as_of just before the rollback still sees the 5-row head
    assert read_iceberg_table(spark, path, as_of_ms=t0 - 1).count() == 5


def test_remove_orphans_keeps_old_metadata_references(spark, tmp_path):
    """Files reachable ONLY through an older retained metadata version
    survive the sweep: another engine's metadata-only expire (snapshot
    dropped from the head's list, storage left in place) must not turn
    read_metadata(path, old_v) audit replay into missing-file errors.
    Once expire_iceberg_snapshots HAS deleted the snapshot's manifest
    storage, its replay is gone either way — the sweep then collects the
    now-unreachable data files instead of crashing."""
    import json as _json

    from monday_etl_spark.iceberg_import import (
        _meta_dir,
        compact_iceberg,
        metadata_versions,
        remove_orphan_iceberg_files,
    )

    path = _mk(spark, tmp_path)  # snapshot A: 4 rows in files F1
    compact_iceberg(spark, path)  # snapshot R: fresh files F2 only
    old_v = max(metadata_versions(path))
    old_meta = read_metadata(path, old_v)
    first = old_meta["snapshots"][0]["snapshot-id"]

    # a metadata-only expire, the external-engine shape: drop snapshot A
    # from the head's list but leave every file on disk
    head = _json.loads(_json.dumps(old_meta))
    head["snapshots"] = [s for s in head["snapshots"]
                         if s["snapshot-id"] != first]
    head["snapshot-log"] = [e for e in head.get("snapshot-log", [])
                            if e["snapshot-id"] != first]
    new_v = old_v + 1
    with open(os.path.join(_meta_dir(path),
                           f"v{new_v}.metadata.json"), "w") as fh:
        _json.dump(head, fh)

    assert remove_orphan_iceberg_files(path, grace_s=0.0) == []
    # audit replay through the retained old metadata still reads whole
    got = read_iceberg_table(spark, path, snapshot_id=first,
                             metadata_version=old_v)
    assert got.count() == 4
    assert read_iceberg_table(spark, path).count() == 4

    # now ACTUALLY expire A's manifest storage: the old versions become
    # unreadable for A, and its data files turn sweepable — no crash
    from monday_etl_spark.iceberg_import import _from_uri, _manifest_paths

    mlist = next(s["manifest-list"] for s in old_meta["snapshots"]
                 if s["snapshot-id"] == first)
    for m in _manifest_paths(old_meta,
                             {"manifest-list": mlist,
                              "snapshot-id": first}):
        p = _from_uri(m["manifest_path"])
        if os.path.exists(p):
            os.unlink(p)
    os.unlink(_from_uri(mlist))
    deleted = remove_orphan_iceberg_files(path, grace_s=0.0)
    assert deleted  # F1 collected
    assert read_iceberg_table(spark, path).count() == 4  # head intact


def test_fast_forward_refuses_non_ancestor(spark, tmp_path):
    """main moved past the branch point -> fast-forward would drop the
    main-side commit; it must refuse (that needs a merge)."""
    path = _mk(spark, tmp_path)
    create_iceberg_branch(path, "stale")
    append_iceberg(spark, spark.createDataFrame(
        [(7, 7.0)], "id bigint, v double"), path)  # main advances
    append_iceberg(spark, spark.createDataFrame(
        [(8, 8.0)], "id bigint, v double"), path, branch="stale")
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward_iceberg(path, "stale")
    # main kept its own history
    assert sorted(r.id for r in
                  read_iceberg_table(spark, path).collect()) \
        == [0, 1, 2, 3, 7]


def test_branch_guards(spark, tmp_path):
    path = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not in table refs"):
        append_iceberg(spark, spark.createDataFrame(
            [(1, 1.0)], "id bigint, v double"), path, branch="nope")
    create_iceberg_branch(path, "pin", tag=True)
    with pytest.raises(ValueError, match="tag"):
        append_iceberg(spark, spark.createDataFrame(
            [(1, 1.0)], "id bigint, v double"), path, branch="pin")
    with pytest.raises(ValueError, match="already exists"):
        create_iceberg_branch(path, "pin")
    # a tag keeps resolving to the pinned snapshot as main moves on
    append_iceberg(spark, spark.createDataFrame(
        [(9, 9.0)], "id bigint, v double"), path)
    assert read_iceberg_table(spark, path, ref="pin").count() == 4
    assert read_iceberg_table(spark, path).count() == 5


def test_metadata_tables(spark, tmp_path):
    path = _mk(spark, tmp_path)
    append_iceberg(spark, spark.createDataFrame(
        [(10, 1.0), (11, 2.0)], "id bigint, v double"), path)

    snaps = iceberg_metadata_table(spark, path, "snapshots")
    assert snaps.count() == 2
    ops = [r.operation for r in snaps.orderBy("committed_at_ms").collect()]
    assert ops == ["append", "append"]

    hist = iceberg_metadata_table(spark, path, "history").collect()
    assert len(hist) == 2 and all(r.is_current_ancestor for r in hist)

    refs = {r.name: r for r in
            iceberg_metadata_table(spark, path, "refs").collect()}
    assert refs["main"].type == "branch"

    mans = iceberg_metadata_table(spark, path, "manifests")
    assert mans.count() == 2  # carried + new
    assert all(r.content == 0 for r in mans.collect())

    files = iceberg_metadata_table(spark, path, "files")
    assert files.agg(F.sum("record_count")).first()[0] == 6
    for r in files.collect():
        assert r.file_format == "PARQUET" and os.path.exists(
            r.file_path.replace("file://", ""))

    parts = iceberg_metadata_table(spark, path, "partitions").collect()
    assert len(parts) == 1  # unpartitioned: one empty tuple
    assert parts[0].record_count == 6

    with pytest.raises(ValueError, match="unknown metadata table"):
        iceberg_metadata_table(spark, path, "nope")


def test_partitions_metadata_over_transforms(spark, tmp_path):
    """partitions over a day+bucket table: record counts per tuple sum to
    the data, and the map surfaces the transform values as strings."""
    import datetime

    path = str(tmp_path / "pt")
    create_iceberg_table(
        path, [("id", "long"), ("ts", "timestamp")],
        partition_by=[("ts", "day"), ("id", "bucket[2]")])
    rows = [(i, datetime.datetime(2024, 5, 1 + (i % 2), 8))
            for i in range(6)]
    append_iceberg(spark, spark.createDataFrame(
        rows, "id bigint, ts timestamp_ntz"), path)
    parts = iceberg_metadata_table(spark, path, "partitions")
    got = {(r.partition["ts_day"], r.partition["id_bucket"]):
           r.record_count for r in parts.collect()}
    assert sum(got.values()) == 6
    epoch = datetime.date(1970, 1, 1).toordinal()
    want_days = {str(datetime.date(2024, 5, d).toordinal() - epoch)
                 for d in (1, 2)}
    assert {k[0] for k in got} == want_days


def test_remove_orphan_iceberg_files(spark, tmp_path):
    """Unreferenced data files (a lost commit's debris) are swept; every
    file any snapshot references — including older snapshots' — stays,
    so time travel is unaffected."""
    from monday_etl_spark.iceberg_import import remove_orphan_iceberg_files

    path = _mk(spark, tmp_path)
    append_iceberg(spark, spark.createDataFrame(
        [(50, 5.0)], "id bigint, v double"), path)

    # fake a lost commit: a fully-written file nothing references
    orphan_dir = os.path.join(path, "data", "append-lostwriter")
    os.makedirs(orphan_dir)
    spark.createDataFrame([(999, 9.9)], "id bigint, v double") \
        .coalesce(1).write.mode("overwrite").parquet(orphan_dir)

    assert remove_orphan_iceberg_files(path, grace_s=3600) == []  # grace
    deleted = remove_orphan_iceberg_files(path, grace_s=0.0)
    assert deleted and all("append-lostwriter" in d for d in deleted)

    # both snapshots still read whole
    meta = read_metadata(path)
    first = meta["snapshots"][0]["snapshot-id"]
    assert read_iceberg_table(spark, path, snapshot_id=first).count() == 4
    assert read_iceberg_table(spark, path).count() == 5
    assert remove_orphan_iceberg_files(path, grace_s=0.0) == []


def test_many_partition_tuples_use_join_injection(spark, tmp_path,
                                                  monkeypatch):
    """Past the group threshold an identity-partitioned read keeps ONE
    scan branch and injects partition values via a broadcast path-join;
    rows identical to the per-group constant form."""
    import datetime

    from monday_etl_spark import iceberg_import as ii

    path = str(tmp_path / "many")
    create_iceberg_table(
        path, [("id", "long"), ("d", "date"), ("v", "string")],
        partition_by=[("d", "identity")])
    rows = [(i, datetime.date(2024, 1, 1)
             + datetime.timedelta(days=i % 40), f"v{i}")
            for i in range(200)]
    append_iceberg(spark, spark.createDataFrame(
        rows, "id bigint, d date, v string").coalesce(1), path)

    got = read_iceberg_table(spark, path)  # 40 groups >= threshold 33
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain()
    plan = buf.getvalue()
    assert plan.count("Scan parquet") == 1  # inj frame is a LocalRelation
    assert "BroadcastHashJoin" in plan
    collected = sorted((r.id, r.d, r.v) for r in got.collect())
    assert collected == sorted(rows)

    # parity with the constant-injection form on the SAME table
    monkeypatch.setattr(ii, "_INJECT_JOIN_MIN_GROUPS", 10**9)
    const_rows = sorted((r.id, r.d, r.v) for r in
                        read_iceberg_table(spark, path).collect())
    assert const_rows == collected


def test_rollback_iceberg(spark, tmp_path):
    from monday_etl_spark.iceberg_import import rollback_iceberg

    path = _mk(spark, tmp_path)
    append_iceberg(spark, spark.createDataFrame(
        [(77, 7.7)], "id bigint, v double"), path)
    meta = read_metadata(path)
    first = meta["snapshots"][0]["snapshot-id"]
    head = meta["snapshots"][-1]["snapshot-id"]

    rollback_iceberg(path, first)
    assert read_iceberg_table(spark, path).count() == 4
    # rolled-past snapshot still addressable; rollback is undoable...
    assert read_iceberg_table(spark, path, snapshot_id=head).count() == 5
    # ...but only to an ANCESTOR: the old head is no longer one
    with pytest.raises(ValueError, match="not an ancestor"):
        rollback_iceberg(path, head)


def test_branch_and_publish_are_conditional_puts(spark, tmp_path):
    """Metadata-only commits (branch creation, fast-forward) publish
    through the same conditional put as data commits: a writer whose
    read is overtaken between read and put loses with
    ConcurrentCommitError, never a clobber. (A commit landing BEFORE the
    read is not a race — the next attempt re-derives against it, which
    the optimistic model wants.)"""
    import json

    from monday_etl_spark.iceberg_import import (
        _meta_dir,
        _publish_metadata,
        metadata_versions,
    )

    path = _mk(spark, tmp_path)
    versions = metadata_versions(path)
    cur_v = max(versions)
    stale = json.loads(json.dumps(read_metadata(path)))
    stale.setdefault("refs", {})["race"] = {
        "snapshot-id": stale["current-snapshot-id"], "type": "branch"}

    # another writer lands cur_v+1 inside our read->put window
    meta_dir = _meta_dir(path)
    with open(os.path.join(meta_dir,
                           f"v{cur_v + 1}.metadata.json"), "w") as fh:
        json.dump(read_metadata(path), fh)

    with pytest.raises(ConcurrentCommitError):
        _publish_metadata(path, stale, versions, cur_v)
    # the loser left no ref behind
    assert "race" not in (read_metadata(path).get("refs") or {})


def test_schema_evolution_add_and_rename(spark, tmp_path):
    """Metadata-only evolution: a rename is visible to the CURRENT read
    immediately (field-id resolution, no rewrite), an added column
    NULL-fills old files, appends take the new column set, and time
    travel reads each snapshot under its own schema."""
    from monday_etl_spark.iceberg_import import evolve_iceberg_schema

    path = _mk(spark, tmp_path)  # id, v; 4 rows
    meta = read_metadata(path)
    first = meta["snapshots"][0]["snapshot-id"]

    evolve_iceberg_schema(
        path, add_columns=[("note", "string")],
        rename_columns={"v": "val"})

    cur = read_iceberg_table(spark, path)
    assert cur.columns == ["id", "val", "note"]
    rows = {r.id: r for r in cur.collect()}
    assert rows[2].val == 2.0 and rows[2].note is None  # old file, new names

    # time travel keeps the snapshot's own schema
    old = read_iceberg_table(spark, path, snapshot_id=first)
    assert old.columns == ["id", "v"]

    # appends now expect (and write) the evolved set
    append_iceberg(spark, spark.createDataFrame(
        [(100, 1.5, "staged")], "id bigint, val double, note string"), path)
    got = {r.id: r for r in read_iceberg_table(spark, path).collect()}
    assert got[100].note == "staged" and got[100].val == 1.5
    assert len(got) == 5 and got[3].note is None

    # pruned reads resolve the renamed column too
    from monday_etl_spark.iceberg_import import read_iceberg_where

    hit = read_iceberg_where(spark, path, "val", 1.4, 1.6)
    assert sorted(r.id for r in hit.collect()) == [100]

    with pytest.raises(ValueError, match="already a column"):
        evolve_iceberg_schema(path, rename_columns={"id": "val"})
    with pytest.raises(ValueError, match="already exists"):
        evolve_iceberg_schema(path, add_columns=[("note", "string")])


def test_schema_evolution_drop_and_promote(spark, tmp_path):
    """Drop removes the field without reusing its id; promote rewrites a
    field's type along the spec's safe promotions only — old footers
    upcast natively on read, time travel keeps each snapshot's types,
    and unsafe promotions / partition-referenced drops refuse."""
    from monday_etl_spark.iceberg_import import (
        IcebergProtocolError,
        evolve_iceberg_schema,
    )

    path = str(tmp_path / "tbl")
    create_iceberg_table(
        path, [("id", "int"), ("v", "float"), ("tag", "string")])
    append_iceberg(spark, spark.createDataFrame(
        [(i, float(i), f"t{i}") for i in range(4)],
        "id int, v float, tag string"), path)
    first = read_metadata(path)["snapshots"][0]["snapshot-id"]
    dropped_id = next(
        f["id"] for s in read_metadata(path)["schemas"]
        for f in s["fields"] if f["name"] == "tag")

    evolve_iceberg_schema(
        path,
        promote_columns={"id": "long", "v": "double"},
        drop_columns=["tag"])

    cur = read_iceberg_table(spark, path)
    assert cur.columns == ["id", "v"]
    assert dict(cur.dtypes) == {"id": "bigint", "v": "double"}
    assert sorted((r.id, r.v) for r in cur.collect()) \
        == [(i, float(i)) for i in range(4)]

    # time travel keeps the snapshot's own schema AND types
    old = read_iceberg_table(spark, path, snapshot_id=first)
    assert old.columns == ["id", "v", "tag"]
    assert dict(old.dtypes) == {"id": "int", "v": "float", "tag": "string"}

    # appends take the evolved (promoted, dropped) column set
    append_iceberg(spark, spark.createDataFrame(
        [(100, 50.5)], "id bigint, v double"), path)
    assert sorted(r.id for r in read_iceberg_table(spark, path).collect()) \
        == [0, 1, 2, 3, 100]

    # a post-drop add gets a FRESH field id, never the dropped one
    evolve_iceberg_schema(path, add_columns=[("note", "string")])
    meta = read_metadata(path)
    cur_schema = next(s for s in meta["schemas"]
                      if s["schema-id"] == meta["current-schema-id"])
    note_id = next(f["id"] for f in cur_schema["fields"]
                   if f["name"] == "note")
    assert note_id > dropped_id

    # refusals
    with pytest.raises(IcebergProtocolError, match="not a safe promotion"):
        evolve_iceberg_schema(path, promote_columns={"id": "int"})
    with pytest.raises(IcebergProtocolError, match="not a safe promotion"):
        evolve_iceberg_schema(path, promote_columns={"v": "float"})
    with pytest.raises(ValueError, match="not in schema"):
        evolve_iceberg_schema(path, drop_columns=["ghost"])

    # decimal: widening precision at the same scale is safe, scale is not
    dpath = str(tmp_path / "dec")
    create_iceberg_table(dpath, [("d", "decimal(5,2)")])
    evolve_iceberg_schema(dpath, promote_columns={"d": "decimal(10,2)"})
    with pytest.raises(IcebergProtocolError, match="not a safe promotion"):
        evolve_iceberg_schema(dpath, promote_columns={"d": "decimal(10,4)"})

    # dropping a partition-transform source refuses
    ppath = str(tmp_path / "ptbl")
    create_iceberg_table(
        ppath, [("id", "long"), ("cat", "string")],
        partition_by=[("cat", "identity")])
    with pytest.raises(IcebergProtocolError, match="partition spec"):
        evolve_iceberg_schema(ppath, drop_columns=["cat"])
