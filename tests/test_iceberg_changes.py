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
