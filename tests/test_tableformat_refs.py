"""Named refs (tags): pin semantics, name collisions, and vacuum retention."""

from __future__ import annotations

import pytest

from monday_etl_spark.tableformat import (
    RefError,
    create_tag,
    delete_tag,
    list_tags,
    list_versions,
    merge_versioned,
    read_tag,
    resolve_tag,
    vacuum,
    write_versioned,
)

N_BUCKETS = 4


def _tbl(spark, path):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id bigint, v double"
    )
    write_versioned(df, path, key="id", n_buckets=N_BUCKETS)
    upd = spark.createDataFrame([(7, 700.0), (99, 99.0)], "id bigint, v double")
    merge_versioned(spark, path, upd)  # -> v2


def test_tag_pins_and_reads_exact_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    _tbl(spark, path)
    assert create_tag(path, "train-v1", version=1) == 1
    assert create_tag(path, "latest-good") == 2  # defaults to current
    assert list_tags(path) == {"train-v1": 1, "latest-good": 2}
    assert resolve_tag(path, "train-v1") == 1

    old = {r.id: r.v for r in read_tag(spark, path, "train-v1").collect()}
    assert len(old) == 50 and old[7] == 7.0  # pre-merge state
    new = {r.id: r.v for r in read_tag(spark, path, "latest-good").collect()}
    assert len(new) == 51 and new[7] == 700.0


def test_tag_name_collision_and_move(spark, tmp_path):
    path = str(tmp_path / "t")
    _tbl(spark, path)
    create_tag(path, "rel", version=1)
    with pytest.raises(RefError):
        create_tag(path, "rel", version=2)  # tags are immutable
    delete_tag(path, "rel")
    assert create_tag(path, "rel", version=2) == 2  # explicit two-step move
    with pytest.raises(RefError):
        resolve_tag(path, "never-created")
    with pytest.raises(RefError):
        delete_tag(path, "never-created")
    with pytest.raises(RefError):
        create_tag(path, "../escape", version=1)
    with pytest.raises(FileNotFoundError):
        create_tag(path, "ok-name", version=77)


def test_vacuum_retains_tagged_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    _tbl(spark, path)
    create_tag(path, "pinned", version=1)
    dropped = vacuum(path, keep_last=1)
    assert dropped == []  # v1 is tagged, v2 is newest: nothing to drop
    assert list_versions(path) == [1, 2]
    assert read_tag(spark, path, "pinned").count() == 50

    delete_tag(path, "pinned")
    assert vacuum(path, keep_last=1) == [1]
    assert list_versions(path) == [2]
