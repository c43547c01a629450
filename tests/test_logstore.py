"""The LogStore seam: every publish (manifest commit, tag create) routes
through put_if_absent; a conditional-put backend drops in without touching
the format; injected conflicts surface as ConcurrentCommitError and the
optimistic retry loop recovers through the seam."""

from __future__ import annotations

import pytest

from monday_etl_spark import tableformat as tf


class RecordingStore(tf.LogStore):
    def __init__(self):
        self.puts: list[str] = []

    def put_if_absent(self, final_path: str, payload: str) -> None:
        self.puts.append(final_path)
        super().put_if_absent(final_path, payload)


class ConflictOnceStore(tf.LogStore):
    """Simulates losing one race: the first put of a matching path raises
    as if another writer's object had just appeared (nothing written)."""

    def __init__(self, needle: str):
        self.needle = needle
        self.fired = False

    def put_if_absent(self, final_path: str, payload: str) -> None:
        if not self.fired and self.needle in final_path:
            self.fired = True
            raise FileExistsError(final_path)
        super().put_if_absent(final_path, payload)


@pytest.fixture
def _restore_store():
    prev = tf.set_log_store(tf.LogStore())
    yield
    tf.set_log_store(prev)


def _df(spark, n=40):
    return spark.createDataFrame(
        [(i, float(i)) for i in range(n)], "id bigint, v double"
    )


def test_every_publish_routes_through_store(spark, tmp_path, _restore_store):
    rec = RecordingStore()
    tf.set_log_store(rec)
    path = str(tmp_path / "t")
    tf.write_versioned(_df(spark), path, key="id", n_buckets=4)
    tf.merge_versioned(spark, path, _df(spark, 5))
    tf.create_tag(path, "rel")
    assert [p.split("/")[-1] for p in rec.puts] == [
        "v00001.json", "v00002.json", "rel.json",
    ]


def test_injected_conflict_raises_and_retry_recovers(spark, tmp_path,
                                                     _restore_store):
    path = str(tmp_path / "t")
    tf.write_versioned(_df(spark), path, key="id", n_buckets=4)

    tf.set_log_store(ConflictOnceStore("v00002.json"))
    with pytest.raises(tf.ConcurrentCommitError):
        tf.merge_versioned(spark, path, _df(spark, 5))
    # retries=1 re-derives and republishes through the same seam
    v = tf.merge_versioned(spark, path, _df(spark, 5), retries=1)
    assert v == 2
    assert tf.read_version(spark, path).count() == 40

    tf.set_log_store(ConflictOnceStore("rel.json"))
    with pytest.raises(tf.RefError):
        tf.create_tag(path, "rel")


def test_real_duplicate_still_conflicts(spark, tmp_path, _restore_store):
    path = str(tmp_path / "t")
    tf.write_versioned(_df(spark), path, key="id", n_buckets=4)
    man = tf._read_manifest(path, 1)
    with pytest.raises(tf.ConcurrentCommitError):
        tf._commit(path, dict(man))  # same version again
