"""Iceberg partition-spec evolution: metadata-only default-spec swap,
mixed-spec reads with per-era identity injection, field-id/name reuse,
ambiguity refusals, and pruning across both eras."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from monday_etl_spark.iceberg_import import (
    IcebergProtocolError,
    append_iceberg,
    create_iceberg_table,
    delete_iceberg_where,
    evolve_iceberg_partition_spec,
    iceberg_files_where,
    read_iceberg_table,
    read_metadata,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp_path, partition_by=None, name="t"):
    path = str(tmp_path / name)
    create_iceberg_table(
        path,
        [("region", "string"), ("day", "string"), ("v", "long")],
        partition_by=partition_by,
    )
    return path


def test_evolve_unpartitioned_to_identity(spark, tmp_path):
    path = _mk(spark, tmp_path)
    append_iceberg(spark, spark.createDataFrame(
        [("EU", "d1", 1), ("US", "d1", 2)],
        "region string, day string, v long"), path)
    evolve_iceberg_partition_spec(path, [("region", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [("EU", "d2", 3), ("AP", "d2", 4)],
        "region string, day string, v long"), path)

    meta = read_metadata(path)
    assert meta["default-spec-id"] == 1
    assert [s["spec-id"] for s in meta["partition-specs"]] == [0, 1]

    got = read_iceberg_table(spark, path)
    assert _rows(got) == [("AP", "d2", 4), ("EU", "d1", 1),
                          ("EU", "d2", 3), ("US", "d1", 2)]
    # new-era files are identity-routed: no physical region column
    newf, _ = iceberg_files_where(spark, path, "region", "AP", "AP")
    appended = [f for f in newf if "append-" in f and "region=" in f]
    assert appended and all(
        "region" not in pq.ParquetFile(f).schema_arrow.names
        for f in appended
    )
    # pruning: old era prunes by footer stats, new era by point bounds
    keep, total = iceberg_files_where(spark, path, "region", "AP", "AP")
    got_ap = read_iceberg_table(spark, path).filter("region = 'AP'")
    assert _rows(got_ap) == [("AP", "d2", 4)]
    assert len(keep) < total  # the EU new-era file pruned by point bounds


def test_evolve_identity_to_other_identity_injects_old_era(spark, tmp_path):
    """Files written under the OLD identity spec carry no physical
    column; after evolving to a different identity spec the union'd
    _identity_sources must still inject their values."""
    path = _mk(spark, tmp_path, partition_by=[("region", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [("EU", "d1", 1), ("US", "d1", 2)],
        "region string, day string, v long"), path)
    evolve_iceberg_partition_spec(path, [("day", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [("EU", "d2", 3)], "region string, day string, v long"), path)

    got = read_iceberg_table(spark, path)
    assert _rows(got) == [("EU", "d1", 1), ("EU", "d2", 3), ("US", "d1", 2)]
    # old era: region injected (not physical); new era: day injected
    keep, _ = iceberg_files_where(spark, path, "day", "d2", "d2")
    d2 = [f for f in keep if "day=" in f]
    assert d2 and all(
        "day" not in pq.ParquetFile(f).schema_arrow.names for f in d2
    )


def test_field_id_and_name_reuse_on_revival(spark, tmp_path):
    path = _mk(spark, tmp_path, partition_by=[("region", "identity")])
    evolve_iceberg_partition_spec(path, [])  # drop to unpartitioned
    evolve_iceberg_partition_spec(
        path, [("region", "identity"), ("v", "bucket[4]")])
    meta = read_metadata(path)
    specs = {s["spec-id"]: s["fields"] for s in meta["partition-specs"]}
    # revived region re-uses spec 0's field id + name; v_bucket is new
    assert specs[0][0]["field-id"] == specs[2][0]["field-id"]
    assert specs[0][0]["name"] == specs[2][0]["name"] == "region"
    assert specs[2][1]["name"] == "v_bucket"
    assert specs[2][1]["field-id"] > specs[2][0]["field-id"]
    assert meta["last-partition-id"] == specs[2][1]["field-id"]


def test_evolve_to_identical_spec_repoints_without_new_entry(spark, tmp_path):
    path = _mk(spark, tmp_path, partition_by=[("region", "identity")])
    evolve_iceberg_partition_spec(path, [])
    n_specs = len(read_metadata(path)["partition-specs"])
    evolve_iceberg_partition_spec(path, [("region", "identity")])
    meta = read_metadata(path)
    assert len(meta["partition-specs"]) == n_specs  # spec 0 re-used
    assert meta["default-spec-id"] == 0


def test_name_collision_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    create_iceberg_table(
        path, [("v", "long"), ("v_bucket", "string")],
        partition_by=[("v_bucket", "identity")])
    with pytest.raises(IcebergProtocolError, match="already means"):
        evolve_iceberg_partition_spec(path, [("v", "bucket[4]")])


def test_transform_era_then_identity_era_reads_and_prunes(spark, tmp_path):
    path = _mk(spark, tmp_path, partition_by=[("v", "bucket[4]")])
    append_iceberg(spark, spark.createDataFrame(
        [("EU", "d1", 1), ("US", "d1", 2)],
        "region string, day string, v long"), path)
    evolve_iceberg_partition_spec(path, [("region", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [("AP", "d2", 3)], "region string, day string, v long"), path)
    got = read_iceberg_table(spark, path)
    assert _rows(got) == [("AP", "d2", 3), ("EU", "d1", 1), ("US", "d1", 2)]
    # bucket-era files keep v physically (transforms are not invertible)
    keep, _ = iceberg_files_where(spark, path, "v", 1, 2)
    bucketed = [f for f in keep if "__ice_pt_" in f]
    assert bucketed and all(
        "v" in pq.ParquetFile(f).schema_arrow.names for f in bucketed
    )


def test_mor_delete_after_evolution(spark, tmp_path):
    path = _mk(spark, tmp_path, partition_by=[("region", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [("EU", "d1", 1), ("US", "d1", 2)],
        "region string, day string, v long"), path)
    evolve_iceberg_partition_spec(path, [("day", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [("EU", "d2", 3), ("AP", "d2", 4)],
        "region string, day string, v long"), path)
    # position-delete rows from BOTH eras in one pass
    delete_iceberg_where(spark, path, "v", 2, 3)
    got = read_iceberg_table(spark, path)
    assert _rows(got) == [("AP", "d2", 4), ("EU", "d1", 1)]


def test_v1_table_refuses(spark, tmp_path):
    # hand-write a minimal v1 metadata file
    import json as _json

    path = str(tmp_path / "v1t")
    os.makedirs(os.path.join(path, "metadata"))
    meta = {
        "format-version": 1, "table-uuid": "u", "location": path,
        "last-updated-ms": 0, "last-column-id": 1,
        "schema": {"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "v", "required": False, "type": "long"}]},
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "v", "required": False, "type": "long"}]}],
        "current-schema-id": 0,
        "partition-spec": [], "partition-specs": [
            {"spec-id": 0, "fields": []}],
        "default-spec-id": 0, "last-partition-id": 999,
        "properties": {}, "snapshots": [], "snapshot-log": [],
    }
    with open(os.path.join(path, "metadata", "v1.metadata.json"), "w") as f:
        _json.dump(meta, f)
    with pytest.raises(IcebergProtocolError, match="format-version 2"):
        evolve_iceberg_partition_spec(path, [("v", "identity")])


def test_unknown_column_and_bad_transform_refuse(spark, tmp_path):
    path = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not a column"):
        evolve_iceberg_partition_spec(path, [("nope", "identity")])
    with pytest.raises(IcebergProtocolError):
        evolve_iceberg_partition_spec(path, [("v", "zigzag[3]")])


def test_changelog_stream_and_batch_across_evolution(spark, tmp_path):
    """Commits on both sides of a partition evolution stream with each
    era's identity values injected from its own spec's tuples, with
    exact batch-changelog parity (the cross-spec _identity_sources
    union feeds both surfaces)."""
    import os

    from monday_etl_spark.iceberg_changes import read_iceberg_changes
    from monday_etl_spark.iceberg_import import iceberg_history
    from monday_etl_spark.iceberg_source import stream_iceberg

    path = _mk(spark, tmp_path, partition_by=[("region", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [("EU", "d1", 1), ("US", "d1", 2)],
        "region string, day string, v long").coalesce(1), path)
    first = iceberg_history(path)[0]["snapshot_id"]
    evolve_iceberg_partition_spec(path, [("day", "identity")])
    append_iceberg(spark, spark.createDataFrame(
        [("EU", "d2", 3), ("AP", "d2", 4)],
        "region string, day string, v long").coalesce(1), path)
    delete_iceberg_where(spark, path, "v", 2, 3)  # one row per era

    stream = stream_iceberg(spark, path, starting_snapshot_id=first,
                            changelog=True)
    out = os.path.join(str(tmp_path), "rows")

    def handle(batch, bid):
        batch.write.mode("overwrite").parquet(
            os.path.join(out, f"batch={bid}"))

    q = (stream.writeStream.foreachBatch(handle)
         .option("checkpointLocation",
                 os.path.join(str(tmp_path), "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    streamed = {(r.region, r.day, r.v, r._change_type,
                 r._commit_snapshot_id)
                for r in spark.read.parquet(out).collect()}
    batch_rows = {(r.region, r.day, r.v, r._change_type,
                   r._commit_snapshot_id)
                  for r in read_iceberg_changes(spark, path).collect()}
    assert streamed == batch_rows
    flat = {(r.region, r.day, r.v, r._change_type)
            for r in spark.read.parquet(out).collect()}
    assert flat == {
        ("EU", "d1", 1, "insert"), ("US", "d1", 2, "insert"),
        ("EU", "d2", 3, "insert"), ("AP", "d2", 4, "insert"),
        ("US", "d1", 2, "delete"), ("EU", "d2", 3, "delete"),
    }
