"""Delta snapshot export: protocol shape, manifest equivalence, refusals.

delta-spark isn't in the container, so the bridge is verified against the
public Delta PROTOCOL.md contract directly: exactly one protocol + one
metaData action, schemaString equal to the manifest's logical schema, the
add-file set equal to the manifest's file set, per-file sizes/stats true
of the files on disk — and the referenced files re-read (plain parquet)
row-identical to read_version, which is what any Delta reader would
materialize from this log.
"""

from __future__ import annotations

import json
import os
import urllib.parse

from monday_etl_spark.delta_export import export_delta_log, read_exported_files
from monday_etl_spark.tableformat import (
    _read_manifest,
    current_version,
    merge_versioned,
    read_version,
    rename_column,
    write_versioned,
)


def _df(spark, n=120):
    return spark.createDataFrame(
        [(i, f"name_{i}", float(i)) for i in range(n)],
        "id bigint, name string, v double",
    )


def _updates(spark):
    return spark.createDataFrame(
        [(3, "upd_3", 300.0), (500, "new_500", 500.0)],
        "id bigint, name string, v double",
    )


def test_export_matches_manifest_and_rereads_identically(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_versioned(_df(spark), path, key="id", n_buckets=4,
                    stats_cols=["id", "v"])
    merge_versioned(spark, path, _updates(spark))

    log_file = export_delta_log(path)
    assert log_file.endswith(os.path.join("_delta_log",
                                          "00000000000000000000.json"))

    with open(log_file) as fh:
        actions = [json.loads(ln) for ln in fh if ln.strip()]
    protos = [a for a in actions if "protocol" in a]
    metas = [a for a in actions if "metaData" in a]
    adds = [a["add"] for a in actions if "add" in a]
    assert len(protos) == 1 and len(metas) == 1
    assert protos[0]["protocol"] == {"minReaderVersion": 1,
                                     "minWriterVersion": 2}

    man = _read_manifest(path, current_version(path))
    man_files = sorted(f for fs in man["buckets"].values() for f in fs)
    add_paths = sorted(urllib.parse.unquote(a["path"]) for a in adds)
    assert add_paths == man_files

    # schemaString IS the manifest's logical schema (Spark JSON == Delta's
    # schema serialization); __bucket never appears (directory-only layout)
    assert (json.loads(metas[0]["metaData"]["schemaString"])
            == json.loads(man["schema"]))
    assert "__bucket" not in metas[0]["metaData"]["schemaString"]
    assert metas[0]["metaData"]["partitionColumns"] == []

    # sizes and stats are true of the files on disk
    total_records = 0
    for a in adds:
        absf = os.path.join(path, urllib.parse.unquote(a["path"]))
        assert os.path.getsize(absf) == a["size"]
        stats = json.loads(a["stats"])
        total_records += stats["numRecords"]
        assert set(stats["minValues"]) == {"id", "v"}
        for c in ("id", "v"):
            assert stats["minValues"][c] <= stats["maxValues"][c]
    expect = read_version(spark, path)
    assert total_records == expect.count()

    # what a Delta reader materializes == read_version, row for row
    files = [os.path.join(path, p) for p in add_paths]
    got = sorted(map(tuple, spark.read.parquet(*files)
                 .select("id", "name", "v").collect()))
    want = sorted(map(tuple, expect.select("id", "name", "v").collect()))
    assert got == want


def test_export_idempotent_and_append_only(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_versioned(_df(spark), path, key="id", n_buckets=4)
    first = export_delta_log(path)
    assert export_delta_log(path) == first  # same snapshot: no-op

    # a different snapshot must not silently re-point version 0
    merge_versioned(spark, path, _updates(spark))
    import pytest

    with pytest.raises(FileExistsError):
        export_delta_log(path)


def test_export_refuses_alias_manifests(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_versioned(_df(spark), path, key="id", n_buckets=4)
    rename_column(path, "v", "value")
    import pytest

    with pytest.raises(NotImplementedError):
        export_delta_log(path)


def test_export_pinned_old_version(spark, tmp_path):
    """Exporting an explicit (e.g. tagged) old version freezes THAT
    snapshot: the add set is version 1's file set, not the latest's."""
    path = str(tmp_path / "tbl")
    write_versioned(_df(spark), path, key="id", n_buckets=4)
    merge_versioned(spark, path, _updates(spark))

    export_delta_log(path, version=1)
    meta, adds = read_exported_files(
        os.path.join(path, "_delta_log", "00000000000000000000.json"))
    man1 = _read_manifest(path, 1)
    assert (sorted(urllib.parse.unquote(a["path"]) for a in adds)
            == sorted(f for fs in man1["buckets"].values() for f in fs))
    n = sum(json.loads(a["stats"])["numRecords"] for a in adds)
    assert n == read_version(spark, path, 1).count() == 120


def test_exported_commit_time_is_the_original_manifest_time(spark, tmp_path):
    """Timestamp addressing on an exported table reflects the snapshot's
    TRUE commit time (manifest committed_at), not the export run's clock
    or the log file's mtime."""
    from monday_etl_spark.delta_import import commit_timestamps
    from monday_etl_spark.tableformat import _read_manifest

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    write_versioned(df, path, key="id", n_buckets=1)
    export_delta_log(path)
    # tableformat versions are 1-based; the exported Delta log is v0
    want_ms = int(float(_read_manifest(path, 1)["committed_at"]) * 1000)
    assert commit_timestamps(path)[0] == want_ms
