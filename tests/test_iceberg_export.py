"""Iceberg snapshot export: metadata/manifest contract, name mapping,
refusals, and row-identical re-reads.

No Iceberg runtime exists in the container, so the bridge is verified
against the public table-spec contract directly: v1.metadata.json +
version-hint discovery, Avro manifest list -> manifest -> data files
(parsed with the spec-subset ``avro_ocf`` reader), per-file record counts
and single-value-serialized bounds true of the files on disk, and the
name-mapping read path materializing exactly ``read_version``'s rows —
including the renamed-then-APPENDED case the Delta bridge must refuse.
"""

from __future__ import annotations

import json
import os
import struct

import pytest

from monday_etl_spark.iceberg_export import (
    IcebergExportError,
    export_iceberg,
    iceberg_files,
    read_iceberg,
    read_iceberg_meta,
)
from monday_etl_spark.tableformat import (
    drop_column,
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


def test_export_contract_and_reread(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_versioned(_df(spark), path, key="id", n_buckets=4,
                    stats_cols=["id", "v"])

    meta_file = export_iceberg(path)
    assert meta_file.endswith(os.path.join("metadata", "v1.metadata.json"))
    assert export_iceberg(path) == meta_file  # idempotent

    meta = read_iceberg_meta(path)
    assert meta["format-version"] == 2
    schema = meta["schemas"][0]
    assert [f["name"] for f in schema["fields"]] == ["id", "name", "v"]
    ids = [f["id"] for f in schema["fields"]]
    assert len(set(ids)) == 3 and meta["last-column-id"] >= max(ids)

    # manifest chain resolves; counts/sizes/bounds are true of the files
    dfiles = iceberg_files(path)
    expect = read_version(spark, path)
    assert sum(d["record_count"] for d in dfiles) == expect.count()
    fid = {f["name"]: f["id"] for f in schema["fields"]}
    for d in dfiles:
        p = d["file_path"]
        assert p.startswith("file://")
        assert os.path.getsize(p[len("file://"):]) \
            == d["file_size_in_bytes"]
        lows = {e["key"]: e["value"] for e in (d["lower_bounds"] or [])}
        highs = {e["key"]: e["value"] for e in (d["upper_bounds"] or [])}
        assert set(lows) == {fid["id"], fid["v"]}
        # single-value serialization: little-endian long / double
        assert struct.unpack("<q", lows[fid["id"]])[0] \
            <= struct.unpack("<q", highs[fid["id"]])[0]
        assert struct.unpack("<d", lows[fid["v"]])[0] \
            <= struct.unpack("<d", highs[fid["v"]])[0]

    got = read_iceberg(spark, path)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, expect.collect()))

    # a different snapshot must not silently re-point v1
    merge_versioned(spark, path, spark.createDataFrame(
        [(3, "upd", 300.0)], "id bigint, name string, v double"))
    with pytest.raises(FileExistsError):
        export_iceberg(path)


def test_renamed_then_appended_exports_via_name_mapping(spark, tmp_path):
    """The case the Delta bridge refuses (one physicalName per column):
    Iceberg name mapping carries BOTH footer names for the renamed field,
    so old and new files resolve — and values surface under the new
    logical name."""
    path = str(tmp_path / "tbl")
    write_versioned(_df(spark), path, key="id", n_buckets=4)
    rename_column(path, "v", "value")
    merge_versioned(spark, path, spark.createDataFrame(
        [(3, "upd_3", 300.0), (500, "new", 500.0)],
        "id bigint, name string, value double"))

    export_iceberg(path)
    meta = read_iceberg_meta(path)
    mapping = {m["field-id"]: m["names"] for m in json.loads(
        meta["properties"]["schema.name-mapping.default"])}
    value_id = next(f["id"] for f in meta["schemas"][0]["fields"]
                    if f["name"] == "value")
    assert sorted(mapping[value_id]) == ["v", "value"]

    got = read_iceberg(spark, path)
    assert got.columns == ["id", "name", "value"]
    want = read_version(spark, path)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
    rows = dict((r.id, r.value) for r in got.collect())
    assert rows[3] == 300.0 and rows[500] == 500.0 and rows[7] == 7.0


def test_export_refuses_reused_dropped_name(spark, tmp_path):
    """Same erased-data hazard as the Delta bridge: a dropped column's
    name reused while pre-drop files are still referenced would resurrect
    dead bytes through name mapping — refuse loudly."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"n{i}", f"OLDSECRET{i}") for i in range(40)],
        "id bigint, name string, token string",
    )
    write_versioned(df, path, key="id", n_buckets=4)
    drop_column(path, "token")
    merge_versioned(spark, path, spark.createDataFrame(
        [(3, "n3", "fresh")], "id bigint, name string, token string"),
        allow_schema_evolution=True)
    with pytest.raises(IcebergExportError, match="resurrect"):
        export_iceberg(path)


def test_array_columns_export_with_minted_element_ids(spark, tmp_path):
    path = str(tmp_path / "emb")
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "id bigint, emb array<double>",
    )
    write_versioned(df, path, key="id", n_buckets=2)
    export_iceberg(path)
    meta = read_iceberg_meta(path)
    emb = next(f for f in meta["schemas"][0]["fields"]
               if f["name"] == "emb")
    assert emb["type"]["type"] == "list"
    assert emb["type"]["element"] == "double"
    top_ids = {f["id"] for f in meta["schemas"][0]["fields"]}
    assert emb["type"]["element-id"] not in top_ids
    got = read_iceberg(spark, path)
    assert sorted((r.id, tuple(r.emb)) for r in got.collect()) \
        == [(1, (1.0, 2.0)), (2, (3.0, 4.0))]


def test_nested_struct_map_roundtrip(spark, tmp_path):
    """array<struct>, bare struct, and map columns export with minted
    nested field ids, nested name-mapping entries, and re-read
    row-identical through the import bridge."""
    path = str(tmp_path / "nested")
    df = spark.createDataFrame(
        [(1, [("a", 1.0), ("b", 2.0)], ("x", 10), {"k1": 5}),
         (2, [("c", 3.0)], ("y", 20), {"k2": 7})],
        "id bigint, items array<struct<k:string, v:double>>, "
        "meta struct<tag:string, n:long>, counts map<string, long>",
    )
    write_versioned(df, path, key="id", n_buckets=2, stats_cols=["id"])
    export_iceberg(path)

    meta = read_iceberg_meta(path)
    fields = {f["name"]: f for f in meta["schemas"][0]["fields"]}
    items_t = fields["items"]["type"]
    assert items_t["type"] == "list" and items_t["element"]["type"] == "struct"
    el_fields = items_t["element"]["fields"]
    assert [f["name"] for f in el_fields] == ["k", "v"]
    meta_t = fields["meta"]["type"]
    assert meta_t["type"] == "struct"
    counts_t = fields["counts"]["type"]
    assert counts_t["type"] == "map" and counts_t["key"] == "string"
    # every nested id is unique and above the top-level range
    def _ids(t):
        if not isinstance(t, dict):
            return []
        if t["type"] == "struct":
            return [i for f in t["fields"]
                    for i in [f["id"], *_ids(f["type"])]]
        if t["type"] == "list":
            return [t["element-id"], *_ids(t["element"])]
        return [t["key-id"], t["value-id"], *_ids(t["key"]), *_ids(t["value"])]
    nested = [i for f in fields.values() for i in _ids(f["type"])]
    top = [f["id"] for f in fields.values()]
    assert len(set(nested + top)) == len(nested) + len(top)
    # the name mapping covers nested fields (spec: element/key/value names)
    mapping = json.loads(
        meta["properties"]["schema.name-mapping.default"])
    items_m = next(m for m in mapping if "items" in m["names"])
    assert items_m["fields"][0]["names"] == ["element"]
    assert {f["names"][0] for f in items_m["fields"][0]["fields"]} \
        == {"k", "v"}

    got = read_iceberg(spark, path)
    want = sorted(
        (r.id, tuple(tuple(i) for i in r.items), tuple(r.meta),
         tuple(sorted(r.counts.items())))
        for r in df.collect())
    have = sorted(
        (r.id, tuple(tuple(i) for i in r.items), tuple(r.meta),
         tuple(sorted(r.counts.items())))
        for r in got.collect())
    assert have == want
