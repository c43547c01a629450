"""rename_column / drop_column: metadata-only schema evolution.

- rename is metadata-only (no new data dirs), exact through old+new files,
  key columns and stats rekey, time travel keeps each version's own names;
- genuine NULLs survive the cross-epoch read;
- drop hides the column; NAME REUSE after rename/drop is allowed (r07,
  field-id resolution): the reused name binds a FRESH field id, so the
  dropped column's bytes stay dead in old files — resurrection is
  structurally impossible, not guarded by a block;
- legacy (pre-field-id) manifests keep the old hard block, since they
  resolve historical names inside old files BY NAME;
- compaction and MERGE after a rename keep resolving pre-rename files.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from monday_etl_spark.tableformat import (
    drop_column,
    files_for_range,
    merge_versioned,
    read_version,
    read_where,
    rename_column,
    write_versioned,
)

N = 600


def _df(spark):
    # v NULL on every 5th row: genuine NULLs must survive the alias read
    return spark.createDataFrame(
        [(i, None if i % 5 == 0 else i * 10, f"s{i % 7}") for i in range(N)],
        "id bigint, v bigint, s string",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _n_data_dirs(path):
    return len(glob.glob(os.path.join(path, "_data", "c*")))


def test_rename_is_metadata_only_and_exact(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # distribution="none" keeps one file per (ordered input partition,
    # bucket) so per-file v ranges stay narrow — the pruning this test's
    # stats-rekey assertion needs (hash distribution packs each bucket into
    # one file whose v range spans everything)
    write_versioned(_df(spark), path, key="id", n_buckets=4,
                    stats_cols=["v"], distribution="none")
    before = _rows(read_version(spark, path))
    dirs_before = _n_data_dirs(path)

    assert rename_column(path, "v", "amount") == 2
    assert _n_data_dirs(path) == dirs_before  # zero data I/O

    got = read_version(spark, path)
    assert got.columns == ["id", "amount", "s"]
    assert _rows(got) == before  # same values, including the NULL rows
    # time travel: v1 answers under its own name
    assert read_version(spark, path, 1).columns == ["id", "v", "s"]

    # stats rekeyed: skipping on the NEW name still prunes and stays exact
    keep, pruned = files_for_range(path, "amount", 100, 200)
    assert pruned > 0 and keep
    assert _rows(read_where(spark, path, "amount", 100, 200)) == _rows(
        got.filter(F.col("amount").between(100, 200))
    )


def test_merge_and_compact_after_rename_resolve_old_files(spark, tmp_path):
    from monday_etl_spark.tableformat import compact_versioned

    path = str(tmp_path / "tbl")
    write_versioned(_df(spark), path, key="id", n_buckets=4)
    rename_column(path, "v", "amount")

    # merge uses the CURRENT name; its rewritten buckets get the new
    # physical name while untouched buckets keep the old one — both resolve
    merge_versioned(spark, path, spark.createDataFrame(
        [(1, -11, "sX"), (N, -99, "sNEW")],
        "id bigint, amount bigint, s string",
    ))
    rows = {r.id: r for r in read_version(spark, path).collect()}
    assert rows[1].amount == -11 and rows[N].amount == -99
    assert rows[2].amount == 20          # pre-rename file, via alias
    assert rows[5].amount is None        # genuine NULL, not alias fallout
    assert len(rows) == N + 1

    compact_versioned(spark, path)
    rows2 = {r.id: r for r in read_version(spark, path).collect()}
    assert {i: (r.amount, r.s) for i, r in rows.items()} == \
        {i: (r.amount, r.s) for i, r in rows2.items()}


def test_rename_key_column_keeps_layout(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_versioned(_df(spark), path, key="id", n_buckets=4)
    rename_column(path, "id", "entity_id")
    # bucketing hashes values, not names: a merge keyed on the new name
    # routes to the same buckets the v1 layout used
    merge_versioned(spark, path, spark.createDataFrame(
        [(3, -33, "sK")], "entity_id bigint, v bigint, s string"))
    got = read_version(spark, path)
    assert got.columns == ["entity_id", "v", "s"]
    assert [(r.v, r.s) for r in got.filter("entity_id = 3").collect()] == \
        [(-33, "sK")]
    assert got.count() == N


def test_drop_then_name_reuse_keeps_old_bytes_dead(spark, tmp_path):
    """The r06-verdict limitation, lifted: after drop, a NEW column may
    take the dropped name — it binds a fresh field id, so every pre-drop
    file resolves the reused name to NULL (the dead id's bytes never
    surface), and only rows written after the rebirth carry values."""
    path = str(tmp_path / "tbl")
    write_versioned(_df(spark), path, key="id", n_buckets=4)
    assert drop_column(path, "s") == 2
    got = read_version(spark, path)
    assert got.columns == ["id", "v"]
    assert read_version(spark, path, 1).columns == ["id", "v", "s"]

    # rebirth via evolution: allowed, and old strings must NOT come back
    merge_versioned(
        spark, path,
        spark.createDataFrame([(1, 10, "fresh")],
                              "id bigint, v bigint, s string"),
        allow_schema_evolution=True,
    )
    rows = {r.id: r.s for r in read_version(spark, path).collect()}
    assert rows[1] == "fresh"
    assert all(v is None for i, v in rows.items() if i != 1)  # bytes dead
    # the dropped version still time-travels WITHOUT the reborn column's
    # values bleeding back
    assert read_version(spark, path, 2).columns == ["id", "v"]

    # a key column still cannot be dropped
    with pytest.raises(ValueError, match="key column"):
        drop_column(path, "id")
    # a LIVE name still cannot be taken
    with pytest.raises(ValueError, match="live column"):
        rename_column(path, "v", "s")


def test_rename_chain_and_name_reuse_resolution(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_versioned(_df(spark), path, key="id", n_buckets=4)
    rename_column(path, "v", "v2")
    merge_versioned(spark, path, spark.createDataFrame(
        [(N, -1, "sA")], "id bigint, v2 bigint, s string"))
    rename_column(path, "v2", "v3")
    got = read_version(spark, path)
    assert got.columns == ["id", "v3", "s"]
    rows = {r.id: r.v3 for r in got.collect()}
    assert rows[2] == 20 and rows[N] == -1 and rows[5] is None

    # reusing a historical chain name for ANOTHER live column: the id
    # travels with the column, so s's strings now answer under the name
    # 'v' while v3 keeps the original numeric column — no crosstalk
    rename_column(path, "s", "v")
    got2 = read_version(spark, path)
    assert got2.columns == ["id", "v3", "v"]
    r2 = {r.id: (r.v3, r.v) for r in got2.collect()}
    assert r2[2] == (20, "s2") and r2[N] == (-1, "sA")
    assert r2[5] == (None, "s5")


def test_legacy_manifest_keeps_reuse_block(spark, tmp_path):
    """Tables whose manifests predate field ids resolve historical names
    inside old files BY NAME — for them the reuse block must survive."""
    import json as _json

    path = str(tmp_path / "tbl")
    write_versioned(_df(spark), path, key="id", n_buckets=4)
    # strip the field-id bookkeeping: the manifest a pre-r07 writer left
    mpath = os.path.join(path, "_manifests", "v00001.json")
    man = _json.load(open(mpath))
    for k in ("field_ids", "next_field_id", "epochs"):
        man.pop(k, None)
    os.remove(mpath)
    with open(mpath, "w") as fh:
        _json.dump(man, fh)

    rename_column(path, "v", "amount")
    # legacy alias read still resolves old files
    rows = {r.id: r.amount for r in read_version(spark, path).collect()}
    assert rows[2] == 20 and rows[5] is None
    # and historical names stay blocked for reuse
    with pytest.raises(ValueError, match="already used"):
        rename_column(path, "s", "v")
    with pytest.raises(ValueError, match="resurrect"):
        drop_column(path, "s")
        merge_versioned(
            spark, path,
            spark.createDataFrame([(1, 10, "fresh")],
                                  "id bigint, amount bigint, s string"),
            allow_schema_evolution=True,
        )
