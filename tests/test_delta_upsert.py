"""Copy-on-write MERGE upsert on the Delta bridge: matched-file-only
rewrites, CDF update pre/post-images, exactly-once replays, refusals."""

from __future__ import annotations

import json
import os

import pytest

from monday_etl_spark.delta_cdf import read_delta_changes
from monday_etl_spark.delta_import import (
    delta_versions,
    read_delta,
    upsert_delta,
)

from .test_delta_cdf import _add, _cdf_table, _commit, _write_file


def test_upsert_rewrites_matched_files_only(spark, tmp_path):
    table = _cdf_table(spark, tmp_path)       # f0: ids 0..9
    f1 = _write_file(spark, table, "f1",
                     [(i, float(i)) for i in range(100, 110)])
    _commit(table, 1, [_add(f1)])

    # source updates ids 3,4 (both live in f0) and inserts 500
    src = spark.createDataFrame(
        [(3, 33.0), (4, 44.0), (500, 5.0)], "id long, v double")
    v = upsert_delta(spark, src, table, ["id"],
                     app_id="merge-pipe", txn_version=0)
    assert v == 2

    rows = {r.id: r.v for r in read_delta(spark, table).collect()}
    assert rows[3] == 33.0 and rows[4] == 44.0 and rows[500] == 5.0
    assert rows[0] == 0.0 and rows[100] == 100.0
    assert len(rows) == 21

    # ONLY f0 was rewritten: f1 is still a referenced data file
    live = {os.path.basename(f) for f in
            read_delta(spark, table).inputFiles()}
    assert "f1.parquet" in live and "f0.parquet" not in live

    # the commit's change feed carries the MERGE row-level truth
    feed = {(r.id, r._change_type)
            for r in read_delta_changes(spark, table, 2, 2).collect()}
    assert (3, "update_preimage") in feed and (3, "update_postimage") in feed
    assert (500, "insert") in feed
    pre = {i for i, t in feed if t == "update_preimage"}
    assert pre == {3, 4}

    # exactly-once: the same (app_id, txn_version) replays as a no-op
    again = upsert_delta(spark, src, table, ["id"],
                         app_id="merge-pipe", txn_version=0)
    assert again == 2 and delta_versions(table) == [0, 1, 2]

    # pure insert (no matches): nothing removed
    v3 = upsert_delta(
        spark,
        spark.createDataFrame([(900, 9.0)], "id long, v double"),
        table, ["id"])
    with open(os.path.join(table, "_delta_log", f"{3:020d}.json")) as fh:
        acts = [json.loads(line) for line in fh if line.strip()]
    assert v3 == 3 and not any("remove" in a for a in acts)


def test_upsert_refusals(spark, tmp_path):
    table = _cdf_table(spark, tmp_path, name="ref")
    dup = spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], "id long, v double")
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_delta(spark, dup, table, ["id"])
    bad = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert_delta(spark, bad, table, ["id"])
    with pytest.raises(ValueError, match="key columns"):
        upsert_delta(spark, spark.createDataFrame(
            [(1, 1.0)], "id long, v double"), table, ["ghost"])
