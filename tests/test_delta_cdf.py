"""Delta Change Data Feed: CDC writes from the DV DELETE, the
table_changes-style reader, and its refusal surfaces.

External commits are hand-built against the public PROTOCOL.md (§Add
CDC File); the reader must serve cdc-bearing commits from change files
only, reconstruct blind appends / whole-file removes, and refuse
anything it cannot reconstruct faithfully."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from monday_etl_spark.delta_cdf import read_delta_changes
from monday_etl_spark.delta_import import (
    DeltaProtocolError,
    append_delta,
    delete_delta_where,
    read_delta,
    vacuum_delta,
)

_SCHEMA_JSON = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}},
    ],
})


def _write_file(spark, table, name, rows):
    import shutil

    tmp = os.path.join(table, f"_stage_{name}")
    spark.createDataFrame(rows, "id long, v double").coalesce(1) \
        .write.parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    rel = f"data/{name}.parquet"
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    os.replace(os.path.join(tmp, part), os.path.join(table, rel))
    shutil.rmtree(tmp)
    return rel


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def _add(rel):
    return {"add": {"path": rel, "partitionValues": {}, "size": 1,
                    "modificationTime": 0, "dataChange": True}}


def _cdf_table(spark, tmp_path, name="cdf"):
    table = str(tmp_path / name)
    os.makedirs(table)
    f0 = _write_file(spark, table, "f0", [(i, float(i)) for i in range(10)])
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors",
                                         "changeDataFeed"]}},
        {"metaData": {"id": "cdf-fixture",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": _SCHEMA_JSON,
                      "partitionColumns": [],
                      "configuration": {
                          "delta.enableChangeDataFeed": "true"}}},
        _add(f0),
    ])
    return table


def test_delete_writes_cdc_and_feed_reads_back(spark, tmp_path):
    """DV DELETE on a CDF table writes _change_data pre-images + cdc
    actions; the reader serves appends from add reconstruction and the
    delete from its change files, with version/timestamp stamps."""
    table = _cdf_table(spark, tmp_path)
    # v1: blind append (no cdc actions written — reconstructed)
    append_delta(
        spark,
        spark.createDataFrame([(i, float(i)) for i in range(100, 105)],
                              "id long, v double"),
        table)
    # v2: DV delete (cdc files written)
    v = delete_delta_where(spark, table, "id", 3, 101)
    assert v == 2
    with open(os.path.join(table, "_delta_log", f"{2:020d}.json")) as fh:
        acts = [json.loads(line) for line in fh if line.strip()]
    cdc = [a["cdc"] for a in acts if "cdc" in a]
    assert cdc, "DELETE on a CDF table must commit cdc actions"
    assert all(c["path"].startswith("_change_data/") for c in cdc)
    assert all(c["dataChange"] is False for c in cdc)

    feed = read_delta_changes(spark, table, 1, 2)
    assert set(feed.columns) == {"id", "v", "_change_type",
                                 "_commit_version", "_commit_timestamp"}
    rows = {(r["id"], r["_change_type"], r["_commit_version"])
            for r in feed.collect()}
    want = {(i, "insert", 1) for i in range(100, 105)} \
        | {(i, "delete", 2) for i in (3, 4, 5, 6, 7, 8, 9, 100, 101)}
    assert rows == want
    # the snapshot agrees with replaying the feed over v0
    assert sorted(r["id"] for r in read_delta(spark, table).collect()) \
        == [0, 1, 2, 102, 103, 104]
    # timestamps come from the commit clock, monotone across versions
    t = {r["_commit_version"]: r["_commit_timestamp"]
         for r in feed.collect()}
    assert t[1] <= t[2]


def test_feed_reconstructs_whole_file_remove(spark, tmp_path):
    """A remove-only commit (external truncate shape) without cdc files
    reconstructs: every live row of the removed file — prior DV applied
    — is a delete."""
    from monday_etl_spark.roaring import write_dv_file

    table = _cdf_table(spark, tmp_path)
    # v1: an external DV commit WITH a cdc file would be fine; instead
    # re-add f0 with a DV via our own DELETE so v2's remove sees a
    # DV-carrying file (our delete writes cdc, keeping v1 readable)
    delete_delta_where(spark, table, "id", 0, 1)
    # v2: external remove-only commit (no cdc): whole-file delete
    _commit(table, 2, [
        {"remove": {"path": "data/f0.parquet", "dataChange": True}},
    ])
    feed = read_delta_changes(spark, table, 2, 2)
    got = sorted(r["id"] for r in feed.collect())
    assert got == [2, 3, 4, 5, 6, 7, 8, 9]  # 0,1 were DV-deleted at v1
    assert {r["_change_type"] for r in feed.collect()} == {"delete"}
    # write_dv_file import kept for parity with other DV tests
    assert callable(write_dv_file)


def test_feed_refusals(spark, tmp_path):
    """Non-CDF table, DV-update commit without cdc, and bad ranges all
    refuse loudly instead of inventing change rows."""
    # non-CDF table
    plain = str(tmp_path / "plain")
    os.makedirs(plain)
    f0 = _write_file(spark, plain, "f0", [(1, 1.0)])
    _commit(plain, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "x",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": _SCHEMA_JSON,
                      "partitionColumns": [], "configuration": {}}},
        _add(f0),
    ])
    with pytest.raises(DeltaProtocolError, match="enableChangeDataFeed"):
        read_delta_changes(spark, plain, 0)

    # DV-update without cdc: external engine rewrote a vector silently
    table = _cdf_table(spark, tmp_path)
    from monday_etl_spark.roaring import write_dv_file

    dv_path = os.path.join(table, "ext_dv.bin")
    (off, size), = write_dv_file(dv_path, [[0, 1]])
    readd = _add("data/f0.parquet")
    readd["add"]["deletionVector"] = {
        "storageType": "p", "pathOrInlineDv": dv_path,
        "offset": off, "sizeInBytes": size, "cardinality": 2}
    _commit(table, 1, [
        {"remove": {"path": "data/f0.parquet", "dataChange": True}},
        readd,
    ])
    with pytest.raises(DeltaProtocolError, match="without\\s+change-data"):
        read_delta_changes(spark, table, 1, 1)

    with pytest.raises(ValueError, match="bad version range"):
        read_delta_changes(spark, table, 5, 9)


def test_vacuum_keeps_retained_change_data(spark, tmp_path):
    """VACUUM never sweeps change-data files for commits inside the
    retained window: the feed stays readable wherever time travel
    does."""
    table = _cdf_table(spark, tmp_path)
    delete_delta_where(spark, table, "id", 0, 2)   # v1: cdc written
    append_delta(
        spark,
        spark.createDataFrame([(50, 50.0)], "id long, v double"),
        table)                                      # v2
    deleted = vacuum_delta(spark, table, retain_last=3, grace_s=0.0)
    assert deleted == []  # everything is referenced or retained-cdc
    feed = read_delta_changes(spark, table, 1, 1)
    assert sorted(r["id"] for r in feed.collect()) == [0, 1, 2]


def test_restore_and_compaction_in_the_feed(spark, tmp_path):
    """RESTORE on a CDF table writes the NET diff as change rows (the
    back-in rows as inserts here); a compaction inside the range emits
    nothing (dataChange=false both sides)."""
    from monday_etl_spark.delta_import import compact_delta, restore_delta

    table = _cdf_table(spark, tmp_path, name="rst")
    delete_delta_where(spark, table, "id", 0, 3)      # v1: cdc deletes
    compact_delta(spark, table)                       # v2: invisible
    restore_delta(spark, table, 0)                    # v3: cdc inserts

    feed = read_delta_changes(spark, table, 1, 3)
    rows = {(r["id"], r["_change_type"], r["_commit_version"])
            for r in feed.collect()}
    want = {(i, "delete", 1) for i in range(4)} \
        | {(i, "insert", 3) for i in range(4)}
    assert rows == want
    # the restored head serves the original row set again
    assert sorted(r.id for r in read_delta(spark, table).collect()) \
        == list(range(10))


def _ci(ts_ms):
    return {"commitInfo": {"timestamp": ts_ms}}


def test_feed_timestamp_addressing(spark, tmp_path):
    """Timestamp bounds resolve against the monotone commit clock:
    starting → earliest commit at/after, ending → latest commit
    at/before; boundary-exact, between-commit, and out-of-range cases
    match delta-spark's startingTimestamp/endingTimestamp contract."""
    table = str(tmp_path / "ts")
    os.makedirs(table)
    f0 = _write_file(spark, table, "f0", [(0, 0.0)])
    f1 = _write_file(spark, table, "f1", [(1, 1.0)])
    f2 = _write_file(spark, table, "f2", [(2, 2.0)])
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "ts-fixture",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": _SCHEMA_JSON,
                      "partitionColumns": [],
                      "configuration": {
                          "delta.enableChangeDataFeed": "true"}}},
        _add(f0), _ci(1000),
    ])
    _commit(table, 1, [_add(f1), _ci(2000)])
    _commit(table, 2, [_add(f2), _ci(3000)])

    def ids(**kw):
        return sorted(r["id"] for r in
                      read_delta_changes(spark, table, **kw).collect())

    # between commits: start rounds up, end rounds down
    assert ids(starting_timestamp=1500, ending_timestamp=2500) == [1]
    # boundary-exact on both sides
    assert ids(starting_timestamp=2000, ending_timestamp=3000) == [1, 2]
    # open end defaults to the latest version
    assert ids(starting_timestamp=1500) == [1, 2]
    # mixing a version bound with a timestamp bound on the OTHER side
    assert ids(starting_version=1, ending_timestamp=2999) == [1]
    with pytest.raises(ValueError, match="after the latest commit"):
        ids(starting_timestamp=9999)
    with pytest.raises(ValueError, match="before the first commit"):
        ids(starting_timestamp=1000, ending_timestamp=500)
    with pytest.raises(ValueError, match="not both"):
        read_delta_changes(spark, table, starting_version=0,
                           starting_timestamp=1000)
    with pytest.raises(ValueError, match="not both"):
        read_delta_changes(spark, table, starting_version=0,
                           ending_version=1, ending_timestamp=2000)
    with pytest.raises(ValueError, match="starting_version or"):
        read_delta_changes(spark, table)


def test_feed_refuses_pre_enablement_versions(spark, tmp_path):
    """CDF enabled mid-history: versions below the enablement carry no
    change-data files, so a pre-enablement copy-on-write rewrite
    (remove f / add g, no cdc) would over-report every surviving row as
    delete+insert. The reader refuses ranges that predate enablement,
    like delta-spark."""
    table = str(tmp_path / "late")
    os.makedirs(table)
    f0 = _write_file(spark, table, "f0", [(0, 0.0), (1, 1.0)])
    f1 = _write_file(spark, table, "f1", [(0, 0.0), (1, 1.0)])
    f2 = _write_file(spark, table, "f2", [(2, 2.0)])
    md = {"metaData": {"id": "late-fixture",
                       "format": {"provider": "parquet", "options": {}},
                       "schemaString": _SCHEMA_JSON,
                       "partitionColumns": [], "configuration": {}}}
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        md, _add(f0),
    ])
    # v1: pre-enablement COW rewrite (remove f0 / add f1, no cdc)
    _commit(table, 1, [
        {"remove": {"path": f0, "dataChange": True}}, _add(f1),
    ])
    # v2: enable CDF via a metaData action
    md_on = json.loads(json.dumps(md))
    md_on["metaData"]["configuration"] = {
        "delta.enableChangeDataFeed": "true"}
    _commit(table, 2, [md_on])
    # v3: post-enablement blind append (reconstructable)
    _commit(table, 3, [_add(f2)])

    with pytest.raises(DeltaProtocolError, match="off at version 0"):
        read_delta_changes(spark, table, 0)
    with pytest.raises(DeltaProtocolError, match="off at version 1"):
        read_delta_changes(spark, table, 1, 3)
    got = {(r["id"], r["_change_type"], r["_commit_version"])
           for r in read_delta_changes(spark, table, 2).collect()}
    assert got == {(2, "insert", 3)}

    # a disable INSIDE the range refuses even when CDF is back on later:
    # v4 disables, v5 re-enables — [3, 5] covers the dark commit
    md_off = json.loads(json.dumps(md))
    _commit(table, 4, [md_off])
    md_on2 = json.loads(json.dumps(md))
    md_on2["metaData"]["configuration"] = {
        "delta.enableChangeDataFeed": "true"}
    _commit(table, 5, [md_on2])
    with pytest.raises(DeltaProtocolError, match="off at version 4"):
        read_delta_changes(spark, table, 3, 5)
    # the re-enablement is the new floor: starting there serves again
    assert read_delta_changes(spark, table, 5).count() == 0


def test_feed_refuses_vacuumed_change_data(spark, tmp_path):
    """A change-data file swept from disk refuses loudly naming the
    version, instead of a raw parquet path-not-found deep in the
    scan."""
    import glob

    table = _cdf_table(spark, tmp_path)
    delete_delta_where(spark, table, "id", 0, 2)  # v1: cdc written
    assert sorted(
        r["id"] for r in
        read_delta_changes(spark, table, 1, 1).collect()) == [0, 1, 2]
    for f in glob.glob(os.path.join(table, "_change_data", "**", "*"),
                       recursive=True):
        if os.path.isfile(f):
            os.unlink(f)
    with pytest.raises(DeltaProtocolError, match="version 1.*vacuumed"):
        read_delta_changes(spark, table, 1, 1)


def test_feed_commit_range_cap(spark, tmp_path, monkeypatch):
    """Past the commit cap the reader refuses loudly naming the remedy
    (bounded windows): the plan grows at least one scan per commit."""
    from monday_etl_spark import delta_cdf as dc

    table = _cdf_table(spark, tmp_path)
    for i in range(2):
        append_delta(
            spark,
            spark.createDataFrame([(200 + i, 0.0)], "id long, v double"),
            table)
    monkeypatch.setattr(dc, "_CDF_MAX_COMMITS", 2)
    with pytest.raises(DeltaProtocolError, match="bounded windows"):
        read_delta_changes(spark, table, 0, 2)
    assert read_delta_changes(spark, table, 1, 2).count() == 2


def _mapped_schema(mode_cols):
    """schemaString for a column-mapped table: [(logical, physical, id,
    type)]."""
    return json.dumps({"type": "struct", "fields": [
        {"name": lname, "type": typ, "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": pname,
                      "delta.columnMapping.id": cid}}
        for lname, pname, cid, typ in mode_cols
    ]})


def _write_phys_file(table, name, cols, ids=None):
    """A parquet data file keyed by PHYSICAL column names; ``ids`` stamps
    parquet field ids (mode=id resolution)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    arrays, fields = [], []
    for i, (pname, typ, vals) in enumerate(cols):
        arrays.append(pa.array(vals, typ))
        fid = ids[i] if ids and i < len(ids) else None
        md = ({b"PARQUET:field_id": str(fid).encode()}
              if fid is not None else None)
        fields.append(pa.field(pname, typ, metadata=md))
    rel = f"data/{name}.parquet"
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    pq.write_table(
        pa.Table.from_arrays(arrays, schema=pa.schema(fields)),
        os.path.join(table, rel))
    return rel


def test_feed_over_column_mapped_table(spark, tmp_path):
    """CDF over column-mapped tables (previously refused): mode=name
    resolves data columns and partitionValues by physicalName, mode=id
    by parquet field id — both serve cdc commits and blind-append
    reconstruction under LOGICAL names, like delta-spark."""
    import pyarrow as pa

    for mode in ("name", "id"):
        table = str(tmp_path / f"mapped_{mode}")
        os.makedirs(table)
        schema_json = _mapped_schema([
            ("id", "col-aaa", 1, "long"),
            ("v", "col-bbb", 2, "double"),
            ("region", "col-ccc", 3, "string"),
        ])
        ids = [1, 2] if mode == "id" else None
        f0 = _write_phys_file(
            table, "f0",
            [("col-aaa", pa.int64(), [1, 2]),
             ("col-bbb", pa.float64(), [1.0, 2.0])], ids=ids)
        # cdc change file: physical names + literal _change_type
        c0 = _write_phys_file(
            table, "c0",
            [("col-aaa", pa.int64(), [2]),
             ("col-bbb", pa.float64(), [2.0]),
             ("_change_type", pa.string(), ["delete"])], ids=ids)
        _commit(table, 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": {"id": f"m-{mode}",
                          "format": {"provider": "parquet",
                                     "options": {}},
                          "schemaString": schema_json,
                          "partitionColumns": ["region"],
                          "configuration": {
                              "delta.enableChangeDataFeed": "true",
                              "delta.columnMapping.mode": mode,
                              "delta.columnMapping.maxColumnId": "3"}}},
            # partitionValues keyed by the PHYSICAL name
            {"add": {"path": f0, "partitionValues": {"col-ccc": "EU"},
                     "size": 1, "modificationTime": 0,
                     "dataChange": True}},
        ])
        # v1: a cdc-bearing delete commit
        _commit(table, 1, [
            {"cdc": {"path": c0, "partitionValues": {"col-ccc": "EU"},
                     "size": 1, "dataChange": False}},
            {"remove": {"path": f0, "dataChange": True}},
            {"add": {"path": _write_phys_file(
                table, "f1",
                [("col-aaa", pa.int64(), [1]),
                 ("col-bbb", pa.float64(), [1.0])], ids=ids),
                "partitionValues": {"col-ccc": "EU"}, "size": 1,
                "modificationTime": 0, "dataChange": False}},
        ])
        feed = read_delta_changes(spark, table, 0, 1)
        assert set(feed.columns) == {"id", "v", "region", "_change_type",
                                     "_commit_version",
                                     "_commit_timestamp"}
        rows = {(r["id"], r["v"], r["region"], r["_change_type"],
                 r["_commit_version"]) for r in feed.collect()}
        assert rows == {
            (1, 1.0, "EU", "insert", 0),
            (2, 2.0, "EU", "insert", 0),
            (2, 2.0, "EU", "delete", 1),
        }, f"mode={mode}: {rows}"


def test_enablement_check_opens_only_range_commits(spark, tmp_path,
                                                   monkeypatch):
    """The enablement-floor check is O(range), not O(retained history):
    with a checkpoint near the head, a 2-commit range at the head of a
    long log opens only the range's commit JSONs (plus the bounded
    post-checkpoint tail), never every retained commit (ADVICE r11 —
    previously every commit <= end was opened and fully parsed)."""
    import builtins

    from monday_etl_spark.delta_cdf import _check_cdf_enabled_over
    from monday_etl_spark.delta_import import (
        _list_commits,
        write_checkpoint,
    )

    table = _cdf_table(spark, tmp_path, "widehist")
    n = 24
    for i in range(1, n + 1):
        f = _write_file(spark, table, f"a{i}", [(100 + i, float(i))])
        _commit(table, i, [_add(f)])
    write_checkpoint(spark, table)  # checkpoint at the head (v24)
    f = _write_file(spark, table, "tail1", [(900, 9.0)])
    _commit(table, n + 1, [_add(f)])
    f = _write_file(spark, table, "tail2", [(901, 9.1)])
    _commit(table, n + 2, [_add(f)])

    commits = _list_commits(table)
    opened: list[str] = []
    real_open = builtins.open

    def counting_open(file, *a, **kw):
        s = str(file)
        if s.endswith(".json") and "_delta_log" in s:
            opened.append(s)
        return real_open(file, *a, **kw)

    monkeypatch.setattr(builtins, "open", counting_open)
    _check_cdf_enabled_over(spark, table, commits, n + 1, n + 2)
    monkeypatch.setattr(builtins, "open", real_open)

    commit_opens = [s for s in opened
                    if os.path.basename(s).rstrip(".json").isdigit()]
    # the range's two commits (the seed replays from the v24 checkpoint,
    # touching no commit JSON below it) — not the 24 history commits
    assert len(commit_opens) <= 4, commit_opens
    versions = {int(os.path.basename(s).split(".")[0])
                for s in commit_opens}
    assert versions <= {n + 1, n + 2}, versions

    # and the full read still serves the head range exactly
    got = {(r["id"], r["_change_type"], r["_commit_version"])
           for r in read_delta_changes(spark, table, n + 1, n + 2).collect()}
    assert got == {(900, "insert", n + 1), (901, "insert", n + 2)}


def test_windowed_read_opens_only_range_commits(spark, tmp_path,
                                                monkeypatch):
    """A version-addressed read_delta_changes window is O(range) in
    commit-JSON opens, not O(retained history): the timestamp stamping
    uses the bounded commit_timestamps (range + one clamp-seed commit),
    the enablement check seeds from the checkpoint, and the snapshot
    replay walks only the post-checkpoint tail — so a 2-commit window
    at the head of a long log never opens the history below the
    checkpoint (VERDICT r12 next-round #1: previously every window
    re-walked commit_timestamps over the whole retained log)."""
    import builtins

    from monday_etl_spark.delta_import import write_checkpoint

    table = _cdf_table(spark, tmp_path, "windowhist")
    n = 24
    for i in range(1, n + 1):
        f = _write_file(spark, table, f"a{i}", [(100 + i, float(i))])
        _commit(table, i, [_add(f)])
    write_checkpoint(spark, table)  # checkpoint at the head (v24)
    f = _write_file(spark, table, "tail1", [(900, 9.0)])
    _commit(table, n + 1, [_add(f)])
    f = _write_file(spark, table, "tail2", [(901, 9.1)])
    _commit(table, n + 2, [_add(f)])

    opened: list[str] = []
    real_open = builtins.open

    def counting_open(file, *a, **kw):
        s = str(file)
        if s.endswith(".json") and "_delta_log" in s:
            opened.append(s)
        return real_open(file, *a, **kw)

    monkeypatch.setattr(builtins, "open", counting_open)
    feed = read_delta_changes(spark, table, n + 1, n + 2)
    got = {(r["id"], r["_change_type"], r["_commit_version"])
           for r in feed.collect()}
    monkeypatch.setattr(builtins, "open", real_open)

    assert got == {(900, "insert", n + 1), (901, "insert", n + 2)}
    commit_versions = {
        int(os.path.basename(s).split(".")[0]) for s in opened
        if os.path.basename(s).rstrip(".json").isdigit()}
    # window commits + the one clamp-seed commit below the window —
    # nothing from the 24-commit history below the checkpoint
    assert commit_versions <= {n, n + 1, n + 2}, sorted(commit_versions)


def test_ranged_commit_timestamps_matches_full_walk(spark, tmp_path):
    """The bounded commit_timestamps returns the same monotone times as
    the full walk whenever raw commit times are non-decreasing below
    the window (the normal case: the clamp-seed commit carries the
    prefix max)."""
    from monday_etl_spark.delta_import import commit_timestamps

    table = _cdf_table(spark, tmp_path, "tsrange")
    for i in range(1, 7):
        f = _write_file(spark, table, f"t{i}", [(i, float(i))])
        _commit(table, i, [_add(f)])
    full = commit_timestamps(table)
    ranged = commit_timestamps(table, 3, 5)
    assert set(ranged) == {3, 4, 5}
    assert all(ranged[v] == full[v] for v in ranged), (ranged, full)
    # open range ends behave: start-only and end-only
    assert commit_timestamps(table, start_version=5) == {
        v: full[v] for v in (5, 6)}
    assert commit_timestamps(table, end_version=1) == {
        v: full[v] for v in (0, 1)}
