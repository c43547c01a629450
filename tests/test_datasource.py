"""Spark 4 Python Data Source path: partition-per-board fetch + JVM parse."""

from __future__ import annotations

import json

from monday_etl_spark import fixtures as FX
from monday_etl_spark.normalize import extract_projects
from monday_etl_spark.source_datasource import read_monday_items


def test_datasource_reads_boards_in_partitions(spark, tmp_path):
    fixture = {
        "board-a": [FX.PROJECTS_BOARD],
        "board-b": [FX.PERSONNEL_BOARD, FX.SUPPLIER_BOARD],  # 2 pages
    }
    p = tmp_path / "boards.json"
    p.write_text(json.dumps(fixture))

    items = read_monday_items(spark, str(p), ["board-a", "board-b"])
    counts = {r["board_id"]: r["n"] for r in
              items.groupBy("board_id").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"board-a": 3, "board-b": 5}  # 3 projects; 3+2 cost items


def test_datasource_feeds_normalize(spark, tmp_path):
    p = tmp_path / "b.json"
    p.write_text(json.dumps({"board-a": [FX.PROJECTS_BOARD]}))
    items = read_monday_items(spark, str(p), ["board-a"]).drop("board_id")
    out = extract_projects(items, FX.RUN_DATE, FX.RUN_TS)
    rows = {r.project_id: r for r in out.collect()}
    assert set(rows) == {"101", "102", "103"}
    assert rows["101"].circolo == "Radical"


def test_stream_reader_availablenow_matches_batch(spark, tmp_path):
    """Streaming flavor: AvailableNow drains every page; result set is
    identical to the batch reader over the same fixture."""
    from monday_etl_spark.source_datasource import stream_monday_items

    fixture = {
        "board-a": [FX.PROJECTS_BOARD],
        "board-b": [FX.PERSONNEL_BOARD, FX.SUPPLIER_BOARD],
    }
    p = tmp_path / "boards.json"
    p.write_text(json.dumps(fixture))

    stream = stream_monday_items(spark, str(p), ["board-a", "board-b"],
                                 pages_per_batch=1)
    # NB: PythonMicroBatchStream does not support Trigger.AvailableNow (it
    # falls back to ONE batch, which under pages_per_batch=1 strands pages) —
    # drain with the default ASAP trigger + processAllAvailable instead.
    q = (
        stream.writeStream.format("memory").queryName("monday_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM monday_stream")
    batch = read_monday_items(spark, str(p), ["board-a", "board-b"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    # pages_per_batch=1: the 2-page board needs >1 micro-batch to drain
    assert len([pr for pr in q.recentProgress if pr["numInputRows"] > 0]) >= 2


def test_stream_reader_offset_replay_is_deterministic(tmp_path):
    """readBetweenOffsets(start, end) — the restart/replay path — returns
    exactly the rows read() produced for the same offset range."""
    from monday_etl_spark.source_datasource import MondayStreamReader

    fixture = {"board-a": [FX.PROJECTS_BOARD, FX.PERSONNEL_BOARD]}
    p = tmp_path / "boards.json"
    p.write_text(json.dumps(fixture))

    r = MondayStreamReader({"fixture_path": str(p), "boards": "board-a",
                            "pages_per_batch": "1"})
    start = r.initialOffset()
    rows1, mid = r.read(start)
    rows1 = list(rows1)
    rows2, end = r.read(mid)
    rows2 = list(rows2)
    assert mid == {"pages": {"board-a": 1}} and end == {"pages": {"board-a": 2}}
    assert list(r.readBetweenOffsets(start, mid)) == rows1
    assert list(r.readBetweenOffsets(mid, end)) == rows2
    # drained: reading past the last page yields nothing, offset stable
    rows3, again = r.read(end)
    assert list(rows3) == [] and again == end
