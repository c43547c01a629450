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
