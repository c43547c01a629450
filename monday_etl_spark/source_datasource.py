"""Spark 4 Python Data Source for Monday-style GraphQL boards — the
partition-parallel scale path of the connector (SURVEY §2.1 O-1 note).

``source_graphql.MondayConnector`` fetches driver-side, which is right for
one small board. This DataSource moves the fetch onto executors: one
InputPartition per board, each task pulling its board's pages independently —
the shape that scales to thousands of boards. Pages are emitted as raw JSON
strings; parsing happens JVM-side via ``from_json`` (so the Python task does
I/O, not row-by-row decoding).

Offline contract as everywhere in this repo: the "endpoint" is a JSON file
(board_id → list of page responses). A production HTTP variant would swap
``_load_pages`` for paginated POSTs using exactly the retry/cursor logic of
``MondayConnector`` — per-executor, no driver bottleneck.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .normalize import MONDAY_SCHEMA

RAW_SCHEMA = "board_id string, page_index int, payload string"


class BoardPartition(InputPartition):
    def __init__(self, board_id: str):
        self.board_id = board_id


class MondayDataSource(DataSource):
    """Usage:
        spark.dataSource.register(MondayDataSource)
        spark.read.format("monday")
             .option("fixture_path", path).option("boards", "b1,b2").load()
    """

    @classmethod
    def name(cls) -> str:
        return "monday"

    def schema(self) -> str:
        return RAW_SCHEMA

    def reader(self, schema) -> "MondayBoardReader":
        return MondayBoardReader(self.options)

    def simpleStreamReader(self, schema) -> "MondayStreamReader":
        return MondayStreamReader(self.options)


class MondayBoardReader(DataSourceReader):
    def __init__(self, options):
        self.fixture_path = options.get("fixture_path")
        boards = options.get("boards", "")
        self.boards = [b for b in boards.split(",") if b]
        if not self.fixture_path or not self.boards:
            raise ValueError("monday source requires 'fixture_path' and 'boards' options")

    def partitions(self):
        # O-4: one partition per board — board fetches run concurrently on
        # executors; at thousands of boards this is the parallelism unit
        return [BoardPartition(b) for b in self.boards]

    def read(self, partition: BoardPartition):
        # executes on an executor; self-contained (no driver state)
        with open(self.fixture_path) as f:
            fixtures = json.load(f)
        for i, page in enumerate(fixtures.get(partition.board_id, [])):
            yield (partition.board_id, i, json.dumps(page))


class MondayStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor of the connector (TODO #4 r02): the cursor-paginated
    reader as a micro-batch source — each trigger drains up to
    ``pages_per_batch`` pages per board, so a continuously-updated board
    becomes an unbounded stream of page documents.

    Offsets are {"pages": {board_id: next_page_index}} — exactly the cursor
    position of the paginated reader (etl_quick_fix.py:50-151 loops until
    the cursor is exhausted; here the loop is the streaming engine's).
    The fixture source is deterministic, so ``readBetweenOffsets`` replays
    a committed batch bit-identically after restart (exactly-once with a
    checkpoint + idempotent sink, same contract as streaming/ elsewhere)."""

    def __init__(self, options):
        self.fixture_path = options.get("fixture_path")
        boards = options.get("boards", "")
        self.boards = [b for b in boards.split(",") if b]
        if not self.fixture_path or not self.boards:
            raise ValueError("monday source requires 'fixture_path' and 'boards' options")
        self.pages_per_batch = int(options.get("pages_per_batch", "1"))
        self._fixtures: dict | None = None

    def _pages(self, board: str) -> list:
        if self._fixtures is None:
            with open(self.fixture_path) as f:
                self._fixtures = json.load(f)
        return self._fixtures.get(board, [])

    def initialOffset(self) -> dict:
        return {"pages": {b: 0 for b in self.boards}}

    def _slice(self, start: dict, end: dict | None):
        for board in self.boards:
            lo = start["pages"].get(board, 0)
            pages = self._pages(board)
            hi = len(pages) if end is None else end["pages"].get(board, lo)
            hi = min(hi, lo + self.pages_per_batch) if end is None else hi
            for i in range(lo, hi):
                yield board, i, pages[i]

    def read(self, start: dict):
        rows = [(b, i, json.dumps(p)) for b, i, p in self._slice(start, None)]
        nxt = dict(start["pages"])
        for b, i, _ in rows:
            nxt[b] = max(nxt.get(b, 0), i + 1)
        return iter(rows), {"pages": nxt}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([(b, i, json.dumps(p)) for b, i, p in self._slice(start, end)])


def _flatten_raw(raw: DataFrame) -> DataFrame:
    """Raw page JSON → flat item rows with board_id: the same O-5
    from_json/explode flatten for both the batch and streaming readers."""
    return (
        raw.select("board_id", F.from_json("payload", MONDAY_SCHEMA).alias("r"))
        .select("board_id", F.explode("r.data.boards").alias("board"))
        .select("board_id", F.explode("board.items_page.items").alias("item"))
        .select("board_id", "item.*")
    )


def stream_monday_items(spark: SparkSession, fixture_path: str,
                        boards: list[str], pages_per_batch: int = 1) -> DataFrame:
    """readStream twin of ``read_monday_items``: one micro-batch per
    ``pages_per_batch`` pages per board. Downstream is the identical
    JVM-side flatten — a caller can point the whole normalize/snapshot
    pipeline at this and get incremental board ingestion with checkpointed
    exactly-once page offsets."""
    from .session import ensure_session_confs

    ensure_session_confs(spark)
    spark.dataSource.register(MondayDataSource)
    raw = (
        spark.readStream.format("monday")
        .option("fixture_path", fixture_path)
        .option("boards", ",".join(boards))
        .option("pages_per_batch", str(pages_per_batch))
        .load()
    )
    return _flatten_raw(raw)


def read_monday_items(spark: SparkSession, fixture_path: str,
                      boards: list[str]) -> DataFrame:
    """Register + read + JVM-side parse: raw page JSON → flat item rows with
    their board_id. The from_json/explode pipeline is the same O-5 flatten
    as the driver-side path — only the fetch layer differs."""
    from .session import ensure_session_confs

    ensure_session_confs(spark)
    spark.dataSource.register(MondayDataSource)
    raw = (
        spark.read.format("monday")
        .option("fixture_path", fixture_path)
        .option("boards", ",".join(boards))
        .load()
    )
    return _flatten_raw(raw)
