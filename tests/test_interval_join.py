"""Stream-stream watermarked interval join (streaming/interval_join.py):
cross-micro-batch pairs must survive (view buffered in join state from
batch 1, purchase arriving in batch 2), out-of-window and wrong-order
pairs must not, and a re-drain with the same checkpoint appends nothing.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from monday_etl_spark.streaming.interval_join import (
    run_view_purchase_attribution,
)


def _ts(h: int, m: int) -> dt.datetime:
    return dt.datetime(2024, 3, 1, h, m, 0)


def _us(h: int, m: int) -> int:
    return int(_ts(h, m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def _write_events(path: str, rows: list[tuple[int, dt.datetime, int, str]]) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, path)


def test_interval_join_across_micro_batches(spark):
    root = tempfile.mkdtemp(prefix="ivj_t_")
    ingest = os.path.join(root, "ingest")
    os.makedirs(ingest)

    # batch 1: everything before 11:00 — includes u2's view at 10:45 whose
    # purchase only arrives in batch 2 (the cross-boundary pair the join
    # state must carry)
    batch1 = [
        (101, _ts(10, 0), 1, "view"),
        (102, _ts(10, 30), 1, "purchase"),   # pairs with 101 (30 min)
        (103, _ts(10, 45), 2, "view"),       # pairs with 202 ACROSS batches
        (104, _ts(9, 0), 3, "view"),         # 2.5 h before u3's purchase: out
        (105, _ts(10, 55), 1, "view"),       # pairs with 201 (55 min)
    ]
    # batch 2: at/after 11:00, all >= batch 1's max ts (time-ordered split)
    batch2 = [
        (201, _ts(11, 50), 1, "purchase"),   # pairs with 105 only (101 is 1h50)
        (202, _ts(11, 15), 2, "purchase"),   # pairs with 103 (cross-boundary)
        (203, _ts(11, 20), 2, "view"),       # AFTER 202: must not pair
        (204, _ts(11, 30), 3, "purchase"),   # nearest view 2.5 h old: no pair
    ]
    p1 = os.path.join(ingest, "part1.events.parquet")
    p2 = os.path.join(ingest, "part2.events.parquet")
    _write_events(p1, batch1)
    _write_events(p2, batch2)
    # the file source orders by modification time: make the split explicit
    os.utime(p1, (1_000_000_000, 1_000_000_000))
    os.utime(p2, (1_000_000_100, 1_000_000_100))

    got = run_view_purchase_attribution(
        spark, ingest, f"{root}/ckpt", f"{root}/out",
        glob="*.events.parquet", max_files_per_trigger=1,
    )
    want = sorted(
        [
            (102, 101, 1, _us(10, 30), _us(10, 0)),
            (201, 105, 1, _us(11, 50), _us(10, 55)),
            (202, 103, 2, _us(11, 15), _us(10, 45)),
        ]
    )
    assert sorted(tuple(r) for r in got.collect()) == want

    # exactly-once: a re-drain with the same checkpoint appends nothing
    again = run_view_purchase_attribution(
        spark, ingest, f"{root}/ckpt", f"{root}/out",
        glob="*.events.parquet", max_files_per_trigger=1,
    )
    assert sorted(tuple(r) for r in again.collect()) == want


def test_interval_join_empty_source_returns_typed_empty(spark):
    root = tempfile.mkdtemp(prefix="ivj_e_")
    ingest = os.path.join(root, "ingest")
    os.makedirs(ingest)
    _write_events(os.path.join(ingest, "part1.events.parquet"), [])
    got = run_view_purchase_attribution(
        spark, ingest, f"{root}/ckpt", f"{root}/out",
        glob="*.events.parquet",
    )
    assert got.count() == 0
    assert got.columns == [
        "purchase_id", "view_id", "user_id", "purchase_ts_us", "view_ts_us",
    ]
