"""SimHash hamming banding vs a brute-force Python oracle, and the
foreachBatch streaming dual-write."""

from __future__ import annotations

from monday_etl_spark.extensions.dedup import simhash_near_pairs
from monday_etl_spark.io import load_table
from monday_etl_spark.streaming.dual_write_stream import stream_dual_write

from .conftest import SF_SMOKE
from .test_extensions import py_simhash64

_U64 = (1 << 64) - 1


def test_simhash_near_pairs_match_bruteforce(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        (r.doc_a, r.doc_b): r.hamming_distance
        for r in simhash_near_pairs(docs, max_distance=2).collect()
    }
    # brute force oracle over all pairs (mask to u64: hashes are signed)
    hashes = {r.doc_id: py_simhash64(r.text) for r in docs.collect()}
    ids = sorted(hashes)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((hashes[a] ^ hashes[b]) & _U64).count("1")
            if d <= 2:
                want[(a, b)] = d
    assert got == want
    assert len(want) > 0, "corpus should contain at least one near pair"


def test_stream_dual_write(spark, tmp_path):
    base, ckpt = str(tmp_path / "base"), str(tmp_path / "ckpt")
    stream_dual_write(spark, SF_SMOKE, base, ckpt)
    snap = spark.read.parquet(f"{base}/events_rollup")
    hist = spark.read.parquet(f"{base}/events_rollup_historical")
    # 1000 events over ~30 days x 5 types
    assert snap.count() == hist.count() > 100
    assert {"extraction_date", "event_type", "n_events", "total_value"} <= set(
        snap.columns
    ) and "extraction_date" in hist.columns
    total = snap.agg({"n_events": "sum"}).first()[0]
    assert total == 1000
