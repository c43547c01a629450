"""Streaming incremental dedup: batch-split invariance and store continuation.

The single-drain == SQL-oracle equivalence is covered by the registry sweep
(test_queries_oracle). Here we test what the oracle can't express: that the
decisions are invariant to how the file source splits micro-batches (when
batch order respects doc_id order), and that a SECOND run against the same
signature store rejects documents that duplicate anything seen in the first
run — the actual incremental-crawl semantics.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from monday_etl_spark.streaming.incremental_dedup import run_incremental_dedup

from .conftest import SF_SMOKE

THRESHOLD = 0.5


def _unique_store(tmp_path, tag: str) -> str:
    """Store name unique per test invocation: a fixed name would collide
    with the managed-table DIRECTORY a previous test session left in the
    warehouse (the catalog entry dies with the session; the dir does not)."""
    import re

    base = re.sub(r"[^a-z0-9_]", "_", tmp_path.name.lower())
    return f"sigstore_{tag}_{base}"


def _split_documents(tmp_path, n_splits=2):
    """Write the smoke documents as n id-ordered parquet files, one dir."""
    t = pq.read_table(f"{SF_SMOKE}/documents.parquet").sort_by("doc_id")
    d = tmp_path / "docs_split"
    d.mkdir()
    step = (t.num_rows + n_splits - 1) // n_splits
    import os
    import time
    for i in range(n_splits):
        part = t.slice(i * step, step)
        p = d / f"part{i}.documents.parquet"
        pq.write_table(part, p)
        # the file source replays in modification-time order; make it match
        # the id order explicitly rather than trusting write latency
        ts = time.time() - (n_splits - i) * 10
        os.utime(p, (ts, ts))
    return str(d)


def _decisions(spark, sf_dir, tmp_path, tag, store=None, glob=None, mfpt=None):
    kwargs = {}
    if glob is not None:
        kwargs["glob"] = glob
    if mfpt is not None:
        kwargs["max_files_per_trigger"] = mfpt
    df = run_incremental_dedup(
        spark, sf_dir,
        store_table=store or _unique_store(tmp_path, tag),
        out_path=str(tmp_path / f"out_{tag}"),
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        threshold=THRESHOLD,
        **kwargs,
    )
    return sorted(map(tuple, df.collect()))


def test_batch_split_invariance(spark, tmp_path):
    try:
        single = _decisions(spark, SF_SMOKE, tmp_path, "single")

        split_dir = _split_documents(tmp_path, n_splits=2)
        split = _decisions(
            spark, split_dir, tmp_path, "split",
            glob="*.documents.parquet", mfpt=1,
        )
        assert split == single
    finally:
        for tag in ("single", "split"):
            spark.sql(f"DROP TABLE IF EXISTS {_unique_store(tmp_path, tag)}")


def test_store_continuation_rejects_cross_run_dups(spark, tmp_path):
    store = _unique_store(tmp_path, "cont")
    first = _decisions(spark, SF_SMOKE, tmp_path, "run1", store=store)
    n_docs = len(first)
    assert n_docs > 0

    # second run re-ingests the SAME corpus under shifted doc_ids: every doc
    # is an exact dup of something already in the store, so every decision
    # must be a reject
    t = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    import pyarrow.compute as pc
    shifted = t.set_column(
        t.schema.get_field_index("doc_id"), "doc_id",
        pc.add(t.column("doc_id"), 10_000_000),
    )
    d2 = tmp_path / "docs_rerun"
    d2.mkdir()
    pq.write_table(shifted, d2 / "documents.parquet")

    try:
        second = _decisions(spark, str(d2), tmp_path, "run2", store=store)
        assert len(second) == n_docs
        assert all(not kept for _, kept in second), "cross-run dup not rejected"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {store}")


def test_replayed_batch_does_not_self_reject(spark, tmp_path):
    # foreachBatch is at-least-once: a batch replayed AFTER its store append
    # landed probes a store containing its own signatures. The probe excludes
    # same-doc_id matches, so the replay must reproduce the original
    # decisions instead of rejecting everything at est=1.0.
    from monday_etl_spark.streaming.incremental_dedup import _batch_decisions

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    store = _unique_store(tmp_path, "replay")
    first, banded = _batch_decisions(docs, store, THRESHOLD)
    first_rows = sorted(map(tuple, first.collect()))
    # simulate the completed store append, then replay the same batch
    banded.write.mode("overwrite").bucketBy(16, "band", "bh").sortBy(
        "band", "bh"
    ).saveAsTable(store)
    try:
        replay, banded2 = _batch_decisions(docs, store, THRESHOLD)
        assert sorted(map(tuple, replay.collect())) == first_rows
        banded2.unpersist()
    finally:
        banded.unpersist()
        spark.sql(f"DROP TABLE IF EXISTS {store}")
