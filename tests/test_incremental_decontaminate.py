"""Incremental decontamination (streaming/incremental_decontaminate.py):
any micro-batch split of the training stream yields byte-identical
decisions to the batch decontaminate — and a store refresh reaches the
next drain."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from monday_etl_spark.extensions.dedup import decontaminate
from monday_etl_spark.io import load_table
from monday_etl_spark.streaming.incremental_decontaminate import (
    build_decontamination_store,
    run_incremental_decontaminate,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_split_drain_equals_batch_decontaminate(spark, tmp_path):
    import pyarrow.parquet as pq

    docs = load_table(spark, SF, "documents")
    train = docs.filter(F.col("doc_id") % 41 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 41 == 0)
    want = _rows(decontaminate(train, eval_docs))

    root = str(tmp_path)
    store = os.path.join(root, "eval_shingles")
    build_decontamination_store(spark, eval_docs, store)

    # adversarial 2-file split of the training ingest, drained one file per
    # micro-batch — decisions must not depend on the split
    ingest = os.path.join(root, "ingest")
    os.makedirs(ingest)
    t = pq.read_table(os.path.join(SF, "documents.parquet"))
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half),
                   os.path.join(ingest, "part1.documents.parquet"))
    pq.write_table(t.slice(half),
                   os.path.join(ingest, "part2.documents.parquet"))

    got = run_incremental_decontaminate(
        spark, ingest, store, os.path.join(root, "out"),
        os.path.join(root, "ckpt"), glob="*.documents.parquet",
        max_files_per_trigger=1,
        train_filter=F.col("doc_id") % 41 != 0,
    )
    assert _rows(got) == want

    # checkpointed: re-drain with no new files adds nothing
    again = run_incremental_decontaminate(
        spark, ingest, store, os.path.join(root, "out"),
        os.path.join(root, "ckpt"), glob="*.documents.parquet",
        max_files_per_trigger=1,
        train_filter=F.col("doc_id") % 41 != 0,
    )
    assert _rows(again) == want


def test_store_refresh_reaches_next_drain(spark, tmp_path):
    import pyarrow.parquet as pq

    docs = load_table(spark, SF, "documents")
    root = str(tmp_path)
    store = os.path.join(root, "eval_shingles")
    ingest = os.path.join(root, "ingest")
    os.makedirs(ingest)
    t = pq.read_table(os.path.join(SF, "documents.parquet"))
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half),
                   os.path.join(ingest, "part1.documents.parquet"))

    # drain batch 1 against a store built from HALF the eval split
    eval_all = docs.filter(F.col("doc_id") % 41 == 0)
    build_decontamination_store(
        spark, eval_all.filter(F.col("doc_id") % 2 == 0), store
    )
    first = run_incremental_decontaminate(
        spark, ingest, store, os.path.join(root, "out"),
        os.path.join(root, "ckpt"), glob="*.documents.parquet",
        train_filter=F.col("doc_id") % 41 != 0,
    )
    n_hit_first = first.filter("is_contaminated").count()

    # benchmark refresh: rebuild the store with the FULL eval split, then
    # drain the second ingest file — the new shingles apply to batch 2
    build_decontamination_store(spark, eval_all, store)
    pq.write_table(t.slice(half),
                   os.path.join(ingest, "part2.documents.parquet"))
    both = run_incremental_decontaminate(
        spark, ingest, store, os.path.join(root, "out"),
        os.path.join(root, "ckpt"), glob="*.documents.parquet",
        train_filter=F.col("doc_id") % 41 != 0,
    )
    # batch-2 rows were checked against the refreshed (superset) store:
    # their decisions must equal the batch run against the full eval split
    want_full = decontaminate(
        docs.filter(F.col("doc_id") % 41 != 0), eval_all
    )
    got2 = {r.doc_id: tuple(r) for r in both.collect()}
    batch2_ids = {
        r.doc_id for r in spark.read.parquet(
            os.path.join(ingest, "part2.documents.parquet")
        ).filter(F.col("doc_id") % 41 != 0).select("doc_id").collect()
    }
    want_map = {r.doc_id: tuple(r) for r in want_full.collect()}
    assert all(got2[d] == want_map[d] for d in batch2_ids)
    # and the refresh can only ADD contamination hits overall
    assert both.filter("is_contaminated").count() >= n_hit_first
