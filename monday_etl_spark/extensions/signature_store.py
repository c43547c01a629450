"""Materialized MinHash signature store — the 100 TB shape of near-dup
detection (SCALE.md; TODO #1 from round 1).

The pure-lazy path (``dedup.minhash_candidates``) recomputes every document's
shingles + signature per run and persists them for the self-join. Fine for a
one-shot query; wrong at 100 TB, where the signature build reads the whole
corpus (the expensive part — md5 over every shingle) but the corpus changes
only incrementally between dedup runs.

This module materializes the banded signatures ONCE as a bucketed, sorted
table keyed by the LSH join key:

- ``bucketBy(buckets, "band", "bh")`` + ``sortBy`` — candidate generation is
  a self-join on exactly (band, bh), so both sides arrive pre-hashed and
  pre-sorted: SortMergeJoin with ZERO Exchange and no per-task sort
  (asserted in tests/test_signature_store.py). At 100 TB this removes the
  only corpus-sized shuffle in the dedup pipeline.
- New documents append their signatures (anti-join on stored doc_ids — reads
  only the id column of the store); the bucket layout is preserved, so the
  next candidate run is still shuffle-free. The full-corpus signature cost
  is paid once, then amortized.

The signature math is byte-identical to ``dedup.minhash_signature`` — a
store built today and a lazy query run tomorrow agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import minhash_bands, minhash_signatures

DEFAULT_TABLE = "minhash_signature_store"


def _banded_signatures(df: DataFrame, text_col: str, num_hashes: int,
                       num_bands: int, k: int) -> DataFrame:
    """(doc_id, sig, band, bh) — one row per (document, band)."""
    rows_per_band = num_hashes // num_bands
    sigs = minhash_signatures(df, text_col, num_hashes, k)
    return sigs.select(
        "doc_id",
        "sig",
        F.explode(minhash_bands(F.col("sig"), num_bands, rows_per_band)).alias("b"),
    ).select(
        "doc_id", "sig", F.col("b.band").alias("band"), F.col("b.band_hash").alias("bh")
    )


def build_signature_store(df: DataFrame, table: str = DEFAULT_TABLE,
                          text_col: str = "text", num_hashes: int = 16,
                          num_bands: int = 4, k: int = 3,
                          buckets: int = 16) -> None:
    """Materialize the banded signature table, bucketed+sorted on the LSH
    join key (band, bh). One full-corpus pass; every later candidate run
    reads signatures instead of recomputing them."""
    banded = _banded_signatures(df, text_col, num_hashes, num_bands, k)
    (
        banded.write.mode("overwrite")
        .bucketBy(buckets, "band", "bh")
        .sortBy("band", "bh")
        .saveAsTable(table)
    )


def update_signature_store(new_docs: DataFrame, table: str = DEFAULT_TABLE,
                           text_col: str = "text", num_hashes: int = 16,
                           num_bands: int = 4, k: int = 3,
                           buckets: int = 16) -> None:
    """Append signatures for documents not yet in the store (incremental
    corpus growth). Signature compute touches ONLY the new documents; the
    membership check reads just the store's doc_id column. The append keeps
    the bucket spec, so candidate generation stays Exchange-free."""
    spark = new_docs.sparkSession
    existing = spark.table(table).select("doc_id").distinct()
    fresh = new_docs.join(existing, "doc_id", "left_anti")
    banded = _banded_signatures(fresh, text_col, num_hashes, num_bands, k)
    (
        banded.write.mode("append")
        .bucketBy(buckets, "band", "bh")
        .sortBy("band", "bh")
        .saveAsTable(table)
    )


def candidates_from_store(spark: SparkSession, table: str = DEFAULT_TABLE,
                          num_hashes: int = 16) -> DataFrame:
    """Candidate near-duplicate pairs from the stored signatures — same
    output contract as ``dedup.minhash_candidates`` (doc_a < doc_b, distinct,
    est_jaccard = fraction of agreeing minhashes), but with no signature
    recompute and a shuffle-free bucketed self-join."""
    banded = spark.table(table)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x)
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        (agree.cast("double") / F.lit(num_hashes).cast("double")).alias("est_jaccard"),
    )
