"""Streaming incremental near-dup detection against the signature store.

The 100 TB crawl-dedup shape: documents arrive continuously; each micro-batch
must decide keep/reject against EVERYTHING seen so far without recomputing
old signatures. This composes the two scale pieces the batch path already
has — MinHash banding (``extensions/dedup.py``) and the bucketed signature
store (``extensions/signature_store.py``) — under Structured Streaming:

per micro-batch (``foreachBatch``):
  1. band the batch's signatures (signature math byte-identical to the batch
     path, so a drained stream has an exact SQL oracle);
  2. probe the store on the LSH key (band, bh) — the store is bucketed on
     exactly that key, so the probe is a bucket-local join, and signature
     compute touches ONLY the new documents;
  3. resolve within-batch collisions by doc_id (lower id wins — the same
     deterministic keeper rule as the batch dedup family);
  4. emit (doc_id, is_kept) decisions to a per-batch-overwrite parquet sink
     (idempotent under foreachBatch's at-least-once replay);
  5. append ALL the batch's signatures (kept and rejected alike) to the
     store — "have I seen something like this" must remember rejected docs
     too, and it makes the reject rule monotonic: a doc is rejected iff it
     collides at ``threshold`` with ANY earlier-seen document.

Rule 5 is what keeps the semantics batch-split invariant: "earlier" means
(earlier micro-batch, then lower doc_id within the batch), so any file split
whose batch order respects doc_id order yields byte-identical decisions to
one big batch — which is the SQL-oracle form (reject b iff exists a < b with
a shared band bucket and est_jaccard ≥ threshold).

Scale: state lives in the bucketed store table, not in streaming state —
there is no per-key state store to checkpoint, the probe reads only the
colliding buckets, and the store grows by exactly one banded row per
(new doc, band). Decisions land executor-side in parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.signature_store import _banded_signatures

NUM_HASHES = 16


def _est_jaccard(sig_a, sig_b) -> F.Column:
    agree = F.size(F.filter(F.zip_with(sig_a, sig_b, lambda a, b: a == b),
                            lambda x: x))
    return agree.cast("double") / F.lit(NUM_HASHES).cast("double")


def _batch_decisions(batch: DataFrame, store_table: str,
                     threshold: float) -> tuple[DataFrame, DataFrame]:
    """(decisions, banded): keep/reject for one micro-batch against the
    store + within-batch, and the batch's banded signatures to append."""
    spark = batch.sparkSession
    banded = _banded_signatures(batch, "text", NUM_HASHES, num_bands=4, k=3)
    # probed twice (store + self-join) and appended once: materialize the
    # signature math a single time per batch
    banded = banded.persist()

    rejected = None
    if spark.catalog.tableExists(store_table):
        store = spark.table(store_table)
        vs_store = (
            banded.alias("n")
            .join(
                store.alias("o"),
                (F.col("n.band") == F.col("o.band"))
                & (F.col("n.bh") == F.col("o.bh"))
                # the monotonic reject rule applied directly: a doc is
                # rejected only by an EARLIER (lower-id) collision — the
                # same "exists a < b" the SQL oracle states. Also the
                # replay-safety guard: a batch replayed after its store
                # append landed sees its own signatures (self at est=1.0,
                # own later near-dups too) and must reproduce its original
                # decisions, which only the < comparison does
                & (F.col("o.doc_id") < F.col("n.doc_id")),
            )
            .select(
                F.col("n.doc_id").alias("doc_id"),
                _est_jaccard(F.col("n.sig"), F.col("o.sig")).alias("est"),
            )
            .filter(F.col("est") >= threshold)
            .select("doc_id")
        )
        rejected = vs_store
    within = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("r.doc_id").alias("doc_id"),
            _est_jaccard(F.col("l.sig"), F.col("r.sig")).alias("est"),
        )
        .filter(F.col("est") >= threshold)
        .select("doc_id")
    )
    rejected = within if rejected is None else rejected.unionByName(within)
    rejected = rejected.distinct().withColumn("__rej", F.lit(True))

    decisions = (
        batch.select("doc_id")
        .join(rejected, "doc_id", "left")
        .select("doc_id", F.coalesce(~F.col("__rej"), F.lit(True)).alias("is_kept"))
    )
    return decisions, banded


def run_incremental_dedup(
    spark: SparkSession,
    sf_dir: str,
    store_table: str,
    out_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    max_files_per_trigger: int | None = None,
    glob: str = "documents.parquet",
) -> DataFrame:
    """AvailableNow drain of the documents directory through the incremental
    dedup pipeline. Returns a LAZY read of the decisions parquet — nothing
    transits the driver. ``max_files_per_trigger`` exists for the
    batch-split-invariance test; a fresh ``store_table`` gives whole-corpus
    semantics, an existing one continues from what it has seen."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    on_disk = spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
    reader = spark.readStream.schema(on_disk).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(sf_dir)

    def handle(batch: DataFrame, _bid: int) -> None:
        decisions, banded = _batch_decisions(batch, store_table, threshold)
        # idempotent per-batch sink: foreachBatch is at-least-once, so a
        # replayed batch OVERWRITES its own batch=<id> directory instead of
        # appending duplicate decision rows (the read side drops the
        # partition column). The store append stays at-least-once — benign:
        # the probe is existence-based (distinct) and excludes self-matches
        # by doc_id, so duplicate signature rows cost space, not correctness.
        decisions.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={_bid}")
        )
        writer = banded.write.mode(
            "append" if spark.catalog.tableExists(store_table) else "overwrite"
        )
        # same bucket spec as extensions/signature_store.build_signature_store:
        # the probe join stays bucket-local for every later batch
        writer.bucketBy(16, "band", "bh").sortBy("band", "bh").saveAsTable(
            store_table
        )
        banded.unpersist()

    # decisions per batch are tiny vs the corpus; 8 shuffle partitions avoid
    # 32 near-empty tasks per probe join at micro-batch cardinality
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    if not os.path.exists(out_path):
        # zero input files: no batch ever fired; empty decisions frame
        return spark.createDataFrame([], "doc_id long, is_kept boolean")
    return spark.read.parquet(out_path).drop("batch")
