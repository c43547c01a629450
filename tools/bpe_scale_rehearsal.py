#!/usr/bin/env python
"""BPE training/application scale rehearsal: sf0.1 vs the 10x replica
set (.scratch/sf1, tools/gen_scale_data.py).

Measures what the 100 TB claim rests on:
- bpe_learn wall per round (each round = one weighted pair-count
  shuffle over the DEDUPLICATED word vocabulary + a one-row argmax) —
  should scale with distinct words, which the replica generator grows
  sublinearly (perturbed replicas share most of the vocabulary);
- bpe_apply + corpus token count wall — a pure narrow map over
  documents plus one aggregation shuffle; should scale ~linearly in
  rows.

Usage: python tools/bpe_scale_rehearsal.py [sf1_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from monday_etl_spark.extensions.bpe import (  # noqa: E402
    bpe_apply,
    bpe_learn,
    word_counts,
)
from monday_etl_spark.session import get_spark  # noqa: E402


def measure(spark, docs_path: str) -> dict:
    docs = spark.read.parquet(docs_path)
    out: dict = {"docs": docs.count()}
    out["distinct_words"] = word_counts(docs).count()

    t = time.time()
    merges = bpe_learn(docs, rounds=4)
    out["learn_4_rounds_s"] = round(time.time() - t, 3)
    out["merges"] = [(m[3], m[4]) for m in merges]

    t = time.time()
    n = (
        bpe_apply(docs, merges)
        .select(F.explode("bpe_tokens").alias("t"))
        .groupBy("t").count().count()
    )
    out["apply_distinct_tokens"] = n
    out["apply_count_s"] = round(time.time() - t, 3)

    # r13: the corpus-count QUERY path (bpe_tokenize_topk) tokenizes the
    # DEDUPLICATED vocabulary weighted by word frequency instead — exact
    # same integer counts, O(vocabulary) regex work. This row evidences
    # that the counting path is flat in corpus size (the per-document
    # bpe_apply row above remains the intentionally row-linear API).
    t = time.time()
    n2 = (
        bpe_apply(word_counts(docs), merges, text_col="word")
        .select(F.explode("bpe_tokens").alias("t"), "cnt")
        .groupBy("t").agg(F.sum("cnt").alias("n")).count()
    )
    assert n2 == n, (n2, n)
    out["vocab_count_s"] = round(time.time() - t, 3)
    return out


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    spark = get_spark()
    # warm the JVM/session so the sf0.1 row is not paying first-job cost
    spark.range(1000).select(F.sum("id")).collect()
    res = {
        "sf0.1": measure(spark, "/root/testdata/sf0.1/documents.parquet"),
        "sf1": measure(spark, f"{sf1}/documents.parquet"),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
