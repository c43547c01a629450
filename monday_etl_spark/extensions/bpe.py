"""Distributed BPE merge learning — the tokenizer-training pass of an
LLM data pipeline, as iterative Spark relational rounds.

Byte-pair encoding training (Sennrich et al. 2016, the algorithm under
GPT-2/RoBERTa-style tokenizers) is inherently iterative: count adjacent
token pairs over the corpus, merge the most frequent pair everywhere,
repeat. The classic implementation is a single-machine dict loop; at
corpus scale the pair COUNT is the expensive part and is exactly a
map-side-combined groupBy, so each round here is:

1. one distributed pair-count over the deduplicated word vocabulary
   (words carry their corpus frequency — pair counts are weighted, so
   the corpus is never re-scanned after the first pass);
2. one driver-side argmax of a single row (count DESC, then pair
   lexicographic — deterministic tie-break);
3. one narrow map applying the merge.

Token sequences are represented as strings in which every token OWNS
a leading and a trailing space (``" a  b  c "``) over a ``[a-z]+``
word alphabet, so applying a merge is ``replace(seq, " l  r ",
" lr ")`` — left-to-right non-overlapping replacement over disjoint
character spans, which IS greedy token-space BPE application (after a
merge the scan resumes past the merged token, and adjacent
occurrences never share a delimiter), and is the identical primitive in
Spark (``F.replace``) and ANSI SQL — the DuckDB oracle unrolls the same
rounds with scalar-subquery argmaxes, so the result is exact.

Scale shape: round cost is one shuffle over the pair vocabulary
(small) after a map over distinct WORDS (not documents — the word
dedup up front is the same trick every production BPE trainer uses);
the driver holds one merge row per round. Real trainings run thousands
of merges over a corpus SAMPLE; ``rounds`` bounds the demo and the
sampling decision is the caller's.

Reference scope: the reference pipeline has no tokenizer training; this
extends SURVEY §2's text-analysis family (token_stats, bigram_lm) with
the op an LLM pipeline actually trains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): lowercase ``[a-z]+`` runs with corpus frequencies —
    the deduplicated vocabulary BPE rounds iterate over."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
            ).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _char_seq(word):
    """``"abc"`` -> ``" a  b  c "``: every token OWNS a leading and a
    trailing space, so adjacent pair occurrences never share a
    delimiter character and one non-overlapping replace pass merges
    exactly the occurrences greedy token-space BPE would (with a
    single shared space, ``replace(" a b a b ", " a b ")`` consumes
    the second occurrence's leading space and misses it)."""
    return F.regexp_replace(word, "(.)", " $1 ")


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the current sequences."""
    toks = F.filter(F.split(F.col("seq"), " "), lambda x: x != F.lit(""))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("l"),
        F.slice(toks, 2, n - 1).alias("r"),
    )
    return (
        seqs.select(F.explode(pairs).alias("p"), "cnt")
        .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "cnt")
        .groupBy("l", "r")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )


def bpe_learn(df: DataFrame, text_col: str = "text",
              rounds: int = 4) -> list[tuple[int, str, str, str, int]]:
    """Learn ``rounds`` BPE merges; returns
    ``[(round, left, right, merged, n_occurrences)]`` (1-based rounds).

    Each round is one distributed pair-count job; the only driver
    traffic is the argmax row (metadata-plane, like the k-means
    centroid fold). Stops early if no adjacent pair remains.

    Each round's sequence frame is PERSISTED (and the prior round's
    dropped once its successor is materialized): without this, round
    N's lazy lineage replays the corpus scan + word dedup + N-1
    replaces — rounds would re-pay the corpus every iteration, the
    exact cost the word-dedup trick exists to avoid. The cached frame
    is the deduplicated VOCABULARY (Heaps-law sublinear in corpus
    size), not the corpus, so MEMORY_AND_DISK stays cheap at scale;
    every cache is dropped before return."""
    from pyspark import StorageLevel

    seqs = (
        word_counts(df, text_col)
        .select(_char_seq(F.col("word")).alias("seq"), "cnt")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev: DataFrame | None = None
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for i in range(1, rounds + 1):
            top = (
                _pair_counts(seqs)
                .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            # the collect materialized seqs' cache: the previous
            # round's frame can no longer be replayed through
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break
            l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
            merges.append((i, l, r, l + r, n))
            prev = seqs
            seqs = seqs.select(
                F.replace(
                    F.col("seq"), F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
                ).alias("seq"),
                "cnt",
            ).persist(StorageLevel.MEMORY_AND_DISK)
    finally:
        if prev is not None:
            prev.unpersist()
        seqs.unpersist()
    return merges


def bpe_apply(df: DataFrame,
              merges: list[tuple[int, str, str, str, int]],
              text_col: str = "text",
              out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word, char
    split then each merge applied IN LEARNED ORDER (the BPE apply
    rule), tokens flattened per document. Adds ``out_col`` as
    array<string>; pure narrow map (expression-only), no shuffle."""
    def tok(word):
        seq = _char_seq(word)
        for _i, l, r, _m, _n in merges:
            seq = F.replace(seq, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
        return F.filter(F.split(seq, " "), lambda x: x != F.lit(""))

    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    return df.withColumn(out_col, F.flatten(F.transform(words, tok)))
