"""Exact set-similarity self-join via prefix filtering (AllPairs/PPJoin).

The third candidate-generation strategy in the dedup stack, complementing
MinHash LSH (probabilistic, tunable recall) and SimHash banding (Hamming):
prefix filtering is EXACT — zero false negatives at the target threshold —
while still never forming all pairs. The trick (Bayardo et al., WWW'07
"Scaling Up All Pairs Similarity Search"; same family as PPJoin, VLDB'08):

1. order every document's token set by GLOBAL token frequency, rarest
   first (ties broken by token value, so the order is total and
   deterministic);
2. index only each set's PREFIX — for Jaccard >= 1/2 a set of size n needs
   a prefix of n - ceil(n/2) + 1 = n div 2 + 1 tokens. Any pair with
   J >= 1/2 shares its smallest common token, which provably sits inside
   BOTH prefixes (if it didn't, all common tokens would fit in one doc's
   suffix of length ceil(n/2) - 1 < required overlap ceil(n/2));
3. candidates = pairs sharing >= 1 prefix token, pre-filtered by the size
   bound 2 * min(|x|, |y|) >= max(|x|, |y|) (J >= 1/2 forces it);
4. verify candidates with the exact intersection; keep 2*inter >= union.

The threshold is FIXED at Jaccard >= 1/2 so every decision is integer
arithmetic (prefix length via div, the final test via 2*inter >= union) —
bit-reproducible by a SQL oracle, no floating-point thresholds.

Scale shape (100 TB): the frequency table is one groupBy over exploded
tokens; the prefix index is a fraction of the exploded corpus (~half per
doc, and candidates only form on RARE tokens — frequent tokens sort to
suffixes, which are never indexed — so the candidate join avoids exactly
the hot keys that would skew a naive token join); verification is
pair-scoped. No all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefix_filter_pairs(sets: DataFrame, id_col: str = "doc_id",
                        set_col: str = "sh") -> DataFrame:
    """``sets``: (id, array<string> of DISTINCT tokens). Returns every pair
    (doc_a < doc_b) with Jaccard >= 1/2 as (doc_a, doc_b, inter, union_sz,
    jaccard_ppm) — exact, no false negatives/positives."""
    # the token-set frame feeds THREE branches (prefix index, verify-left,
    # verify-right): persist it so the upstream set construction (shingling
    # is expensive) runs once, and so no expression gets pushed below the
    # exchanges into a re-evaluated pre-shuffle position
    sets = sets.select(F.col(id_col).alias(id_col), F.col(set_col).alias(set_col))
    sets = sets.persist()
    toks = sets.select(F.col(id_col).alias("id"), F.explode(set_col).alias("s"))
    freq = toks.groupBy("s").agg(F.count("*").alias("freq"))
    # rarest-first total order per doc; prefix = first (n div 2 + 1) tokens
    ranked = (
        toks.join(freq, "s")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("freq", "s"))).alias("arr"))
    )
    # a shared token has global freq >= 2 by definition, so unique tokens
    # can be dropped from the index AFTER the prefix is chosen over the
    # full ordering — big cut (most shingles are unique) with zero recall
    # loss: the pair's smallest common token survives in both prefixes
    pref = (
        ranked.select(
            "id",
            F.size("arr").alias("sz"),
            F.explode(F.expr("slice(arr, 1, size(arr) div 2 + 1)")).alias("p"),
        )
        .where(F.col("p.freq") >= 2)
        .select("id", "sz", F.col("p.s").alias("s"))
    )

    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")),
        )
        .where(
            2 * F.least("a.sz", "b.sz") >= F.greatest("a.sz", "b.sz")
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )

    sa = sets.select(F.col(id_col).alias("doc_a"), F.col(set_col).alias("sha"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col(set_col).alias("shb"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sha", "shb")).cast("long").alias("inter"),
            (F.size("sha") + F.size("shb")
             - F.size(F.array_intersect("sha", "shb"))).cast("long")
            .alias("union_sz"),
        )
        .where(2 * F.col("inter") >= F.col("union_sz"))
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "inter",
        "union_sz",
        F.expr("(inter * 1000000) div union_sz").cast("long").alias("jaccard_ppm"),
    )
