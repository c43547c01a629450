"""DSIR-style importance resampling for training-data selection.

Implements the hashed n-gram importance-resampling method of Xie et al.,
"Data Selection for Language Models via Importance Resampling" (NeurIPS
2023): fit two bag-of-hashed-ngrams multinomials — one over a TARGET
corpus (the domain to up-weight), one over the RAW pool — and score each
raw document by how much more likely its features are under the target
distribution than under the raw one; keep the top-scoring documents.

Engine-parity variant (documented divergence from the paper): the paper
scores ``log p_tgt(doc) - log p_raw(doc) = sum_g log r_b(g)`` and samples
with Gumbel noise. Natural log is not correctly-rounded IEEE-754 (its
last ulp varies across runtimes) and Gumbel needs log too, so this
implementation ranks by the linear-domain analog

    score(doc) = (sum_g r_b(g)) / n_features(doc)

— the mean per-ngram likelihood ratio, where ``r_b`` is the add-one-
smoothed ``p_tgt[b] / p_raw[b]``. Every arithmetic step is +,-,*,/ on
exact integer counts (each correctly rounded, bit-identical on any IEEE
engine), the per-document sum is an ordered fold over bucket ids, and
selection is deterministic top-k with a doc_id tie-break — reproducible
across engines, re-runs, and audits (the same determinism contract as
``deterministic_sample`` / ``training_order_shuffle``). The linear mean
up-weights strongly target-like ngrams more than the paper's log-mean
would; both rank "target-like" above "raw-like", and the plan shape (the
part that matters at 100 TB) is identical to a log-scored variant.

Scale shape (all linear, no all-pairs, nothing on the driver):
  * two B-row bucket distributions — explode + groupBy(bucket), partial
    aggregation combines map-side, output is B rows regardless of corpus
    size;
  * the B-row ratio table joins back broadcast (B is a constant, 256);
  * one (doc_id, bucket) shuffle for per-doc bucket counts, then a
    per-doc ordered fold — the only corpus-sized shuffle in the plan;
  * top-k select is ORDER BY + LIMIT → TakeOrderedAndProject (per-
    partition heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hashed feature-space width — constant, so the distribution/ratio tables
#: stay B rows at any corpus size (the paper uses 10k; 256 keeps the demo
#: buckets well-populated at sf0.01 while exercising the identical plan)
N_BUCKETS = 256


def _tokens(col: Column) -> Column:
    """Normalized whitespace tokens; empty/blank text -> empty array."""
    return F.when(
        F.length(F.trim(col)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(col), r"\s+"))


def ngram_features(col: Column) -> Column:
    """Word unigrams + bigrams of normalized text, repeats kept (counts
    are the multinomial's sufficient statistic). One-word docs contribute
    just their unigram; empty docs an empty array."""
    toks = _tokens(col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def feature_buckets(col: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Hashing trick: each ngram -> bucket id in [0, n_buckets) via the
    first 8 hex chars of md5 (md5, not murmur3, so every engine — and the
    DuckDB oracle — computes the identical bucket)."""
    return F.transform(
        ngram_features(col),
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        ),
    )


def _exploded(df: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    return df.select(
        "*", F.explode(feature_buckets(F.col(text_col), n_buckets)).alias("bucket")
    )


def dsir_scores(
    raw: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-document DSIR importance scores over ``raw``, with the target
    distribution fit on the rows matching ``target_filter`` (a boolean
    Column over ``raw``'s columns — e.g. ``F.col('lang') == 'en'``).

    Returns (id_col, n_features, importance); documents with zero
    features (blank text) carry no score and are omitted — they cannot
    be ranked by content and a curation pipeline drops them anyway.

    Smoothed ratio per bucket, computed in a fixed parenthesization so
    both engines round identically at every step::

        r_b = ((tgt_b + 1) / (raw_b + 1)) * ((raw_total + B) / (tgt_total + B))
    """
    fb = _exploded(raw, text_col, n_buckets).select(
        F.col(id_col), target_filter.alias("__is_tgt"), "bucket"
    )

    rawd = fb.groupBy("bucket").agg(F.count("*").alias("rc"))
    tgtd = (
        fb.filter(F.col("__is_tgt"))
        .groupBy("bucket")
        .agg(F.count("*").alias("tc"))
    )
    tot = fb.agg(
        F.count("*").alias("rt"),
        F.count(F.when(F.col("__is_tgt"), 1)).alias("tt"),
    )
    b = F.lit(n_buckets).cast("bigint")
    # tgt buckets are a subset of raw buckets, so raw LEFT JOIN tgt is total
    ratio = (
        rawd.join(tgtd, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                (
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double")
                    / (F.col("rc") + 1)
                )
                * ((F.col("rt") + b).cast("double") / (F.col("tt") + b))
            ).alias("rb"),
        )
    )

    dc = fb.groupBy(id_col, "bucket").agg(F.count("*").alias("c"))
    scored = (
        dc.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("bucket"),
                            (F.col("c").cast("double") * F.col("rb")).alias("v"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["v"],
            ).alias("s"),
            F.sum("c").alias("n_features"),
        )
    )
    return scored.select(
        id_col,
        "n_features",
        (F.col("s") / F.col("n_features").cast("double")).alias("importance"),
    )


def dsir_select(
    raw: DataFrame,
    target_filter: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Deterministic top-k selection by importance (doc_id tie-break) —
    the audit-reproducible analog of the paper's Gumbel-top-k draw."""
    return (
        dsir_scores(raw, target_filter, text_col, id_col, n_buckets)
        .orderBy(F.desc("importance"), F.col(id_col))
        .limit(k)
    )
