"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
n-gram Jaccard verification, SimHash.

Design for 100 TB:
- exact dedup: hash-groupBy on a 32-byte fingerprint, not on raw text — the
  shuffle carries digests, not documents;
- MinHash+LSH: per-doc signature is a pure map; candidate generation is a
  self-join on (band_index, band_hash) buckets — only same-bucket pairs meet,
  so the join is linear-ish in practice instead of O(n²);
- Jaccard verification runs only on LSH candidates (tiny);
- hashes are md5-based (not Spark's murmur3) so every engine — and the DuckDB
  oracle — derives bit-identical signatures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def _norm_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), _WS, " ")


def spread(df: DataFrame) -> DataFrame:
    """Lift tiny single-file inputs to cluster parallelism before per-row-
    heavy compute (md5 signatures). A small parquet arrives as ONE input
    partition, which would serialize the whole signature build onto one core
    (observed: 163s -> ~6s at sf0.1). No-op when the scan is already at least
    as parallel as the cluster — so at 100 TB (thousands of input splits)
    this never adds a shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by normalized-text md5: every doc keyed by its group's
    keeper (min doc_id) — ``is_duplicate`` marks losers to drop."""
    keyed = spread(df).select("doc_id", F.md5(_norm_text(F.col(text_col))).alias("fp"))
    keepers = keyed.groupBy("fp").agg(F.min("doc_id").alias("keep_doc_id"))
    return (
        keyed.join(keepers, "fp")
        .select(
            "doc_id",
            "fp",
            "keep_doc_id",
            (F.col("doc_id") != F.col("keep_doc_id")).alias("is_duplicate"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def raw_word_shingles(col: Column, k: int = 3) -> Column:
    """All k-word shingles of normalized text in order, repeats kept
    (array<string>) — the repetition-analysis view. Documents shorter than
    k words contribute their whole text as one shingle."""
    toks = F.split(_norm_text(col), _WS)
    n = F.size(toks)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of normalized text (array<string>)."""
    return F.array_distinct(raw_word_shingles(col, k))


def minhash_signature(col: Column, num_hashes: int = 16, k: int = 3) -> Column:
    """MinHash signature as array<string>: hash function j is the 8-hex-char
    slice ``md5(seed || '|' || shingle)[8*(j%4) : +8]`` with seed = j//4 —
    4 md5 calls per shingle yield 16 independent 32-bit hash values (slicing
    one digest is 4x cheaper than 16 seeded md5s; the min over 8-hex strings
    is an engine-portable stand-in for (a*x+b) mod p permutations).
    Requires num_hashes % 4 == 0."""
    assert num_hashes % 4 == 0
    n_seeds = num_hashes // 4
    sh = word_shingles(col, k=k)
    digests = F.transform(
        sh,
        lambda s: F.array(
            *[F.md5(F.concat_ws("|", F.lit(str(seed)), s)) for seed in range(n_seeds)]
        ),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.array_min(
            F.transform(
                digests,
                lambda d: F.element_at(d, F.floor(j / 4).cast("int") + 1).substr(
                    F.lit(1) + (j % 4) * 8, F.lit(8)
                ),
            )
        ),
    )


def minhash_bands(sig: Column, num_bands: int = 4, rows_per_band: int = 4) -> Column:
    """LSH bands: array of (band_index, band_hash) structs; band_hash is the
    md5 of the band's signature slice."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(F.concat_ws("|", F.slice(sig, b * rows_per_band + 1, rows_per_band)))
            .alias("band_hash"),
        ),
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    num_bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing ≥1 LSH band, with their
    estimated Jaccard (fraction of agreeing minhashes). Returns
    (doc_a, doc_b, est_jaccard), doc_a < doc_b, distinct."""
    rows_per_band = num_hashes // num_bands
    sigs = spread(df).select(
        "doc_id", minhash_signature(F.col(text_col), num_hashes, k).alias("sig")
    )
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(minhash_bands(F.col("sig"), num_bands, rows_per_band)).alias("b"),
    ).select("doc_id", "sig", F.col("b.band").alias("band"), F.col("b.band_hash").alias("bh"))
    # both sides of the self-join read `banded`; without persist, Catalyst
    # re-derives the whole shingle+signature tree per side (no CSE across
    # self-join branches) — the dominant cost. The persisted frame is tiny:
    # (doc_id, 16x8-char sig, band, hash) per band. At 100 TB this becomes a
    # materialized signature table (SCALE.md).
    banded = banded.persist()

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
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x
        )
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        (agree.cast("double") / F.lit(16).cast("double")).alias("est_jaccard"),
    )


def ngram_jaccard(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                  k: int = 3) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (the verify stage after
    LSH): |A∩B| / |A∪B| over distinct k-word shingles."""
    sh = spread(df).select("doc_id", word_shingles(F.col(text_col), k).alias("sh"))
    sh = sh.persist()  # joined twice (doc_a and doc_b sides)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = pairs.select("doc_a", "doc_b").join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        "doc_a",
        "doc_b",
        F.when(union > 0, inter.cast("double") / union).otherwise(0.0).alias("jaccard"),
    )


def decontaminate(train: DataFrame, eval_docs: DataFrame,
                  text_col: str = "text", k: int = 3) -> DataFrame:
    """Test-set decontamination: flag training documents sharing ≥1 distinct
    k-word shingle with any eval/benchmark document. Returns
    (doc_id, n_shared_shingles, is_contaminated) for every train doc.

    Scale shape: the eval corpus is tiny (benchmarks), so its distinct
    shingle set BROADCASTS — contamination checking is then a map-side hash
    probe over the train corpus with no train-side shuffle; only the hit
    rows (rare) shuffle for the per-doc count. At 100 TB this is one read
    of the corpus, full stop."""
    tsh = spread(train).select(
        "doc_id", F.explode(word_shingles(F.col(text_col), k)).alias("sh")
    )
    esh = eval_docs.select(
        F.explode(word_shingles(F.col(text_col), k)).alias("sh")
    ).distinct()
    hits = (
        tsh.join(F.broadcast(esh), "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_shared_shingles"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_shingles", F.lit(0).cast("long")).alias(
                "n_shared_shingles"
            ),
            (F.coalesce("n_shared_shingles", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash (16-bit, md5-derived — engine-portable)
# ---------------------------------------------------------------------------


def simhash16(col: Column) -> Column:
    """16-bit SimHash over whitespace tokens: bit i is 1 when the sum of
    (+1/-1) votes from each token's md5-derived 16-bit value is positive.
    Integer-only arithmetic → exactly reproducible anywhere."""
    toks = F.split(_norm_text(col), _WS)
    # per-token 16-bit value from the first 4 hex digits of md5
    tok_vals = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int"))

    # bit i of v, with a Column-valued i (shiftright needs a literal int):
    # v / 2^i is exact in double for v < 2^16, so floor-div-mod is safe
    def bit(v, i):
        return F.floor(v / F.pow(F.lit(2.0), i.cast("double"))).cast("int") % 2

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda i: F.when(
            F.aggregate(
                tok_vals,
                F.lit(0),
                lambda acc, v: acc + F.when(bit(v, i) == 1, 1).otherwise(-1),
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    # fold bits into one integer: sum of bit_i * 2^i
    return F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.lit(15)),
            lambda b, i: b * F.pow(F.lit(2.0), i.cast("double")).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       max_distance: int = 2) -> DataFrame:
    """SimHash near-dup pairs within a Hamming-distance budget, at scale.

    Banding: the 16-bit hash splits into (max_distance + 1) bands; by
    pigeonhole, any pair within ``max_distance`` bits agrees exactly on at
    least one band, so candidates come from equi-joins on (band_index,
    band_value) — never an all-pairs XOR scan. The exact popcount filter
    then keeps true near-pairs. Returns (doc_a, doc_b, hamming_distance).
    """
    n_bands = max_distance + 1
    width = 16 // n_bands
    h = spread(df).select("doc_id", simhash16(F.col(text_col)).alias("simhash"))
    h = h.persist()
    # band value b_i = bits [i*width, (i+1)*width); last band takes the rest
    banded = h.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        (
                            (F.col("simhash") / F.lit(2 ** (i * width))).cast("int")
                            % F.lit(
                                2 ** (width if i < n_bands - 1 else 16 - i * width)
                            )
                        ).alias("val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    dist = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        pairs.withColumn("hamming_distance", dist)
        .filter(F.col("hamming_distance") <= max_distance)
        .select("doc_a", "doc_b", "hamming_distance")
    )


def simhash_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Docs sharing an identical 16-bit simhash bucket, paired for review
    (hamming-distance banding generalizes this at scale)."""
    h = spread(df).select("doc_id", simhash16(F.col(text_col)).alias("simhash"))
    h = h.persist()  # self-joined: avoid recomputing the bit votes per side
    a, b = h.alias("a"), h.alias("b")
    return a.join(
        b,
        (F.col("a.simhash") == F.col("b.simhash"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("simhash"),
    )
