"""Corpus packing / token accounting / chunk dedup / source rebalancing.

Four training-data operators beyond the reference's inventory (SURVEY §7 M4
extension class), each declarative and exact-oracle-checked:

* ``token_stats``        — whitespace vs BPE-ish vs subword-estimate token
                           counts per document (pure map).
* ``sequence_packing``   — GPT-style concat-and-chunk packing: concatenate
                           documents per language in deterministic order and
                           assign each doc its training-sequence id + offset
                           at a fixed token budget. Integer window arithmetic
                           only (exact on both engines).
* ``chunk_dedup``        — MassiveText-style fixed-width token-chunk dedup:
                           split docs into 32-token chunks, find corpus-wide
                           repeated chunks, report per-doc duplication.
* ``source_temperature_resample`` — temperature-flattened source mixing
                           (alpha = 0.5): per-source keep-targets
                           proportional to sqrt(count), filled by
                           deterministic md5-ordered ranking. sqrt is
                           IEEE-exact (unlike pow), so targets are
                           bit-identical across engines.

Scale shapes: token_stats is shuffle-free; sequence_packing shuffles once on
lang (at 100 TB the partition key would widen to (lang, shard) with
per-shard budgets — the window is per-partition, never global);
chunk_dedup explodes ~n_tokens/32 rows per doc and shuffles on the chunk
hash (the same shape as tfidf's doc-term explode); the resampler's
per-source dimension is tiny and broadcast back onto the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..extensions.textanalysis import _BPE_RE, bpe_ish_count, token_count, tokens
from ..io import load_table
from .registry import register

# shared DuckDB fragments — identical tokenizer on both engines
_SQL_TOKS = r"string_split_regex(trim(text), '\s+')"
_SQL_NTOK = (
    f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_SQL_TOKS}) END"
)

_SEQ_BUDGET = 512  # tokens per packed training sequence
_CHUNK = 32  # tokens per dedup chunk


@register(
    "token_stats",
    oracle=f"""
    SELECT doc_id,
           {_SQL_NTOK} AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))
               AS n_bpe_tokens,
           CAST(list_sum(list_transform({_SQL_TOKS},
                                        w -> (length(w) + 3) // 4))
                AS BIGINT) AS n_subword_est
    FROM documents
    """,
    doc="Token accounting per document: whitespace tokens, BPE-ish regex "
        "tokens (letters runs / single digits / single symbols), and a "
        "subword estimate (ceil(len/4) per word, integer arithmetic). Pure "
        "map over the scan — shuffle-free at any scale; the regex and the "
        "integer fold run inside whole-stage codegen.",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    # integer subword estimate: ceil(len/4) == (len+3) div 4, no doubles
    subword = F.expr(
        r"aggregate(split(trim(text), '\\s+'), 0L,"
        r" (acc, w) -> acc + (length(w) + 3) div 4)"
    )
    return docs.select(
        "doc_id",
        token_count(c).alias("n_ws_tokens"),
        bpe_ish_count(c).alias("n_bpe_tokens"),
        subword.alias("n_subword_est"),
    )


@register(
    "sequence_packing",
    oracle=f"""
    WITH n AS (
        SELECT doc_id, lang, {_SQL_NTOK} AS n_tokens FROM documents
    ), c AS (
        SELECT doc_id, lang, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM n
    )
    SELECT doc_id, lang, n_tokens,
           CAST(cum_before // {_SEQ_BUDGET} AS BIGINT) AS seq_id,
           CAST(cum_before % {_SEQ_BUDGET} AS BIGINT) AS seq_offset,
           (cum_before % {_SEQ_BUDGET}) + n_tokens > {_SEQ_BUDGET}
               AS crosses_boundary
    FROM c
    """,
    doc="Concat-and-chunk sequence packing: per language, documents are "
        "concatenated in doc_id order and cut into fixed "
        f"{_SEQ_BUDGET}-token training sequences; each doc learns its "
        "sequence id, offset, and whether it straddles a boundary. One "
        "integer window sum partitioned by lang — exact on both engines "
        "(token counts are ints, unlike double window sums). At 100 TB the "
        "partition key widens to (lang, shard) so no single partition "
        "carries a language's whole corpus.",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = docs.select(
        "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
    )
    cum = n.withColumn(
        "cum_before",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
    )
    return cum.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(f"cum_before div {_SEQ_BUDGET}").alias("seq_id"),
        (F.col("cum_before") % _SEQ_BUDGET).alias("seq_offset"),
        ((F.col("cum_before") % _SEQ_BUDGET) + F.col("n_tokens") > _SEQ_BUDGET)
        .alias("crosses_boundary"),
    )


@register(
    "chunk_dedup",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
        WHERE length(trim(text)) > 0
    ), ch AS (
        SELECT doc_id,
               unnest(range(0, (len(toks) + {_CHUNK} - 1) // {_CHUNK})) AS c,
               toks
        FROM t
    ), hashed AS (
        SELECT doc_id, c AS chunk_idx,
               md5(array_to_string(
                   list_slice(toks, c * {_CHUNK} + 1, c * {_CHUNK} + {_CHUNK}),
                   ' ')) AS h
        FROM ch
    ), ranked AS (
        SELECT doc_id, chunk_idx,
               ROW_NUMBER() OVER (PARTITION BY h
                                  ORDER BY doc_id, chunk_idx) AS rn
        FROM hashed
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(COUNT(CASE WHEN rn > 1 THEN 1 END) AS BIGINT) AS n_dup_chunks,
           CAST(COUNT(CASE WHEN rn > 1 THEN 1 END) AS DOUBLE) / COUNT(*)
               AS dup_chunk_frac
    FROM ranked GROUP BY doc_id
    """,
    doc=f"Fixed-width chunk dedup (MassiveText-style): cut each doc into "
        f"{_CHUNK}-token chunks, hash them, keep the first corpus-wide "
        "occurrence (row_number over the chunk hash), report per-doc "
        "duplicated-chunk fraction. Explodes ~n_tokens/32 rows per doc and "
        "shuffles once on the chunk hash — same shape as the doc-term "
        "explode in tfidf; the md5 is the only per-row-heavy op and runs "
        "JVM-side.",
)
def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = tokens(F.col("text"))
    nchunks = F.expr(f"(size(toks) + {_CHUNK} - 1) div {_CHUNK}")
    exploded = (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(F.sequence(F.lit(0), nchunks - 1)).alias("c"))
    )
    hashed = exploded.select(
        "doc_id",
        F.col("c").alias("chunk_idx"),
        F.md5(
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("c") * _CHUNK + 1, _CHUNK))
        ).alias("h"),
    )
    w = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    dup = F.count(F.when(F.col("rn") > 1, 1))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        dup.alias("n_dup_chunks"),
        (dup.cast("double") / F.count(F.lit(1))).alias("dup_chunk_frac"),
    )


@register(
    "source_temperature_resample",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
    s AS (SELECT list_reduce(list(sqrt(CAST(c AS DOUBLE)) ORDER BY source),
                             (a, b) -> a + b) AS total_w,
                 SUM(c) AS total
          FROM c),
    t AS (SELECT c.source,
                 least(c.c,
                       CAST(floor((CAST(s.total // 2 AS DOUBLE)
                                   * sqrt(CAST(c.c AS DOUBLE))) / s.total_w)
                            AS BIGINT)) AS target
          FROM c, s),
    r AS (SELECT d.doc_id, d.source,
                 ROW_NUMBER() OVER (
                     PARTITION BY d.source
                     ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
          FROM documents d)
    SELECT r.doc_id, r.source, r.rn
    FROM r JOIN t USING (source) WHERE r.rn <= t.target
    """,
    doc="Temperature-flattened source mixing (alpha = 0.5, UniMax-style): "
        "per-source keep-targets proportional to sqrt(count) over a halved "
        "total budget, filled deterministically by md5-ordered rank. sqrt "
        "is correctly-rounded IEEE (pow is not) and the ~20-element weight "
        "sum is an explicit source-ordered left fold, so targets match "
        "bit-for-bit across engines. The per-source target table is tiny "
        "and broadcast onto the corpus scan; the only corpus-wide work is "
        "one rank window per source.",
)
def source_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    # source-ordered left fold of sqrt weights: bit-identical to the
    # oracle's list_reduce (0.0 + w == w exactly for w >= 0)
    weights = counts.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("source"),
                        F.sqrt(F.col("c").cast("double")).alias("w"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("total_w"),
        F.sum("c").alias("total"),
    )
    targets = counts.crossJoin(F.broadcast(weights)).select(
        "source",
        F.least(
            F.col("c"),
            F.floor(
                (
                    F.expr("total div 2").cast("double")
                    * F.sqrt(F.col("c").cast("double"))
                )
                / F.col("total_w")
            ).cast("long"),
        ).alias("target"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w).alias("rn")
    )
    return ranked.join(F.broadcast(targets), "source").filter(
        F.col("rn") <= F.col("target")
    ).select("doc_id", "source", "rn")


# ---------------------------------------------------------------------------
# Arbitrary-offset substring dedup (ExactSubstr-style) + sharded packing
# ---------------------------------------------------------------------------

_SUBSTR_W = 16  # tokens per sliding window

# duplicate-window -> span-coverage SQL tail shared by both substring-dedup
# oracles (identical downstream semantics; only the window HASH differs)
_SQL_SPAN_TAIL = f"""
    dup AS (
        SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2
    ), dwin AS (
        SELECT w.doc_id, w.off FROM wins w JOIN dup USING (h)
    ), cov AS (
        SELECT doc_id, off,
               LEAST({_SUBSTR_W},
                     COALESCE(LEAD(off) OVER (PARTITION BY doc_id ORDER BY off)
                              - off, {_SUBSTR_W})) AS c
        FROM dwin
    ), agg AS (
        SELECT doc_id, COUNT(*) AS n_dup_windows,
               CAST(SUM(c) AS BIGINT) AS dup_tokens_covered
        FROM cov GROUP BY doc_id
    )
    SELECT t.doc_id,
           t.n_tokens,
           greatest(t.n_tokens - {_SUBSTR_W} + 1, 0) AS n_windows,
           COALESCE(a.n_dup_windows, 0) AS n_dup_windows,
           COALESCE(a.dup_tokens_covered, 0) AS dup_tokens_covered,
           CASE WHEN t.n_tokens > 0 THEN
               CAST(COALESCE(a.dup_tokens_covered, 0) AS DOUBLE) / t.n_tokens
           ELSE 0.0 END AS dup_token_frac
    FROM t LEFT JOIN agg a USING (doc_id)
"""


def _dup_span_report(wins: DataFrame, base: DataFrame) -> DataFrame:
    """Shared downstream of both substring-dedup variants: duplicate-window
    set (>=2 occurrences corpus-wide), per-doc covered-token count via the
    lead-gap interval union, and the final per-doc report."""
    wins = wins.persist()  # used for both the dup-set and the probe side
    dup = wins.groupBy("h").count().filter(F.col("count") >= 2).select("h")
    dwin = wins.join(dup, "h").select("doc_id", "off")
    wlead = Window.partitionBy("doc_id").orderBy("off")
    cov = dwin.withColumn(
        "c",
        F.least(
            F.lit(_SUBSTR_W),
            F.coalesce(
                F.lead("off").over(wlead) - F.col("off"), F.lit(_SUBSTR_W)
            ),
        ),
    )
    agg = cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_windows"),
        F.sum("c").cast("long").alias("dup_tokens_covered"),
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.greatest(
                F.col("n_tokens") - _SUBSTR_W + 1, F.lit(0).cast("long")
            ).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0).cast("long")).alias(
                "n_dup_windows"
            ),
            F.coalesce("dup_tokens_covered", F.lit(0).cast("long")).alias(
                "dup_tokens_covered"
            ),
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("dup_tokens_covered", F.lit(0).cast("long")).cast(
                    "double"
                )
                / F.col("n_tokens"),
            )
            .otherwise(0.0)
            .alias("dup_token_frac"),
        )
    )


@register(
    "substring_dedup",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_SQL_TOKS} AS toks, {_SQL_NTOK} AS n_tokens
        FROM documents
    ), wins AS (
        SELECT doc_id,
               u.i AS off,
               md5(array_to_string(toks[u.i : u.i + {_SUBSTR_W} - 1], ' ')) AS h
        FROM t, UNNEST(range(1, greatest(n_tokens - {_SUBSTR_W} + 1, 0) + 1)) u(i)
    ), {_SQL_SPAN_TAIL}
    """,
    doc=f"Arbitrary-offset repeated-span dedup (the ExactSubstr semantics of "
        f"Lee et al. 2022, which aligned chunk_dedup cannot express): hash "
        f"every {_SUBSTR_W}-token sliding window, find windows occurring >=2 "
        "times corpus-wide, and report per doc how many tokens lie inside a "
        "repeated span (interval union via the lead-gap trick — integer "
        "only). Scale shape: the explode emits one 16-byte digest per token "
        "position (linear, like tfidf's term explode) and the duplicate "
        "test is one partial-agg shuffle on the window hash; a Rabin-Karp "
        "rolling hash would cut the O(W) per-window concat to O(1) but "
        "needs per-row state (a mapInPandas seam) — the md5-of-slice stays "
        "inside whole-stage codegen and keeps the DuckDB oracle exact.",
)
def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        tokens(F.col("text")).alias("toks"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    wins = (
        base.filter(F.col("n_tokens") >= _SUBSTR_W)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.col("n_tokens") - _SUBSTR_W + 1)
            ).alias("off"),
            F.col("toks"),
        )
        .select(
            "doc_id",
            "off",
            F.md5(
                F.concat_ws(" ", F.slice(F.col("toks"), F.col("off"), _SUBSTR_W))
            ).alias("h"),
        )
    )
    return _dup_span_report(wins, base)
from ..extensions.rolling import sql_rolling_window_hashes as _sql_roll

def _hex2int15(expr: str) -> str:
    """DuckDB hex->BIGINT fold for <=15 nibbles (fits signed int64)."""
    return (
        f"list_reduce(list_transform(string_split({expr}, ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
        f"(a, b) -> a * 16 + b)"
    )

_SQL_ROLLING_WINS = _sql_roll(16, _SQL_TOKS, _SQL_NTOK, _hex2int15)



@register(
    "substring_dedup_rolling",
    oracle=f"""
    WITH {_SQL_ROLLING_WINS},
    {_SQL_SPAN_TAIL}
    """,
    doc=f"Rabin-Karp flavor of substring_dedup (TODO r02 #2): window hashes "
        f"come from ONE O(L) rolling pass per document inside mapInPandas "
        f"(H' = H·B − t_out·B^W + t_in, mod 2^61−1) instead of an O(W) "
        "md5-of-slice per position. The DuckDB oracle computes the same "
        "values via the direct polynomial sum — a closed-form identity twin "
        "of the recurrence — in HUGEINT mulmods, so the stateful rolling "
        "computation is exactness-checked, not trusted. Downstream "
        "(duplicate-window set, span coverage) is shared with "
        "substring_dedup. Scale: pure Arrow-batched map, no shuffle before "
        "the one window-hash aggregate.",
)
def substring_dedup_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.rolling import rolling_window_hashes

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        tokens(F.col("text")).alias("toks"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    wins = rolling_window_hashes(
        base.filter(F.col("n_tokens") >= _SUBSTR_W), _SUBSTR_W
    )
    return _dup_span_report(wins, base)



_N_SHARDS = 4  # >1 shard per language: no partition carries a whole language


@register(
    "sequence_packing_sharded",
    oracle=f"""
    WITH n AS (
        SELECT doc_id, lang, doc_id % {_N_SHARDS} AS shard,
               {_SQL_NTOK} AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, lang, shard, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM n
    )
    SELECT doc_id, lang, shard, n_tokens,
           CAST(cum_before // {_SEQ_BUDGET} AS BIGINT) AS seq_id,
           CAST(cum_before % {_SEQ_BUDGET} AS BIGINT) AS seq_offset,
           (cum_before % {_SEQ_BUDGET}) + n_tokens > {_SEQ_BUDGET}
               AS crosses_boundary
    FROM c
    """,
    doc=f"Sharded sequence packing (the 100 TB form of sequence_packing, "
        f"r01 TODO #3): the window key widens to (lang, shard) with "
        f"shard = doc_id % {_N_SHARDS}, so no single partition ever carries "
        "a language's whole corpus — each shard packs its own budgeted "
        "sequences and sequence ids are namespaced by (lang, shard). "
        "Integer window arithmetic only; deterministic for any shard "
        "count. In production the shard count scales with corpus size "
        "(shards ≈ corpus_tokens / executor_partition_budget).",
)
def sequence_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % _N_SHARDS).alias("shard"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    cum = n.withColumn(
        "cum_before",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
    )
    return cum.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        F.expr(f"cum_before div {_SEQ_BUDGET}").alias("seq_id"),
        (F.col("cum_before") % _SEQ_BUDGET).alias("seq_offset"),
        ((F.col("cum_before") % _SEQ_BUDGET) + F.col("n_tokens") > _SEQ_BUDGET)
        .alias("crosses_boundary"),
    )


@register(
    "chunk_dedup_rewrite",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
        WHERE length(trim(text)) > 0
    ), ch AS (
        SELECT doc_id,
               unnest(range(0, (len(toks) + {_CHUNK} - 1) // {_CHUNK})) AS c,
               toks
        FROM t
    ), chunks AS (
        SELECT doc_id, c AS chunk_idx,
               array_to_string(
                   list_slice(toks, c * {_CHUNK} + 1, c * {_CHUNK} + {_CHUNK}),
                   ' ') AS chunk_text
        FROM ch
    ), ranked AS (
        SELECT doc_id, chunk_idx, chunk_text,
               ROW_NUMBER() OVER (PARTITION BY md5(chunk_text)
                                  ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk_text END,
                               ' ' ORDER BY chunk_idx), '') AS clean_text
    FROM ranked GROUP BY doc_id
    """,
    doc=f"Chunk dedup as a REWRITE (the step MassiveText actually applies, "
        f"where chunk_dedup only reports): cut each doc into {_CHUNK}-token "
        "chunks, keep the first corpus-wide occurrence of each chunk "
        "(row_number over the chunk hash), and reassemble every document's "
        "text from its surviving chunks in order. Same explode+hash-shuffle "
        "shape as chunk_dedup plus one groupBy(doc_id) to rebuild the text; "
        "chunk text rides the shuffle instead of being re-sliced, so the "
        "doc's token array is scanned once.",
)
def chunk_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = tokens(F.col("text"))
    nchunks = F.expr(f"(size(toks) + {_CHUNK} - 1) div {_CHUNK}")
    exploded = (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks",
                F.explode(F.sequence(F.lit(0), nchunks - 1)).alias("c"))
    )
    chunks = exploded.select(
        "doc_id",
        F.col("c").alias("chunk_idx"),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("c") * _CHUNK + 1, _CHUNK)
        ).alias("chunk_text"),
    )
    w = Window.partitionBy(F.md5("chunk_text")).orderBy("doc_id", "chunk_idx")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    kept = F.when(F.col("rn") == 1, F.struct("chunk_idx", "chunk_text"))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(kept).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda s: s["chunk_text"]
            ),
        ).alias("clean_text"),
    )


@register(
    "bigram_lm_build",
    oracle=f"""
    WITH big AS (
        SELECT u.bg.w1 AS w1, u.bg.w2 AS w2 FROM (
            SELECT [struct_pack(w1 := toks[i], w2 := toks[i+1])
                    for i in range(1, len(toks))] AS bgs
            FROM (SELECT {_SQL_TOKS} AS toks FROM documents
                  WHERE length(trim(text)) > 0) t
        ) x, UNNEST(x.bgs) AS u(bg)
    ),
    bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_bigram
           FROM big GROUP BY w1, w2),
    uc AS (SELECT w1, CAST(SUM(c_bigram) AS BIGINT) AS c_unigram
           FROM bc GROUP BY w1)
    SELECT bc.w1, bc.w2, bc.c_bigram, uc.c_unigram,
           CAST(bc.c_bigram AS DOUBLE) / uc.c_unigram AS p_cond
    FROM bc JOIN uc USING (w1)
    """,
    doc="Bigram language-model build: adjacent-token pairs per document -> "
        "(w1, w2) counts -> conditional P(w2|w1) as a single IEEE division "
        "of exact counts. The training side of text_perplexity's unigram "
        "scorer, one order up. Spark derives bigrams with ONE pass "
        "(posexplode + lead over the doc partition = arrays zipped "
        "in-place, no self-join); the oracle zips the same adjacent pairs "
        "with a list comprehension. Shuffles: (w1, w2) count, then the "
        "vocab-sized unigram table broadcast back.",
)
def bigram_lm_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    # in-place bigram derivation: zip the token array with itself shifted by
    # one — no explode-then-self-join, no window
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bigram"))
    uc = bc.groupBy("w1").agg(F.sum("c_bigram").alias("c_unigram"))
    return bc.join(F.broadcast(uc), "w1").select(
        "w1", "w2", "c_bigram", "c_unigram",
        (F.col("c_bigram").cast("double") / F.col("c_unigram")).alias("p_cond"),
    )


_MIX_BUDGET = 1_000_000  # tokens to allocate across sources


@register(
    "mixture_token_allocation",
    oracle=f"""
    WITH src AS (
        SELECT source, CAST(SUM({_SQL_NTOK}) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    wts AS (
        SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS w
        FROM src
    ),
    tot AS (SELECT SUM(w) AS sw FROM wts),
    quota AS (
        SELECT source, n_tokens, w,
               ({_MIX_BUDGET} * w) / t.sw AS exact_quota
        FROM wts CROSS JOIN tot t
    ),
    fl AS (
        SELECT source, n_tokens, exact_quota,
               CAST(FLOOR(exact_quota) AS BIGINT) AS base,
               exact_quota - FLOOR(exact_quota) AS rem
        FROM quota
    ),
    leftover AS (
        SELECT CAST({_MIX_BUDGET} - SUM(base) AS BIGINT) AS k FROM fl
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rn
        FROM fl
    )
    SELECT source, n_tokens,
           base + CASE WHEN rn <= l.k THEN 1 ELSE 0 END AS alloc_tokens
    FROM ranked CROSS JOIN leftover l
    """,
    doc="Training-mixture token allocation: temperature-flattened weights "
        "(alpha=0.5, sqrt is IEEE-correctly-rounded so cross-engine exact) "
        "over per-source token counts, a fixed 1M-token budget split by "
        "largest-remainder rounding — allocations sum to the budget "
        "EXACTLY, no drift. The integer-budget step after "
        "source_temperature_resample's rate setting. Plan: one "
        "conditional-sum scan per source (sources-sized everything "
        "after), window over the handful of sources.",
)
def mixture_token_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).alias("n_tokens")
    )
    wts = src.select(
        "source", "n_tokens",
        F.sqrt(F.col("n_tokens").cast("double")).alias("w"),
    )
    tot = wts.agg(F.sum("w").alias("sw"))
    quota = wts.crossJoin(F.broadcast(tot)).select(
        "source", "n_tokens",
        ((F.lit(_MIX_BUDGET) * F.col("w")) / F.col("sw")).alias("exact_quota"),
    )
    fl = quota.select(
        "source", "n_tokens", "exact_quota",
        F.floor("exact_quota").alias("base"),
        (F.col("exact_quota") - F.floor("exact_quota").cast("double"))
        .alias("rem"),
    )
    leftover = fl.agg((F.lit(_MIX_BUDGET) - F.sum("base")).alias("k"))
    w = Window.orderBy(F.desc("rem"), F.asc("source"))
    ranked = fl.withColumn("rn", F.row_number().over(w))
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "source", "n_tokens",
        (F.col("base")
         + F.when(F.col("rn") <= F.col("k"), 1).otherwise(0))
        .alias("alloc_tokens"),
    )
