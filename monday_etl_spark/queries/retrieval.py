"""Full-text retrieval operators: inverted-index build and BM25 ranking.

A training-data platform needs search over its corpus (debugging dedup
clusters, pulling eval examples, contamination forensics). Both ops are
plain aggregation plans: the index build is ONE doc-term shuffle, BM25 is
the same shuffle joined against a term-sized statistics table that Catalyst
broadcasts.

Determinism: BM25 here is the log-free Robertson variant — idf kept as the
raw ratio (N - df + 0.5)/(df + 0.5) instead of its log — so every arithmetic
step is an exactly-specified IEEE-754 +,-,*,/ and both engines produce
bit-identical doubles (transcendental log/exp are the only ops whose last
ulp varies across runtimes). Per-document summation over query terms is an
ordered fold (terms sorted lexicographically), never a parallel SUM, so the
float addition order is fixed at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

# normalized whitespace tokens — same convention as tfidf_top_terms
_LTOKS = r"string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"

# the standing query for bm25_topk (a literal, like filter_inlist's IN list)
_QUERY_TERMS = ("vector", "join", "stream")
# BM25 constants forced to DOUBLE on BOTH engines: a bare 1.2 literal parses
# as DECIMAL(2,1) in DuckDB (and in Spark SQL text), silently switching the
# score arithmetic to decimal and shifting the last ulp vs the double path
_K1 = "CAST(1.2 AS DOUBLE)"
_B_DL = "CAST(0.75 AS DOUBLE)"
_ONE_MINUS_B = "CAST(0.25 AS DOUBLE)"


def _tokens(docs: DataFrame) -> DataFrame:
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    return docs.select(
        "doc_id", F.explode(F.split(norm, " ")).alias("term")
    )


@register(
    "search_index_build",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, u.term FROM (
            SELECT doc_id, {_LTOKS} AS toks FROM documents
        ) t, UNNEST(t.toks) AS u(term)
    )
    SELECT term,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(COUNT(*) AS BIGINT) AS cf,
           array_to_string(list_sort(list(DISTINCT doc_id)), '|') AS postings
    FROM tok GROUP BY term
    """,
    doc="Inverted-index build: explode tokens -> one (term) shuffle "
        "producing document frequency, collection frequency, and the "
        "sorted posting list per term. Scale: partial aggregation "
        "combines (doc,term) duplicates map-side; the posting arrays are "
        "the only wide payload and they shuffle already-combined. At "
        "100 TB the postings column for stopword-grade terms is the skew "
        "risk — shard hot terms by (term, doc_id div B) exactly like "
        "sequence_packing_sharded shards languages.",
)
def search_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _tokens(load_table(spark, sf_dir, "documents"))
    return tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count("*").alias("cf"),
        F.array_join(F.sort_array(F.collect_set("doc_id")), "|").alias("postings"),
    )


@register(
    "bm25_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, u.term FROM (
            SELECT doc_id, {_LTOKS} AS toks FROM documents
        ) t, UNNEST(t.toks) AS u(term)
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        WHERE term IN ('vector', 'join', 'stream')
        GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        WHERE term IN ('vector', 'join', 'stream')
        GROUP BY term
    ),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ((CAST(s.n_docs AS DOUBLE) - df.df + CAST(0.5 AS DOUBLE)) / (df.df + CAST(0.5 AS DOUBLE)))
               * ((tf.tf * CAST(2.2 AS DOUBLE))
                  / (tf.tf + {_K1} * ({_ONE_MINUS_B} + {_B_DL}
                                      * (CAST(dl.dl AS DOUBLE) / s.avgdl))))
                   AS term_score
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats s
    ),
    folded AS (
        SELECT doc_id,
               list_reduce(list(term_score ORDER BY term), (a, b) -> a + b)
                   AS bm25,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, bm25, n_terms_hit
    FROM folded
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    doc="BM25 top-20 for a standing query (k1=1.2, b=0.75, log-free "
        "Robertson idf so the whole score is exactly-specified IEEE "
        "arithmetic — see module docstring). Plan: one (doc,term) shuffle "
        "for tf (query-filtered BEFORE the shuffle, so the exchange "
        "carries only matching terms), a term-sized df table and 2-column "
        "stats row broadcast back, per-doc ordered fold over <=3 term "
        "scores, TakeOrderedAndProject for the top-k (partial top-20 per "
        "partition, no global sort). 100 TB: every shuffle is "
        "query-term-filtered, so cost tracks hit count, not corpus size.",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = _tokens(docs)
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    hits = tok.filter(F.col("term").isin(*_QUERY_TERMS))
    tf = hits.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    idf = (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    tf_part = (F.col("tf") * F.lit(2.2)) / (
        F.col("tf")
        + F.expr(f"{_K1} * ({_ONE_MINUS_B} + {_B_DL} * (CAST(dl AS DOUBLE) / avgdl))")
    )
    scored = (
        tf.join(df, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", (idf * tf_part).alias("term_score"))
    )
    folded = scored.groupBy("doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "term_score"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term_score"],
        ).alias("bm25"),
        F.count("*").alias("n_terms_hit"),
    )
    return folded.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(20)


_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48  # 16-token overlap between adjacent chunks


@register(
    "doc_chunking",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_LTOKS} AS toks FROM documents
        WHERE length(trim(text)) > 0
    )
    SELECT doc_id,
           CAST(s // {_CHUNK_STRIDE} AS INTEGER) AS chunk_id,
           CAST(s AS BIGINT) AS start_tok,
           CAST(len(toks[s + 1 : least(s + {_CHUNK_SIZE}, len(toks))])
                AS INTEGER) AS n_toks,
           array_to_string(
               toks[s + 1 : least(s + {_CHUNK_SIZE}, len(toks))], ' ')
               AS chunk_text
    FROM t, UNNEST(range(0, len(toks), {_CHUNK_STRIDE})) AS u(s)
    """,
    doc="RAG-style overlapping chunking: 64-token windows at stride 48 "
        "(16-token overlap so no passage straddles a boundary unseen), "
        "emitted with stable (doc_id, chunk_id, start_tok) addressing for "
        "index-and-retrieve round trips. Pure map + explode — shuffle-free "
        "at any corpus size; the chunk inherits its doc's partition. The "
        "ingestion step ahead of search_index_build / bm25_topk / ANN.",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    t = docs.select("doc_id", F.split(norm, " ").alias("toks"))
    starts = F.sequence(
        F.lit(0), F.size("toks") - 1, F.lit(_CHUNK_STRIDE)
    )
    ck = t.select(
        "doc_id", "toks", F.explode(starts).alias("s")
    )
    window = F.slice(
        "toks", F.col("s") + 1,
        F.least(F.lit(_CHUNK_SIZE), F.size("toks") - F.col("s")),
    )
    return ck.select(
        "doc_id",
        F.expr(f"CAST(s div {_CHUNK_STRIDE} AS INT)").alias("chunk_id"),
        F.col("s").cast("long").alias("start_tok"),
        F.size(window).cast("int").alias("n_toks"),
        F.array_join(window, " ").alias("chunk_text"),
    )
