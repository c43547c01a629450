"""Registry entries: dup-cluster resolution (iterative) and TF-IDF weights."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..extensions.cluster import dedup_clusters
from ..extensions.dedup import minhash_candidates
from ..io import load_table
from .registry import register


@register(
    "dedup_cluster_resolution",
    oracle=None,  # iterative label propagation to fixpoint — the
    # non-SQL-expressible iterative-algorithm case; verified against a
    # pure-Python union-find oracle in tests/test_cluster.py
    doc="Near-dup cluster resolution: LSH candidate pairs → connected "
        "components (iterative min-label propagation, localCheckpoint per "
        "round) → one keeper per component. The end-to-end dedup decision "
        "a training-data pipeline actually applies.",
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
