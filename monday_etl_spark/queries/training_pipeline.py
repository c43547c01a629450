"""The end-to-end training-data story: scrub → score → dedup → select.

``training_set_selection`` is the composite the individual extension
operators exist for — the filter a data pipeline applies before a corpus
ships to training. Everything is a pure map plus the exact-dedup groupBy, so
the composite inherits the scale shape of its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.dedup import exact_dedup
from ..extensions.textanalysis import quality_score
from ..io import load_table
from .registry import register

# identical regexes on both engines (Java regex + RE2 common subset)
_URL_RE = r"https?://\S+"
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_LONG_NUM_RE = r"[0-9]{6,}"


@register(
    "text_scrub",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_URL_RE}', '<URL>', 'g'),
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_LONG_NUM_RE}', '<NUM>', 'g') AS scrubbed,
           len(regexp_extract_all(text, '{_URL_RE}')) AS n_urls,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_LONG_NUM_RE}')) AS n_long_numbers
    FROM documents
    """,
    doc="PII/URL scrubbing: redact urls, emails, long digit runs, and count "
        "what was redacted — regexp_replace chains, pure map, codegen-side.",
)
def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", _URL_RE, "<URL>"),
            _EMAIL_RE,
            "<EMAIL>",
        ),
        _LONG_NUM_RE,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit(_URL_RE))).alias("n_urls"),
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE))).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_LONG_NUM_RE))).alias(
            "n_long_numbers"
        ),
    )


# thresholds for the composite selection
_MIN_QUALITY = 0.5
_MIN_TOKENS = 20

_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_TOKS = r"string_split_regex(trim(text), '\s+')"
_STOP = "['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','this']"


@register(
    "training_set_selection",
    oracle=f"""
    WITH q AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END AS n_tokens,
               CAST((CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1 ELSE 0 END
                   + CASE WHEN (CASE WHEN length(text) > 0 THEN
                         CAST(length(text) - length(regexp_replace(text,
                              '[.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE)
                         / length(text) ELSE 0.0 END) < 0.1 THEN 1 ELSE 0 END
                   + CASE WHEN (CASE WHEN len({_TOKS}) > 0 AND length(trim(text)) > 0 THEN
                         CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                         / len({_TOKS}) ELSE 0.0 END) BETWEEN 2.0 AND 12.0
                     THEN 1 ELSE 0 END
                   + CASE WHEN (CASE WHEN len({_TOKS}) > 0 AND length(trim(text)) > 0 THEN
                         CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                              t -> list_contains({_STOP}, t))) AS DOUBLE) / len({_TOKS})
                         ELSE 0.0 END) >= 0.05 THEN 1 ELSE 0 END) AS DOUBLE) / 4
                   AS quality_score
        FROM documents
    ),
    keyed AS (SELECT doc_id, md5({_NORM}) AS fp FROM documents),
    keepers AS (SELECT fp, MIN(doc_id) AS keep_doc_id FROM keyed GROUP BY fp),
    dedup AS (SELECT k.doc_id, k.doc_id <> p.keep_doc_id AS is_duplicate
              FROM keyed k JOIN keepers p USING (fp))
    SELECT q.doc_id, q.n_tokens, q.quality_score, d.is_duplicate,
           (q.quality_score >= {_MIN_QUALITY}
            AND q.n_tokens >= {_MIN_TOKENS}
            AND NOT d.is_duplicate) AS selected
    FROM q JOIN dedup d USING (doc_id)
    """,
    doc="Composite training-set selection: quality threshold + token floor + "
        "exact-dedup keeper — the decision column a corpus pipeline writes "
        "before training. Joins are on doc_id (broadcast-able dim-sized "
        "outputs at this stage of a real pipeline: per-doc scores).",
)
def training_set_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "n_tokens", "quality_score")
    d = exact_dedup(docs).select("doc_id", "is_duplicate")
    return q.join(d, "doc_id").select(
        "doc_id",
        "n_tokens",
        "quality_score",
        "is_duplicate",
        (
            (F.col("quality_score") >= _MIN_QUALITY)
            & (F.col("n_tokens") >= _MIN_TOKENS)
            & ~F.col("is_duplicate")
        ).alias("selected"),
    )
