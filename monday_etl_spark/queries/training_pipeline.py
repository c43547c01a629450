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


# the per-doc quality SELECT (mirrors textanalysis.quality_columns exactly);
# shared by the training_set_selection and corpus_curation oracles
_QUALITY_SELECT = f"""
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
        FROM documents"""


@register(
    "training_set_selection",
    oracle=f"""
    WITH q AS ({_QUALITY_SELECT}
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


@register(
    "corpus_curation",
    oracle=f"""
    WITH q AS ({_QUALITY_SELECT}
    ),
    keyed AS (SELECT doc_id, md5({_NORM}) AS fp FROM documents
              WHERE doc_id % 41 <> 0),
    keepers AS (SELECT fp, MIN(doc_id) AS keep_doc_id FROM keyed GROUP BY fp),
    dedup AS (SELECT k.doc_id, k.doc_id <> p.keep_doc_id AS is_duplicate
              FROM keyed k JOIN keepers p USING (fp)),
    t AS (SELECT doc_id, string_split_regex({_NORM}, '\\s+') AS toks
          FROM documents),
    shraw AS (SELECT doc_id,
                     [array_to_string(t.toks[i:i+2], ' ')
                      for i in range(1, greatest(len(t.toks)-2, 1) + 1)] AS sh
              FROM t),
    rep AS (SELECT doc_id,
                   1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh)
                       AS dup_frac
            FROM shraw),
    sh5 AS (SELECT doc_id,
                   list_distinct([array_to_string(t.toks[i:i+4], ' ')
                                  for i in range(1, greatest(len(t.toks)-4, 1) + 1)])
                       AS sh
            FROM t),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh5),
    eval_sh AS (SELECT DISTINCT s FROM ex WHERE doc_id % 41 = 0),
    cont AS (SELECT DISTINCT e.doc_id FROM ex e JOIN eval_sh v USING (s)
             WHERE e.doc_id % 41 <> 0),
    surv AS (
        SELECT d.doc_id, d.lang
        FROM documents d
        JOIN q USING (doc_id)
        JOIN dedup USING (doc_id)
        JOIN rep USING (doc_id)
        WHERE d.doc_id % 41 <> 0
          AND q.quality_score >= {_MIN_QUALITY}
          AND q.n_tokens >= {_MIN_TOKENS}
          AND NOT dedup.is_duplicate
          AND rep.dup_frac <= 0.2
          AND d.doc_id NOT IN (SELECT doc_id FROM cont)
    ),
    ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n_stratum
        FROM surv)
    SELECT doc_id, lang, rn FROM ranked WHERE rn <= CEIL(n_stratum * 0.2)
    """,
    doc="The full curation pipeline as ONE declarative plan: quality floor + "
        "repetition filter + dedup fingerprint in a single map pass, keeper "
        "selection as min-over-fingerprint WINDOW (one shuffle, no self-join "
        "recompute), test-set decontamination as a broadcast-probe ANTI join, "
        "then an exact 20% stratified sample of the survivors per language. "
        "Two corpus passes total (scores + shingle probe), one fingerprint "
        "shuffle, zero corpus-wide self-joins - the shape that holds at "
        "100 TB.",
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..extensions.dedup import (
        _norm_text,
        raw_word_shingles,
        spread,
        word_shingles,
    )
    from ..extensions.textanalysis import quality_columns

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 41 != 0)
    ev = docs.filter(F.col("doc_id") % 41 == 0)

    qc = quality_columns(F.col("text"))
    sh = raw_word_shingles(F.col("text"), 3)
    dup_frac = (
        F.lit(1.0) - F.size(F.array_distinct(sh)).cast("double") / F.size(sh)
    )
    # ONE per-row-heavy score pass (quality HOFs + shingles + dedup md5);
    # spread() guards against a single-file scan pinning it to one core
    per_doc = spread(train).select(
        "doc_id",
        "lang",
        F.md5(_norm_text(F.col("text"))).alias("fp"),
        qc["n_tokens"].alias("n_tokens"),
        qc["quality_score"].alias("quality_score"),
        dup_frac.alias("dup_frac"),
    )
    # exact-dedup keeper via window min over the fingerprint: same shuffle
    # the groupBy would cost, but no join back and no branch recompute
    keep = F.min("doc_id").over(Window.partitionBy("fp"))

    # contaminated ids: probe the broadcast eval shingle set, anti-join.
    # 5-word shingles, not 3 — decontamination keys on LONG n-grams (the
    # common-phrase 3-gram space flags ~everything; 5-grams isolate real
    # eval overlap)
    tsh = spread(train).select(
        "doc_id", F.explode(word_shingles(F.col("text"), 5)).alias("sh")
    )
    esh = ev.select(F.explode(word_shingles(F.col("text"), 5)).alias("sh")).distinct()
    cont = tsh.join(F.broadcast(esh), "sh").select("doc_id").distinct()

    surv = (
        per_doc.withColumn("keep_id", keep)
        .filter(
            (F.col("quality_score") >= _MIN_QUALITY)
            & (F.col("n_tokens") >= _MIN_TOKENS)
            & (F.col("doc_id") == F.col("keep_id"))
            & (F.col("dup_frac") <= 0.2)
        )
        .join(cont, "doc_id", "left_anti")
        .select("doc_id", "lang")
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    cw = Window.partitionBy("lang")
    return (
        surv.withColumn("rn", F.row_number().over(w))
        .withColumn("n_stratum", F.count(F.lit(1)).over(cw))
        .filter(F.col("rn") <= F.ceil(F.col("n_stratum") * 0.2))
        .select("doc_id", "lang", "rn")
    )


# DuckDB twin of int(hex, 16): left fold over hex nibbles (same helper the
# extensions oracles use — duplicated here because oracles are literal SQL)
_H2I = (
    "list_reduce(list_transform(string_split(substr(md5(g), 1, 8), ''), "
    "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
    "(a, b) -> a * 16 + b)"
)
_DSIR_B = 256
_DSIR_K = 100


@register(
    "dsir_importance_select",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               CASE WHEN length(trim(text)) = 0 THEN []
                    ELSE string_split_regex(trim(text), '\\s+') END AS toks
        FROM documents),
    feats AS (
        SELECT doc_id, lang,
               list_concat(toks,
                   CASE WHEN len(toks) >= 2 THEN
                       list_transform(generate_series(1, len(toks) - 1),
                                      i -> toks[i] || ' ' || toks[i+1])
                   ELSE [] END) AS ngs
        FROM t),
    fb AS (
        SELECT doc_id, lang, {_H2I} % {_DSIR_B} AS bucket
        FROM feats, UNNEST(ngs) AS u(g)),
    rawd AS (SELECT bucket, COUNT(*) AS rc FROM fb GROUP BY bucket),
    tgtd AS (SELECT bucket, COUNT(*) AS tc FROM fb WHERE lang = 'en'
             GROUP BY bucket),
    tot AS (SELECT COUNT(*) AS rt,
                   COUNT(*) FILTER (WHERE lang = 'en') AS tt
            FROM fb),
    ratio AS (
        SELECT r.bucket,
               (CAST(COALESCE(t.tc, 0) + 1 AS DOUBLE) / (r.rc + 1))
               * (CAST(rt + {_DSIR_B} AS DOUBLE) / (tt + {_DSIR_B})) AS rb
        FROM rawd r LEFT JOIN tgtd t USING (bucket) CROSS JOIN tot),
    dc AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
           FROM fb GROUP BY doc_id, bucket),
    scored AS (
        SELECT dc.doc_id,
               list_reduce(list(CAST(dc.c AS DOUBLE) * ratio.rb
                                ORDER BY dc.bucket),
                           (a, b) -> a + b) AS s,
               CAST(SUM(dc.c) AS BIGINT) AS n_features
        FROM dc JOIN ratio USING (bucket) GROUP BY dc.doc_id)
    SELECT doc_id, n_features, s / n_features AS importance
    FROM scored
    ORDER BY importance DESC, doc_id
    LIMIT {_DSIR_K}
    """,
    doc="DSIR importance resampling (Xie et al., NeurIPS 2023): hashed "
        "unigram+bigram multinomials over target (lang='en') vs the raw "
        "pool, add-one-smoothed per-bucket likelihood ratios, deterministic "
        "top-k by mean per-ngram ratio. Log-free linear-domain scoring and "
        "an ordered per-doc fold keep every double bit-identical across "
        "engines (same contract as bm25_topk). Scale: two B-row (B=256) "
        "bucket aggregates, a broadcast ratio table, ONE corpus-sized "
        "(doc_id,bucket) shuffle, TakeOrderedAndProject top-k — linear, "
        "no all-pairs, nothing driver-side.",
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dsir import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    return dsir_select(
        docs, F.col("lang") == "en", k=_DSIR_K, n_buckets=_DSIR_B
    )
