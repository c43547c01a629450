"""Text-analysis operators over the ``documents`` table — the text half of a
large-scale training-data pipeline (language ID, quality scoring, token
counting, fingerprinting).

All built from pyspark.sql.functions only (split/regexp/aggregate/
array_intersect) — JVM-side, whole-stage-codegen, no Python in the hot path.
At 100 TB each of these is a pure map: no shuffle, scales with executors,
and the parquet scan reads only ``doc_id``/``text`` (column pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# whitespace tokenizer shared by every operator (and mirrored in oracle SQL)
_WS = r"\s+"


def tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text; empty text → empty array."""
    return F.split(F.trim(col), _WS)


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


# A BPE-ish approximation: words, digit runs, or single non-space symbols —
# the token count an LLM tokenizer would land near (same regex both engines).
_BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_ish_count(col: Column) -> Column:
    # idx=0 (full match): Spark defaults to group 1, and this pattern has
    # no capture groups — the default raises REGEX_GROUP_INDEX on match
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_RE), 0))


def char_stats(col: Column) -> dict[str, Column]:
    """Building blocks for quality scoring, all via length-difference counting
    (portable across engines, no regex-dialect surprises)."""
    n = F.length(col)
    no_space = F.length(F.regexp_replace(col, r"\s", ""))
    no_punct = F.length(F.regexp_replace(col, r"[.,;:!?'\"()\[\]{}-]", ""))
    no_upper = F.length(F.regexp_replace(col, r"[A-Z]", ""))
    no_digit = F.length(F.regexp_replace(col, r"[0-9]", ""))
    return {
        "n_chars": n,
        "n_space": n - no_space,
        "n_punct": n - no_punct,
        "n_upper": n - no_upper,
        "n_digit": n - no_digit,
    }


_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this",
)


def stopword_hits(col: Column) -> Column:
    """Number of tokens that are English stopwords (count, not distinct)."""
    toks = tokens(F.lower(col))
    return F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))


def quality_columns(c: Column) -> dict[str, Column]:
    """The quality-metric Column expressions, reusable by any single-pass
    per-doc scorer (quality_score below, the corpus_curation composite).
    Deterministic ratio arithmetic: every ratio is one IEEE division of
    exact integers."""
    stats = char_stats(c)
    ntok = token_count(c)
    nchars = stats["n_chars"]
    punct_ratio = F.when(nchars > 0, stats["n_punct"].cast("double") / nchars).otherwise(0.0)
    stop_ratio = F.when(ntok > 0, stopword_hits(c).cast("double") / ntok).otherwise(0.0)
    mean_wordlen = F.when(
        ntok > 0, (nchars - stats["n_space"]).cast("double") / ntok
    ).otherwise(0.0)

    length_ok = (nchars >= 100) & (nchars <= 20000)
    punct_ok = punct_ratio < 0.1
    words_ok = (mean_wordlen >= 2.0) & (mean_wordlen <= 12.0)
    stop_ok = stop_ratio >= 0.05

    score = (
        length_ok.cast("int") + punct_ok.cast("int")
        + words_ok.cast("int") + stop_ok.cast("int")
    ).cast("double") / 4
    return {
        "n_tokens": ntok,
        "n_chars": nchars,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "mean_word_len": mean_wordlen,
        "quality_score": score,
    }


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length band, punctuation ratio,
    stopword ratio, mean word length band (see quality_columns)."""
    cols = quality_columns(F.col(text_col))
    ntok, nchars = cols["n_tokens"], cols["n_chars"]
    punct_ratio, stop_ratio = cols["punct_ratio"], cols["stopword_ratio"]
    mean_wordlen, score = cols["mean_word_len"], cols["quality_score"]
    return df.select(
        "doc_id",
        ntok.alias("n_tokens"),
        nchars.alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_wordlen.alias("mean_word_len"),
        score.alias("quality_score"),
    )


# language-ID marker words (tiny deterministic n-gram-free heuristic); the
# distinct-intersection count is the score, ties broken by fixed language order
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es": ("el", "la", "los", "las", "es", "y", "que", "por", "una", "para"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"),
}


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: distinct marker hits per language, argmax
    with deterministic tie order (en>de>fr>es>zh), 'und' when no hits."""
    toks = tokens(F.lower(F.col(text_col)))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(_LANG_MARKERS)):  # earlier langs win ties
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    out = df.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in _LANG_MARKERS],
        pred.alias("predicted_lang"),
    )
    return out


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed text —
    identical bytes on every engine, so it doubles as the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), _WS, " ")
    return df.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.substring(F.md5(norm), 1, 8).alias("fingerprint_short"),
    )


def unigram_cross_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document cross-entropy (bits/token) under the corpus's own
    unigram language model — the CCNet/KenLM-style quality signal: very low
    bits/token = templated/repetitive text, very high = gibberish relative
    to the corpus.

    Two passes over one persisted token explode: (1) vocab = per-token
    corpus counts (shuffle sized |vocab|, not |corpus|) plus the scalar
    total; (2) map-side broadcast probe of per-token surprisal back onto the
    token rows, then one doc-keyed aggregate. At 100 TB the vocab of a
    deduplicated corpus is ~1e7-1e8 types — still broadcastable at ~1 GiB;
    beyond that, drop the broadcast hint and let the probe shuffle on tok.

    Determinism: surprisal -log2(c/N) is quantized to integer MICRO-bits
    per distinct token (floor(x*1e6 + 0.5) — one exactly-rounded division
    feeding one libm log whose ≤1-ulp engine skew vanishes at 1e-6), so the
    per-doc sum is exact int64 arithmetic and bits_per_token is a single
    IEEE division of two exact integers — bit-identical across engines and
    partitionings."""
    from .dedup import _norm_text, spread

    toks = F.filter(F.split(_norm_text(F.col(text_col)), _WS), lambda t: t != "")
    tok = (
        spread(df)
        .select("doc_id", F.explode(toks).alias("tok"))
        .persist()  # read twice: vocab build + surprisal probe
    )
    vocab = tok.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("n_total"))
    q_micro = F.floor(
        -F.log2(F.col("c").cast("double") / F.col("n_total")) * 1000000.0 + F.lit(0.5)
    ).cast("long")
    vq = vocab.crossJoin(F.broadcast(total)).select("tok", q_micro.alias("q_micro"))
    per_doc = (
        tok.join(F.broadcast(vq), "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("q_micro").alias("micro_bits"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )
    n_tok = F.coalesce("n_tokens", F.lit(0).cast("long"))
    bits = F.coalesce("micro_bits", F.lit(0).cast("long"))
    return (
        df.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            n_tok.alias("n_tokens"),
            bits.alias("micro_bits"),
            F.when(
                n_tok > 0,
                bits.cast("double") / (n_tok * F.lit(1000000)).cast("double"),
            ).alias("bits_per_token"),
        )
    )
