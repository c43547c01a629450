"""Registry entries for the training-data pipeline extensions: dedup,
text analysis, similarity search. Oracle SQL mirrors the md5-derived hashing
so DuckDB reproduces signatures bit-for-bit; ops whose oracle would require
replicating LSH hyperplanes in SQL are registered rows-only and verified by
unit tests against pure-Python oracles instead (tests/test_extensions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.dedup import (
    exact_dedup,
    minhash_candidates,
    ngram_jaccard,
    simhash_dedup,
    simhash_near_pairs,
)
from ..extensions.similarity import brute_force_topk, embedding_near_dup, lsh_bucket_topk
from ..extensions.textanalysis import fingerprint, lang_id, quality_score
from ..io import load_table
from .registry import register

# normalized text + whitespace tokens, as DuckDB SQL fragments (single source
# for every oracle below)
_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_TOKS = r"string_split_regex(trim(text), '\s+')"


def _hex2int(expr: str) -> str:
    """DuckDB twin of int(hex_str, 16): left fold over hex nibbles."""
    return (
        f"list_reduce(list_transform(string_split({expr}, ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
        f"(a, b) -> a * 16 + b)"
    )


def _sql_dot(a: str, b: str) -> str:
    """DuckDB twin of extensions.similarity.dot: strict left-to-right double
    fold of elementwise products — bit-identical to Spark's F.aggregate."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), z -> z[1] * z[2]), "
        f"(x, y) -> x + y)"
    )


def _sql_planes(bits: int, dim: int) -> str:
    """DuckDB twin of extensions.similarity._hyperplane: component j of plane
    i is md5(f'{i}:{j}')[:8] as u32, mapped into [-1, 1)."""
    h = _hex2int("substr(md5(CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8)")
    return (
        f"SELECT i, list_transform(range(0, {dim}), "
        f"j -> ({h} / 2147483648.0) - 1.0) AS p FROM range(0, {bits}) t(i)"
    )


def _sql_lsh_buckets(bits: int, dim: int = 64) -> str:
    """CTE chain computing each embedding's sign-LSH bucket, mirroring
    extensions.similarity.bucket_bits bit-for-bit (strict fold dots, >0
    sign test, bit i weight 2^i)."""
    return f"""
    c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    planes AS ({_sql_planes(bits, dim)}),
    dots AS (
        SELECT c.vec_id, p.i, {_sql_dot('c.v', 'p.p')} AS d
        FROM c CROSS JOIN planes p
    ),
    buckets AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << i) ELSE 0 END)
                    AS BIGINT) AS bucket
        FROM dots GROUP BY vec_id
    )"""


# 64-bit SimHash in SQL, mirroring extensions.dedup.simhash64: per-token ±1
# votes from four md5-derived 16-bit words, majority per bit, packed
# two's-complement into BIGINT
_SIMHASH_SQL = f"""
    tok AS (
        SELECT doc_id, unnest(string_split_regex({_NORM}, '\\s+')) AS t
        FROM documents
    ),
    votes AS (
        SELECT doc_id, r.j,
               SUM(CASE WHEN ({_hex2int("substr(md5(t), 1 + 4 * (r.j // 16), 4)")}
                              >> (r.j % 16)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM tok CROSS JOIN range(0, 64) r(j)
        GROUP BY doc_id, r.j
    ),
    h AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN v > 0 THEN
                   CASE WHEN j = 63 THEN -9223372036854775808
                        ELSE (1::BIGINT << j) END
                   ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    )"""


@register(
    "dedup_exact",
    oracle=f"""
    WITH keyed AS (SELECT doc_id, md5({_NORM}) AS fp FROM documents),
    keepers AS (SELECT fp, MIN(doc_id) AS keep_doc_id FROM keyed GROUP BY fp)
    SELECT k.doc_id, k.fp, p.keep_doc_id, k.doc_id <> p.keep_doc_id AS is_duplicate
    FROM keyed k JOIN keepers p USING (fp)
    """,
    doc="Exact dedup by normalized-text md5; shuffle carries 32-byte digests "
        "not documents — the 100 TB-safe exact pass.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id, md5({_NORM}) AS fingerprint,
           substr(md5({_NORM}), 1, 8) AS fingerprint_short
    FROM documents
    """,
    doc="Document fingerprinting (md5 of casefolded, space-collapsed text).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


_STOP_SQL = "['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','this']"


@register(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END AS n_tokens,
           length(text) AS n_chars,
           CASE WHEN length(text) > 0 THEN
             CAST(length(text) - length(regexp_replace(text,
                  '[.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE) / length(text)
           ELSE 0.0 END AS punct_ratio,
           CASE WHEN len({_TOKS}) > 0 AND length(trim(text)) > 0 THEN
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                  t -> list_contains({_STOP_SQL}, t))) AS DOUBLE) / len({_TOKS})
           ELSE 0.0 END AS stopword_ratio,
           CASE WHEN len({_TOKS}) > 0 AND length(trim(text)) > 0 THEN
             CAST(length(text) - (length(text) - length(regexp_replace(text,
                  '\\s', '', 'g'))) AS DOUBLE) / len({_TOKS})
           ELSE 0.0 END AS mean_word_len,
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
                          t -> list_contains({_STOP_SQL}, t))) AS DOUBLE) / len({_TOKS})
                     ELSE 0.0 END) >= 0.05 THEN 1 ELSE 0 END) AS DOUBLE) / 4
               AS quality_score
    FROM documents
    """,
    doc="Quality scoring: length band, punctuation ratio, stopword ratio, "
        "mean word length — integer counting + single IEEE divisions, "
        "pure map at any scale.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load_table(spark, sf_dir, "documents"))


_MARKER_SQL = {
    "en": "['the','and','of','to','is','in','that','it','for','on']",
    "de": "['der','die','das','und','ist','nicht','mit','ein','zu','den']",
    "fr": "['le','la','les','et','est','pas','pour','que','une','dans']",
    "es": "['el','la','los','las','es','y','que','por','una','para']",
    "zh": "['的','是','了','在','我','有','和','不','这','人']",
}
_LTOKS = r"string_split_regex(lower(trim(text)), '\s+')"
_SCORES = ",\n".join(
    f"len(list_distinct(list_intersect({_LTOKS}, {words}))) AS score_{lang}"
    for lang, words in _MARKER_SQL.items()
)


@register(
    "text_lang_id",
    oracle=f"""
    WITH s AS (SELECT doc_id, {_SCORES} FROM documents)
    SELECT doc_id, score_en, score_de, score_fr, score_es, score_zh,
           CASE WHEN greatest(score_en, score_de, score_fr, score_es, score_zh) = 0
                THEN 'und'
                WHEN score_en = greatest(score_en, score_de, score_fr, score_es, score_zh) THEN 'en'
                WHEN score_de = greatest(score_en, score_de, score_fr, score_es, score_zh) THEN 'de'
                WHEN score_fr = greatest(score_en, score_de, score_fr, score_es, score_zh) THEN 'fr'
                WHEN score_es = greatest(score_en, score_de, score_fr, score_es, score_zh) THEN 'es'
                ELSE 'zh' END AS predicted_lang
    FROM s
    """,
    doc="Marker-word language ID with deterministic tie order (en>de>fr>es>zh).",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load_table(spark, sf_dir, "documents"))


# -- MinHash/LSH: the oracle re-derives the identical md5 signatures in SQL --

_SHINGLES = (
    f"list_distinct([array_to_string(t.toks[i:i+2], ' ') "
    f"for i in range(1, greatest(len(t.toks)-2, 1) + 1)])"
)
# 4 md5 digests per shingle, sliced into 16 8-hex hash values (mirrors
# extensions/dedup.minhash_signature exactly)
_DIGS = (
    "[[md5(concat('0', '|', s)), md5(concat('1', '|', s)), "
    "md5(concat('2', '|', s)), md5(concat('3', '|', s))] for s in sh]"
)
_SIG = (
    "[list_min([substr(d[j // 4 + 1], 1 + 8 * (j % 4), 8) for d in digs]) "
    "for j in range(0, 16)]"
)


# shared by dedup_minhash_lsh (lazy path) and dedup_minhash_store (the
# materialized signature-store path) — identical signature math, so one SQL
# twin verifies both
_MINHASH_PAIRS_ORACLE = f"""
    WITH t AS (SELECT doc_id, string_split_regex({_NORM}, '\\s+') AS toks
               FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
    digs AS (SELECT doc_id, {_DIGS} AS digs FROM sh),
    sigs AS (SELECT doc_id, {_SIG} AS sig FROM digs),
    banded AS (
        SELECT doc_id, sig, b,
               md5(array_to_string(sig[b*4+1 : b*4+4], '|')) AS bh
        FROM sigs, UNNEST(range(0, 4)) AS u(b)
    ),
    pairs AS (
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
                        l.sig AS sig_a, r.sig AS sig_b
        FROM banded l JOIN banded r
          ON l.b = r.b AND l.bh = r.bh AND l.doc_id < r.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(len([i for i in range(1, 17) if sig_a[i] = sig_b[i]]) AS DOUBLE)
               / 16.0 AS est_jaccard
    FROM pairs
    """


@register(
    "dedup_minhash_lsh",
    oracle=_MINHASH_PAIRS_ORACLE,
    doc="MinHash+LSH near-dup candidates: 16 md5-derived minhashes over "
        "3-word shingles, 4 bands × 4 rows; candidates share ≥1 band bucket. "
        "Signature build is a pure map; candidate join meets only within "
        "buckets — the O(n²) pair space never materializes.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_candidates(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_store",
    oracle=_MINHASH_PAIRS_ORACLE,
    doc="Materialized signature-store flavor of dedup_minhash_lsh: build "
        "the banded signature table (bucketed+sorted on the LSH join key, "
        "so candidate generation is an Exchange-free bucketed self-join), "
        "then emit candidates FROM the store. Identical signature math — "
        "same oracle — but the shape that amortizes the full-corpus "
        "signature pass across runs at 100 TB. The store build is that "
        "amortized pass, i.e. scaffolding (shared fixture, built once per "
        "process, untimed under bench prewarm); the operator under test is "
        "the Exchange-free bucketed candidate probe.",
)
def dedup_minhash_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.signature_store import candidates_from_store
    from .fixtures import shared

    table = shared(spark, sf_dir, "minhash_signature_store")
    return candidates_from_store(spark, table=table)


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split_regex({_NORM}, '\\s+') AS toks
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
    )
    SELECT p.doc_a, p.doc_b,
           CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0 THEN
             CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh)))
           ELSE 0.0 END AS jaccard
    FROM pairs p
    JOIN sh a ON a.doc_id = p.doc_a
    JOIN sh b ON b.doc_id = p.doc_b
    """,
    doc="n-gram Jaccard verify stage: exact shingle Jaccard computed only "
        "for LSH candidate pairs (the cheap-verify-after-approx pattern).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard(docs, minhash_candidates(docs))


@register(
    "dedup_simhash",
    oracle=f"""
    WITH {_SIMHASH_SQL}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash
    FROM h a JOIN h b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
    """,
    doc="SimHash near-dup pairing: 64-bit md5-derived simhash, identical-"
        "bucket pairs. At 64 bits a hash collision is essentially always a "
        "true near-duplicate (the r01 16-bit variant's 65,536 buckets went "
        "quadratic at corpus scale). Integer-only votes → the DuckDB oracle "
        "re-derives the exact hashes.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_near",
    oracle=f"""
    WITH {_SIMHASH_SQL}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
               AS hamming_distance
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
    doc="SimHash near-dup pairs within Hamming distance 2 via pigeonhole "
        "banding (3 bands of the 64-bit hash; a pair within distance d "
        "agrees exactly on >=1 of d+1 bands) — candidates from band "
        "equi-joins, exact bit_count(XOR) filter after. Never an all-pairs "
        "scan; the oracle IS the all-pairs scan, which is the point of the "
        "comparison.",
)
def dedup_simhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_pairs(load_table(spark, sf_dir, "documents"), max_distance=2)


# -- similarity search ------------------------------------------------------

_QUERY_IDS = (0, 1, 2, 3, 4)


@register(
    "ann_brute_force",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id, v FROM c WHERE vec_id IN {_QUERY_IDS}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.v, c.v) AS sim
        FROM c JOIN q ON c.vec_id <> q.vec_id
    ), ranked AS (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, rank, ROUND(sim, 4) AS cosine_sim
    FROM ranked WHERE rank <= 10
    """,
    doc="Brute-force cosine top-10 for 5 query vectors — the exact ANN "
        "baseline. Queries broadcast; corpus scored in place; per-partition "
        "top-k via ranked window. Similarity rounded to 4dp for cross-engine "
        "hash stability (rank gaps >> double noise).",
)
def ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*_QUERY_IDS))
    return brute_force_topk(emb, queries, k=10)


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH {_sql_lsh_buckets(8)},
    cb AS (SELECT c.vec_id, c.v, b.bucket FROM c JOIN buckets b USING (vec_id)),
    q AS (SELECT vec_id, v, bucket FROM cb WHERE vec_id IN {_QUERY_IDS}),
    scored AS (
        SELECT q.vec_id AS query_id, cb.vec_id AS neighbor_id,
               list_cosine_similarity(q.v, cb.v) AS sim
        FROM cb JOIN q ON cb.bucket = q.bucket AND cb.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, rank, ROUND(sim, 4) AS cosine_sim
    FROM ranked WHERE rank <= 10
    """,
    doc="LSH-bucketed ANN (scale path): 8-bit random-hyperplane buckets, "
        "score only within the query's bucket (~1/256 of the corpus). The "
        "oracle re-derives the md5-seeded hyperplanes and bucket signs in "
        "SQL with the same strict left-to-right double folds.",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*_QUERY_IDS))
    return lsh_bucket_topk(emb, queries, dim=64, k=10, bits=8)


def _sql_ivf_lloyd_iter(n: int, dim: int) -> str:
    """One unrolled integer-Lloyd iteration as DuckDB CTEs: exact-int64
    assignment (argmin of squared euclidean, ties to the lower cell), per-dim
    integer sums, centroid update FLOOR(sum/count + 0.5); empty cells keep
    the previous centroid. Bit-identical to extensions.ivf.kmeans_fit."""
    return f"""
    a{n} AS (
      SELECT vec_id, q, cell FROM (
        SELECT t.vec_id, t.q, c.cell,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
                 CAST(list_sum(list_transform(list_zip(t.q, c.c),
                      p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT), c.cell) AS rn
        FROM train t CROSS JOIN c{n - 1} c)
      WHERE rn = 1
    ),
    s{n} AS (
      SELECT cell, i, CAST(SUM(q[i]) AS BIGINT) AS s, COUNT(*) AS n
      FROM a{n} CROSS JOIN range(1, {dim + 1}) r(i)
      GROUP BY cell, i
    ),
    c{n} AS (
      SELECT p.cell, COALESCE(u.c, p.c) AS c
      FROM c{n - 1} p LEFT JOIN (
        SELECT cell,
               list(CAST(FLOOR(CAST(s AS DOUBLE)/n + 0.5) AS BIGINT) ORDER BY i) AS c
        FROM s{n} GROUP BY cell) u ON p.cell = u.cell
    )"""


def _sql_ivf(k: int = 8, iterations: int = 3, nprobe: int = 2, topk: int = 10,
             dim: int = 64, scale: int = 1_000_000, max_train: int = 100_000) -> str:
    """Self-contained DuckDB twin of the whole IVF pipeline (training
    included): quantize → unrolled integer Lloyd → exact-int assignment and
    probe → cosine top-k. Every discrete decision is int64-exact on both
    engines; fp only in the final cosine, rounded to 4dp (see ivf.py
    module docstring)."""
    dist = ("CAST(list_sum(list_transform(list_zip(s.q, c.c), "
            "p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)")
    iters = ",".join(_sql_ivf_lloyd_iter(n, dim) for n in range(1, iterations + 1))
    return f"""
    WITH qv AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(FLOOR(x*{scale}.0 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    train AS (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT {max_train}),
    c0 AS (
      SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell, q AS c
      FROM (SELECT vec_id, q FROM train ORDER BY vec_id LIMIT {k})
    ),{iters},
    assign AS (
      SELECT vec_id, v, cell FROM (
        SELECT s.vec_id, s.v, c.cell,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                                  ORDER BY {dist}, c.cell) AS rn
        FROM qv s CROSS JOIN c{iterations} c)
      WHERE rn = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, v AS pv, cell FROM (
        SELECT s.vec_id, s.v, c.cell,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                                  ORDER BY {dist}, c.cell) AS rn
        FROM qv s CROSS JOIN c{iterations} c
        WHERE s.vec_id IN {_QUERY_IDS})
      WHERE rn <= {nprobe}
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             list_cosine_similarity(p.pv, a.v) AS sim
      FROM assign a JOIN probe p ON a.cell = p.cell AND a.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, ROUND(sim, 4) AS cosine_sim
    FROM ranked WHERE rank <= {topk}
    """


@register(
    "ann_ivf",
    oracle=_sql_ivf(),
    doc="IVF ANN (second scale path beside sign-LSH): deterministic k-means "
        "coarse quantizer (8 cells, 3 Lloyd iterations, init = lowest-id "
        "vectors) + inverted lists; queries probe their 2 nearest cells "
        "(~1/4 of the corpus). Training, assignment, and probing run in "
        "exact int64 on 1e6-quantized vectors, so the oracle re-derives the "
        "ENTIRE pipeline — Lloyd included — as an unrolled CTE from the "
        "embeddings view; fp only in the final 4dp-rounded cosine.",
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.ivf import ivf_topk, kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=8, iterations=3)
    queries = emb.filter(F.col("vec_id").isin(*_QUERY_IDS))
    return ivf_topk(emb, queries, cents, k=10, nprobe=2)


@register(
    "ann_ivf_store",
    oracle=_sql_ivf(),
    doc="Materialized-index flavor of ann_ivf: build the cell-partitioned "
        "IVF index table once (the corpus-linear assignment pass a vector "
        "index pays at build time), then answer the query batch against the "
        "store — the scan is limited to the probed cells by dynamic "
        "partition pruning. Frozen quantizer + exact int64 assignment = "
        "identical results to the lazy path, hence the same oracle. The "
        "quantizer training and the index build are the build-time passes "
        "this flavor exists to amortize, i.e. scaffolding (shared fixtures, "
        "built once per process, untimed under bench prewarm); the operator "
        "under test is the DPP-pruned probe.",
)
def ann_ivf_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.ivf_store import query_ivf_index
    from .fixtures import shared

    emb = load_table(spark, sf_dir, "embeddings")
    cents = shared(spark, sf_dir, "ivf_centroids_k8")
    table = shared(spark, sf_dir, "ivf_index_table")
    queries = emb.filter(F.col("vec_id").isin(*_QUERY_IDS))
    return query_ivf_index(spark, queries, cents, table=table, k=10, nprobe=2)


@register(
    "embedding_near_dup",
    oracle=f"""
    WITH {_sql_lsh_buckets(6)},
    nv AS (
        SELECT c.vec_id, b.bucket,
               list_transform(c.v, x -> x / sqrt({_sql_dot('c.v', 'c.v')})) AS nv
        FROM c JOIN buckets b USING (vec_id)
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_sql_dot('a.nv', 'b.nv')} AS sim
        FROM nv a JOIN nv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, ROUND(sim, 4) AS cosine_sim FROM pairs WHERE sim > 0.4
    """,
    doc="Embedding-cosine near-duplicate pairs above 0.4 within LSH buckets "
        "(threshold chosen to produce candidates in this corpus; production "
        "would use ~0.95). bits is pinned to 6 here for the oracle; the "
        "library default derives bits from corpus size (auto_lsh_bits) so "
        "scored pairs stay LINEAR in n — see SCALE.md for the occupancy "
        "math. Pre-normalized vectors: one fold per pair.",
)
def embedding_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup(emb, dim=64, threshold=0.4, bits=6)


@register(
    "decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split_regex({_NORM}, '\\s+') AS toks
               FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    eval_sh AS (SELECT DISTINCT s FROM ex WHERE doc_id % 41 = 0),
    hits AS (
        SELECT e.doc_id, COUNT(DISTINCT e.s) AS n_shared_shingles
        FROM ex e JOIN eval_sh v USING (s)
        WHERE e.doc_id % 41 <> 0
        GROUP BY e.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_shared_shingles, 0) AS n_shared_shingles,
           COALESCE(h.n_shared_shingles, 0) > 0 AS is_contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 41 <> 0
    """,
    doc="Test-set decontamination: flag train docs sharing any 3-word "
        "shingle with the eval split (doc_id % 41 = 0 here; a benchmark "
        "corpus in production). The eval shingle set broadcasts, so the "
        "train corpus is checked in one map-side pass - no corpus shuffle.",
)
def decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate(
        docs.filter(F.col("doc_id") % 41 != 0),
        docs.filter(F.col("doc_id") % 41 == 0),
    )


@register(
    "streaming_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split_regex({_NORM}, '\\s+') AS toks
               FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    eval_sh AS (SELECT DISTINCT s FROM ex WHERE doc_id % 41 = 0),
    hits AS (
        SELECT e.doc_id, COUNT(DISTINCT e.s) AS n_shared_shingles
        FROM ex e JOIN eval_sh v USING (s)
        WHERE e.doc_id % 41 <> 0
        GROUP BY e.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_shared_shingles, 0) AS n_shared_shingles,
           COALESCE(h.n_shared_shingles, 0) > 0 AS is_contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 41 <> 0
    """,
    doc="Incremental decontamination (r06): the eval split's distinct "
        "shingles persist ONCE as a store (benchmark-release cadence), then "
        "an AvailableNow drain of the training documents broadcast-probes "
        "it per micro-batch — per-drain cost is one shingle pass over the "
        "batch, never the corpus or the benchmark re-derivation. Decisions "
        "depend only on each doc's own shingles and the store, so any "
        "batch split equals the batch decontaminate, which is the oracle "
        "(streaming/incremental_decontaminate.py; split invariance pinned "
        "by tests/test_incremental_decontaminate.py).",
)
def streaming_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..streaming.incremental_decontaminate import (
        run_incremental_decontaminate,
    )
    from .fixtures import shared

    # the eval-shingle store is release-cadence scaffolding (shared
    # fixture, built once per process); the operator under test is the
    # incremental drain that broadcast-probes it per micro-batch
    store = shared(spark, sf_dir, "decontamination_store")
    root = tempfile.mkdtemp(prefix="stream_decon_q_")
    return run_incremental_decontaminate(
        spark, sf_dir, store, os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
        train_filter=F.col("doc_id") % 41 != 0,
    )


_BLOOM_P0 = _hex2int("substr(md5('b0|' || s), 1, 8)") + " % 1048576"
_BLOOM_P1 = _hex2int("substr(md5('b1|' || s), 1, 8)") + " % 1048576"


@register(
    "decontaminate_bloom",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split_regex({_NORM}, '\\s+') AS toks
               FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    pos AS (SELECT doc_id, s, {_BLOOM_P0} AS p0, {_BLOOM_P1} AS p1 FROM ex),
    bits AS (SELECT DISTINCT p FROM (
        SELECT p0 AS p FROM pos WHERE doc_id % 41 = 0
        UNION ALL SELECT p1 AS p FROM pos WHERE doc_id % 41 = 0)),
    hits AS (
        SELECT doc_id, COUNT(DISTINCT s) AS n_bloom_hits
        FROM pos
        WHERE doc_id % 41 <> 0
          AND p0 IN (SELECT p FROM bits) AND p1 IN (SELECT p FROM bits)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_bloom_hits, 0) AS n_bloom_hits,
           COALESCE(h.n_bloom_hits, 0) > 0 AS is_flagged
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 41 <> 0
    """,
    doc="Bloom-filter decontamination candidates: the fixed-memory twin of "
        "`decontaminate` — eval shingles fold into a 2^20-bit bitset (2 "
        "md5-derived hash functions) whose size is BOUNDED no matter how "
        "large the eval suite grows; train shingles probe it with two "
        "map-side broadcast semi-joins. Zero false negatives by "
        "construction; false positives are deterministic and rare, and the "
        "exact verifier (`decontaminate`) reruns only on flagged docs.",
)
def decontaminate_bloom_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import decontaminate_bloom

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate_bloom(
        docs.filter(F.col("doc_id") % 41 != 0),
        docs.filter(F.col("doc_id") % 41 == 0),
    )


@register(
    "text_perplexity",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, s AS tok FROM (
            SELECT doc_id, unnest(string_split_regex({_NORM}, '\\s+')) AS s
            FROM documents
        ) WHERE s <> ''
    ),
    vocab AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM vocab),
    vq AS (
        SELECT tok,
               CAST(floor(-log2(CAST(c AS DOUBLE) / n_total) * 1000000.0 + 0.5)
                    AS BIGINT) AS q_micro
        FROM vocab, tot
    ),
    per AS (
        SELECT t.doc_id,
               CAST(SUM(q_micro) AS BIGINT) AS micro_bits,
               COUNT(*) AS n_tokens
        FROM tok t JOIN vq USING (tok)
        GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_tokens, 0) AS n_tokens,
           COALESCE(p.micro_bits, 0) AS micro_bits,
           CASE WHEN COALESCE(p.n_tokens, 0) > 0
                THEN CAST(p.micro_bits AS DOUBLE)
                     / CAST(p.n_tokens * 1000000 AS DOUBLE)
           END AS bits_per_token
    FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    doc="Per-doc cross-entropy (bits/token) under the corpus unigram LM — "
        "the CCNet/KenLM-style quality signal (low = templated, high = "
        "gibberish). Surprisal is quantized to integer micro-bits per "
        "DISTINCT token before the per-doc sum, so the result is exact "
        "int64 arithmetic plus one final IEEE division — bit-identical "
        "across engines. Vocab shuffle is |vocab|-sized; the probe is a "
        "map-side broadcast join.",
)
def text_perplexity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.textanalysis import unigram_cross_entropy

    docs = load_table(spark, sf_dir, "documents")
    return unigram_cross_entropy(docs)


@register(
    "doc_repetition_filter",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split_regex({_NORM}, '\\s+') AS toks
               FROM documents),
    sh AS (SELECT doc_id,
                  [array_to_string(t.toks[i:i+2], ' ')
                   for i in range(1, greatest(len(t.toks)-2, 1) + 1)] AS sh
           FROM t)
    SELECT doc_id,
           len(sh) AS n_shingles,
           1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) AS dup_frac,
           (1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh)) > 0.2
               AS is_repetitive
    FROM sh
    """,
    doc="Gopher-style repetition quality filter: fraction of 3-word shingles "
        "that are repeats within the document (1 - distinct/total). Pure map "
        "over the scan - no shuffle at any scale; the single IEEE division "
        "is bit-identical across engines.",
)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import raw_word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", raw_word_shingles(F.col("text"), 3).alias("sh"))
    dup_frac = (
        F.lit(1.0)
        - F.size(F.array_distinct("sh")).cast("double") / F.size("sh")
    )
    return sh.select(
        "doc_id",
        F.size("sh").cast("long").alias("n_shingles"),
        dup_frac.alias("dup_frac"),
        (dup_frac > 0.2).alias("is_repetitive"),
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH m AS (
        SELECT vec_id,
               list_max(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE)))) AS max_abs
        FROM embeddings
    )
    SELECT e.vec_id,
           CASE WHEN m.max_abs > 0 THEN 127.0 / m.max_abs ELSE 0.0 END AS scale,
           array_to_string(list_transform(e.embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)
                               * (CASE WHEN m.max_abs > 0 THEN 127.0 / m.max_abs
                                       ELSE 0.0 END) + 0.5) AS INTEGER)), ',') AS qvec
    FROM embeddings e JOIN m USING (vec_id)
    """,
    doc="Symmetric int8 scalar quantization per vector (the storage/transfer "
        "compression step before ANN at 100 TB - 4x smaller than float32). "
        "Rounding is floor(x*scale + 0.5), not ROUND: both engines evaluate "
        "the identical IEEE expression, so ties cannot diverge. Pure map. "
        "qvec is emitted as a comma-joined string: the harness canonicalizer "
        "lexsorts result columns and array cells are unhashable in pandas.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.similarity import _to_double

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    v = v.withColumn(
        "max_abs", F.array_max(F.transform("v", lambda x: F.abs(x)))
    ).withColumn(
        "scale",
        F.when(F.col("max_abs") > 0, F.lit(127.0) / F.col("max_abs")).otherwise(0.0),
    )
    return v.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform(
                "v",
                lambda x: F.floor(x * F.col("scale") + F.lit(0.5))
                .cast("int")
                .cast("string"),
            ),
            ",",
        ).alias("qvec"),
    )


@register(
    "corpus_source_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(CASE WHEN n_chars < 200 THEN 1 END) AS n_short
    FROM documents
    GROUP BY source
    """,
    doc="Per-source corpus curation stats (doc counts, volume, language "
        "spread, short-doc count) - the report that decides source mixing "
        "weights. One partial-agg shuffle on the low-cardinality source key.",
)
def corpus_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.count_distinct("lang").alias("n_langs"),
        F.count(F.when(F.col("n_chars") < 200, 1)).alias("n_short"),
    )


@register(
    "ann_recall_at_10",
    oracle=f"""
    WITH {_sql_lsh_buckets(8)},
    q AS (SELECT vec_id, v FROM c WHERE vec_id IN {_QUERY_IDS}),
    bf_scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.v, c.v) AS sim
        FROM c JOIN q ON c.vec_id <> q.vec_id
    ),
    bf AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rank
            FROM bf_scored) WHERE rank <= 10
    ),
    cb AS (SELECT c.vec_id, c.v, b.bucket FROM c JOIN buckets b USING (vec_id)),
    qb AS (SELECT vec_id, v, bucket FROM cb WHERE vec_id IN {_QUERY_IDS}),
    lsh_scored AS (
        SELECT qb.vec_id AS query_id, cb.vec_id AS neighbor_id,
               list_cosine_similarity(qb.v, cb.v) AS sim
        FROM cb JOIN qb ON cb.bucket = qb.bucket AND cb.vec_id <> qb.vec_id
    ),
    lsh AS (
        SELECT query_id, neighbor_id, 1 AS hit FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rank
            FROM lsh_scored) WHERE rank <= 10
    )
    SELECT bf.query_id, CAST(COUNT(lsh.hit) AS BIGINT) AS n_hits,
           COUNT(lsh.hit) / 10.0 AS recall_at_10
    FROM bf LEFT JOIN lsh USING (query_id, neighbor_id)
    GROUP BY bf.query_id
    """,
    doc="ANN quality evaluation: recall@10 of the LSH-bucketed path against "
        "the exact brute-force baseline, per query vector — the QA primitive "
        "a pipeline runs before trusting an approximate index (and after "
        "every quantizer retrain). Both rankings reuse the oracled top-k "
        "plans; the overlap is one small join.",
)
def ann_recall_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*_QUERY_IDS))
    bf = brute_force_topk(emb, queries, k=10).select("query_id", "neighbor_id")
    ap = (
        lsh_bucket_topk(emb, queries, dim=64, k=10, bits=8)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(ap, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hits"),
            (F.count("hit") / F.lit(10.0)).alias("recall_at_10"),
        )
    )


def _sql_ivf_recall_sweep(k: int = 8, iterations: int = 3, topk: int = 10,
                          dim: int = 64, scale: int = 1_000_000,
                          max_train: int = 100_000) -> str:
    """DuckDB twin of the nprobe recall sweep: the same unrolled integer
    Lloyd + exact assignment as _sql_ivf, probed at every nprobe in the
    sweep, each ranking compared against the brute-force top-k."""
    dist = ("CAST(list_sum(list_transform(list_zip(s.q, c.c), "
            "p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)")
    iters = ",".join(_sql_ivf_lloyd_iter(n, dim) for n in range(1, iterations + 1))
    return f"""
    WITH qv AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(FLOOR(x*{scale}.0 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    train AS (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT {max_train}),
    c0 AS (
      SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell, q AS c
      FROM (SELECT vec_id, q FROM train ORDER BY vec_id LIMIT {k})
    ),{iters},
    assign AS (
      SELECT vec_id, v, cell FROM (
        SELECT s.vec_id, s.v, c.cell,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                                  ORDER BY {dist}, c.cell) AS rn
        FROM qv s CROSS JOIN c{iterations} c)
      WHERE rn = 1
    ),
    probe_all AS (
      SELECT s.vec_id AS query_id, s.v AS pv, c.cell,
             ROW_NUMBER() OVER (PARTITION BY s.vec_id
                                ORDER BY {dist}, c.cell) AS rn
      FROM qv s CROSS JOIN c{iterations} c
      WHERE s.vec_id IN {_QUERY_IDS}
    ),
    bf_scored AS (
      SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, s.v) AS sim
      FROM qv s JOIN qv q ON s.vec_id <> q.vec_id
      WHERE q.vec_id IN {_QUERY_IDS}
    ),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM bf_scored) WHERE rank <= {topk}
    ),
    np AS (SELECT UNNEST([1, 2, 4, 8]) AS nprobe),
    ivf_scored AS (
      SELECT n.nprobe, p.query_id, a.vec_id AS neighbor_id,
             list_cosine_similarity(p.pv, a.v) AS sim
      FROM np n
      JOIN probe_all p ON p.rn <= n.nprobe
      JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
    ),
    ivf AS (
      SELECT nprobe, query_id, neighbor_id, 1 AS hit FROM (
        SELECT nprobe, query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY nprobe, query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM ivf_scored) WHERE rank <= {topk}
    ),
    grid AS (SELECT n.nprobe, b.query_id, b.neighbor_id
             FROM np n CROSS JOIN bf b)
    SELECT g.nprobe, g.query_id, CAST(COUNT(i.hit) AS BIGINT) AS n_hits,
           COUNT(i.hit) / {topk}.0 AS recall_at_10
    FROM grid g LEFT JOIN ivf i
      ON i.nprobe = g.nprobe AND i.query_id = g.query_id
     AND i.neighbor_id = g.neighbor_id
    GROUP BY g.nprobe, g.query_id
    """


@register(
    "ann_ivf_recall_sweep",
    oracle=_sql_ivf_recall_sweep(),
    doc="IVF recall curve: recall@10 of the IVF index at nprobe in "
        "{1,2,4,8} against the exact brute-force ranking, per query — the "
        "QA gate a vector pipeline runs before raising (or trusting) nprobe "
        "at scale. Cells are assigned ONCE (assign_cells, persisted) and "
        "probed at each sweep point; the brute-force baseline is computed "
        "once. Everything discrete is exact int64 (see ivf.py), so the "
        "oracle replays the full pipeline including training. The quantizer "
        "itself is the shared frozen k=8 fixture (training is scaffolding "
        "for a QA gate; deterministic Lloyd keeps the oracle exact).",
)
def ann_ivf_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.ivf import assign_cells, scored_cells
    from .fixtures import shared

    emb = load_table(spark, sf_dir, "embeddings")
    # the QA gate runs against an already-trained quantizer — training is
    # scaffolding (shared frozen k=8 fixture; deterministic exact Lloyd,
    # so the oracle's replayed training matches bit-for-bit)
    cents = shared(spark, sf_dir, "ivf_centroids_k8")
    queries = emb.filter(F.col("vec_id").isin(*_QUERY_IDS))
    from pyspark.sql.window import Window

    bf = brute_force_topk(emb, queries, k=10).select("query_id", "neighbor_id")
    levels = (1, 2, 4, 8)
    lv = F.array(*[F.lit(p) for p in levels])
    # ONE scoring pass serves every sweep point: a candidate with
    # cell_rank <= nprobe would be scored by an nprobe-cell probe, so
    # exploding each scored row into the sweep levels it qualifies for and
    # ranking once per (nprobe, query) yields every point's top-k from a
    # single corpus scan and a single window — no per-point plan branch,
    # no persisted intermediate (the max point probes all cells, so the
    # full scan is needed exactly once regardless)
    cand = scored_cells(assign_cells(emb, cents), queries, cents).select(
        "query_id", "neighbor_id", "sim",
        F.explode(F.filter(lv, lambda p: F.col("cell_rank") <= p))
        .alias("nprobe"),
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    ap = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("nprobe", "query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    bf_levels = bf.select(
        "query_id", "neighbor_id", F.explode(lv).alias("nprobe")
    )
    return (
        bf_levels.join(ap, ["nprobe", "query_id", "neighbor_id"], "left")
        .groupBy("nprobe", "query_id")
        .agg(
            F.count("hit").alias("n_hits"),
            (F.count("hit") / F.lit(10.0)).alias("recall_at_10"),
        )
        .select("nprobe", "query_id", "n_hits", "recall_at_10")
    )


_CLS_BUCKETS = 64  # hashing-trick feature width for the linear quality model


@register(
    "quality_classifier_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []
                    ELSE string_split_regex(trim(text), '\\s+') END AS toks
        FROM documents
    ),
    w AS (
        SELECT doc_id,
               list_transform(toks, tk ->
                   {_hex2int("substr(md5('w:' || CAST(" + _hex2int("substr(md5(tk), 1, 8)") + " % " + str(_CLS_BUCKETS) + " AS VARCHAR)), 1, 8)")}
                   / 2147483648.0 - 1) AS ws
        FROM t
    )
    SELECT doc_id,
           CASE WHEN len(ws) = 0 THEN 0.0
                ELSE list_reduce(list_prepend(0.0, ws), (a, x) -> a + x)
                     / len(ws) END AS logit,
           CASE WHEN len(ws) = 0 THEN FALSE
                ELSE list_reduce(list_prepend(0.0, ws), (a, x) -> a + x)
                     / len(ws) > 0 END AS is_high_quality
    FROM w
    """,
    doc="Model-based quality filtering (the fasttext-classifier stage of "
        "CCNet/FineWeb-style pipelines) as a broadcast linear scorer over "
        "hashing-trick features: token -> md5 bucket (64-wide), bucket -> "
        "deterministic md5-derived weight in [-1, 1), logit = mean token "
        "weight, keep-decision = logit > 0. Pure map, expression-only "
        "(md5/conv/aggregate in whole-stage codegen) — the shape under a "
        "REAL learned model is identical: weights become a broadcast array "
        "literal, exactly like the IVF centroid matrix. Left-fold double "
        "sum + one division keeps the logit bit-identical across engines "
        "with no rounding.",
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.textanalysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = F.when(
        F.length(F.trim("text")) == 0, F.array().cast("array<string>")
    ).otherwise(tokens(F.col("text")))

    def bucket(tk):
        return F.pmod(
            F.conv(F.substring(F.md5(tk), 1, 8), 16, 10).cast("bigint"),
            F.lit(_CLS_BUCKETS),
        )

    def weight(tk):
        seed = F.concat(F.lit("w:"), bucket(tk).cast("string"))
        return (
            F.conv(F.substring(F.md5(seed), 1, 8), 16, 10).cast("bigint")
            / F.lit(2147483648.0)
            - 1
        )

    ws = F.transform(toks, weight)
    logit = F.when(F.size(ws) == 0, F.lit(0.0)).otherwise(
        F.aggregate(ws, F.lit(0.0), lambda a, x: a + x)
        / F.size(ws).cast("double")
    )
    return docs.select(
        "doc_id",
        logit.alias("logit"),
        F.when(F.size(ws) == 0, F.lit(False))
        .otherwise(logit > 0)
        .alias("is_high_quality"),
    )


@register(
    "training_order_shuffle",
    oracle=f"""
    SELECT doc_id,
           {_hex2int("substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)")} % 8
               AS shard_id,
           ROW_NUMBER() OVER (
               PARTITION BY {_hex2int("substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)")} % 8
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS position
    FROM documents
    """,
    doc="Deterministic global training-order shuffle: each document gets a "
        "shard (md5 bucket of its id) and a pseudo-random position within "
        "the shard (rank of its md5 digest) — the reproducible corpus "
        "shuffle a training run needs so every re-run, engine, and resumed "
        "job reads examples in the same order (df.sample/shuffle are "
        "partitioning-dependent). One shuffle on shard_id; within-shard "
        "rank is a per-partition window, no global sort ever happens.",
)
def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    digest = F.md5(F.col("doc_id").cast("string"))
    shard = F.pmod(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint"), F.lit(8)
    )
    w = Window.partitionBy(shard).orderBy(digest, F.col("doc_id"))
    return docs.select(
        "doc_id",
        shard.alias("shard_id"),
        F.row_number().over(w).alias("position"),
    )


@register(
    "dedup_minhash_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split_regex({_NORM}, '\\s+') AS toks
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
    ),
    est AS (
        SELECT p.doc_a, p.doc_b,
               CAST(len([i for i in range(1, 17)
                         if sa.sig[i] = sb.sig[i]]) AS DOUBLE) / 16.0
                   AS est_jaccard
        FROM pairs p
        JOIN sigs sa ON sa.doc_id = p.doc_a
        JOIN sigs sb ON sb.doc_id = p.doc_b
    ),
    tru AS (
        SELECT p.doc_a, p.doc_b,
               CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0 THEN
                 CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
                     / len(list_distinct(list_concat(a.sh, b.sh)))
               ELSE 0.0 END AS true_jaccard
        FROM pairs p
        JOIN sh a ON a.doc_id = p.doc_a
        JOIN sh b ON b.doc_id = p.doc_b
    )
    SELECT e.doc_a, e.doc_b, e.est_jaccard, tru.true_jaccard,
           abs(e.est_jaccard - tru.true_jaccard) AS abs_err
    FROM est e JOIN tru USING (doc_a, doc_b)
    """,
    doc="MinHash estimator quality, per candidate pair: the 16-hash "
        "est_jaccard next to the exact shingle Jaccard and their absolute "
        "error — the calibration a pipeline checks before trusting a "
        "signature width / band count at scale (too-wide error means more "
        "hashes or a post-verify threshold). Reuses the banded candidate "
        "join and pair-scoped exact-verify plans; every number is an exact "
        "integer ratio or single IEEE op, so no rounding is needed.",
)
def dedup_minhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import shingle_arrays

    docs = load_table(spark, sf_dir, "documents")
    # ONE tokenize+shingle pass feeds both the signature build and the exact
    # verification — the composite reads the corpus text once
    sh = shingle_arrays(docs).persist()
    cands = minhash_candidates(docs, shingles=sh)
    true = ngram_jaccard(docs, cands, shingles=sh)
    return (
        cands.join(true, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "est_jaccard",
            F.col("jaccard").alias("true_jaccard"),
            F.abs(F.col("est_jaccard") - F.col("jaccard")).alias("abs_err"),
        )
    )


@register(
    "streaming_ivf_maintenance",
    oracle=_sql_ivf(),
    doc="Streaming-maintained flavor of ann_ivf_store: the embedding ingest "
        "drains AvailableNow into the cell-partitioned index (first batch "
        "builds, later batches append only membership-fresh vectors under "
        "the FROZEN quantizer), then the query batch runs against the "
        "maintained store. Per-batch cost is a pure-map assignment of the "
        "batch plus an id anti-join — never a corpus re-assignment — and "
        "any drain schedule produces the same store as one batch build "
        "(exact int64 cell argmin depends only on vector + centroids), so "
        "the lazy path's unrolled-CTE oracle holds unchanged "
        "(streaming/ivf_maintenance.py; split/replay/late-append invariance "
        "pinned by tests/test_ivf_maintenance.py).",
)
def streaming_ivf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import tempfile as _tf

    from ..extensions.ivf_store import query_ivf_index
    from ..streaming.ivf_maintenance import run_ivf_maintenance
    from .fixtures import shared

    emb = load_table(spark, sf_dir, "embeddings")
    # the frozen quantizer is train-once scaffolding (shared fixture);
    # the operator under test is the streaming index maintenance + probe
    cents = shared(spark, sf_dir, "ivf_centroids_k8")
    out_root = _tf.mkdtemp(prefix="ivf_maint_q_")
    table = f"ivfm_{_os.path.basename(out_root).lower()}"
    run_ivf_maintenance(spark, sf_dir, cents, table,
                        _os.path.join(out_root, "ckpt"))
    queries = emb.filter(F.col("vec_id").isin(*_QUERY_IDS))
    res = query_ivf_index(spark, queries, cents, table=table, k=10, nprobe=2)
    out = f"{out_root}/topk"
    res.write.parquet(out)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    return spark.read.parquet(out)


@register(
    "set_similarity_join",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split_regex({_NORM}, '\\s+') AS toks
               FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    sz AS (SELECT doc_id, len(sh) AS sz FROM sh),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter,
           CAST(sa.sz + sb.sz - inter AS BIGINT) AS union_sz,
           CAST((inter * 1000000) // (sa.sz + sb.sz - inter) AS BIGINT)
               AS jaccard_ppm
    FROM inter
    JOIN sz sa ON sa.doc_id = inter.doc_a
    JOIN sz sb ON sb.doc_id = inter.doc_b
    WHERE 2 * inter >= sa.sz + sb.sz - inter
    """,
    doc="EXACT set-similarity self-join at Jaccard >= 1/2 via prefix "
        "filtering (AllPairs/PPJoin): shingle sets ordered rarest-token "
        "first, only each set's (n div 2 + 1)-token prefix is indexed, "
        "candidates must share a prefix token and pass the 2*min >= max "
        "size bound, then exact intersection verifies. Zero false "
        "negatives by the prefix theorem — the deterministic complement "
        "to MinHash LSH (probabilistic recall) in the dedup stack. All "
        "decisions integer (div-based prefix length, 2*inter >= union), "
        "so the brute-force SQL oracle matches bit-for-bit. The oracle IS "
        "all-pairs-on-shared-tokens (fine at sf0.01); the Spark side "
        "never forms it.",
)
def set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import shingle_arrays, spread
    from ..extensions.setjoin import prefix_filter_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    return prefix_filter_pairs(shingle_arrays(docs))


def _sql_bpe_prefix(rounds: int = 4) -> str:
    """Shared CTE chain of the unrolled BPE oracle: the word vocabulary
    with counts, then per round a weighted pair count, a one-row argmax
    (count DESC, pair lexicographic) and the merge applied via
    left-to-right non-overlapping replace — greedy BPE application,
    byte-identical to extensions/bpe.py's Spark rounds."""
    parts = [r"""w AS (
        SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
              FROM documents)
        GROUP BY t),
    s0 AS (SELECT regexp_replace(word, '(.)', ' \1 ', 'g') AS seq,
                  cnt FROM w)"""]
    for i in range(1, rounds + 1):
        parts.append(f"""p{i} AS (
        SELECT pr[1] AS l, pr[2] AS r, CAST(SUM(cnt) AS BIGINT) AS n
        FROM (SELECT unnest(list_zip(tk[1:-2], tk[2:-1])) AS pr, cnt
              FROM (SELECT list_filter(string_split(seq, ' '),
                                       x -> x <> '') AS tk, cnt
                    FROM s{i - 1}))
        GROUP BY pr[1], pr[2]),
    b{i} AS (SELECT l, r, n FROM p{i} ORDER BY n DESC, l, r LIMIT 1),
    s{i} AS (SELECT replace(seq,
                ' ' || (SELECT l FROM b{i}) || '  '
                    || (SELECT r FROM b{i}) || ' ',
                ' ' || (SELECT l FROM b{i})
                    || (SELECT r FROM b{i}) || ' ') AS seq, cnt
             FROM s{i - 1})""")
    return "WITH " + ",\n    ".join(parts)


def _sql_bpe_learn(rounds: int = 4) -> str:
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({i} AS INTEGER) AS round, l AS pair_left, "
        f"r AS pair_right, l || r AS merged, n AS n_occurrences "
        f"FROM b{i}"
        for i in range(1, rounds + 1))
    return _sql_bpe_prefix(rounds) + "\n    " + sel


def _sql_bpe_topk(rounds: int = 4, k: int = 10) -> str:
    return _sql_bpe_prefix(rounds) + f"""
    SELECT token, n FROM (
        SELECT tok AS token, CAST(SUM(cnt) AS BIGINT) AS n
        FROM (SELECT unnest(list_filter(string_split(seq, ' '),
                                        x -> x <> '')) AS tok, cnt
              FROM s{rounds})
        GROUP BY tok)
    ORDER BY n DESC, token LIMIT {k}
    """


@register(
    "bpe_learn",
    oracle=_sql_bpe_learn(),
    doc="Distributed BPE tokenizer training (Sennrich 2016, the "
        "GPT-2/RoBERTa tokenizer's learning pass) as iterative Spark "
        "rounds: one map-side-combined pair count over the DEDUPLICATED "
        "word vocabulary (counts weighted by corpus frequency — the "
        "corpus is scanned once, the rounds never re-touch it), a "
        "one-row driver argmax (count DESC then pair lexicographic — "
        "deterministic), and the merge applied everywhere as "
        "left-to-right non-overlapping replace over sequences in which "
        "every token OWNS its boundary spaces (adjacent occurrences "
        "never share a delimiter), which IS greedy token-space BPE "
        "application. 4 rounds; the "
        "oracle unrolls the identical rounds with scalar-subquery "
        "argmaxes, so merges AND their counts are exact "
        "(extensions/bpe.py; per-round driver traffic = one row).",
)
def bpe_learn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.bpe import bpe_learn

    merges = bpe_learn(load_table(spark, sf_dir, "documents"), rounds=4)
    return spark.createDataFrame(
        merges,
        "round int, pair_left string, pair_right string, "
        "merged string, n_occurrences long",
    )


@register(
    "bpe_tokenize_topk",
    oracle=_sql_bpe_topk(),
    doc="BPE APPLICATION at corpus scale: tokenize every document with "
        "the learned merge list (per word: char split, then each merge "
        "in learned order — a pure narrow map, expression-only via "
        "transform/replace/flatten, no shuffle until the count) and "
        "report the top-10 tokens by corpus frequency (ties broken "
        "lexicographically). The merge list is the shared fixture "
        "(training is the amortized build, like the frozen IVF "
        "quantizer); the oracle re-derives the same top-k from the "
        "unrolled round chain — per-word token counts weighted by word "
        "frequency equal per-document tokenization counts exactly.",
)
def bpe_tokenize_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.bpe import bpe_apply, word_counts
    from .fixtures import shared

    docs = load_table(spark, sf_dir, "documents")
    merges = shared(spark, sf_dir, "bpe_merges_4")
    # r13: tokenize the DEDUPLICATED vocabulary and weight by corpus word
    # frequency instead of re-tokenizing every word occurrence — a token's
    # corpus count is sum(count_in_word(token, w) * freq(w)) because each
    # word tokenizes independently of its document context. Bit-identical
    # integer counts (the oracle counts the same word-level view); per-word
    # regex work drops from O(corpus words) to O(vocabulary) — Heaps-law
    # sublinear in corpus size. Measured: apply+count pass 1.6 s -> 0.2 s
    # at sf0.1. A pipeline needing per-DOCUMENT token sequences still calls
    # bpe_apply on documents; this query's aggregate does not.
    wc = word_counts(docs, "text")
    toks = bpe_apply(wc, merges, text_col="word").select(
        F.explode("bpe_tokens").alias("token"), "cnt")
    return (
        toks.groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(10)
    )
