"""IVF-style approximate nearest neighbor: k-means coarse quantizer +
inverted lists, probing only the closest cells.

The second scale path beside sign-LSH (similarity.py): instead of random
hyperplane buckets, the corpus is clustered into k cells (deterministic
Lloyd iterations — initial centroids are the vectors of the k smallest ids,
ties in assignment break toward the lower centroid id), and each query
scores only its ``nprobe`` nearest cells (~nprobe/k of the corpus).

Scale split (FAISS-style): the coarse quantizer TRAINS on a bounded
driver-side sample (``max_train`` lowest-id vectors — numpy Lloyd, one Spark
job), while ASSIGNMENT — the part that is linear in corpus size — runs
distributively as a broadcast cross-score against the k-centroid literal.
At 100 TB the sample stays O(max_train·dim) on the driver and the corpus
never leaves the executors.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _to_double, cosine, dot


def _centroid_scores(vec, centroids: list[tuple[int, list[float]]]):
    """Column array<double>: distance score per centroid, in list order
    (expanded euclidean: -2·v·c + |c|² since |v|² is constant per row).

    The k×dim centroid matrix enters the plan as ONE array<array<double>>
    literal + a transform, not k unrolled 64-element F.array()s — the
    unrolled form put 512 literal nodes in the tree twice (assignment +
    probe) and codegen compile dominated the cold run (~5 s at sf0.1)."""
    cmat = F.lit([c for _, c in centroids])
    c2 = F.lit([sum(x * x for x in c) for _, c in centroids])
    return F.zip_with(cmat, c2, lambda c, cc: cc - 2 * dot(vec, c))


def _nearest_centroid(vec, centroids: list[tuple[int, list[float]]]):
    """Column: id of the closest centroid by euclidean distance; ties break
    toward the lower centroid id (first occurrence of the min).

    Built as argmin over a scores ARRAY, not a chain of F.when — a when-chain
    that re-embeds the running best twice per step grows the expression tree
    2^k-fold (k=8 made codegen the dominant cost: 20 s/query at sf0.1)."""
    scores = _centroid_scores(vec, centroids)
    pos = F.array_position(scores, F.array_min(scores)).cast("int")
    return F.element_at(F.lit([cid for cid, _ in centroids]), pos)


def kmeans_fit(corpus: DataFrame, k: int = 8, iterations: int = 3,
               vec_col: str = "embedding", id_col: str = "vec_id",
               max_train: int = 100_000) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd on a bounded training sample: the ``max_train``
    lowest-id vectors are collected once and iterated in numpy (init = the k
    smallest ids; ties in assignment break toward the lower centroid id;
    empty cells keep their previous centroid). One Spark job total — the
    driver-loop-per-iteration variant cost 4 jobs + a codegen compile each
    and dominated the query (20 s at sf0.1). Returns [(cell_id, centroid)].
    """
    rows = (
        corpus.select(F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v"))
        .orderBy("id")
        .limit(max_train)
        .collect()
    )
    X = np.array([list(r.v) for r in rows], dtype=np.float64)
    cents = X[:k].copy()
    x2 = (X * X).sum(axis=1)
    for _ in range(iterations):
        # n×k distances via |x|² - 2x·c + |c|²; argmin ties → first index
        d = x2[:, None] - 2.0 * (X @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [(i, cents[i].tolist()) for i in range(k)]


def ivf_topk(corpus: DataFrame, queries: DataFrame,
             centroids: list[tuple[int, list[float]]], k: int = 10,
             nprobe: int = 2, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Top-k per query, scoring only the query's ``nprobe`` nearest cells.
    Returns (query_id, neighbor_id, rank, cosine_sim) — same shape as the
    LSH and brute-force paths."""
    from .dedup import spread

    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    ).withColumn("cell", _nearest_centroid(F.col("cv"), centroids))

    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    )
    # nprobe nearest cells per query: rank the k centroid distances
    ids = F.lit([cid for cid, _ in centroids])
    probe = q.select(
        "query_id",
        "qv",
        F.explode(
            F.zip_with(
                ids,
                _centroid_scores(F.col("qv"), centroids),
                lambda i, d: F.struct(i.alias("cell"), d.alias("d")),
            )
        ).alias("pc"),
    ).select("query_id", "qv", F.col("pc.cell").alias("cell"), F.col("pc.d").alias("d"))
    wq = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("cell"))
    probe = (
        probe.withColumn("cr", F.row_number().over(wq))
        .filter(F.col("cr") <= nprobe)
        .select("query_id", "qv", "cell")
    )

    scored = c.join(
        F.broadcast(probe),
        (c.cell == probe.cell) & (F.col("neighbor_id") != F.col("query_id")),
    ).select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("cosine_sim"))
    )
