"""Distribution statistics: histogram binning, exact correlation,
deterministic sampling — the profiling ops a data pipeline runs before and
after transformations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register


@register(
    "revenue_histogram",
    oracle="""
    SELECT CAST(floor(l_extendedprice / 5000) AS INTEGER) + 1 AS bucket,
           COUNT(*) AS n,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY CAST(floor(l_extendedprice / 5000) AS INTEGER) + 1
    """,
    doc="Equi-width histogram (5000-wide buckets over the price domain) via "
        "explicit floor binning (width_bucket doesn't exist in DuckDB; the "
        "floor expression is engine-portable) — a single partial+final "
        "aggregate.",
)
def revenue_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = (F.floor(F.col("l_extendedprice") / 5000).cast("int") + 1)
    return li.groupBy(b.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "price_quantity_corr",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sx,
               SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sy,
               SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxx,
               SUM(CAST(round(l_quantity * 100) AS BIGINT)
                   * CAST(round(l_quantity * 100) AS BIGINT)) AS syy,
               SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round(l_quantity * 100) AS BIGINT)) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
           / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
              * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))
               AS price_qty_corr
    FROM s
    """,
    doc="Pearson correlation computed from exact integer-cents sums (the "
        "F.corr built-in accumulates doubles and is partial-agg-order "
        "dependent; this formulation is bit-deterministic at any "
        "parallelism — same technique as grouped_zscore_pandas). sxy of "
        "cents*cents stays within int64 up to ~1e5-row x 1e7-cent groups; "
        "beyond that, promote to DECIMAL(38,0).",
)
def price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    y = F.round(F.col("l_quantity") * 100, 0).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n * F.col("sxy").cast("double") - sx * F.col("sy")
    den = F.sqrt(n * F.col("sxx").cast("double") - sx * F.col("sx")) * F.sqrt(
        n * F.col("syy").cast("double") - sy * F.col("sy")
    )
    return s.select("l_returnflag", "n", (num / den).alias("price_qty_corr"))


@register(
    "deterministic_sample",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
               - 1 AS BIGINT) < 2
    """,
    doc="Reproducible ~12.5% sample keyed on md5(doc_id) first nibble < 2 — "
        "the sampling a training pipeline must use so re-runs, engines, and "
        "audits agree on membership (df.sample() is seed-and-partitioning "
        "dependent). Pure map; the predicate pushes to the scan.",
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nibble = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
                    ).cast("bigint")
    return docs.filter(nibble < 2).select("doc_id", "lang", "n_chars")


@register(
    "stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n_stratum
        FROM documents)
    SELECT doc_id, lang, rn FROM ranked WHERE rn <= CEIL(n_stratum * 0.2)
    """,
    doc="Stratified 20% sample: exactly ceil(20%) of each language stratum, "
        "membership keyed on md5(doc_id) so every engine/rerun/audit selects "
        "the same documents. The rank-based form guarantees exact per-stratum "
        "counts; at extreme scale a hash-threshold filter (md5 < p·2^128) "
        "gives approximate fractions with NO shuffle at all — rank costs one "
        "shuffle on the stratum key and is the exact-count path.",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    cw = Window.partitionBy("lang")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .withColumn("n_stratum", F.count(F.lit(1)).over(cw))
        .filter(F.col("rn") <= F.ceil(F.col("n_stratum") * 0.2))
        .select("doc_id", "lang", "rn")
    )


@register(
    "weighted_median_price",
    oracle="""
    WITH t AS (
        SELECT l_returnflag AS flag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
               CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q
        FROM lineitem
    ),
    w AS (SELECT flag, pc, SUM(q) AS q FROM t GROUP BY flag, pc),
    c AS (SELECT flag, pc,
                 SUM(q) OVER (PARTITION BY flag ORDER BY pc) AS cw,
                 SUM(q) OVER (PARTITION BY flag) AS tot
          FROM w)
    SELECT flag, CAST(MIN(pc) AS DOUBLE) / 100.0 AS wmedian_price
    FROM c WHERE 2 * cw >= tot GROUP BY flag
    """,
    doc="Exact quantity-weighted median price per return flag via a "
        "GROUPED_AGG pandas UDF (extensions/weighted.py) — the pandas_udf "
        "flavor built-ins can't replace (no weighted median in Spark). "
        "Integer-cents math end-to-end; the oracle re-derives the same "
        "lower-median rule with window cumsums.",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.weighted import weighted_median_cents

    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("pc"),
        (F.col("l_quantity").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("q"),
    )
    return t.groupBy("flag").agg(
        weighted_median_cents("pc", "q").alias("wmedian_price")
    )


@register(
    "revenue_percentiles_sketch",
    oracle=None,
    doc="Approximate percentiles via approx_percentile (Greenwald-Khanna "
        "sketch, accuracy 10000 => rank error <= n/10000): the ONE-PASS, "
        "mergeable path that replaces revenue_percentiles' exact "
        "per-group sort at 100 TB — partial sketches combine "
        "associatively, so the plan is a partial+final aggregate like any "
        "sum, with no per-group sort or full shuffle of values. No SQL "
        "oracle (DuckDB's quantile sketch differs); correctness is "
        "enforced IN-QUERY: each approximate quantile must sit within two "
        "error-radii of the exact per-group distribution "
        "(checked against one exact percentile() pass), or the query "
        "raises.",
)
def revenue_percentiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    acc = 10000
    qs = [0.5, 0.9, 0.99]
    approx = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.approx_percentile("l_extendedprice", qs, acc).alias("ap"),
    )
    out = approx.select(
        "l_returnflag", "n",
        F.col("ap")[0].alias("p50_approx"),
        F.col("ap")[1].alias("p90_approx"),
        F.col("ap")[2].alias("p99_approx"),
    ).persist()

    # invariant: every approximate quantile lies between the exact values
    # two error-radii around its rank (2*eps: GK guarantees the QUERY rank;
    # the exact value at q-eps can itself sit a boundary rank away under
    # percentile_disc's discrete rank definition). ALL six exact bounds
    # come from ONE aggregation pass — the check must not cost three extra
    # scans of the fact table.
    rows = {r.l_returnflag: r for r in out.collect()}
    # GK's rank error is max(1, eps*n): at small groups the FLOOR of one
    # rank dominates, so express the window in quantile units as
    # max(2*eps, 3/min_group_n) — ~3 ranks of slack at tiny n, 2 error
    # radii (~n/5000 ranks) at scale
    min_n = min(r.n for r in rows.values())
    eps = max(2.0 / acc, 3.0 / max(min_n, 1)) / 2
    cols = ("p50_approx", "p90_approx", "p99_approx")
    bound_qs = []
    for q in qs:
        bound_qs += [max(q - 2 * eps, 0.0), min(q + 2 * eps, 1.0)]
    arr = ", ".join(str(b) for b in bound_qs)
    # exact percentile() with an ARRAY of quantiles: ONE value buffer and
    # ONE sort per group for all six bounds (percentile_disc buffers and
    # sorts per expression — 6x the work; measured 4.3s vs 1.4s at sf0.1).
    # Interpolated bounds are safe here: the 2*eps slack is ~120 ranks at
    # sf0.1 while interpolation moves a bound by <1 rank.
    exact = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile(l_extendedprice, array({arr}))").alias("bounds")
    )
    for e in exact.collect():
        for i, (q, col) in enumerate(zip(qs, cols)):
            got = getattr(rows[e.l_returnflag], col)
            lo, hi = e.bounds[2 * i], e.bounds[2 * i + 1]
            if not (lo <= got <= hi):
                raise AssertionError(
                    f"sketch out of rank window: {col}[{e.l_returnflag}] "
                    f"= {got}, window [{lo}, {hi}]"
                )
    return out
