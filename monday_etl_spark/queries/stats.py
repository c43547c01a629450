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


def _sketch_rank_sql(acc: int) -> str:
    """DuckDB twin of the sketch query's bound check. The window BOUNDS are
    cross-engine-exact (integer-cents elements picked at explicit integer
    ranks — no interpolation, no floats); the ok_* booleans are the
    CONTRACT: DuckDB asserts TRUE, Spark computes them honestly from its
    sketch, so a sketch outside its documented rank window hash-mismatches
    into a red driver row."""
    qs = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    rank_cols = ", ".join(
        f"GREATEST(1, (n*{num} + {den} - 1) // {den} - slack) AS lo_{lbl}, "
        f"LEAST(n, (n*{num} + {den} - 1) // {den} + slack) AS hi_{lbl}"
        for lbl, num, den in qs
    )
    val_cols = ", ".join(
        f"MIN(CASE WHEN r.rn = b.lo_{lbl} THEN r.pc END) AS lo_val_{lbl}, "
        f"MIN(CASE WHEN r.rn = b.hi_{lbl} THEN r.pc END) AS hi_val_{lbl}"
        for lbl, _, _ in qs
    )
    out_cols = ", ".join(
        f"v.lo_val_{lbl} AS lo_{lbl}_cents, v.hi_val_{lbl} AS hi_{lbl}_cents, "
        f"TRUE AS ok_{lbl}"
        for lbl, _, _ in qs
    )
    return f"""
    WITH t AS (
        SELECT l_returnflag AS flag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
        FROM lineitem
    ),
    n AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY flag),
    k AS (SELECT flag, n,
                 GREATEST(3, (2*n + {acc} - 1) // {acc} + 1) AS slack
          FROM n),
    b AS (SELECT flag, n, {rank_cols} FROM k),
    r AS (SELECT flag, pc,
                 ROW_NUMBER() OVER (PARTITION BY flag ORDER BY pc) AS rn
          FROM t),
    v AS (SELECT r.flag, {val_cols}
          FROM r JOIN b ON r.flag = b.flag GROUP BY r.flag)
    SELECT b.flag, b.n, {out_cols}
    FROM b JOIN v ON b.flag = v.flag
    """


@register(
    "revenue_percentiles_sketch",
    oracle=_sketch_rank_sql(10000),
    doc="Approximate percentiles via approx_percentile (Greenwald-Khanna "
        "sketch, accuracy 10000 => rank error <= n/10000): the ONE-PASS, "
        "mergeable path that replaces revenue_percentiles' exact "
        "per-group sort at 100 TB — partial sketches combine "
        "associatively, so the plan is a partial+final aggregate like any "
        "sum, with no per-group sort or full shuffle of values. Sketch "
        "VALUES are engine-specific by nature, so the driver-checked "
        "result is the documented-error-bound AUDIT (the r06 verdict's "
        "last rows-only upgrade): per group it emits n, the exact "
        "integer-cents elements at ranks ceil(q*n) +/- slack (slack = two "
        "GK error radii + 1 discrete-boundary rank, min 3 — all integer "
        "rank math, bit-identical in DuckDB via ROW_NUMBER), and booleans "
        "asserting the sketch lies inside its window. DuckDB hashes the "
        "same bounds with TRUE literals: an out-of-bound sketch flips a "
        "boolean and reds the row. The rank-window pass is the audit "
        "query; production reads the sketch alone (no per-group sort).",
)
def revenue_percentiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    acc = 10000
    qs = [("p50", 1, 2, 0.5), ("p90", 9, 10, 0.9), ("p99", 99, 100, 0.99)]
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("pc"),
    )
    approx = t.groupBy("flag").agg(
        F.count("*").cast("long").alias("n"),
        F.approx_percentile("pc", [q for _, _, _, q in qs], acc).alias("ap"),
    )
    bounds = approx.withColumn(
        "slack", F.expr(f"greatest(3L, (2*n + {acc} - 1) div {acc} + 1)")
    )
    for lbl, num, den, _ in qs:
        target = f"(n*{num} + {den} - 1) div {den}"
        bounds = bounds.withColumn(
            f"lo_{lbl}", F.expr(f"greatest(1L, {target} - slack)")
        ).withColumn(f"hi_{lbl}", F.expr(f"least(n, {target} + slack)"))

    ranked = t.withColumn(
        "rn", F.row_number().over(Window.partitionBy("flag").orderBy("pc"))
    )
    vals = (
        ranked.join(F.broadcast(bounds.select(
            "flag", *[c for lbl, _, _, _ in qs
                      for c in (f"lo_{lbl}", f"hi_{lbl}")]
        )), "flag")
        .groupBy("flag")
        .agg(*[
            agg
            for lbl, _, _, _ in qs
            for agg in (
                F.min(F.when(F.col("rn") == F.col(f"lo_{lbl}"), F.col("pc")))
                .alias(f"lo_val_{lbl}"),
                F.min(F.when(F.col("rn") == F.col(f"hi_{lbl}"), F.col("pc")))
                .alias(f"hi_val_{lbl}"),
            )
        ])
    )
    out_cols = [F.col("flag"), F.col("n")]
    for i, (lbl, _, _, _) in enumerate(qs):
        out_cols += [
            F.col(f"lo_val_{lbl}").alias(f"lo_{lbl}_cents"),
            F.col(f"hi_val_{lbl}").alias(f"hi_{lbl}_cents"),
            (F.col(f"lo_val_{lbl}") <= F.col("ap")[i])
            .__and__(F.col("ap")[i] <= F.col(f"hi_val_{lbl}"))
            .alias(f"ok_{lbl}"),
        ]
    return bounds.join(vals, "flag").select(*out_cols)


@register(
    "distinct_count_sketch",
    oracle="""
    WITH per AS (
        SELECT l_returnflag AS flag,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact
        FROM lineitem GROUP BY l_returnflag
    ),
    g AS (
        SELECT '_ALL_' AS flag,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact
        FROM lineitem
    )
    SELECT flag, n_exact, TRUE AS ok FROM per
    UNION ALL
    SELECT flag, n_exact, TRUE AS ok FROM g
    """,
    doc="Mergeable distinct-count sketches (Apache DataSketches HLL via "
        "hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per "
        "l_returnflag a binary sketch column estimates distinct "
        "l_orderkey, and the GLOBAL estimate comes from hll_union_agg "
        "over the three group sketches — NO second scan of the fact "
        "table, and the union correctly de-duplicates orders whose "
        "lineitems span flags (a plain SUM of per-group counts cannot). "
        "That re-aggregation-without-rescan is the 100 TB rollup story: "
        "sketches are partial-aggregate state, so any rollup level is a "
        "merge, not a scan. Sketch estimates are engine-specific, so the "
        "driver-checked result is the bounded-error AUDIT (the "
        "revenue_percentiles_sketch pattern): each row carries the exact "
        "distinct count and a boolean asserting the estimate lies within "
        "10% (>=6 sigma at the default lgK=12, sigma~1.04/sqrt(2^12)); "
        "DuckDB hashes the same exacts with TRUE literals, so a "
        "drifted sketch flips a boolean and reds the row. The exact "
        "COUNT(DISTINCT) pass exists only to audit; production reads "
        "the sketches alone.",
)
def distinct_count_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def tol(n):  # 10% of exact, >= 16 — generous vs the ~1.6% sigma
        return F.greatest(F.lit(16).cast("long"),
                          F.ceil(n * F.lit(0.10)).cast("long"))

    per = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.hll_sketch_agg("l_orderkey").alias("sk"),
        F.count_distinct("l_orderkey").cast("long").alias("n_exact"),
    )
    per_rows = per.select(
        "flag", "n_exact",
        (F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
         <= tol(F.col("n_exact"))).alias("ok"),
    )
    merged = per.agg(F.hll_union_agg("sk").alias("sk_all"))
    global_exact = li.agg(
        F.count_distinct("l_orderkey").cast("long").alias("n_exact")
    )
    global_row = global_exact.crossJoin(merged).select(
        F.lit("_ALL_").alias("flag"), "n_exact",
        (F.abs(F.hll_sketch_estimate("sk_all") - F.col("n_exact"))
         <= tol(F.col("n_exact"))).alias("ok"),
    )
    return per_rows.unionByName(global_row)
