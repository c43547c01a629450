"""Plan-only query detection for steady-state benchmarking.

A registry query is a *plan-only builder* when its ``fn(spark, sf_dir)``
merely CONSTRUCTS a DataFrame: no Spark jobs, no filesystem or fixture
work, no materialized state baked into the plan. For those queries, a
steady-state re-run can re-execute the constructed logical plan JVM-side
(``Dataset.ofRows`` — one py4j call) instead of re-paying hundreds of
py4j round trips to rebuild an identical plan from Python. That is the
honest steady-state number: analysis, optimization, and EVERY physical
stage re-run (fresh Dataset → fresh RDDs → fresh shuffle ids, so the
DAGScheduler cannot skip map stages the way a repeated ``.count()`` on
the SAME Dataset would); only the Python-side plan re-construction —
which a long-running pipeline pays once, and which measures py4j, not
the engine — is skipped.

Three guards, all required (defense in depth — each catches a class the
others can miss):

1. **static**: the fn's source is free of action / side-effect names
   (``collect``, ``count`` on DataFrames, fixture access, tempdirs, …).
   ``F.count`` / ``F.first`` — lazy Column expressions — are excluded.
   Catches driver-side filesystem work (manifest resolution, tempdirs)
   that submits no Spark job.
2. **dynamic**: zero Spark jobs submitted while fn runs (checked against
   the DAGScheduler job counter at bench time). Catches helpers the
   static scan cannot see into (IVF training collects, graph-iteration
   checkpoints).
3. **plan**: the optimized plan embeds no materialized node
   (LogicalRDD / ExistingRDD / InMemoryRelation — e.g. from a
   localCheckpoint inside a helper). Re-executing such a plan would
   reuse computed partitions and under-time the operator.
"""

from __future__ import annotations

import ast
import inspect
import textwrap

# names whose presence in a query fn's source disqualifies it: DataFrame /
# stream actions, persistence, fixture and filesystem access
_ACTION_NAMES = frozenset({
    "collect", "count", "first", "head", "take", "show", "isEmpty",
    "toPandas", "toLocalIterator",
    "persist", "cache", "checkpoint", "localCheckpoint",
    "write", "writeStream", "saveAsTable", "parquet", "csv", "json", "orc",
    "foreachBatch", "start", "awaitTermination",
    "sql", "createOrReplaceTempView", "refreshTable",
    "shared", "fresh_copy", "mkdtemp", "makedirs",
})

_MATERIALIZED_NODES = ("LogicalRDD", "ExistingRDD", "InMemoryRelation")


def _fn_is_static_lazy(fn) -> bool:
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, TypeError, SyntaxError):
        return False
    for sub in ast.walk(tree):
        if isinstance(sub, ast.Attribute) and sub.attr in _ACTION_NAMES:
            base = sub.value
            # pyspark.sql.functions.count/first/... build lazy Columns
            if isinstance(base, ast.Name) and base.id == "F":
                continue
            return False
        if (isinstance(sub, ast.Call)
                and getattr(sub.func, "id", "") in _ACTION_NAMES):
            return False
    return True


def plan_only_candidates(registry) -> set[str]:
    """Names whose fn source passes the static guard (guard 1)."""
    return {name for name, q in registry.items() if _fn_is_static_lazy(q.fn)}


def jobs_submitted(spark) -> int:
    """Monotone DAGScheduler job counter (guard 2 reads it around fn)."""
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


def plan_is_reusable(df) -> bool:
    """Guard 3: no materialized nodes in the optimized plan."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return not any(node in plan for node in _MATERIALIZED_NODES)


def steady_count(spark, df) -> int:
    """Re-execute ``df``'s logical plan as a FRESH JVM Dataset and count.

    ``Dataset.ofRows`` re-analyzes, re-optimizes, and re-plans — new RDD
    lineage, new shuffle dependencies — so every stage re-runs. (The
    between-run ``clearCache`` in the bench keeps the CacheManager from
    re-matching any persisted subtree.)"""
    Dataset = spark._jvm.org.apache.spark.sql.classic.Dataset
    return Dataset.ofRows(spark._jsparkSession, df._jdf.logicalPlan()).count()
