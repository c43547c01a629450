"""Bucketed table layout — the co-located join strategy (SURVEY §4 /
SCALE.md: 'pre-partitioning for shuffle-free fact-fact joins').

``bucketBy(n, key)`` writes each table pre-hash-partitioned on the join key;
two tables bucketed the same way join with ZERO Exchange on either side —
at 100 TB that removes the single most expensive stage of the
orders⋈lineitem family. The cost moves to write time (one shuffle when
materializing), paid once and amortized over every subsequent join/agg on
that key.

Bucketed tables require the session catalog (saveAsTable), so these helpers
take a table name, not a path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 16,
                   sort: bool = True) -> None:
    """Materialize df hash-bucketed (and optionally sorted) by ``key``.
    Sorting within buckets additionally enables sort-merge joins without a
    per-task sort and better min/max skipping."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans SortMergeJoin with no Exchange on either
    side (assert via .explain — tested in tests/test_bucketing.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
