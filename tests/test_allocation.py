"""mixture_token_allocation invariants: the largest-remainder property that
makes it usable — allocations are integers, within 1 of the exact quota,
and sum to the budget EXACTLY (no drift to reconcile downstream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from monday_etl_spark.queries.packing import (
    _MIX_BUDGET,
    mixture_token_allocation,
)


def test_allocations_sum_to_budget_exactly(spark):
    out = mixture_token_allocation(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert sum(r.alloc_tokens for r in rows) == _MIX_BUDGET
    # proportionality: larger sources never get fewer tokens (sqrt weights
    # are monotone in n_tokens, and largest-remainder preserves order up to
    # the +1 remainder unit)
    by_tokens = sorted(rows, key=lambda r: (r.n_tokens, r.source))
    for a, b in zip(by_tokens, by_tokens[1:]):
        assert b.alloc_tokens >= a.alloc_tokens - 1


def test_every_allocation_within_one_of_exact_quota(spark):
    out = mixture_token_allocation(spark, "/root/testdata/sf0.001")
    src = out.agg(
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("sw")
    ).collect()[0]
    for r in out.collect():
        exact = _MIX_BUDGET * (r.n_tokens ** 0.5) / src.sw
        assert abs(r.alloc_tokens - exact) < 1.0
