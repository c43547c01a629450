"""Grouped-aggregate pandas UDF: exact weighted median.

Spark has no built-in weighted median (``percentile``/``median`` are
unweighted), making this the honest use case for the GROUPED_AGG pandas
UDF surface — the one ``pandas_udf`` flavor the engine didn't already
exercise (GROUPED_MAP: grouped_zscore; SCALAR via mapInPandas: multimodal;
stateful: sessions). The group's columns arrive as whole Arrow-backed
Series; there is no partial aggregation, which is exactly right for a
holistic (non-decomposable) statistic like a median.

Determinism contract (shared with the DuckDB oracle): all arithmetic is
int64 — values and weights arrive as exact integer cents (produced by
``CAST(x AS DECIMAL(18,2)) * 100``), weights are summed per distinct value
in ascending value order, and the lower weighted median is the smallest
value whose cumulative weight w satisfies ``2*w >= total``. No float enters
until the final cents/100 division, so Spark and the oracle agree
bit-for-bit.

Scale: one shuffle on the group key, then one Arrow batch per group. A
group's DISTINCT-value footprint bounds memory (the UDF aggregates weights
per value first); for groups whose distinct-value cardinality itself
explodes, the move is a t-digest/quantile sketch — a different operator
with approximate semantics, deliberately not hidden behind this exact one.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_median_cents(value_cents: pd.Series, weight: pd.Series) -> float:
    """Lower weighted median of integer-cent values, returned in currency
    units. Empty/all-null groups yield None."""
    df = pd.DataFrame({"v": value_cents, "w": weight}).dropna()
    if df.empty:
        return None
    per_value = df.groupby("v")["w"].sum().sort_index()
    cum = per_value.cumsum()
    total = int(per_value.sum())
    return float(cum.index[(2 * cum >= total).values.argmax()]) / 100.0
