"""Property test: a chain of versioned merges equals a dict fold.

The model: a table is a {key: row} dict; merge_versioned must behave as
dict.update, for ANY update sequence — while every intermediate version
stays readable as its own dict state (time travel).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from monday_etl_spark.tableformat import (
    merge_versioned,
    read_version,
    write_versioned,
)

_KEYS = st.integers(min_value=0, max_value=40)
_update_batch = st.dictionaries(_KEYS, st.integers(0, 1_000), min_size=1, max_size=8)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(_update_batch, min_size=1, max_size=3))
def test_merge_chain_equals_dict_fold(spark, tmp_path_factory, batches):
    path = str(tmp_path_factory.mktemp("vt") / "tbl")
    base = {k: -1 for k in range(10)}
    write_versioned(
        spark.createDataFrame(list(base.items()), "id bigint, v bigint"),
        path, key="id", n_buckets=4,
    )

    model = dict(base)
    states = [dict(model)]  # model state at each committed version
    for batch in batches:
        merge_versioned(
            spark,
            path,
            spark.createDataFrame(list(batch.items()), "id bigint, v bigint"),
        )
        model.update(batch)
        states.append(dict(model))

    for version, want in enumerate(states, start=1):
        got = {r.id: r.v for r in read_version(spark, path, version).collect()}
        assert got == want, f"version {version} diverged from the dict fold"
