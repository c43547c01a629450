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


_op = st.one_of(
    st.tuples(st.just("merge"), _update_batch),
    st.tuples(st.just("delete"),
              st.lists(_KEYS, min_size=1, max_size=5, unique=True)),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("zorder"), st.none()),
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=4),
       lo=st.integers(0, 500), width=st.integers(0, 500))
def test_operation_mix_equals_dict_model(spark, tmp_path_factory, ops,
                                         lo, width):
    """ANY interleaving of merge/delete/compact/zorder behaves as the dict
    model; every committed version time-travels to its model snapshot; the
    stats-skipping read agrees with a plain model filter at every range."""
    from monday_etl_spark.tableformat import (
        compact_versioned,
        delete_versioned,
        optimize_zorder,
        read_where,
    )

    path = str(tmp_path_factory.mktemp("vtmix") / "tbl")
    model = {k: (k * 13) % 997 for k in range(20)}
    write_versioned(
        spark.createDataFrame(list(model.items()), "id bigint, v bigint"),
        path, key="id", n_buckets=4, stats_cols=["v"],
    )
    states = {1: dict(model)}

    for kind, arg in ops:
        if kind == "merge":
            v = merge_versioned(
                spark, path,
                spark.createDataFrame(list(arg.items()),
                                      "id bigint, v bigint"),
            )
            model.update(arg)
        elif kind == "delete":
            v = delete_versioned(
                spark, path,
                spark.createDataFrame([(k,) for k in arg], "id bigint"),
            )
            model = {k: x for k, x in model.items() if k not in arg}
        elif kind == "compact":
            v = compact_versioned(spark, path)
        else:
            v = optimize_zorder(spark, path, ["v"], files_per_bucket=2)
        states[v] = dict(model)  # compact/zorder: same rows, maybe same v

    for version, want in states.items():
        got = {r.id: r.v for r in read_version(spark, path, version).collect()}
        assert got == want, f"version {version} diverged"

    hi = lo + width
    got_rng = {r.id: r.v
               for r in read_where(spark, path, "v", lo, hi).collect()}
    want_rng = {k: x for k, x in model.items() if lo <= x <= hi}
    assert got_rng == want_rng
