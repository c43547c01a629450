"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and values
order-insensitively (columns sorted by name, rows sorted by their full value
tuple). Floats compare with a tiny absolute+relative tolerance locally — the
real driver hashes values, so queries are written to be bit-deterministic
(decimal-sum money, explicit casts); the tolerance here only guards against
printing noise while still catching real mismatches.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from monday_etl_spark.io import TABLES, table_path

ABS_TOL = 1e-6
REL_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm(v):
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if v is None:
        return ("z",)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm(x) for x in v))
    return ("s", str(v))


def _sort_key(row):
    out = []
    for tag, *rest in (_norm(v) for v in row):
        if tag == "f":
            out.append(("f", round(rest[0], 6) if not math.isnan(rest[0]) else "nan"))
        else:
            out.append((tag, *rest))
    return repr(out)


def _values_equal(a, b) -> bool:
    na, nb = _norm(a), _norm(b)
    ta, tb = na[0], nb[0]
    if {ta, tb} <= {"f", "i"} and ta != tb:  # int vs float numeric compare
        return float(a) == float(b)
    if ta != tb:
        return False
    if ta == "f":
        x, y = na[1], nb[1]
        if math.isnan(x) and math.isnan(y):
            return True
        return math.isclose(x, y, rel_tol=REL_TOL, abs_tol=ABS_TOL)
    return na == nb


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    """Raise AssertionError with a diff summary if spark result != oracle."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"[{name}] column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )

    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_proj = sorted(([r[i] for i in order] for r in s_rows), key=_sort_key)
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    d_proj = sorted(([r[i] for i in d_order] for r in d_rows), key=_sort_key)

    mismatches = []
    for idx, (sr, dr) in enumerate(zip(s_proj, d_proj)):
        for ci, (sv, dv) in enumerate(zip(sr, dr)):
            if not _values_equal(sv, dv):
                mismatches.append((idx, sorted(s_cols)[ci], sv, dv))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"[{name}] value mismatches (row, col, spark, duckdb): {mismatches}"
