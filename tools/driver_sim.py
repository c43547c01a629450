#!/usr/bin/env python
"""Local replica of the grading driver: runs every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB at sf0.01 (or argv[1]),
comparing with EXACT tuple equality (None-safe sorted). Exits non-zero on any
mismatch. Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from monday_etl_spark.io import TABLES, table_path  # noqa: E402
from monday_etl_spark.session import get_spark  # noqa: E402


def sort_key(row):
    return tuple((v is None, str(type(v)), v) for v in row)


def canon_cell(v):
    """Render a cell so that numeric *dtype* artifacts fail (DuckDB HUGEINT
    -> float64 '7949.0' vs Spark int64 '7949' — the r01 corpus_source_stats
    red row) while representation-only differences pass (datetime.date vs
    midnight Timestamp for the same DATE value)."""
    import datetime as _dt
    import math

    import numpy as _np
    import pandas as _pd

    if v is None or v is _pd.NaT:
        return "∅"
    if not isinstance(v, (list, _np.ndarray)):
        try:
            if _pd.isna(v):
                return "∅"
        except (TypeError, ValueError):
            pass
    if isinstance(v, (float, _np.floating)):
        if math.isnan(v):
            return "∅"
        return f"f:{float(v)!r}"
    if isinstance(v, (bool, _np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, _np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, _pd.Timestamp):
        if _pd.isna(v):
            return "∅"
        return f"t:{v.isoformat()}"
    if isinstance(v, _dt.datetime):
        return f"t:{_pd.Timestamp(v).isoformat()}"
    if isinstance(v, _dt.date):
        return f"t:{_pd.Timestamp(v).isoformat()}"
    # arrays/lists are unhashable in the driver's canonicalizer: fail loudly
    if isinstance(v, (list, _np.ndarray)):
        raise TypeError(
            f"unhashable array cell {type(v).__name__} — the grading driver "
            "would crash on this; emit a joined string or exploded rows"
        )
    return f"s:{v}"


def canon_strings(pdf):
    """Driver-faithful canonical form: columns sorted by name, every cell
    rendered via canon_cell, rows sorted."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False)
    ]
    rows.sort()
    return rows


def main() -> int:
    """Usage: driver_sim.py [sf_dir] [query_name ...] — with names given,
    checks only those queries (and skips the entry() smoke)."""
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    if not only:
        df = entrymod.entry(spark)
        n = len(df.collect())
        print(f"entry(): {n} rows, schema ok" if n > 0 else "entry(): EMPTY", flush=True)

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures: list[str] = []
    for name in sorted(only or qs):
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            srows = sorted(
                map(tuple, (r for r in sdf.itertuples(index=False))), key=sort_key
            )
            if name not in osql:
                print(f"{name}: rows-only ({len(srows)} rows)", flush=True)
                continue
            ddf = con.execute(osql[name]).df()
            drows = sorted(
                map(tuple, (r for r in ddf.itertuples(index=False))), key=sort_key
            )
            # driver-faithful check: canonical string rendering must match
            scanon, dcanon = canon_strings(sdf), canon_strings(ddf)
            if scanon == dcanon:
                print(f"{name}: rows={len(srows)} exact=True", flush=True)
            else:
                failures.append(name)
                print(f"{name}: MISMATCH spark={len(srows)} duck={len(drows)}", flush=True)
                s, d = set(scanon), set(dcanon)
                print("  spark-only:", sorted(s - d)[:3])
                print("  duck-only :", sorted(d - s)[:3])
                print("  spark dtypes:", dict(sdf.dtypes.astype(str)))
                print("  duck  dtypes:", dict(ddf.dtypes.astype(str)))
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: ERROR {str(ex)[:200]}", flush=True)

    print("FAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
