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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    df = entrymod.entry(spark)
    n = len(df.collect())
    print(f"entry(): {n} rows, schema ok" if n > 0 else "entry(): EMPTY", flush=True)

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures: list[str] = []
    for name in sorted(qs):
        try:
            srows = sorted(map(tuple, qs[name](spark, sf_dir).collect()), key=sort_key)
            if name not in osql:
                print(f"{name}: rows-only ({len(srows)} rows)", flush=True)
                continue
            drows = sorted(map(tuple, con.execute(osql[name]).fetchall()), key=sort_key)
            if srows == drows:
                print(f"{name}: rows={len(srows)} exact=True", flush=True)
            else:
                failures.append(name)
                print(f"{name}: MISMATCH spark={len(srows)} duck={len(drows)}", flush=True)
                s, d = set(srows), set(drows)
                print("  spark-only:", sorted(s - d, key=sort_key)[:3])
                print("  duck-only :", sorted(d - s, key=sort_key)[:3])
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: ERROR {str(ex)[:200]}", flush=True)

    print("FAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
