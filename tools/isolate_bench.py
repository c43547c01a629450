#!/usr/bin/env python
"""Isolated per-query timings — the noise separator for BENCH_DETAIL.json.

The full-suite bench times 120 queries back-to-back in one session; on this
host ambient GC/cache pressure can inflate an individual multi-second entry
2-3x over its true cost. This tool times the named queries (or the suite's
top-N from BENCH_DETAIL.json) one at a time in a quiet session: one untimed
sf0.001 warm per query, then best-of-2 at the target sf with a cache clear
between runs. The printed numbers are the queries' REAL costs; diffs against
BENCH_DETAIL.json quantify suite-position noise.

Usage: python tools/isolate_bench.py [query ...]   (default: top 12 by suite time)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from monday_etl_spark.queries import REGISTRY  # noqa: E402
from monday_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        detail = Path(__file__).resolve().parent.parent / "BENCH_DETAIL.json"
        suite = json.loads(detail.read_text())["queries"]
        names = [k for k, _ in sorted(suite.items(), key=lambda kv: -kv[1])[:12]]
    spark = get_spark("isolate-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        try:
            fn(spark, "/root/testdata/sf0.001").count()  # untimed codegen warm
            spark.catalog.clearCache()
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                e = time.perf_counter() - t0
                best = e if best is None else min(best, e)
                spark.catalog.clearCache()
            out[name] = round(best, 3)
            print(f"# {name}: {out[name]:.3f}s isolated", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
        spark.sparkContext._jvm.System.gc()
    print(json.dumps({"sf_dir": sf_dir, "isolated_best_of_2": out}))
    spark.stop()


if __name__ == "__main__":
    main()
