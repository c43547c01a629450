#!/usr/bin/env python
"""Scale-proportionality rehearsal for the suite's top-5 entries (r14,
VERDICT r13 "Next round #6"): the official sf0.1 bench is job-fixed-cost
bound (every 8c/32c ratio ~= 1), so the 100 TB story for the most
expensive queries needs one measured rung above it. For each query this
runs isolated best-of-2 timings at sf0.1 and at the 10x rehearsal data
(.scratch/sf1, tools/gen_scale_data.py) under 8 and 32 cores — four cells
per query, each in a FRESH subprocess so local[N] and the derived
shuffle-partition count are honest.

Reported per query: wall at each cell, data-scaling exponent
(log10(t_sf1/t_sf01) — 1.0 would be linear, ~0 flat/fixed-cost), and the
core-scaling ratio at sf1 (t_8c/t_32c — >1 means cores help once data
dominates).

Usage: python tools/topq_scale_rehearsal.py [query ...]
       (default: the five r13-verdict-named queries)
Env:   SPARK_GRAFT_SF1_DIR (default .scratch/sf1)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_QUERIES = [
    "semantic_dedup_auto",
    "streaming_stateful_sessions",
    "semantic_dedup",
    "streaming_interval_join",
    "dsir_importance_select",
]
WARM_SF = "/root/testdata/sf0.001"


def _run_cell(name: str, sf_dir: str, cpus: int, runs: int = 2) -> float:
    """One (query, sf, cpus) cell in this process: warm at sf0.001, then
    best-of-``runs`` full materializations."""
    from monday_etl_spark.queries import REGISTRY
    from monday_etl_spark.session import get_spark

    spark = get_spark(f"topq-rehearsal-{cpus}c")
    spark.sparkContext.setLogLevel("ERROR")
    fn = REGISTRY[name].fn
    fn(spark, WARM_SF).count()
    spark.catalog.clearCache()
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        e = time.perf_counter() - t0
        best = e if best is None else min(best, e)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    spark.stop()
    return round(best, 3)


def main() -> None:
    if len(sys.argv) > 3 and sys.argv[1] == "--cell":
        # child mode: --cell <query> <sf_dir>  (cpus from SPARK_GRAFT_CPUS)
        name, sf_dir = sys.argv[2], sys.argv[3]
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        print(json.dumps({"t": _run_cell(name, sf_dir, cpus)}))
        return

    names = sys.argv[1:] or DEFAULT_QUERIES
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR",
                         str(REPO / ".scratch" / "sf1"))
    if not os.path.isdir(sf1):
        raise SystemExit(f"no rehearsal data at {sf1} — run "
                         "tools/gen_scale_data.py first")
    out: dict[str, dict] = {}
    for name in names:
        row: dict[str, float] = {}
        for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                              ("sf1", sf1)):
            for cpus in (8, 32):
                env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--cell", name, sf_dir],
                    env=env, capture_output=True, text=True)
                key = f"{label}_{cpus}c"
                if proc.returncode != 0:
                    row[key] = None
                    sys.stderr.write(proc.stderr[-800:])
                else:
                    row[key] = json.loads(
                        proc.stdout.strip().splitlines()[-1])["t"]
                print(f"# {name} {key}: {row[key]}", file=sys.stderr)
        import math

        if row.get("sf1_32c") and row.get("sf0.1_32c"):
            row["data_exponent_32c"] = round(
                math.log10(row["sf1_32c"] / row["sf0.1_32c"]), 2)
        if row.get("sf1_8c") and row.get("sf1_32c"):
            row["core_ratio_sf1"] = round(row["sf1_8c"] / row["sf1_32c"], 2)
        out[name] = row
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
