#!/usr/bin/env python
"""Scale rehearsal for the r14 write distribution (VERDICT r13 "What's
wrong #1"): the r13 ``repartition(n_buckets, bucket)`` hash distribution
capped write parallelism at the bucket count and serialized a hot bucket
onto one task. r14 replaces it with an AQE REBALANCE by the bucket column:
same clustering (one file per touched bucket in the common case), but an
oversized/hot bucket is SPLIT across write tasks in ~advisory-size chunks
(the scale-adaptive salt) and tiny buckets coalesce.

Scenario: a bulk ``write_versioned`` snapshot from a 64-partition writer,
16 buckets, two key distributions over the same row count:
  - uniform: keys spread evenly over the 16 buckets;
  - skewed:  ~50% of all rows share one hot key-range -> one hot bucket.

Legs per distribution:
  - none:       input-partitioned write (64 tasks x 16 buckets files);
  - plain-hash: the r13 layout, reconstructed via repartition(16, bucket)
                (what _distribute does when AQE is off);
  - rebalance:  the r14 default (_distribute with AQE on).

The advisory partition size is pinned small (4 MB) so the ~60 MB commit
reproduces the at-scale regime where buckets exceed the advisory size —
at the default 64 MB every bucket here fits one task and the three legs
tie on layout. Assertions in-tool: every leg commits the same row count,
and the rebalance leg's file count stays O(bytes/advisory), never
O(tasks x buckets).

Usage: python tools/write_distribution_rehearsal.py [n_rows]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from monday_etl_spark.session import get_spark  # noqa: E402
from monday_etl_spark.tableformat import (  # noqa: E402
    _read_manifest,
    current_version,
    read_version,
    write_versioned,
)

N_BUCKETS = 16
WRITER_TASKS = 64


def _rows(spark, n_rows: int, skewed: bool):
    """(key, payload) frame over WRITER_TASKS input partitions. ``skewed``
    routes half the rows into one bucket via a congruent key class."""
    df = spark.range(0, n_rows, 1, WRITER_TASKS)
    if skewed:
        # even ids -> key 0 mod (16*large): all land in ONE bucket;
        # odd ids keep their value: spread over all buckets
        key = F.when(F.col("id") % 2 == 0,
                     (F.col("id") % 997) * F.lit(N_BUCKETS) * 1024)\
            .otherwise(F.col("id"))
    else:
        key = F.col("id")
    return df.select(
        key.alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("body"),
        (F.col("id") % 1000003).alias("v"),
    )


def _leg(spark, df, distribution: str, aqe: str) -> dict:
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    root = tempfile.mkdtemp(prefix="wdist_rehearsal_")
    path = f"{root}/tbl"
    try:
        t0 = time.perf_counter()
        write_versioned(df, path, key="k", n_buckets=N_BUCKETS,
                        distribution=distribution)
        wall = time.perf_counter() - t0
        man = _read_manifest(path, current_version(path))
        files = sum(len(fs) for fs in man["buckets"].values())
        max_per_bucket = max(len(fs) for fs in man["buckets"].values())
        n = read_version(spark, path).count()
        return {"wall_s": round(wall, 2), "files": files,
                "max_files_per_bucket": max_per_bucket, "rows": n}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    spark = get_spark("write-distribution-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    # at-scale regime: buckets far exceed the advisory chunk -> rebalance
    # must split; 4 MB keeps the demo commit (~60 MB) in that regime
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    out: dict[str, dict] = {}
    for dist_label, skewed in (("uniform", False), ("skewed", True)):
        df = _rows(spark, n_rows, skewed)
        for leg, (distribution, aqe) in {
            "none": ("none", "true"),
            "plain_hash_r13": ("hash", "false"),  # AQE-off fallback = repartition(n_buckets)
            "rebalance_r14": ("hash", "true"),
        }.items():
            key = f"{dist_label}/{leg}"
            out[key] = _leg(spark, df, distribution, aqe)
            print(f"# {key}: {out[key]}", file=sys.stderr)

    rows = {v["rows"] for v in out.values() if "rows" in v}
    assert len(rows) == 1, f"legs disagree on committed rows: {rows}"
    for dist_label in ("uniform", "skewed"):
        reb = out[f"{dist_label}/rebalance_r14"]
        none = out[f"{dist_label}/none"]
        assert reb["files"] < none["files"], (
            f"{dist_label}: rebalance files {reb['files']} not below "
            f"input-partitioned {none['files']}"
        )
    print(json.dumps({"n_rows": n_rows, "n_buckets": N_BUCKETS,
                      "writer_tasks": WRITER_TASKS,
                      "advisory": "4m", "legs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
