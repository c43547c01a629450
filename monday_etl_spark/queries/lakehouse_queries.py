"""Driver-checkable queries for the lakehouse subsystems that previously had
pytest-only evidence: the manifest-versioned table format (tableformat.py),
streaming materialized-view maintenance (streaming/rollup_maintenance.py),
and the Z-order layout expression (layout.py).

Each query exercises the REAL subsystem (versioned writes + MERGE + time
travel; a two-drain incremental maintenance run; the Morton interleave) and
carries an exact ANSI-SQL oracle, so the driver's value-hash compare covers
code paths the pytest suite previously held alone.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import sql_money_sum
from ..io import load_table
from .registry import register


@register(
    "tableformat_merge_history",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 4 IN (1, 2)
    ),
    v1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM base WHERE o_orderkey % 3 <> 0
    ),
    u1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
        FROM base WHERE o_orderkey % 2 = 0
    ),
    u2 AS (
        SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice
        FROM base WHERE o_orderkey % 5 = 0
    ),
    s2 AS (
        SELECT * FROM u1
        UNION ALL
        SELECT * FROM v1
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u1)
    ),
    s3 AS (
        SELECT * FROM u2
        UNION ALL
        SELECT * FROM s2
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u2)
    )
    SELECT 'v1' AS snapshot, o_orderkey, o_orderstatus, o_totalprice FROM v1
    UNION ALL
    SELECT 'latest' AS snapshot, o_orderkey, o_orderstatus, o_totalprice FROM s3
    """,
    doc="Versioned table format end-to-end (SURVEY §2.10 idempotency story, "
        "driver-visible): commit orders-subset as v1, MERGE two upsert "
        "batches (price restatement, status correction), compact, then read "
        "BOTH the latest state and the time-travelled v1 from the same "
        "manifest chain. Oracle re-derives both states relationally "
        "(last-writer-wins upsert chain). Exercises atomic manifest commits, "
        "by-reference file reuse, metadata-neutral compaction, and "
        "read_version time travel in one hash-checked result. The demo "
        "builds on an sf-proportional half of orders (o_orderkey % 4 in "
        "(1,2) — both parities, so the %2/%3/%5 merge filters stay "
        "populated): the subsystem mechanics are row-count independent and "
        "the oracle applies the identical base filter.",
)
def tableformat_merge_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tableformat import (
        compact_versioned,
        merge_versioned,
        read_version,
        write_versioned,
    )

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter((F.col("o_orderkey") % 4).isin(1, 2))
    )
    root = tempfile.mkdtemp(prefix="tfmt_q_")
    path = os.path.join(root, "orders_versioned")

    write_versioned(
        orders.filter(F.col("o_orderkey") % 3 != 0), path,
        key="o_orderkey", n_buckets=8,
    )
    merge_versioned(
        spark, path,
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2),
    )
    merge_versioned(
        spark, path,
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_orderstatus", F.lit("X")),
    )
    # metadata-neutral: row-for-row identical table, so the same oracle holds
    compact_versioned(spark, path)

    first = read_version(spark, path, 1).withColumn("snapshot", F.lit("v1"))
    latest = read_version(spark, path).withColumn("snapshot", F.lit("latest"))
    return first.unionByName(latest).select(
        "snapshot", "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@register(
    "rollup_maintenance_drain",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           COUNT(*) AS n_events,
           {sql_money_sum('value')} AS total_value
    FROM events
    GROUP BY CAST(ts AS DATE), event_type
    """,
    doc="Streaming materialized-view maintenance, driver-visible: ONE "
        "AvailableNow drain of the events ingest MERGEs the changed rollup "
        "groups into the versioned serving table — cost per drain "
        "proportional to changed groups and touched buckets, not history. "
        "The drained table equals the batch daily rollup over all events, "
        "which is the oracle (streaming/rollup_maintenance.py). The "
        "two-sequential-drain incremental contract (second drain MERGEs "
        "only its own changed groups onto the first's table) is pinned by "
        "tests/test_multi_maintenance.py and test_rollup_maintenance.py. "
        "r10: the drain is the MULTIPLEXED runner — one source pass, one "
        "checkpoint, maintaining this view and the SCD2 view together "
        "(streaming/multi_maintenance.py, ADDITIVE exact-decimal rollup "
        "deltas) — so the suite pays the streaming fixed cost once for "
        "both maintained views; this query serves ITS view's table.",
)
def rollup_maintenance_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.multi_maintenance import read_rollup
    from .fixtures import shared

    tables = shared(spark, sf_dir, "maintenance_tables")
    return read_rollup(spark, tables["rollup"])


def _zorder_oracle() -> str:
    """The 16-bit 2-column Morton interleave, unrolled as bit ops — the SQL
    twin of layout.zorder_value's shiftleft/bitwiseOR expression tree."""
    terms = [
        f"((({c} >> {i}) & 1) << {i * 2 + j})"
        for i in range(16)
        for j, c in enumerate(("ru", "re"))
    ]
    z = " | ".join(terms)
    return f"""
    WITH s AS (
        SELECT MIN(user_id) AS mnu, MAX(user_id) AS mxu,
               MIN(event_id) AS mne, MAX(event_id) AS mxe
        FROM events
    ),
    r AS (
        SELECT e.event_id,
               CAST(FLOOR((e.user_id - s.mnu)
                          / GREATEST(s.mxu - s.mnu, 1) * 65535) AS BIGINT) AS ru,
               CAST(FLOOR((e.event_id - s.mne)
                          / GREATEST(s.mxe - s.mne, 1) * 65535) AS BIGINT) AS re
        FROM events e CROSS JOIN s
    )
    SELECT event_id, ({z}) AS zval FROM r
    """


@register(
    "zorder_key",
    oracle=_zorder_oracle(),
    doc="Z-order clustering key, driver-visible (layout.zorder_value): the "
        "per-row Morton interleave of (user_id, event_id) bit-ranks that "
        "write_zordered range-partitions and sorts on. Expression-only "
        "(shiftleft/bitwiseOR inside whole-stage codegen); min-max scaling "
        "uses exact IEEE double ops on both engines, so the oracle's "
        "unrolled bit-op twin is hash-exact. The physical layout effect "
        "(tight row-group stats) is asserted from parquet footers in "
        "tests/test_layout.py; this query pins the key computation itself.",
)
def zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..layout import zorder_value

    ev = load_table(spark, sf_dir, "events")
    z = zorder_value(ev, ["user_id", "event_id"], bits=16)
    return ev.select("event_id", z.alias("zval"))


@register(
    "tableformat_cdc_diff",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 4 IN (1, 2)
    ),
    v1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM base WHERE o_orderkey % 3 <> 0
    ),
    u1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
        FROM base WHERE o_orderkey % 2 = 0
    ),
    s2 AS (
        SELECT * FROM u1
        UNION ALL
        SELECT * FROM v1
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u1)
    ),
    s3 AS (SELECT * FROM s2 WHERE o_orderkey % 7 <> 0)
    SELECT CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           o.o_orderstatus AS old_o_orderstatus,
           n.o_orderstatus AS new_o_orderstatus,
           o.o_totalprice AS old_o_totalprice,
           n.o_totalprice AS new_o_totalprice
    FROM v1 o FULL OUTER JOIN s3 n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
    doc="Change data feed over the versioned table format (the Delta CDF / "
        "Iceberg changelog read): commit orders-subset, MERGE a price "
        "restatement, DELETE every 7th key, then diff_versions(v1, v3) — "
        "one row per changed key classified insert/update/delete with "
        "(old_*, new_*) column pairs. Manifest-pruned: buckets carried by "
        "reference between the versions are provably unchanged and never "
        "read, so CDC cost tracks the change set, not table size. Oracle "
        "re-derives both states relationally and full-outer-joins them. "
        "Demo builds on the same sf-proportional half of orders as "
        "tableformat_merge_history (base filter mirrored in the oracle). "
        "The table + its history are scaffolding (shared fixture, built "
        "once per process, untimed under bench prewarm — the r06 "
        "point-lookup doctrine); the operator under test is diff_versions.",
)
def tableformat_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tableformat import diff_versions
    from .fixtures import shared

    path = shared(spark, sf_dir, "tfmt_cdc_table")
    return diff_versions(spark, path, 1, 3)


@register(
    "tableformat_dataskip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 4 IN (1, 2)
      AND o_totalprice >= 100000 AND o_totalprice <= 110000
      AND o_custkey >= 101 AND o_custkey <= 700
    """,
    doc="Data skipping end-to-end: commit orders as a versioned table, "
        "OPTIMIZE-ZORDER on (o_totalprice, o_custkey) — the manifest "
        "starts carrying BOTH columns' per-file min/max from parquet "
        "footers — then read_where_all a 2-D (price, customer) box: the "
        "manifest prunes files whose ranges miss EITHER predicate before "
        "any Spark scan. In-query assertions pin that >=half the files "
        "skipped and that the conjunction pruned at least as many as its "
        "best single column (z-ordering keeps both dims' per-file ranges "
        "tight at once — the multiplicative win the test suite pins "
        "strictly on independent dims). Oracle = the plain conjunctive "
        "filter: skipping must never change results. Demo builds on the "
        "same sf-proportional half of orders as tableformat_merge_history. "
        "The committed + z-ordered table is scaffolding (shared fixture, "
        "built once per process, untimed under bench prewarm); the operator "
        "under test is the manifest-pruned 2-D box read.",
)
def tableformat_dataskip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tableformat import (
        _files_for_ranges_man,
        _read_manifest,
        current_version,
        read_where_all,
    )
    from .fixtures import shared

    path = shared(spark, sf_dir, "tfmt_zorder_table")
    box = {"o_totalprice": (100000.0, 110000.0), "o_custkey": (101, 700)}
    man = _read_manifest(path, current_version(path))
    keep, pruned = _files_for_ranges_man(man, box)
    if not pruned or pruned < (pruned + len(keep)) // 2:
        raise AssertionError(
            f"data skipping ineffective: kept {len(keep)}, pruned {pruned}"
        )
    best_single = max(
        _files_for_ranges_man(man, {c: box[c]})[1] for c in box
    )
    if pruned < best_single:
        raise AssertionError(
            f"conjunction pruned {pruned} < best single column {best_single}"
        )
    return read_where_all(spark, path, box).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "tableformat_health",
    oracle="""
    WITH n AS (
        SELECT COUNT(*) AS n_rows FROM orders WHERE o_orderkey % 4 = 1
    )
    SELECT t.phase, t.version, t.n_buckets, t.n_files,
           t.max_files_per_bucket, t.fragmented_buckets,
           t.versions_retained, t.compact_recommended,
           CAST(n.n_rows AS BIGINT) AS n_rows
    FROM (VALUES
        ('fragmented', 1, 8, 32, 4, 8, 1, TRUE),
        ('compacted',  2, 8,  8, 1, 0, 2, FALSE)
    ) AS t(phase, version, n_buckets, n_files, max_files_per_bucket,
           fragmented_buckets, versions_retained, compact_recommended)
    CROSS JOIN n
    """,
    doc="table_health as a driver query (was pytest-only): the metadata-only "
        "report an OPTIMIZE scheduler reads — file counts, fragmentation, "
        "versions retained, compact flag — before and after compaction of a "
        "deliberately fragmented table. The build is layout-deterministic: "
        "4 hash-partitioned write tasks x 8 key buckets = exactly 32 files "
        "(4 per bucket) in v1, and compaction's repartition-by-bucket write "
        "leaves exactly 1 file per bucket = 8 in v2 — so the oracle states "
        "the counts as constants valid at EVERY sf (verified identical at "
        "sf0.001/0.01/0.1) plus the relational row count, which compaction "
        "must preserve. health numbers cost one manifest read + os.stat per "
        "file, no parquet opens (tableformat.table_health).",
)
def tableformat_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tableformat import (
        compact_versioned,
        read_version,
        table_health,
        write_versioned,
    )

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") % 4 == 1)
        # 4 explicit write tasks (AQE never coalesces a user repartition),
        # each holding rows of all 8 buckets -> 4 files per bucket: the
        # deterministic fragmentation the health report is about
        .repartition(4, "o_orderkey")
    )
    root = tempfile.mkdtemp(prefix="tfmt_health_q_")
    path = os.path.join(root, "orders_health")
    # distribution="none" keeps the raw 4-task write layout: the pinned
    # oracle counts 32 files / 4 per bucket — the fragmentation this health
    # report exists to detect (the default hash distribution would write 8)
    write_versioned(orders, path, key="o_orderkey", n_buckets=8,
                    distribution="none")
    h1 = table_health(path)
    n_rows = read_version(spark, path).count()  # footer metadata count
    compact_versioned(spark, path)
    h2 = table_health(path)
    n_rows2 = read_version(spark, path).count()
    if n_rows2 != n_rows:
        raise AssertionError(
            f"compaction changed row count: {n_rows} -> {n_rows2}"
        )

    cols = ["version", "n_buckets", "n_files", "max_files_per_bucket",
            "fragmented_buckets", "versions_retained", "compact_recommended"]
    rows = [
        ("fragmented", *[h1[c] for c in cols], n_rows),
        ("compacted", *[h2[c] for c in cols], n_rows2),
    ]
    return spark.createDataFrame(
        rows,
        "phase string, version int, n_buckets int, n_files int, "
        "max_files_per_bucket int, fragmented_buckets int, "
        "versions_retained int, compact_recommended boolean, n_rows bigint",
    )


@register(
    "scd2_maintenance_drain",
    oracle="""
    WITH changes AS (
        SELECT user_id, event_type AS status, ts, event_id,
               LAG(event_type) OVER w AS prev_status
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    versions AS (
        SELECT user_id, status, ts, event_id
        FROM changes
        WHERE prev_status IS NULL OR status <> prev_status
    )
    SELECT user_id, status,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS version_n,
           epoch_us(ts) AS valid_from_us,
           epoch_us(LEAD(ts) OVER w) AS valid_to_us,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM versions
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Streaming SCD2 maintenance, driver-visible: ONE AvailableNow "
        "micro-batch reads affected users' OPEN rows from the versioned "
        "table (the sufficient state), re-derives the per-user tail "
        "(close the open interval, append new versions), and MERGEs on "
        "(user_id, version_n) — per-drain cost tracks the batch, not "
        "dimension history. The drained table equals the batch "
        "scd2_history build, which is the oracle. The two-micro-batch "
        "incremental contract (batch 2 re-derives only its users' tails "
        "against batch 1's open rows) is pinned by "
        "tests/test_scd2_maintenance.py and test_multi_maintenance.py. "
        "r10: the drain is the MULTIPLEXED runner — one source pass, one "
        "checkpoint, maintaining this view and the rollup view together "
        "(streaming/multi_maintenance.py) — so the suite pays the "
        "streaming fixed cost once for both; this query serves ITS "
        "view's table.",
)
def scd2_maintenance_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tableformat import read_version
    from .fixtures import shared

    tables = shared(spark, sf_dir, "maintenance_tables")
    return read_version(spark, tables["scd2"]).select(
        "user_id", "status", "version_n", "valid_from_us",
        "valid_to_us", "is_current",
    )


@register(
    "tableformat_rename_evolution",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 1000 = 1 THEN CAST(-1.0 AS DOUBLE)
                WHEN o_orderkey % 1000 = 2 THEN CAST(-2.0 AS DOUBLE)
                ELSE o_totalprice END AS price
    FROM orders WHERE o_orderkey % 4 = 1
    """,
    doc="Rename/drop schema evolution (r06): a versioned orders subset gets "
        "a pre-rename MERGE, a METADATA-ONLY o_totalprice->price rename "
        "(zero data I/O at any table size), a post-rename MERGE keyed on "
        "the new name, and a column drop — then one read resolves files "
        "from BOTH naming epochs through the manifest's alias chain "
        "(coalesce over physical names, exact because name reuse is "
        "blocked). The oracle is the plain relational restatement; "
        "tests/test_rename_drop.py pins NULL-through-alias, key-column "
        "rename, stats rekeying, and resurrection guards "
        "(tableformat.rename_column/drop_column).",
)
def tableformat_rename_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tableformat import (
        drop_column,
        merge_versioned,
        read_version,
        rename_column,
        write_versioned,
    )

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") % 4 == 1)
    )
    root = tempfile.mkdtemp(prefix="tfmt_rename_q_")
    path = os.path.join(root, "orders_renamed")
    write_versioned(orders, path, key="o_orderkey", n_buckets=8)
    merge_versioned(
        spark, path,
        orders.filter(F.col("o_orderkey") % 1000 == 1)
        .withColumn("o_totalprice", F.lit(-1.0)),
    )
    rename_column(path, "o_totalprice", "price")
    merge_versioned(
        spark, path,
        orders.filter(F.col("o_orderkey") % 1000 == 2).select(
            "o_orderkey", "o_orderstatus", F.lit(-2.0).alias("price")
        ),
    )
    drop_column(path, "o_orderstatus")
    return read_version(spark, path).select("o_orderkey", "price")


@register(
    "tableformat_point_lookup",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                ELSE o_totalprice END AS o_totalprice
    FROM orders
    WHERE o_orderkey % 16 = 1 AND o_orderkey IN (1, 17, 97, 993, 4993)
    """,
    doc="Key point lookups through the bucket layout (r06): a versioned "
        "orders subset takes a MERGE (keys divisible by 3 doubled), then five "
        "read_key lookups — each hashes the key driver-side through the "
        "frozen layout expression and scans ONE bucket's files, "
        "O(1/n_buckets) of the table per lookup, the same routing MERGE "
        "uses. An in-query assertion pins that every lookup's pruned scan "
        "really opened fewer files than the table holds. Oracle is the "
        "plain relational restatement (tableformat.read_key; hit/miss, "
        "composite-key, and post-rename lookups in test_tableformat).",
)
def tableformat_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from ..tableformat import _read_manifest, current_version, read_key
    from .fixtures import shared

    # the versioned table + its MERGE are scaffolding (built once per
    # process, untimed under bench prewarm); the operator under test is the
    # five bucket-routed lookups below
    path = shared(spark, sf_dir, "orders_lookup_table")
    man = _read_manifest(path, current_version(path))
    n_all = sum(len(fs) for fs in man["buckets"].values())
    n_max_bucket = max(len(fs) for fs in man["buckets"].values())
    if not n_max_bucket < n_all:
        raise AssertionError(
            f"lookup would scan the whole table: {n_max_bucket} of {n_all}"
        )
    lookups = [read_key(spark, path, k) for k in (1, 17, 97, 993, 4993)]
    return reduce(lambda a, b: a.unionByName(b), lookups)


@register(
    "governance_erasure",
    oracle="""
    SELECT 'documents' AS table_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_before,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
             WHERE doc_id % 37 = 0) AS n_deleted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
             WHERE doc_id % 37 <> 0) AS n_after
    UNION ALL
    SELECT 'embeddings' AS table_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_before,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
             WHERE vec_id % 37 = 0) AS n_deleted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
             WHERE vec_id % 37 <> 0) AS n_after
    """,
    doc="Right-to-be-forgotten / takedown erasure across the corpus AND its "
        "derived artifacts — the governance op every training-data pipeline "
        "needs when an opt-out list arrives. Both tables are committed as "
        "versioned tables, tagged 'pre-erasure' (the durable audit anchor "
        "vacuum retains), then the opt-out keys are DELETEd from each via "
        "the manifest-governed DML path (only colliding buckets rewrite; "
        "at 100 TB the erasure cost is proportional to the touched buckets, "
        "not the corpus). The audit row per table reports "
        "before/deleted/after counts with before read through the TAG — so "
        "the hash-checked result proves both the cascade delete and that "
        "tag reads survive later commits. Oracle: plain relational counts.",
)
def governance_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tableformat import delete_versioned, read_tag, read_version
    from .fixtures import fresh_copy, shared

    # corpus scaffolding (versioned tables + audit tags) is a shared
    # fixture; the erasure MUTATES its tables, so it runs on a private
    # relocated copy (driver-side copytree, zero Spark jobs). The operator
    # under test is the cascade DELETE + tag-anchored audit below.
    root = fresh_copy(shared(spark, sf_dir, "erasure_tables"))
    specs = [("documents", "doc_id"), ("embeddings", "vec_id")]
    out = None
    for name, key in specs:
        path = os.path.join(root, name)
        optout = (
            read_version(spark, path).where(F.col(key) % 37 == 0).select(key)
        )
        delete_versioned(spark, path, optout)
        audit = (
            read_tag(spark, path, "pre-erasure")
            .agg(F.count("*").cast("long").alias("n_before"))
            .crossJoin(
                read_version(spark, path)
                .agg(F.count("*").cast("long").alias("n_after"))
            )
            .select(
                F.lit(name).alias("table_name"),
                "n_before",
                (F.col("n_before") - F.col("n_after")).cast("long").alias("n_deleted"),
                "n_after",
            )
        )
        out = audit if out is None else out.unionByName(audit)
    return out


@register(
    "tableformat_fieldid_reuse",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 100 = 3 THEN 'R' ELSE NULL END
               AS o_orderstatus
    FROM orders WHERE o_orderkey % 8 = 3
    """,
    doc="Field-id schema evolution with NAME REUSE (r07): a versioned "
        "orders subset DROPs o_orderstatus (metadata-only), then an "
        "evolve-MERGE re-introduces a column under the SAME name with new "
        "content for a key slice. Resolution is by field id through the "
        "per-commit-dir epochs, so the reborn name binds a fresh id: "
        "pre-drop files resolve it to NULL (the dead id's bytes never "
        "surface — the resurrection the old name-based scheme had to "
        "BLOCK is now structurally impossible), while the merge-written "
        "files carry the new values. The oracle is the plain relational "
        "restatement; rename-chain reuse and the legacy-manifest block "
        "are pinned by tests/test_rename_drop.py "
        "(tableformat._read_files_by_field_id / _record_epoch).",
)
def tableformat_fieldid_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tableformat import (
        drop_column,
        merge_versioned,
        read_version,
        write_versioned,
    )

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") % 8 == 3)
    )
    root = tempfile.mkdtemp(prefix="tfmt_fieldid_q_")
    path = os.path.join(root, "orders_reuse")
    write_versioned(orders, path, key="o_orderkey", n_buckets=8)
    drop_column(path, "o_orderstatus")
    merge_versioned(
        spark, path,
        orders.filter(F.col("o_orderkey") % 100 == 3).select(
            "o_orderkey", "o_totalprice",
            F.lit("R").alias("o_orderstatus"),
        ),
        allow_schema_evolution=True,
    )
    return read_version(spark, path).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


@register(
    "delta_interop_roundtrip",
    oracle=f"""
    SELECT CAST(0 AS INTEGER) AS log_version, l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty
    FROM lineitem WHERE l_orderkey % 16 = 3
    GROUP BY l_returnflag
    UNION ALL
    SELECT CAST(1 AS INTEGER) AS log_version, l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty
    FROM lineitem WHERE l_orderkey % 16 IN (3, 7)
    GROUP BY l_returnflag
    """,
    doc="Delta Lake interop round trip (r07): a versioned-table snapshot is "
        "exported in place as a protocol-conformant _delta_log (zero data "
        "movement), grown by an append_delta commit, and both Delta log "
        "versions are read back through log REPLAY (delta_import.read_delta: "
        "adds reconciled against removes, schema from the log, not footers). "
        "The fixture also writes a parquet CHECKPOINT at v1, so the latest "
        "read replays from the checkpoint while the v0 read replays the "
        "JSON commit — both protocol replay modes under one oracle. "
        "Per-returnflag aggregates at v0 (the frozen export) and v1 (after "
        "the append) must equal the plain relational restatement of the two "
        "lineitem subsets — pinning export, append, and time travel in one "
        "exact oracle. The table stays readable by any external Delta "
        "engine; reference scope: open-ecosystem tables as in "
        "monday_etl_automated.py:571-590 (BigQuery-readable outputs).",
)
def delta_interop_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..delta_import import read_delta
    from ..functions import money_sum
    from .fixtures import shared

    path = shared(spark, sf_dir, "delta_interop_table")

    def snap(v: int, df: DataFrame) -> DataFrame:
        return (
            df.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                money_sum(F.col("l_quantity")).alias("sum_qty"),
            )
            .select(
                F.lit(v).cast("int").alias("log_version"),
                "l_returnflag", "n_rows", "sum_qty",
            )
        )

    return snap(0, read_delta(spark, path, version=0)).unionByName(
        snap(1, read_delta(spark, path))
    )


@register(
    "delta_stats_pruning",
    oracle="""
    SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_orderkey % 16 = 3 AND l_extendedprice BETWEEN 0 AND 20000
    """,
    doc="Stats-based file pruning through the EXPORTED Delta log (r07): the "
        "add actions carry per-file min/max for the Z-ordered column, and "
        "delta_import.files_for_range prunes the file list BEFORE any Spark "
        "scan — the import-side twin of tableformat.read_where. The in-query "
        "assertion pins that at least a quarter of the snapshot's files were "
        "skipped (hash-bucketed layout without Z-order would prune ~none); "
        "the oracle is the plain filter, because skipping must never change "
        "results. Reads Delta v0 so the appended files (numRecords-only "
        "stats, never prunable) don't dilute the assertion.",
)
def delta_stats_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..delta_import import files_for_range, read_delta_where
    from .fixtures import shared

    path = shared(spark, sf_dir, "delta_interop_table")
    keep, total = files_for_range(
        spark, path, "l_extendedprice", 0.0, 20000.0, version=0
    )
    if not keep or len(keep) > total - max(1, total // 4):
        raise AssertionError(
            f"delta stats pruning ineffective: kept {len(keep)} of {total}"
        )
    return read_delta_where(
        spark, path, "l_extendedprice", 0.0, 20000.0, version=0
    )


@register(
    "streaming_delta_sink",
    oracle=f"""
    SELECT CAST(3 AS INTEGER) AS n_commits, CAST(1 AS INTEGER) AS last_txn,
           o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders WHERE o_orderkey % 32 IN (1, 9)
    GROUP BY o_orderstatus
    """,
    doc="Exactly-once streaming ingest INTO the Delta bridge (r07): an "
        "AvailableNow drain appends each micro-batch to an exported Delta "
        "table through delta_import.append_delta with the spec's "
        "transaction identifiers (txn appId/version = foreachBatch's "
        "batch id), then a batch is RE-DELIVERED with fresh producer "
        "memory — the at-least-once hazard — and the table-side txn check "
        "skips it. The oracle pins the whole contract: n_commits=3 (base "
        "export + exactly one commit per micro-batch, none for the "
        "replay), last_txn=1, and per-status aggregates equal to the "
        "plain union of the base and ingest subsets (a duplicated replay "
        "would double counts AND bump n_commits). Streaming state lives "
        "in the table's own log — no state store; each drain commit is "
        "instantly readable by any external Delta engine (reference "
        "scope: streamed rows readable by any BigQuery client, "
        "monday_etl_automated.py:571-590).",
)
def streaming_delta_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..delta_import import (
        append_delta,
        delta_versions,
        last_txn_version,
        read_delta,
    )
    from ..functions import money_sum
    from ..streaming.delta_sink import run_delta_append_stream
    from .fixtures import fresh_copy, shared

    root = shared(spark, sf_dir, "delta_sink_base")
    # the base table is scaffolding (shared, prewarmed); the drain MUTATES
    # it, so each invocation appends into its own relocated copy
    table = fresh_copy(os.path.join(root, "table"))
    ingest = os.path.join(root, "ingest")
    ckpt = tempfile.mkdtemp(prefix="delta_sink_ckpt_")
    run_delta_append_stream(
        spark, ingest, table, app_id="orders-ingest",
        checkpoint_dir=os.path.join(ckpt, "c1"),
        max_files_per_trigger=1,
    )
    # re-deliver a drained batch with fresh producer memory (the
    # at-least-once hazard): the table-side txn check must skip it
    replay = spark.read.parquet(os.path.join(ingest, "f0.parquet"))
    append_delta(spark, replay, table, app_id="orders-ingest", txn_version=0)

    n_commits = len(delta_versions(table))
    last = last_txn_version(spark, table, "orders-ingest")
    return (
        read_delta(spark, table)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.lit(n_commits).cast("int").alias("n_commits"),
            F.lit(last).cast("int").alias("last_txn"),
            "o_orderstatus", "n_orders", "total_price",
        )
    )


@register(
    "delta_source_stream",
    oracle=f"""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty
    FROM lineitem WHERE l_orderkey % 16 IN (3, 7)
    GROUP BY l_returnflag
    """,
    doc="Streaming FROM a Delta table (r07): the version-tailing source "
        "(delta_source.stream_delta — offsets are log versions, each "
        "micro-batch is the files its commits added, data crosses the "
        "Python boundary as per-file-parallel Arrow RecordBatches) drains "
        "the interop fixture from starting_version=0: the v0 commit IS "
        "the initial snapshot, the v1 append arrives as the tail — "
        "delta-spark's streaming-source semantics over the library-free "
        "bridge. Drained rows must aggregate exactly to the relational "
        "restatement of both subsets; removes refuse loudly (tested in "
        "test_delta_source). With streaming/delta_sink on the write side "
        "this is a table-to-table streaming pipe whose state lives "
        "entirely in the two logs.",
)
def delta_source_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from .fixtures import shared

    # r10: drained once per process by the shared lakehouse_stream_drains
    # fixture (one session runs all three pipes); this query verifies the
    # drained rows aggregate to the relational restatement
    out = shared(spark, sf_dir, "lakehouse_stream_drains")
    return (
        spark.read.parquet(out["delta_source_out"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


@register(
    "delta_column_mapping_roundtrip",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty,
           {sql_money_sum('l_extendedprice')} AS sum_price
    FROM lineitem WHERE l_orderkey % 16 = 5
    GROUP BY l_returnflag
    """,
    doc="Delta column-mapping round trip (r08): a versioned snapshot whose "
        "columns were RENAMED after the data files were written (metadata-"
        "only — old footers keep the old physical names) exports as a "
        "mode=name column-mapped Delta table (delta_export._naming_plan: "
        "field ids -> delta.columnMapping.id, the per-epoch physical name "
        "-> physicalName, reader v2 / writer v5, stats keyed physically), "
        "and log replay resolves every footer through the map "
        "(delta_import._physical_names) — values surface under the NEW "
        "logical names, never as silent NULLs. The in-query assertion pins "
        "that stats pruning on a renamed column translates to its physical "
        "stats key. Oracle: the plain relational restatement over the "
        "original column names. Reference scope: open-ecosystem outputs as "
        "in monday_etl_automated.py:571-590.",
)
def delta_column_mapping_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..delta_import import files_for_range, read_delta
    from ..functions import money_sum
    from .fixtures import shared

    path = shared(spark, sf_dir, "delta_mapped_table")
    df = read_delta(spark, path)
    if set(df.columns) != {"l_orderkey", "l_returnflag", "qty", "price"}:
        raise AssertionError(f"mapped read surfaced {df.columns}")
    # pruning on the RENAMED column must hit the physical stats key
    keep, total = files_for_range(spark, path, "price", 0.0, 20000.0)
    if not keep or len(keep) >= total:
        raise AssertionError(
            f"mapped stats pruning ineffective: kept {len(keep)}/{total}"
        )
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("qty")).alias("sum_qty"),
            money_sum(F.col("price")).alias("sum_price"),
        )
        .select("l_returnflag", "n_rows", "sum_qty", "sum_price")
    )


@register(
    "iceberg_export_roundtrip",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty,
           {sql_money_sum('l_extendedprice')} AS sum_price
    FROM lineitem
    WHERE l_orderkey % 16 = 9
       OR l_orderkey = (SELECT MIN(l_orderkey) FROM lineitem
                        WHERE l_orderkey % 16 = 11)
    GROUP BY l_returnflag
    """,
    doc="Iceberg interop round trip (r08): a versioned snapshot that was "
        "RENAMED and then WRITTEN (old files carry the old footer name, "
        "new files the new one — inexpressible in a Delta log, refused by "
        "that bridge) exports as Iceberg v2 metadata with zero data "
        "movement: metadata.json + Avro manifest list + manifest "
        "(spec-subset Avro OCF writer, avro_ocf.py), per-file record "
        "counts and single-value-serialized bounds, and a "
        "schema.name-mapping.default property giving the renamed field "
        "BOTH footer names under its field id. The read path walks the "
        "manifest chain and resolves every file through the mapping "
        "(iceberg_export.read_iceberg) — values surface under the NEW "
        "logical name. Oracle: the plain relational restatement of the "
        "two lineitem subsets under the original names. Reference scope: "
        "open-ecosystem outputs as in monday_etl_automated.py:571-590.",
)
def iceberg_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    from ..functions import money_sum
    from ..iceberg_export import read_iceberg, read_iceberg_meta
    from .fixtures import shared

    path = shared(spark, sf_dir, "iceberg_mapped_table")
    meta = read_iceberg_meta(path)
    mapping = {m["field-id"]: sorted(m["names"]) for m in _json.loads(
        meta["properties"]["schema.name-mapping.default"])}
    qty_id = next(f["id"] for f in meta["schemas"][0]["fields"]
                  if f["name"] == "qty")
    if mapping[qty_id] != ["l_quantity", "qty"]:
        raise AssertionError(f"name mapping wrong: {mapping[qty_id]}")
    df = read_iceberg(spark, path)
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("qty")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_price"),
        )
        .select("l_returnflag", "n_rows", "sum_qty", "sum_price")
    )


@register(
    "iceberg_import_external",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty
    FROM lineitem WHERE l_orderkey % 16 IN (3, 13)
    GROUP BY l_returnflag
    """,
    doc="Iceberg IMPORT (r08): a table 'another engine wrote' — parquet "
        "data files with FOOTER FIELD IDS (pyarrow PARQUET:field_id, what "
        "iceberg-java/pyiceberg stamp), hand-built v2 metadata, two "
        "snapshots with a rename between them (snapshot 1's footer says "
        "qty, snapshot 2's says quantity, both field id 3), one manifest "
        "deflate-coded (iceberg-java's default Avro codec). "
        "iceberg_import.read_iceberg_table resolves columns by FIELD ID "
        "through Spark's native parquet fieldId reader — one JVM-side "
        "scan, renames cost nothing — and the in-query assertions pin "
        "time travel: snapshot_id / as_of_ms reads surface the OLD name "
        "and only the first subset's rows. Oracle: the relational "
        "restatement over the two lineitem subsets. Reference scope: "
        "open-ecosystem tables as in monday_etl_automated.py:571-590.",
)
def iceberg_import_external(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from ..iceberg_import import iceberg_history, read_iceberg_table
    from .fixtures import shared

    path = shared(spark, sf_dir, "iceberg_external_table")
    df = read_iceberg_table(spark, path)
    if df.columns != ["l_orderkey", "l_returnflag", "quantity"]:
        raise AssertionError(f"current schema surfaced {df.columns}")
    hist = iceberg_history(path)
    if [h["snapshot_id"] for h in hist] != [100, 200]:
        raise AssertionError(f"history wrong: {hist}")
    old = read_iceberg_table(spark, path, snapshot_id=100)
    asof = read_iceberg_table(spark, path, as_of_ms=1500)
    if old.columns != ["l_orderkey", "l_returnflag", "qty"]:
        raise AssertionError(f"snapshot-1 schema surfaced {old.columns}")
    n_old, n_asof, n_cur = old.count(), asof.count(), df.count()
    if n_old != n_asof or not 0 < n_old < n_cur:
        raise AssertionError(
            f"time travel wrong: old={n_old} asof={n_asof} cur={n_cur}"
        )
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("quantity")).alias("sum_qty"),
        )
        .select("l_returnflag", "n_rows", "sum_qty")
    )


@register(
    "iceberg_append_pipeline",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders WHERE o_orderkey % 16 IN (6, 7)
    GROUP BY o_orderstatus
    """,
    doc="Iceberg two-way pipeline (r08): an exported snapshot (orders "
        "subset) takes an append_iceberg commit — Spark-written data "
        "files, a new Avro manifest with footer-derived bounds, a "
        "manifest list carrying the prior snapshot's manifests, and "
        "v2.metadata.json published through the LogStore conditional-put "
        "seam (a lost race raises, never clobbers). In-query assertions "
        "pin that time travel to the pre-append snapshot excludes the "
        "appended rows and that manifest bounds PRUNE files before any "
        "scan on the appended key range. Oracle: the relational union "
        "restatement. Reference scope: open-ecosystem tables as in "
        "monday_etl_automated.py:571-590.",
)
def iceberg_append_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from ..iceberg_import import (
        iceberg_files_where,
        iceberg_history,
        read_iceberg_table,
    )
    from .fixtures import shared

    path = shared(spark, sf_dir, "iceberg_appended_table")
    df = read_iceberg_table(spark, path)
    first = iceberg_history(path)[0]["snapshot_id"]
    n_first = read_iceberg_table(spark, path, snapshot_id=first).count()
    if not 0 < n_first < df.count():
        raise AssertionError(
            f"pre-append snapshot not smaller: {n_first} vs {df.count()}"
        )
    keep, total = iceberg_files_where(
        spark, path, "o_orderkey", 0, 10
    )
    if not keep or len(keep) >= total:
        raise AssertionError(
            f"bounds pruning ineffective: kept {len(keep)}/{total}"
        )
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("o_orderstatus", "n_rows", "total_price")
    )


@register(
    "iceberg_stream_pipe",
    oracle=f"""
    SELECT CAST(2 AS INTEGER) AS n_snapshots, CAST(0 AS INTEGER) AS last_txn,
           o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders WHERE o_orderkey % 32 = 30 OR o_orderkey % 16 IN (6, 7)
    GROUP BY o_orderstatus
    """,
    doc="Iceberg table-to-table streaming pipe (r08): the snapshot-tailing "
        "source (iceberg_source.stream_iceberg — offsets are spec "
        "sequence numbers + in-snapshot file index, per-file-parallel "
        "Arrow reads, field-id/name-mapping resolution) drains the "
        "appended fixture from its first snapshot, and every micro-batch "
        "appends into a second Iceberg table with (app_id, batch_id) "
        "stamped into the snapshot summary — the public Flink-sink "
        "exactly-once pattern. A batch is then RE-DELIVERED with fresh "
        "producer memory and the summary check skips it: the oracle pins "
        "n_snapshots=2 (base export + ONE drain commit, none for the "
        "replay), last_txn=0, and per-status aggregates equal to the "
        "plain union restatement (a duplicate would double counts AND "
        "bump n_snapshots). Stream state lives entirely in the two "
        "tables' metadata. Reference scope: streamed rows readable by "
        "any client, monday_etl_automated.py:571-590.",
)
def iceberg_stream_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from ..iceberg_import import (
        iceberg_history,
        last_iceberg_txn,
        read_iceberg_table,
    )
    from .fixtures import shared

    # r10: the pipe (drain + the replayed batch-0 hazard) runs once in
    # the shared lakehouse_stream_drains fixture; this query re-derives
    # the exactly-once evidence from the SINK's own metadata
    sink = shared(spark, sf_dir, "lakehouse_stream_drains")["iceberg_sink"]
    n_snapshots = len(iceberg_history(sink))
    last = last_iceberg_txn(sink, "orders-pipe")
    return (
        read_iceberg_table(spark, sink)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.lit(n_snapshots).cast("int").alias("n_snapshots"),
            F.lit(last).cast("int").alias("last_txn"),
            "o_orderstatus", "n_orders", "total_price",
        )
    )


@register(
    "iceberg_merge_on_read",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 16 = 10
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn FROM base
    ), live AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM ranked WHERE rn > 7 AND o_orderkey % 64 <> 26
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM base WHERE o_orderkey % 64 = 26
    )
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM live GROUP BY o_orderstatus
    """,
    doc="Iceberg v2 MERGE-ON-READ (r08): a table shaped the way Flink CDC "
        "writes one — a sorted orders subset at sequence 1, a POSITION "
        "delete file (the data file's first 7 row positions) and an "
        "EQUALITY delete file (keys % 64 == 26, equality field id 1) at "
        "sequence 2, and a re-insert of those keys at sequence 3. "
        "read_iceberg_table applies both delete kinds per the spec's "
        "sequence rules: per-row provenance from the parquet scan's "
        "_metadata struct (file path + row index, JVM-side), position "
        "deletes as an anti-join at data_seq <= delete_seq, equality "
        "deletes as a null-safe anti-join at strictly data_seq < "
        "delete_seq — so the re-inserted keys SURVIVE. Oracle: the "
        "rank-window + key-mod relational restatement. Reference scope: "
        "open-ecosystem tables as in monday_etl_automated.py:571-590.",
)
def iceberg_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from ..iceberg_import import read_iceberg_table
    from .fixtures import shared

    path = shared(spark, sf_dir, "iceberg_mor_table")
    df = read_iceberg_table(spark, path)
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("o_orderstatus", "n_orders", "total_price")
    )


@register(
    "iceberg_delete_compact",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderkey % 16 = 12
      AND NOT (o_totalprice BETWEEN 0 AND 50000)
    GROUP BY o_orderstatus
    """,
    doc="Iceberg merge-on-read WRITE lifecycle (r08): DELETE WHERE on an "
        "exported orders subset writes POSITION-delete files naming "
        "exactly the matching rows (provenance from the scan's _metadata "
        "struct; zero data rewritten), then COMPACT rewrites the live "
        "rows into fresh files as a replace snapshot. In-query "
        "assertions pin the snapshot history (append -> delete -> "
        "replace), that the pre-delete snapshot still time-travels to "
        "the full subset, and that the delete+compact read equals the "
        "pre-compact merge-on-read read. Oracle: the subset minus the "
        "deleted value range. Reference scope: open-ecosystem tables as "
        "in monday_etl_automated.py:571-590.",
)
def iceberg_delete_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from ..iceberg_import import iceberg_history, read_iceberg_table
    from .fixtures import shared

    path = shared(spark, sf_dir, "iceberg_dml_table")
    hist = iceberg_history(path)
    ops = [h["operation"] for h in hist]
    if ops != ["append", "delete", "replace"]:
        raise AssertionError(f"history wrong: {ops}")
    df = read_iceberg_table(spark, path)
    pre_delete = read_iceberg_table(
        spark, path, snapshot_id=hist[0]["snapshot_id"])
    mor = read_iceberg_table(
        spark, path, snapshot_id=hist[1]["snapshot_id"])
    n_now, n_pre, n_mor = df.count(), pre_delete.count(), mor.count()
    if not (n_now == n_mor < n_pre):
        raise AssertionError(
            f"lifecycle counts wrong: now={n_now} mor={n_mor} pre={n_pre}"
        )
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("o_orderstatus", "n_orders", "total_price")
    )


@register(
    "delta_deletion_vectors",
    oracle=f"""
    WITH f1 AS (
        SELECT l_returnflag, l_quantity,
               ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
        FROM lineitem WHERE l_orderkey % 16 = 15
    ), f2 AS (
        SELECT l_returnflag, l_quantity,
               ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
        FROM lineitem WHERE l_orderkey % 16 = 1
    ), live AS (
        SELECT l_returnflag, l_quantity FROM f1 WHERE (rn - 1) % 7 <> 0
        UNION ALL
        SELECT l_returnflag, l_quantity FROM f2 WHERE rn > 5
    )
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty
    FROM live GROUP BY l_returnflag
    """,
    doc="Delta DELETION VECTORS (r08): a reader-v3 table 'another engine "
        "wrote' — one data file whose vector (spec file framing: version "
        "byte, big-endian length, 64-bit RoaringBitmapArray, CRC-32) "
        "deletes every 7th row position, and a second file with an "
        "INLINE Z85 vector deleting its first 5 positions. read_delta "
        "applies both as an anti-join on the scan's _metadata row "
        "provenance, with vectors decoded on EXECUTORS (roaring.py "
        "implements the public RoaringFormatSpec + Z85). Oracle: "
        "rank-window restatement of the deleted positions over the "
        "sorted subsets. The path-level surfaces refuse DV files loudly "
        "(tested in test_delta_import). Reference scope: open-ecosystem "
        "tables as in monday_etl_automated.py:571-590.",
)
def delta_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..delta_import import read_delta
    from ..functions import money_sum
    from .fixtures import shared

    path = shared(spark, sf_dir, "delta_dv_table")
    df = read_delta(spark, path)
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("l_quantity")).alias("sum_qty"),
        )
        .select("l_returnflag", "n_rows", "sum_qty")
    )


@register(
    "delta_delete_where",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderkey % 16 = 8
      AND NOT (o_totalprice BETWEEN 0 AND 60000)
      AND NOT (o_totalprice >= 250000)
    GROUP BY o_orderstatus
    """,
    doc="Delta DV-writing DELETE (r08): two delete_delta_where commits on "
        "a DV-enabled table (reader v3, deletionVectors on both protocol "
        "sides) — each writes a deletion-vector file naming the matching "
        "row positions and re-adds the data file with the UNIONED vector "
        "(remove+add of the same path, the spec's DV-update pattern); "
        "zero data rewritten. In-query assertions pin the commit count "
        "(base + two deletes), that version-0 time travel still sees "
        "every row, and that the single data file was never replaced. "
        "Oracle: the subset minus both value ranges. Reference scope: "
        "open-ecosystem tables as in monday_etl_automated.py:571-590.",
)
def delta_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..delta_import import delta_versions, read_delta
    from ..functions import money_sum
    from .fixtures import shared

    path = shared(spark, sf_dir, "delta_dml_table")
    if delta_versions(path) != [0, 1, 2]:
        raise AssertionError(f"versions wrong: {delta_versions(path)}")
    df = read_delta(spark, path)
    n_v0 = read_delta(spark, path, version=0).count()
    if not df.count() < n_v0:
        raise AssertionError("delete removed nothing")
    files = {os.path.basename(f) for f in df.inputFiles()}
    if files != {"f1.parquet"}:
        raise AssertionError(f"data files were rewritten: {files}")
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("o_orderstatus", "n_orders", "total_price")
    )


@register(
    "nested_bridge_roundtrip",
    oracle=f"""
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_okey,
           {sql_money_sum('o_totalprice')} AS sum_price,
           MAX(o_orderdate) AS last_date
    FROM orders WHERE o_custkey % 10 = 3
    GROUP BY o_custkey
    """,
    doc="Nested types through BOTH lakehouse bridges (r09): orders rolled "
        "up per customer into array<struct<okey,price>> plus a summary "
        "struct, committed versioned, exported from the SAME directory as "
        "a plain Delta log (schemaString carries Spark's nesting verbatim) "
        "and as Iceberg v2 metadata (nested field ids minted in traversal "
        "order, nested name-mapping entries per the spec's element/key/"
        "value names — iceberg_export._iceberg_type/_nested_mapping). The "
        "query re-reads through BOTH import bridges, pins them row-"
        "identical via a one-job fingerprint per side, then flattens the "
        "Iceberg read (array element access, struct field access, explode) "
        "for the value-hash compare. Oracle: the per-customer rollup "
        "restated over the raw orders table. Reference scope: "
        "open-ecosystem outputs as in monday_etl_automated.py:571-590.",
)
def nested_bridge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..delta_import import read_delta
    from ..functions import money_sum
    from ..iceberg_import import read_iceberg_table
    from .fixtures import shared

    path = shared(spark, sf_dir, "nested_bridge_table")
    dd = read_delta(spark, path)
    ii = read_iceberg_table(spark, path)

    def _fingerprint(df: DataFrame) -> tuple:
        ex = df.select(
            "o_custkey",
            F.col("summary.n").alias("n"),
            F.explode("orders").alias("o"),
        )
        row = ex.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.crc32(F.concat_ws(
                "|", F.col("o_custkey"), F.col("n"),
                F.col("o.okey"),
                F.format_number(F.col("o.price"), 2),
            ))).alias("crc"),
        ).first()
        return (row["rows"], row["crc"])

    if _fingerprint(dd) != _fingerprint(ii):
        raise AssertionError("Delta and Iceberg reads disagree")

    ex = ii.select(
        "o_custkey",
        F.col("summary.n").alias("n_orders"),
        F.col("summary.last_date").alias("last_date"),
        F.element_at("orders", 1).getField("okey").alias("first_okey"),
        F.explode("orders").alias("o"),
    )
    return (
        ex.groupBy("o_custkey")
        .agg(
            F.first("n_orders").alias("n_orders"),
            F.first("first_okey").alias("first_okey"),
            money_sum(F.col("o.price")).alias("sum_price"),
            F.first("last_date").alias("last_date"),
        )
        .select("o_custkey", "n_orders", "first_okey",
                "sum_price", "last_date")
    )


@register(
    "iceberg_partition_transforms",
    oracle=f"""
    SELECT CAST(TRUE AS BOOLEAN) AS routing_ok, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderkey % 8 = 5
      AND o_orderdate BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
    GROUP BY o_orderstatus
    """,
    doc="Iceberg partition TRANSFORMS (r09): a day(o_orderdate) + "
        "bucket[4](o_orderkey) table — the layout external Flink/Spark "
        "tables actually use — created by create_iceberg_table and filled "
        "by append_iceberg. Rows route through the spec's transforms "
        "(iceberg_transforms.py: murmur3-seed-0 hashLong as a pure JVM "
        "expression per Appendix B, day as a datediff); non-identity "
        "tuple values live only in the manifests (the source columns "
        "stay in the files), and the read collapses every partition "
        "tuple into ONE scan (no identity constants to inject). The "
        "in-query invariant re-derives each row's (day, bucket) with the "
        "same transform expressions on the READ-BACK rows and matches "
        "the per-tuple counts against the manifests' record_count sums — "
        "writer routing and spec math pinned against each other; "
        "murmur3 itself is pinned to the spec's public Appendix-B "
        "vectors in tests. Oracle: the plain relational restatement "
        "(routing_ok surfaces as the hashed CHECK). Reference scope: "
        "partitioned warehouse tables as in "
        "monday_etl_automated.py:560-590.",
)
def iceberg_partition_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DateType, LongType

    from ..functions import money_sum
    from ..iceberg_import import (
        _decode_manifest,
        _select_snapshot,
        _split_manifests,
        read_iceberg_table,
        read_metadata,
    )
    from ..iceberg_transforms import transform_column
    from .fixtures import shared

    path = shared(spark, sf_dir, "iceberg_transform_table")
    df = read_iceberg_table(spark, path)

    meta = read_metadata(path)
    snap = _select_snapshot(meta, None, None)
    data_mans, _ = _split_manifests(meta, snap)
    man_counts: dict[tuple, int] = {}
    for m in data_mans:
        for t in _decode_manifest(m, want_bounds=False):
            if t[0] in (0, 1):
                p = json.loads(t[5])
                key = (p["o_orderdate_day"], p["o_orderkey_bucket"])
                man_counts[key] = man_counts.get(key, 0) + t[3]
    got = {
        (r["d"], r["b"]): r["n"]
        for r in df.groupBy(
            transform_column("day", None, F.col("o_orderdate"),
                             DateType()).alias("d"),
            transform_column("bucket", 4, F.col("o_orderkey"),
                             LongType()).alias("b"),
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if got != man_counts:
        only_g = {k: v for k, v in got.items() if man_counts.get(k) != v}
        raise AssertionError(
            f"transform routing mismatch: recomputed {len(got)} tuples vs "
            f"{len(man_counts)} in manifests; first diffs {list(only_g)[:3]}"
        )
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.lit(True).alias("routing_ok"),
            "o_orderstatus", "n_rows", "total_price",
        )
    )


@register(
    "delta_stream_id_mapped",
    oracle=f"""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty
    FROM lineitem WHERE l_orderkey % 64 IN (9, 41)
    GROUP BY l_returnflag
    """,
    doc="Streaming an id-mapped Delta table (r09): a mode=id column-"
        "mapped table 'another engine wrote' — one data file stamps "
        "footer field ids under physical names matching nothing logical "
        "(ids are authoritative in this mode), the other carries the "
        "physicalNames with NO footer ids (delta-spark's fallback rule) "
        "— drains through the version-tailing Arrow stream source, which "
        "resolves each footer per file (delta_source: PARQUET:field_id "
        "map, physicalName fallback) and surfaces logical names, never "
        "silent NULL columns. Oracle: the relational restatement of both "
        "subsets over the original lineitem names. Reference scope: "
        "open-ecosystem tables as in monday_etl_automated.py:571-590.",
)
def delta_stream_id_mapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from .fixtures import shared

    # r10: drained by the shared lakehouse_stream_drains fixture (which
    # asserts the stream surfaces LOGICAL names where it is built); the
    # drained rows must still carry them, and aggregate exactly
    out = shared(spark, sf_dir, "lakehouse_stream_drains")
    rows = spark.read.parquet(out["idmap_out"])
    got = [c for c in rows.columns if not c.startswith("batch")]
    if sorted(got) != ["l_orderkey", "l_quantity", "l_returnflag"]:
        raise AssertionError(f"logical names not surfaced: {rows.columns}")
    return (
        rows.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


@register(
    "iceberg_wap_publish",
    oracle=f"""
    SELECT CAST(TRUE AS BOOLEAN) AS staged_invisible,
           c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('c_acctbal')} AS sum_bal
    FROM customer WHERE c_custkey % 16 IN (1, 2)
    GROUP BY c_mktsegment
    """,
    doc="Write-audit-publish on the Iceberg bridge (r09): staged rows "
        "land on a BRANCH (create_iceberg_branch + append_iceberg("
        "branch=...) — per the spec only main moves current-snapshot-id "
        "and the snapshot-log, so readers and time travel see nothing), "
        "the audit step reads the branch ref and the snapshots/refs "
        "inspection tables (iceberg_metadata_table), and "
        "fast_forward_iceberg publishes atomically after verifying main "
        "is an ancestor (a diverged main refuses rather than dropping "
        "commits). The in-query assertion pins that main was UNCHANGED "
        "between stage and publish. Oracle: the relational union of base "
        "+ staged subsets; staged_invisible is the hashed CHECK. "
        "Reference scope: audited publishes of warehouse tables as in "
        "monday_etl_automated.py:560-590.",
)
def iceberg_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from ..iceberg_import import (
        append_iceberg,
        create_iceberg_branch,
        fast_forward_iceberg,
        iceberg_metadata_table,
        read_iceberg_table,
    )
    from .fixtures import fresh_copy, shared

    path = fresh_copy(shared(spark, sf_dir, "iceberg_wap_base"))
    base_count = read_iceberg_table(spark, path).count()
    create_iceberg_branch(path, "audit")
    staged = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .filter(F.col("c_custkey") % 16 == 2)
    )
    append_iceberg(spark, staged.coalesce(2), path, branch="audit")

    # audit: main must be untouched; the branch must hold base + staged
    if read_iceberg_table(spark, path).count() != base_count:
        raise AssertionError("staged rows leaked into main before publish")
    refs = {r["name"]: r["snapshot_id"] for r in
            iceberg_metadata_table(spark, path, "refs").collect()}
    snaps = iceberg_metadata_table(spark, path, "snapshots").count()
    if refs["audit"] == refs["main"] or snaps != 2:
        raise AssertionError(
            f"branch not staged apart from main: {refs}, {snaps} snapshots"
        )

    fast_forward_iceberg(path, "audit")
    return (
        read_iceberg_table(spark, path)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("c_acctbal")).alias("sum_bal"),
        )
        .select(
            F.lit(True).alias("staged_invisible"),
            "c_mktsegment", "n_rows", "sum_bal",
        )
    )


@register(
    "delta_cdc_diff",
    oracle=f"""
    SELECT change_type, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM (
        SELECT 'insert' AS change_type, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 16 = 10
        UNION ALL
        SELECT 'delete' AS change_type, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey % 16 IN (9, 10)
          AND o_totalprice BETWEEN 0 AND 80000
    )
    GROUP BY change_type, o_orderstatus
    """,
    doc="Delta Change Data Feed (r10; r11: timestamp-addressed): a "
        "CDF-enabled DV table takes a "
        "blind append (v1 — reconstructed as inserts from its add "
        "actions, the spec's no-cdc shape) and a DV DELETE (v2 — "
        "pre-image rows written to _change_data + cdc actions by "
        "delete_delta_where); the feed over [v1, v2] is addressed BY "
        "COMMIT TIMESTAMP (delta-spark's starting/endingTimestamp "
        "against the monotone commit clock — boundary-exact on both "
        "sides) and the query aggregates it per change type — the "
        "reference's day-over-day diff consumer shape "
        "(monday_etl_automated.py:600-645, SURVEY.md O-39) over CDF "
        "instead of two snapshot scans. In-query assertions pin that "
        "the v2 commit carries cdc actions and that the timestamp "
        "bounds resolved to exactly versions {1, 2}. Oracle: the "
        "insert set is the appended subset; the delete set is the "
        "value-range match over base + appended.",
)
def delta_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..delta_cdf import read_delta_changes
    from ..delta_import import commit_timestamps
    from ..functions import money_sum
    from .fixtures import shared

    path = shared(spark, sf_dir, "delta_cdf_table")
    with open(os.path.join(path, "_delta_log", f"{2:020d}.json")) as fh:
        acts = [json.loads(line) for line in fh if line.strip()]
    if not any("cdc" in a for a in acts):
        raise AssertionError("DELETE commit carries no cdc actions")
    ts = commit_timestamps(path)
    if ts[1] > ts[0]:
        # timestamp addressing: start rounds UP to v1's commit time,
        # end rounds DOWN to v2's — the distinct-versions assertion
        # below pins the resolution end-to-end under the exact oracle
        feed = read_delta_changes(spark, path,
                                  starting_timestamp=ts[1],
                                  ending_timestamp=ts[2])
    else:  # same-millisecond commits: timestamps cannot split them
        feed = read_delta_changes(spark, path, 1, 2)
    versions = {r["_commit_version"] for r in
                feed.select("_commit_version").distinct().collect()}
    if versions != {1, 2}:
        raise AssertionError(f"feed stamped versions {versions}")
    return (
        feed.groupBy(
            F.col("_change_type").alias("change_type"), "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("change_type", "o_orderstatus", "n_rows", "total_price")
    )


@register(
    "delta_lifecycle",
    oracle=f"""
    SELECT CAST(TRUE AS BOOLEAN) AS restored,
           o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderkey % 16 IN (11, 13)
    GROUP BY o_orderstatus
    """,
    doc="Delta maintenance lifecycle (r10): base + append + DV DELETE + "
        "OPTIMIZE compaction (dataChange=false) + retaining VACUUM "
        "(sweeps nothing while every version stays time-travelable) + "
        "RESTORE back to the pre-delete version — five lifecycle commits "
        "on one table, previously pytest-only. The fixture also proves "
        "the refusal arm on a throwaway copy: restore after a sweeping "
        "vacuum refuses with the missing files named (including on-disk "
        "DV files). In-query assertions pin the version ladder, that the "
        "deleted rows were really gone at v2/v3, and that the restored "
        "head re-serves the v1 row set. Oracle: the plain union of both "
        "appended subsets — restore semantics ARE the hashed check. "
        "Reference scope: warehouse table maintenance as in "
        "monday_etl_automated.py:571-590.",
)
def delta_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..delta_import import delta_versions, read_delta
    from ..functions import money_sum
    from .fixtures import shared

    path = shared(spark, sf_dir, "delta_lifecycle_table")
    if delta_versions(path) != [0, 1, 2, 3, 4]:
        raise AssertionError(f"versions wrong: {delta_versions(path)}")
    n_v1 = read_delta(spark, path, version=1).count()
    n_v2 = read_delta(spark, path, version=2).count()
    n_v3 = read_delta(spark, path, version=3).count()
    df = read_delta(spark, path)
    if not (n_v2 == n_v3 < n_v1 == df.count()):
        raise AssertionError(
            f"lifecycle counts wrong: v1={n_v1} v2={n_v2} v3={n_v3} "
            f"head={df.count()}")
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.lit(True).alias("restored"),
            "o_orderstatus", "n_orders", "total_price",
        )
    )


@register(
    "iceberg_lifecycle",
    oracle=f"""
    SELECT CAST(TRUE AS BOOLEAN) AS rolled_back,
           s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           {sql_money_sum('s_acctbal')} AS total_bal
    FROM supplier
    WHERE s_suppkey % 8 IN (1, 2)
    GROUP BY s_nationkey
    """,
    doc="Iceberg maintenance lifecycle (r10): two appends + "
        "merge-on-read DELETE (position-delete files) + compaction "
        "(replace snapshot) + orphan-file removal (a PLANTED stray "
        "parquet is deleted, nothing referenced is — the fixture "
        "asserts the removed list exactly) + rollback of main to the "
        "pre-delete ancestor snapshot. In-query assertions pin the "
        "snapshot ladder (append, append, delete, replace) and that "
        "rollback moved main WITHOUT erasing history (all snapshots "
        "retained for audit replay). Oracle: the union of both appended "
        "subsets — rollback semantics ARE the hashed check. Reference "
        "scope: warehouse table maintenance as in "
        "monday_etl_automated.py:571-590.",
)
def iceberg_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from ..iceberg_import import read_iceberg_table, read_metadata
    from .fixtures import shared

    path = shared(spark, sf_dir, "iceberg_lifecycle_table")
    meta = read_metadata(path)
    snaps = meta["snapshots"]
    if len(snaps) != 4:
        raise AssertionError(f"expected 4 retained snapshots: {len(snaps)}")
    # rollback moved main back to the second append without erasing
    # the delete/replace snapshots from history
    if meta["current-snapshot-id"] != snaps[1]["snapshot-id"]:
        raise AssertionError("main is not at the pre-delete ancestor")
    df = read_iceberg_table(spark, path)
    return (
        df.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            money_sum(F.col("s_acctbal")).alias("total_bal"),
        )
        .select(
            F.lit(True).alias("rolled_back"),
            "s_nationkey", "n_suppliers", "total_bal",
        )
    )


@register(
    "iceberg_schema_evolution",
    oracle=f"""
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
           {sql_money_sum('price')} AS total_price,
           CAST(COUNT(note) AS BIGINT) AS n_noted
    FROM (
        SELECT p_brand AS brand,
               CAST(CAST(p_retailprice AS REAL) AS DOUBLE) AS price,
               CAST(NULL AS VARCHAR) AS note
        FROM part WHERE p_partkey % 8 = 3
        UNION ALL
        SELECT p_brand, p_retailprice, 'late'
        FROM part WHERE p_partkey % 8 = 5
    )
    GROUP BY brand
    """,
    doc="Iceberg schema evolution, every verb in one commit (r10): the "
        "fixture table is created narrow (int key, float price), takes "
        "base rows, then ONE evolution renames p_brand->brand, PROMOTES "
        "p_partkey int->long and price float->double (spec-safe "
        "promotions; old footers upcast natively — the oracle's "
        "double(float(x)) cast pins that the base rows really lived as "
        "float32), DROPS p_type (field id never reused), and ADDS note; "
        "evolved rows append after. In-query assertions pin the current "
        "dtypes and that time travel to the first snapshot still serves "
        "the ORIGINAL columns and types. Oracle: union of the "
        "float-squashed base subset and the evolved append. Reference "
        "scope: the explicit-schema DDL layer "
        "(monday_etl_automated.py:64-170).",
)
def iceberg_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from ..iceberg_import import read_iceberg_table, read_metadata
    from .fixtures import shared

    path = shared(spark, sf_dir, "iceberg_evolution_table")
    df = read_iceberg_table(spark, path)
    if dict(df.dtypes) != {"p_partkey": "bigint", "price": "double",
                           "brand": "string", "note": "string"}:
        raise AssertionError(f"evolved dtypes wrong: {df.dtypes}")
    first = read_metadata(path)["snapshots"][0]["snapshot-id"]
    old = read_iceberg_table(spark, path, snapshot_id=first)
    if dict(old.dtypes) != {"p_partkey": "int", "price": "float",
                            "p_brand": "string", "p_type": "string"}:
        raise AssertionError(
            f"time travel lost the original schema: {old.dtypes}")
    return (
        df.groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            money_sum(F.col("price")).alias("total_price"),
            F.count("note").alias("n_noted"),
        )
        .select("brand", "n_parts", "total_price", "n_noted")
    )


@register(
    "delta_upsert_merge",
    oracle=f"""
    SELECT change_type, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('price')} AS total_price
    FROM (
        SELECT 'update_preimage' AS change_type, o_orderstatus,
               o_totalprice AS price
        FROM orders WHERE o_orderkey % 32 = 14
        UNION ALL
        SELECT 'update_postimage', o_orderstatus, o_totalprice * 2
        FROM orders WHERE o_orderkey % 32 = 14
        UNION ALL
        SELECT 'insert', o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 16 = 5
    )
    GROUP BY change_type, o_orderstatus
    """,
    doc="Copy-on-write MERGE on the Delta bridge (r10): upsert_delta "
        "replaces matched keys and inserts the rest in ONE commit — only "
        "files containing a matched key are rewritten (survivors move to "
        "fresh files, untouched files stay referenced), and the CDF "
        "change files carry update_preimage/update_postimage/insert "
        "rows, which read_delta_changes serves exactly. The query "
        "aggregates the MERGE commit's feed per change type; in-query "
        "assertions pin the final head state (doubled updates, inserts "
        "present, base half untouched). Oracle: the three change classes "
        "restated relationally. Reference scope: keyed MERGE refreshes "
        "as in monday_etl_automated.py:571-600.",
)
def delta_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..delta_cdf import read_delta_changes
    from ..delta_import import read_delta
    from ..functions import money_sum
    from .fixtures import shared

    path = shared(spark, sf_dir, "delta_merge_table")
    head = read_delta(spark, path)
    n_base = head.filter(F.col("o_orderkey") % 32 == 30).count()
    n_upd = head.filter(F.col("o_orderkey") % 32 == 14).count()
    n_ins = head.filter(F.col("o_orderkey") % 16 == 5).count()
    if head.count() != n_base + n_upd + n_ins or not n_upd or not n_ins:
        raise AssertionError("merged head has wrong composition")
    feed = read_delta_changes(spark, path, 1, 1)
    return (
        feed.groupBy(
            F.col("_change_type").alias("change_type"), "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("change_type", "o_orderstatus", "n_rows",
                F.col("total_price"))
    )


@register(
    "iceberg_changelog",
    oracle=f"""
    SELECT change_type, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM (
        SELECT 'insert' AS change_type, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 16 = 12
        UNION ALL
        SELECT 'delete', o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey % 16 = 12
          AND o_totalprice BETWEEN 0 AND 50000
    )
    GROUP BY change_type, o_orderstatus
    """,
    doc="Iceberg changelog scan (r10): read_iceberg_changes walks the "
        "DML fixture's ancestry (append -> MoR delete -> replace) and "
        "emits per-commit row-level changes — the append's rows as "
        "inserts, the DELETE's position-delete files RESOLVED back to "
        "concrete rows by joining (file, position) against the parent "
        "snapshot's read (iceberg-spark's create_changelog_view refuses "
        "MoR delete files; this reader serves them), and NOTHING for the "
        "compaction (a replace snapshot changes no logical rows — the "
        "in-query assertion pins that its ordinal is absent). Oracle: "
        "insert = the whole subset, delete = the deleted value range. "
        "Reference scope: the day-over-day diff consumer "
        "(monday_etl_automated.py:600-645) served from commit history "
        "instead of two snapshot scans.",
)
def iceberg_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from ..iceberg_changes import read_iceberg_changes
    from ..iceberg_import import iceberg_history
    from .fixtures import shared

    path = shared(spark, sf_dir, "iceberg_dml_table")
    ops = [h["operation"] for h in iceberg_history(path)]
    if ops != ["append", "delete", "replace"]:
        raise AssertionError(f"history wrong: {ops}")
    feed = read_iceberg_changes(spark, path)
    ordinals = {r["_change_ordinal"] for r in
                feed.select("_change_ordinal").distinct().collect()}
    if ordinals != {0, 1}:  # the replace (ordinal 2) must emit nothing
        raise AssertionError(f"changelog ordinals wrong: {ordinals}")
    return (
        feed.groupBy(
            F.col("_change_type").alias("change_type"), "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("change_type", "o_orderstatus", "n_rows", "total_price")
    )


@register(
    "delta_cdf_stream",
    oracle=f"""
    SELECT change_type, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM (
        SELECT 'insert' AS change_type, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 16 = 10
        UNION ALL
        SELECT 'delete' AS change_type, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey % 16 IN (9, 10)
          AND o_totalprice BETWEEN 0 AND 80000
    )
    GROUP BY change_type, o_orderstatus
    """,
    doc="STREAMING the Delta change feed (r10): stream_delta("
        "read_change_feed=True) — delta-spark's readChangeFeed — drains "
        "the CDF fixture from version 1 through the version-tailing "
        "Arrow source: the blind append streams as inserts "
        "(reconstructed per spec, no cdc files), the DV DELETE streams "
        "its _change_data files with the pre-image rows, and every row "
        "carries _change_type/_commit_version/_commit_timestamp stamps. "
        "Same oracle as the batch feed (delta_cdc_diff): the streamed "
        "rows must aggregate identically — stream/batch parity IS the "
        "hashed check. In-query assertions pin the version stamps. "
        "Reference scope: the day-over-day diff consumer "
        "(monday_etl_automated.py:600-645) fed incrementally.",
)
def delta_cdf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from .fixtures import shared

    out = shared(spark, sf_dir, "lakehouse_stream_drains")
    rows = spark.read.parquet(out["cdf_out"])
    versions = {r["_commit_version"] for r in
                rows.select("_commit_version").distinct().collect()}
    if versions != {1, 2}:
        raise AssertionError(f"stream stamped versions {versions}")
    return (
        rows.groupBy(
            F.col("_change_type").alias("change_type"), "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("change_type", "o_orderstatus", "n_rows", "total_price")
    )


@register(
    "iceberg_changelog_stream",
    oracle=f"""
    SELECT change_type, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM (
        SELECT 'insert' AS change_type, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 16 = 12
        UNION ALL
        SELECT 'delete', o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey % 16 = 12
          AND o_totalprice BETWEEN 0 AND 50000
    )
    GROUP BY change_type, o_orderstatus
    """,
    doc="STREAMING the Iceberg changelog (r10): stream_iceberg("
        "changelog=True) drains the DML fixture's chain (append -> MoR "
        "delete -> replace) through the snapshot-tailing Arrow source — "
        "the append's files stream as inserts, the DELETE's position-"
        "delete files RESOLVE to the rows they name executor-side (one "
        "partition per delete file, (file,pos) take), the compaction "
        "streams NOTHING, and every row carries _change_type/"
        "_change_ordinal/_commit_snapshot_id/_commit_timestamp (r13: "
        "the full batch-reader column set — per-batch ordinals dense "
        "over emitting commits). Same oracle as the batch changelog "
        "(iceberg_changelog): stream/batch parity IS the hashed check. "
        "In-query assertions pin exactly TWO stamped snapshots — append "
        "+ delete, the replace absent — and dense ordinals {0, 1}. "
        "Reference scope: the day-over-day diff consumer "
        "(monday_etl_automated.py:600-645) fed incrementally.",
)
def iceberg_changelog_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from .fixtures import shared

    out = shared(spark, sf_dir, "lakehouse_stream_drains")
    rows = spark.read.parquet(out["changelog_out"])
    stamps = {(r["_commit_snapshot_id"], r["_change_ordinal"]) for r in
              rows.select("_commit_snapshot_id", "_change_ordinal")
              .distinct().collect()}
    sids = {s for s, _o in stamps}
    if len(sids) != 2:  # append + delete; the replace must be absent
        raise AssertionError(f"changelog stamped {len(sids)} snapshots")
    # one-batch drain: ordinals dense over the two emitting commits,
    # the replace consuming none (the batch reader's numbering)
    if {o for _s, o in stamps} != {0, 1}:
        raise AssertionError(f"ordinals not dense: {sorted(stamps)}")
    return (
        rows.groupBy(
            F.col("_change_type").alias("change_type"), "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("change_type", "o_orderstatus", "n_rows", "total_price")
    )


@register(
    "iceberg_cow_update",
    oracle=f"""
    SELECT change_type, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('p')} AS total_price
    FROM (
        SELECT 'insert' AS change_type, o_orderstatus,
               CAST(o_totalprice AS DOUBLE) AS p
        FROM orders WHERE o_orderkey % 16 = 2
        UNION ALL
        SELECT 'delete', o_orderstatus, CAST(o_totalprice AS DOUBLE)
        FROM orders WHERE o_orderkey % 16 = 2
        UNION ALL
        SELECT 'insert', o_orderstatus,
               CASE WHEN CAST(o_totalprice AS DOUBLE)
                         BETWEEN 1000.0 AND 100000.0
                    THEN CAST(o_totalprice AS DOUBLE) * 2
                    ELSE CAST(o_totalprice AS DOUBLE) END
        FROM orders WHERE o_orderkey % 16 = 2
    )
    GROUP BY change_type, o_orderstatus
    """,
    doc="Copy-on-write UPDATE (r12): update_iceberg_cow commits ONE "
        "overwrite snapshot — matching rows take the assignment "
        "(evaluated over the PRE-update row), non-matching rows of the "
        "affected file carry verbatim, the old file is marked DELETED "
        "in a rewritten manifest (explicit sequence numbers, original "
        "snapshot ids on EXISTING entries) — completing the foreign-COW "
        "write matrix next to delete_iceberg_cow. The batch changelog "
        "reads the commit's gross shape: the affected file's "
        "live-at-parent rows as deletes + the rewritten file's rows as "
        "inserts, a deterministic row set at every sf because the "
        "append is a single file. Reference scope: the UPDATE shapes "
        "Spark/Trino write on tables without merge-on-read.",
)
def iceberg_cow_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from ..iceberg_changes import read_iceberg_changes
    from .fixtures import shared

    path = shared(spark, sf_dir, "iceberg_cow_update_table")
    rows = read_iceberg_changes(spark, path)
    return (
        rows.groupBy(
            F.col("_change_type").alias("change_type"), "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("change_type", "o_orderstatus", "n_rows", "total_price")
    )


@register(
    "iceberg_changelog_stream_mor",
    oracle=f"""
    SELECT change_type, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('p')} AS total_price
    FROM (
        SELECT 'insert' AS change_type, o_orderstatus,
               CAST(o_totalprice AS DOUBLE) AS p
        FROM orders WHERE o_orderkey % 16 = 15
        UNION ALL
        SELECT 'delete', o_orderstatus, CAST(o_totalprice AS DOUBLE)
        FROM orders WHERE o_orderkey % 32 = 15
        UNION ALL
        SELECT 'insert', o_orderstatus,
               CAST(o_totalprice AS DOUBLE) * 2 + 1000000000.0
        FROM orders WHERE o_orderkey % 32 = 15
        UNION ALL
        SELECT 'delete', o_orderstatus,
               CAST(o_totalprice AS DOUBLE) * 2 + 1000000000.0
        FROM orders WHERE o_orderkey % 32 = 15
    )
    GROUP BY change_type, o_orderstatus
    """,
    doc="STREAMING the Iceberg changelog over MERGE-ON-READ delete "
        "shapes (r12): stream_iceberg(changelog=True) drains a chain of "
        "append -> Flink-CDC upsert (ONE snapshot: global equality "
        "delete + new rows) -> copy-on-write DELETE. The equality "
        "delete resolves worker-side against each parent live file "
        "(null-safe length-prefixed key matching, the batch reader's "
        "semantics), emitting the OLD row values as deletes and the "
        "upsert's rows as inserts; the COW removal emits the removed "
        "file's live-at-parent rows as deletes (gross emission, "
        "iceberg-spark's changelog shape). The upsert's rewritten "
        "prices are offset +1e9 so the COW predicate removes exactly "
        "the upsert's file — the file-granular emission is a "
        "deterministic row set at every sf. In-query assertion pins "
        "exactly THREE stamped snapshots. Previously both shapes "
        "refused, naming read_iceberg_changes as the remedy "
        "(VERDICT r11 task #2). Reference scope: the day-over-day diff "
        "consumer (monday_etl_automated.py:600-645) fed incrementally "
        "by upstream engines that write CDC upserts or COW deletes.",
)
def iceberg_changelog_stream_mor(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from .fixtures import shared

    out = shared(spark, sf_dir, "lakehouse_stream_drains")
    rows = spark.read.parquet(out["changelog_mor_out"])
    stamps = {(r["_commit_snapshot_id"], r["_change_ordinal"]) for r in
              rows.select("_commit_snapshot_id", "_change_ordinal")
              .distinct().collect()}
    sids = {s for s, _o in stamps}
    if len(sids) != 3:  # append + upsert + COW delete
        raise AssertionError(f"changelog stamped {len(sids)} snapshots")
    if {o for _s, o in stamps} != {0, 1, 2}:  # dense per-batch ordinals
        raise AssertionError(f"ordinals not dense: {sorted(stamps)}")
    return (
        rows.groupBy(
            F.col("_change_type").alias("change_type"), "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("change_type", "o_orderstatus", "n_rows", "total_price")
    )


@register(
    "iceberg_backfill_hybrid",
    oracle=f"""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty
    FROM lineitem WHERE l_orderkey % 16 IN (3, 7)
    GROUP BY l_returnflag
    """,
    doc="Hybrid backfill (r13): streaming.backfill.backfill_iceberg "
        "pins the table's current snapshot as the boundary, serves it "
        "through the JVM batch reader (whole-stage codegen, no Python "
        "in the scan), and hands the Python-DataSource stream an "
        "EXCLUSIVE offset (after_snapshot_id) so only the post-boundary "
        "tail pays the per-row Arrow-boundary cost — the automatic form "
        "of the split the r12 rehearsal measured at ~6x (SCALE.md). The "
        "%16==3 subset is the pinned snapshot, the %16==7 subset lands "
        "AFTER the boundary and arrives only via the tail; the fixture "
        "asserts exactly-once (no key crosses sides) and the union must "
        "aggregate to the relational restatement of both subsets. "
        "Reference scope: the full-board re-extract feeding the "
        "*_historical append (monday_etl_automated.py:196,583-589), "
        "re-expressed as scan + stream.",
)
def iceberg_backfill_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money_sum
    from .fixtures import shared

    out = shared(spark, sf_dir, "iceberg_backfill_drain")
    cols = ["l_orderkey", "l_returnflag", "l_quantity"]
    snap = spark.read.parquet(out["snapshot_out"]).select(*cols)
    tail = spark.read.parquet(out["tail_out"]).select(*cols)
    return (
        snap.unionByName(tail)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


@register(
    "iceberg_partition_evolution",
    oracle=f"""
    SELECT CAST(TRUE AS BOOLEAN) AS evolution_ok, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderkey % 8 = 5
      AND o_orderdate BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
    GROUP BY o_orderstatus
    """,
    doc="Iceberg partition-spec EVOLUTION (r13): a table appended "
        "unpartitioned (era 1), evolved to identity(o_orderstatus) via a "
        "metadata-only commit, then appended under the new spec (era 2) "
        "— no data moved. The read resolves the mixed-spec file set: "
        "era-1 files carry the column physically, era-2 files carry it "
        "only in their manifest tuples and inject it per file group "
        "(_identity_sources unions identity fields across ALL specs, not "
        "just the default). In-query invariants: default-spec-id moved "
        "to the new spec with the old one retained; era-2 per-status "
        "counts from the spec-1 manifests' record_count sums equal the "
        "read-back era-2 rows; at least one era-2 data file physically "
        "LACKS the partition column. Oracle: the plain relational "
        "restatement over the raw parquet (evolution_ok surfaces the "
        "checks). Reference scope: repartitioning a warehouse table as "
        "its query patterns shift (monday_etl_automated.py:560-590) "
        "without the full-rewrite the reference's CTAS would need.",
)
def iceberg_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow.parquet as _pq

    from ..functions import money_sum
    from ..iceberg_import import (
        _decode_manifest,
        _from_uri,
        _select_snapshot,
        _split_manifests,
        read_iceberg_table,
        read_metadata,
    )
    from .fixtures import shared

    path = shared(spark, sf_dir, "iceberg_evolved_table")
    df = read_iceberg_table(spark, path)

    meta = read_metadata(path)
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    if meta["default-spec-id"] != 1 or set(specs) != {0, 1}:
        raise AssertionError(f"spec history wrong: {meta['partition-specs']}")
    if specs[0]["fields"] or [
        (f["name"], f["transform"]) for f in specs[1]["fields"]
    ] != [("o_orderstatus", "identity")]:
        raise AssertionError("evolved spec shape wrong")

    # era-2 (spec-1) entries: partition tuple carries o_orderstatus
    snap = _select_snapshot(meta, None, None)
    data_mans, _ = _split_manifests(meta, snap)
    era2_counts: dict[str, int] = {}
    era2_files: list[str] = []
    for m in data_mans:
        for t in _decode_manifest(m, want_bounds=False):
            if t[0] in (0, 1):
                p = json.loads(t[5])
                if "o_orderstatus" in p:
                    era2_counts[p["o_orderstatus"]] = (
                        era2_counts.get(p["o_orderstatus"], 0) + t[3])
                    era2_files.append(_from_uri(t[1]))
    got2 = {
        r["o_orderstatus"]: r["n"]
        for r in df.filter(F.col("o_orderdate") >= "1995-03-16")
        .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if got2 != era2_counts:
        raise AssertionError(
            f"era-2 manifest counts {era2_counts} != read {got2}")
    if not era2_files or any(
        "o_orderstatus" in _pq.ParquetFile(f).schema_arrow.names
        for f in era2_files
    ):
        raise AssertionError(
            "era-2 files must be identity-routed (no physical column)")

    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.lit(True).alias("evolution_ok"), "o_orderstatus",
            "n_rows", "total_price",
        )
    )
