"""Declarative table catalog — the reference's explicit BigQuery schemas as
StructTypes (O-33, monday_etl_automated.py:64-146; etl_final_fix.py:230-261).

The reference supports two schema modes (SURVEY §1.3): explicit declaration
(these StructTypes — the production path, etl_final_fix) and autodetect
(schema inference; Spark's inferSchema / createDataFrame-from-pandas). The
normalize layer's outputs are validated against this catalog in tests, so the
transform and the declared contract can't drift apart.

``ensure_table`` is the create-if-not-exists analogue: parquet needs no DDL,
so "creating" a historical table means materializing an empty day-partitioned
dataset with the declared schema (idempotent, like the reference's
get-or-create at :159-170).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def _lineage() -> list[T.StructField]:
    return [
        T.StructField("extraction_date", T.DateType()),
        T.StructField("extraction_timestamp", T.TimestampType()),
    ]


def _audit() -> list[T.StructField]:
    return [
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]


PROJECTS = T.StructType(
    _lineage()
    + [
        T.StructField("project_id", T.StringType()),
        T.StructField("project_name", T.StringType()),
        T.StructField("po", T.StringType()),
        T.StructField("data_avvio", T.DateType()),
        T.StructField("var_non_var", T.StringType()),
        T.StructField("circolo", T.StringType()),
        T.StructField("tipologia", T.StringType()),
        T.StructField("stato_pipeline", T.StringType()),
        T.StructField("aperto_chiuso", T.StringType()),
    ]
    + _audit()
)

PROJECT_SUBITEMS = T.StructType(
    _lineage()
    + [
        T.StructField("subitem_id", T.StringType()),
        T.StructField("project_id", T.StringType()),
        T.StructField("subitem_name", T.StringType()),
        T.StructField("po", T.StringType()),
        T.StructField("timeline_start", T.DateType()),
        T.StructField("timeline_end", T.DateType()),
        T.StructField("revenue_amount", T.DoubleType()),
        T.StructField("status", T.StringType()),
        T.StructField("tipologia", T.StringType()),
    ]
    + _audit()
)

PERSONNEL_COSTS = T.StructType(
    _lineage()
    + [
        T.StructField("cost_id", T.StringType()),
        T.StructField("cost_name", T.StringType()),
        T.StructField("person", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("linked_subitem_id", T.StringType()),
        T.StructField("linked_subitem_name", T.StringType()),
    ]
    + _audit()
)

TRAVEL_COSTS = T.StructType(
    _lineage()
    + [
        T.StructField("cost_id", T.StringType()),
        T.StructField("cost_name", T.StringType()),
        T.StructField("person", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("date", T.DateType()),
        T.StructField("stato", T.StringType()),
        T.StructField("pagata_con", T.StringType()),
        T.StructField("linked_subitem_id", T.StringType()),
        T.StructField("linked_subitem_name", T.StringType()),
    ]
    + _audit()
)

SUPPLIER_COSTS = T.StructType(
    _lineage()
    + [
        T.StructField("cost_id", T.StringType()),
        T.StructField("cost_name", T.StringType()),
        T.StructField("imponibile", T.DoubleType()),
        T.StructField("tipologia", T.StringType()),
        T.StructField("stato_ordine", T.StringType()),
        T.StructField("iva", T.DoubleType()),
        T.StructField("linked_subitem_id", T.StringType()),
        T.StructField("linked_subitem_name", T.StringType()),
    ]
    + _audit()
)

CATALOG: dict[str, T.StructType] = {
    "projects": PROJECTS,
    "project_subitems": PROJECT_SUBITEMS,
    "personnel_costs": PERSONNEL_COSTS,
    "travel_costs": TRAVEL_COSTS,
    "supplier_costs": SUPPLIER_COSTS,
}


def read_table(spark: SparkSession, base_path: str, table: str,
               historical: bool = True):
    """Read with the declared schema — required for freshly-created empty
    partitioned datasets (no files to infer from), and a guard against
    drift for populated ones."""
    suffix = "_historical" if historical else ""
    return spark.read.schema(CATALOG[table]).parquet(
        os.path.join(base_path, f"{table}{suffix}")
    )


def ensure_table(spark: SparkSession, base_path: str, table: str,
                 historical: bool = True) -> str:
    """Idempotent create-if-not-exists: materialize an empty dataset with the
    declared schema (and day partitioning for historical) when absent."""
    suffix = "_historical" if historical else ""
    path = os.path.join(base_path, f"{table}{suffix}")
    if not os.path.exists(path):
        empty = spark.createDataFrame([], CATALOG[table])
        writer = empty.write.mode("overwrite")
        if historical:
            writer = writer.partitionBy("extraction_date")
        writer.parquet(path)
    return path


def load_autodetect(spark: SparkSession, path: str, fmt: str = "parquet"):
    """O-34 schema-autodetect load (ref monday_etl_automated.py:573-577,
    etl_quick_fix.py:284-296: BigQuery load jobs with ``autodetect=True``).

    Spark-first equivalents per format: parquet carries its own schema
    (autodetect is free); JSON/CSV sample the data for inference (the same
    behavior class as BigQuery's autodetect — order-stable, but a column of
    all-null/empty strings infers STRING, exactly the drift the declared
    CATALOG protects the production path against).
    """
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.json(path)
    if fmt == "csv":
        return spark.read.option("header", "true").option(
            "inferSchema", "true"
        ).csv(path)
    raise ValueError(f"unsupported autodetect format: {fmt}")


def autodetect_drift(spark: SparkSession, path: str, table: str,
                     fmt: str = "parquet") -> list[str]:
    """Compare an autodetected load's schema against the declared catalog
    entry; returns human-readable drift lines (empty = contract holds).
    The reference has no such guard — autodetect drift reached BigQuery
    silently; here it is observable before publish."""
    inferred = {f.name: f.dataType.simpleString()
                for f in load_autodetect(spark, path, fmt).schema.fields}
    declared = {f.name: f.dataType.simpleString()
                for f in CATALOG[table].fields}
    drift = []
    for name, dtype in declared.items():
        got = inferred.get(name)
        if got is None:
            drift.append(f"missing column: {name} ({dtype})")
        elif got != dtype:
            drift.append(f"type drift: {name} declared {dtype}, inferred {got}")
    for name in inferred:
        if name not in declared:
            drift.append(f"undeclared column: {name}")
    return drift


# ------------------------------------------------------- sf test tables

# Declared schemas for the benchmark/test tables (r08, verdict item #8):
# the same declared-catalog discipline the monday tables get, extended to
# the sf parquet tables so ``io.load_table`` NEVER runs a Spark
# schema-inference job — it types reads from the parquet footer
# (driver-side pyarrow) and validates the result against these
# declarations, so generator drift fails loudly at the fix site instead
# of surfacing NULL columns eleven queries later (the r02 events.ts
# lesson). ``events.ts`` is declared per-vintage flexible: the generator
# has shipped both raw-int64-nanos and timestamp encodings, and
# ``normalize_event_ts`` handles either — the vintage guard
# (assert_known_events_vintage) owns that contract.
SF_TABLE_DDL: dict[str, str] = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": "c_custkey bigint, c_name string, c_nationkey int, "
                "c_acctbal double, c_mktsegment string",
    "supplier": "s_suppkey bigint, s_name string, s_nationkey int, "
                "s_acctbal double",
    "part": "p_partkey bigint, p_name string, p_brand string, "
            "p_type string, p_size int, p_retailprice double",
    "orders": "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string",
    "lineitem": "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
                "l_linenumber int, l_quantity double, "
                "l_extendedprice double, l_discount double, l_tax double, "
                "l_returnflag string, l_linestatus string, "
                "l_shipdate timestamp",
    "events": "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string",
    "documents": "doc_id bigint, text string, lang string, source string, "
                 "n_chars bigint",
    "embeddings": "vec_id bigint, embedding array<float>, label int",
}

_TS_VINTAGES = {"timestamp", "bigint"}  # raw int64 nanos or typed


def assert_sf_schema(name: str, schema) -> None:
    """Loud drift guard: a footer-resolved sf-table schema must match its
    declaration (names, order, types). Unknown table names pass (ad-hoc
    paths routed through load_table are the caller's contract)."""
    ddl = SF_TABLE_DDL.get(name)
    if ddl is None:
        return
    declared = [tuple(c.rsplit(" ", 1)) for c in ddl.split(", ")]
    got = [(f.name, f.dataType.simpleString()) for f in schema.fields]
    for (dn, dt), (gn, gt) in zip(declared, got):
        if dn != gn or (dt != gt and not (
                name == "events" and dn == "ts" and gt in _TS_VINTAGES)):
            raise AssertionError(
                f"sf table {name!r} drifted from the declared catalog: "
                f"footer has {gn} {gt}, catalog declares {dn} {dt} — "
                "update catalog.SF_TABLE_DDL if the generator changed"
            )
    if len(declared) != len(got):
        raise AssertionError(
            f"sf table {name!r}: {len(got)} footer columns vs "
            f"{len(declared)} declared — update catalog.SF_TABLE_DDL"
        )
