"""Read (and append to) Apache Iceberg tables that OTHER engines wrote.

``iceberg_export`` is the outbound half of the second open-ecosystem
bridge; this is the inbound half, implemented — like ``delta_import`` —
directly from the PUBLIC table spec (iceberg.apache.org/spec/), no
Iceberg library required:

- **discovery**: ``metadata/version-hint.text`` (HadoopCatalog) when
  present, else the highest ``vN.metadata.json`` / ``NNNNN-<uuid>
  .metadata.json`` in the metadata dir (the spec's two file-naming
  conventions);
- **snapshot selection**: current snapshot, explicit ``snapshot_id``, or
  ``as_of_ms`` resolved through ``snapshot-log`` (time travel);
- **manifest walk**: Avro manifest list -> Avro manifests (``avro_ocf``
  decodes with each file's own embedded writer schema, codecs null and
  deflate — iceberg-java's default), entries live when status is
  ADDED/EXISTING;
- **column resolution is by FIELD ID**, the property that makes Iceberg
  renames metadata-only. Files whose parquet footers carry ids (what real
  engines write) resolve through Spark's native field-id reader
  (``spark.sql.parquet.fieldId.read.enabled`` + ``parquet.field.id``
  requested-schema metadata) — ONE JVM-side scan for every id-stamped
  file regardless of rename history. Files without footer ids (Hive
  migrations via ``add_files``, our own exporter) resolve through the
  table's ``schema.name-mapping.default`` property, one scan with
  per-field coalesce over the mapped candidate names; identity-partition
  source columns physically absent from such files are injected as typed
  constants from the manifest's partition tuple (the spec's rule for
  migrated files);
- **stats pruning**: per-file ``lower_bounds``/``upper_bounds`` decode
  from Iceberg single-value serialization and files are pruned BEFORE any
  Spark scan; manifest entries are decoded on EXECUTORS above a small
  threshold so a 100 TB table's million-entry manifests never
  materialize on the driver (the r07 ``delta_import`` audit finding,
  applied here at design time);
- **appends** commit a new snapshot under the HadoopCatalog protocol: new
  parquet files written by Spark, a new Avro manifest with per-file
  bounds, a manifest list carrying the prior snapshot's manifests, and
  ``v(N+1).metadata.json`` published through the ``tableformat.LogStore``
  conditional-put seam — a lost race raises instead of clobbering.

**Merge-on-read**: v2 position and equality DELETE files are APPLIED by
``read_iceberg_table`` (the shape Flink CDC writes constantly) — per-row
provenance comes from the parquet scan's ``_metadata`` struct (file path
+ row index, JVM-side) and application is broadcast anti-joins under the
spec's sequence rules (position: ``data_seq <= delete_seq``; equality:
strict ``<``, NULLs match, partition-scoped unless the delete's tuple is
empty). Path-level surfaces that cannot carry deletes
(``iceberg_files_where``, the streaming source) refuse them loudly
instead.

Loud refusals (``IcebergProtocolError``) for everything else the spec
says a non-implementing reader must not silently ignore: format-version
3, nested struct/map columns, and unsupported Avro codecs.

Reference scope: the reference emits open-ecosystem BigQuery tables
(monday_etl_automated.py:571-590); the two bridge halves give this engine
the equivalent two-way handoff surface in the Iceberg ecosystem.
"""

from __future__ import annotations

import json
import os
import re
import struct
import time
import urllib.parse
import uuid
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
    _parse_datatype_string,
)

from . import tableformat as _tf
from .avro_ocf import read_ocf
from .iceberg_export import _MANIFEST_ENTRY, _bound_bytes
from .tableformat import ConcurrentCommitError

_META_DIR = "metadata"

# file count below which manifest entries decode driver-side (the constant
# per-query cost of a Spark job outweighs decoding a few KB of Avro); above
# it, entries decode on executors and only surviving paths return.
_DRIVER_DECODE_MAX_MANIFESTS = 8

# delete-side row count (straight from manifest record_count — no job)
# up to which merge-on-read anti-joins BROADCAST the delete set; beyond
# it they degrade to a shuffle-hash join instead of shipping a multi-GB
# bitmap of (path, pos) rows to every executor. ~2M rows of
# (path string, pos long) is low hundreds of MB — inside a healthy
# executor, far under driver collect limits.
_DELETE_BROADCAST_MAX_ROWS = 2_000_000


class IcebergProtocolError(RuntimeError):
    """The table uses a spec feature this bridge does not implement;
    reading anyway would return wrong data, so it refuses loudly."""


# ------------------------------------------------------------- discovery


_V_RE = re.compile(r"^v(\d+)\.metadata\.json$")
_SEQ_RE = re.compile(r"^(\d+)-[0-9a-f-]+(?:\.gz)?\.metadata\.json$")


def _meta_dir(path: str) -> str:
    return os.path.join(path, _META_DIR)


def metadata_versions(path: str) -> dict[int, str]:
    """Every metadata file in the table's metadata dir, keyed by version —
    both spec naming conventions (``vN.metadata.json`` from HadoopCatalog,
    ``NNNNN-<uuid>.metadata.json`` from Hive/REST catalog writers)."""
    out: dict[int, str] = {}
    for name in os.listdir(_meta_dir(path)):
        m = _V_RE.match(name) or _SEQ_RE.match(name)
        if m:
            if name.endswith(".gz.metadata.json"):
                raise IcebergProtocolError(
                    f"{name}: gzip-compressed metadata is not supported"
                )
            out[int(m.group(1))] = os.path.join(_meta_dir(path), name)
    return out


def read_metadata(path: str, version: int | None = None) -> dict:
    """The table metadata dict: ``version`` if given, else the
    version-hint's target when the hint exists and resolves, else the
    highest discoverable version (the spec's listing fallback)."""
    versions = metadata_versions(path)
    if version is None:
        hint = os.path.join(_meta_dir(path), "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as fh:
                hv = int(fh.read().strip())
            if hv in versions:
                version = hv
        if version is None:
            if not versions:
                raise FileNotFoundError(
                    f"no metadata.json under {_meta_dir(path)}"
                )
            version = max(versions)
    with open(versions[version]) as fh:
        meta = json.load(fh)
    fv = meta.get("format-version", 1)
    if fv not in (1, 2):
        raise IcebergProtocolError(
            f"format-version {fv}: this bridge implements v1/v2 tables "
            "(v3 adds row lineage and binary deletion vectors)"
        )
    return meta


def _from_uri(p: str) -> str:
    if p.startswith("file://"):
        return urllib.parse.unquote(p[len("file://"):])
    return p


# ------------------------------------------------------ snapshot selection


def iceberg_history(path: str) -> list[dict]:
    """``[{snapshot_id, timestamp_ms, operation}]`` oldest-first."""
    meta = read_metadata(path)
    return [
        {
            "snapshot_id": s["snapshot-id"],
            "timestamp_ms": s.get("timestamp-ms"),
            "operation": (s.get("summary") or {}).get("operation"),
        }
        for s in sorted(
            meta.get("snapshots", []), key=lambda s: s.get("timestamp-ms", 0)
        )
    ]


def _select_snapshot(meta: dict, snapshot_id: int | None,
                     as_of_ms: int | None, ref: str | None = None) -> dict:
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if ref is not None:
        refs = meta.get("refs") or {}
        if ref not in refs:
            raise ValueError(
                f"ref {ref!r} not in table metadata "
                f"(known: {sorted(refs)})"
            )
        snapshot_id = refs[ref]["snapshot-id"]
    if snapshot_id is not None:
        if snapshot_id not in snaps:
            raise ValueError(f"snapshot {snapshot_id} not in table metadata")
        return snaps[snapshot_id]
    if as_of_ms is not None:
        log = sorted(
            meta.get("snapshot-log", []), key=lambda e: e["timestamp-ms"]
        )
        live = [e for e in log if e["timestamp-ms"] <= as_of_ms]
        if not live:
            raise ValueError(
                f"no snapshot at or before {as_of_ms} (earliest logged: "
                f"{log[0]['timestamp-ms'] if log else 'none'})"
            )
        return snaps[live[-1]["snapshot-id"]]
    cur = meta.get("current-snapshot-id")
    if cur is None or cur == -1 or cur not in snaps:
        raise ValueError("table has no current snapshot")
    return snaps[cur]


def _schema_for(meta: dict, snap: dict) -> dict:
    """The Iceberg schema the snapshot was written under (v2 ``schemas`` by
    id; v1 single ``schema`` fallback)."""
    if "schemas" in meta:
        sid = snap.get("schema-id", meta.get("current-schema-id", 0))
        for s in meta["schemas"]:
            if s.get("schema-id", 0) == sid:
                return s
    if "schema" in meta:
        return meta["schema"]
    raise IcebergProtocolError("metadata carries no schema")


# --------------------------------------------------------- manifest walk


def _manifest_paths(meta: dict, snap: dict) -> list[dict]:
    """The snapshot's manifest-file records. v2: via ``manifest-list``
    Avro; v1 also allowed an inline ``manifests`` path list."""
    if snap.get("manifest-list"):
        _, _, manifests = read_ocf(_from_uri(snap["manifest-list"]))
        return manifests
    if snap.get("manifests") is not None:
        return [{"manifest_path": p, "content": 0}
                for p in snap["manifests"]]
    raise IcebergProtocolError("snapshot names no manifests")


def _decode_manifest(arg, want_bounds: bool = True) -> list[tuple]:
    """One manifest's entries, projected to the tuple shape pruning and
    scanning need: ``arg`` is a path or ``(path, manifest_sequence)`` —
    entries with a null sequence number inherit the manifest's (the
    spec's inheritance rule). Runs on executors for large tables — keep
    it self-contained (only stdlib + avro_ocf). Scan planning passes
    ``want_bounds=False``: the bounds blobs dominate entry size and a
    million-file table's driver should not hold them when only paths,
    partitions, and sequence numbers are needed."""
    import base64

    from .avro_ocf import read_ocf as _read

    mpath, mseq = arg if isinstance(arg, tuple) else (arg, 0)
    _, _, entries = _read(_from_uri(mpath))
    out = []
    for e in entries:
        d = e.get("data_file") or {}
        b64 = {
            side: json.dumps({
                str(kv["key"]): base64.b64encode(kv["value"]).decode()
                for kv in (d.get(f"{side}_bounds") or [])
                if kv.get("value") is not None
            }) if want_bounds else "{}"
            for side in ("lower", "upper")
        }
        seq = e.get("sequence_number")
        esnap = e.get("snapshot_id")
        out.append((
            int(e.get("status", 1)),
            d.get("file_path"),
            (d.get("file_format") or "PARQUET").upper(),
            int(d.get("record_count", 0)),
            int(d.get("content", 0)),
            # sort_keys: partition tuples are COMPARED as strings across
            # manifests (equality-delete scoping) — a foreign writer's
            # field order must not defeat the match
            json.dumps(d.get("partition") or {}, default=str,
                       sort_keys=True),
            b64["lower"],
            b64["upper"],
            int(seq if seq is not None else mseq),
            json.dumps(sorted(d.get("equality_ids") or [])),
            # the ENTRY's own snapshot_id (spec: null inherits the
            # manifest's added_snapshot_id) — changelog readers need it
            # to skip older entries riding in merged manifests
            None if esnap is None else int(esnap),
        ))
    return out


def _live_entries_df(spark: SparkSession,
                     data_manifests: list[tuple]) -> DataFrame:
    """Live (ADDED/EXISTING) data-file entries as a DataFrame. Small
    manifest sets decode driver-side (no job); larger sets decode on
    EXECUTORS — one task per manifest, exactly how Iceberg's own planning
    distributes — so entry sets scale with the cluster, not driver heap."""
    schema = (
        "status int, file_path string, file_format string, "
        "record_count bigint, content int, partition_json string, "
        "lower_json string, upper_json string, seq bigint, "
        "equality_json string, entry_snapshot_id bigint"
    )
    if len(data_manifests) <= _DRIVER_DECODE_MAX_MANIFESTS:
        rows = [t for m in data_manifests for t in _decode_manifest(m)]
        df = spark.createDataFrame(rows, schema)
    else:
        rdd = (
            spark.sparkContext
            .parallelize(data_manifests, len(data_manifests))
            .flatMap(_decode_manifest)
        )
        df = spark.createDataFrame(rdd, schema)
    return df.filter(F.col("status").isin(0, 1))


def _live_entry_tuples(spark: SparkSession, mans: list[tuple],
                       want_bounds: bool = False) -> list[tuple]:
    """Live (ADDED/EXISTING) entry tuples for scan planning. Small
    manifest sets decode driver-side (no job); larger sets decode on
    EXECUTORS — one task per manifest — and only the projected, dead-
    entry-filtered tuples return (the driver must still hold the
    surviving paths to build the scan, but never pays the Avro decode or
    the deleted-entry churn of a million-file table's manifests)."""
    if len(mans) <= _DRIVER_DECODE_MAX_MANIFESTS:
        return [t for m in mans
                for t in _decode_manifest(m, want_bounds=want_bounds)
                if t[0] in (0, 1)]
    dec = _decode_manifest  # bind for the closure

    def live(arg):
        return [t for t in dec(arg, want_bounds=want_bounds)
                if t[0] in (0, 1)]

    rdd = (spark.sparkContext
           .parallelize(mans, len(mans))
           .flatMap(live))
    return [tuple(t) for t in rdd.collect()]


def _split_manifests(meta: dict, snap: dict) -> tuple[list[tuple], list[tuple]]:
    """``(data manifests, delete manifests)`` for the snapshot, each as
    ``(path, manifest_sequence)`` pairs."""
    data, dele = [], []
    for m in _manifest_paths(meta, snap):
        pair = (m["manifest_path"], int(m.get("sequence_number", 0) or 0))
        if m.get("content", 0) == 1:
            if (m.get("added_files_count", 1) or 0) + (
                m.get("existing_files_count", 0) or 0
            ) > 0:
                dele.append(pair)
        else:
            data.append(pair)
    return data, dele


def _live_manifest_paths(meta: dict, snap: dict) -> list[tuple]:
    """Data-manifest (path, seq) pairs, refusing live deletes — for
    callers whose output contract cannot apply them (path-level pruning,
    the streaming source)."""
    data, dele = _split_manifests(meta, snap)
    if dele:
        raise IcebergProtocolError(
            f"snapshot carries {len(dele)} live DELETE manifest(s): this "
            "surface returns file paths, which cannot carry the "
            "position/equality deletes a correct read must apply — use "
            "read_iceberg_table (it applies them) or compact with the "
            "table's native engine (rewrite_data_files)."
        )
    return data


def _guard_entries(entries: list[tuple]) -> None:
    for t in entries:
        if t[4] != 0:  # data_file.content in a DATA manifest
            raise IcebergProtocolError(
                f"{t[1]}: delete file (content={t[4]}) inside a data "
                "manifest — corrupt metadata"
            )
        if t[2] != "PARQUET":
            raise IcebergProtocolError(
                f"{t[1]}: file_format {t[2]} — only PARQUET data files "
                "are readable here"
            )


# ----------------------------------------------------- schema conversion


def _spark_type(t) -> DataType:
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "list":
            return ArrayType(_spark_type(t["element"]),
                             not t.get("element-required", False))
        if kind == "struct":
            return StructType([
                StructField(f["name"], _spark_type(f["type"]),
                            not f.get("required", False))
                for f in t["fields"]
            ])
        if kind == "map":
            return MapType(_spark_type(t["key"]), _spark_type(t["value"]),
                           not t.get("value-required", False))
        raise IcebergProtocolError(
            f"nested type {kind!r}: no Spark mapping"
        )
    prim = {
        "boolean": BooleanType(), "int": IntegerType(), "long": LongType(),
        "float": FloatType(), "double": DoubleType(), "date": DateType(),
        "string": StringType(), "binary": BinaryType(),
        "timestamptz": TimestampType(), "timestamp": TimestampNTZType(),
    }
    if t in prim:
        return prim[t]
    if isinstance(t, str) and t.startswith("decimal("):
        return _parse_datatype_string(t)
    if isinstance(t, str) and t.startswith("fixed"):
        return BinaryType()
    raise IcebergProtocolError(f"iceberg type {t!r}: no Spark mapping")


def _spark_type_with_ids(t) -> DataType:
    """``_spark_type``, but nested STRUCT fields carry their Iceberg ids
    as ``parquet.field.id`` metadata so the native fieldId reader resolves
    renamed nested fields too. List/map types have no metadata slot in
    Spark; their children match structurally inside the id-matched
    parent, which is how Spark's clipping works."""
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "struct":
            return StructType([
                StructField(f["name"], _spark_type_with_ids(f["type"]),
                            not f.get("required", False),
                            {"parquet.field.id": f["id"]})
                for f in t["fields"]
            ])
        if kind == "list":
            return ArrayType(_spark_type_with_ids(t["element"]),
                             not t.get("element-required", False))
        if kind == "map":
            return MapType(_spark_type_with_ids(t["key"]),
                           _spark_type_with_ids(t["value"]),
                           not t.get("value-required", False))
    return _spark_type(t)


def _name_mapping(meta: dict) -> dict[int, list[str]]:
    """``{field id: candidate footer names}`` from
    ``schema.name-mapping.default`` (empty when the property is absent)."""
    raw = (meta.get("properties") or {}).get("schema.name-mapping.default")
    if not raw:
        return {}
    return {
        m["field-id"]: list(m.get("names") or [])
        for m in json.loads(raw)
        if m.get("field-id") is not None
    }


def _identity_sources(meta: dict) -> dict[int, str]:
    """{source field id: partition field NAME in the manifest's partition
    tuple} for identity transforms across EVERY partition spec — not just
    the default. After partition evolution (a new default spec) the live
    file set mixes files written under old specs, and a file written
    under an identity spec does NOT physically carry the source column
    (it rides Hive-style in the manifest tuple): injection must therefore
    know every identity field any spec ever defined. Safe to union
    because injection only fires for file groups whose partition tuple
    actually CARRIES the field name (``pname in pvals`` at every caller),
    i.e. files written under that spec. Two cross-spec ambiguities have
    no by-name resolution and refuse loudly: the same field name bound to
    different (source, transform) pairs, and the same identity source
    renamed across specs (both require per-manifest spec resolution,
    which no file in a conforming evolution history needs — iceberg-java
    reuses the historical field id AND name when a (source, transform)
    reappears, as does evolve_iceberg_partition_spec)."""
    specs = meta.get("partition-specs")
    if specs is None and meta.get("partition-spec") is not None:
        field_lists = [meta["partition-spec"]]
    else:
        field_lists = [s.get("fields", []) for s in (specs or [])]
    by_name: dict[str, tuple] = {}
    out: dict[int, str] = {}
    for flist in field_lists:
        for f in flist:
            key = (f.get("source-id"), f.get("transform"))
            name = f["name"]
            if name in by_name and by_name[name] != key:
                raise IcebergProtocolError(
                    f"partition field name {name!r} means {by_name[name]} "
                    f"in one spec and {key} in another: by-name identity "
                    "injection would be ambiguous — rewrite the older "
                    "files (compact) under the current spec"
                )
            by_name[name] = key
            if f.get("transform") != "identity":
                continue
            sid = f["source-id"]
            if sid in out and out[sid] != name:
                raise IcebergProtocolError(
                    f"identity partition source id {sid} appears as "
                    f"{out[sid]!r} and {name!r} across specs: injection "
                    "keys on the tuple field name — rewrite the older "
                    "files (compact) under the current spec"
                )
            out[sid] = name
    return out


# ------------------------------------------------------------------ read


def _footer_has_ids(files: list[str], spark: SparkSession) -> dict[str, bool]:
    """Whether each parquet footer stamps field ids (what iceberg-native
    writers do). Probed distributed above a small file count so a huge
    table's planning never serializes a million footer reads on the
    driver."""

    def probe(batch):
        import pyarrow.parquet as pq

        out = []
        for f in batch:
            sch = pq.ParquetFile(f).schema_arrow
            has = all(
                (fld.metadata or {}).get(b"PARQUET:field_id") is not None
                for fld in sch
            )
            out.append((f, has))
        return out

    # a footer open is ~2-3 ms driver-side; the flat cost of one Python
    # RDD job (~1 s) only amortizes past a few hundred files
    if len(files) <= 256:
        return dict(probe(files))
    rdd = spark.sparkContext.parallelize(files, max(1, len(files) // 64))
    return dict(rdd.mapPartitions(lambda it: probe(list(it))).collect())


_URI_RE = re.compile(r"^[A-Za-z0-9+.-]+:/+")


def _norm_path(p: str) -> str:
    """Canonical filesystem path for a manifest/delete-file URI so that
    ``file:/a``, ``file:///a``, and percent-quoted variants all compare
    equal to Spark's raw ``_metadata.file_path``."""
    p = urllib.parse.unquote(p)
    return _URI_RE.sub("/", p)


def _meta_cols() -> list:
    """Per-row provenance for delete application: the scan's normalized
    file path and parquet row index (Spark's _metadata struct — JVM-side,
    no Python in the row path)."""
    return [
        F.regexp_replace(
            F.col("_metadata.file_path"), r"^[A-Za-z0-9+.-]+:/+", "/"
        ).alias("__ice_src"),
        F.col("_metadata.row_index").alias("__ice_pos"),
    ]


def _read_id_files(spark: SparkSession, files: list[str],
                   fields: list[dict], with_meta: bool = False) -> DataFrame:
    """ONE scan of every id-stamped file: the requested schema carries
    ``parquet.field.id`` per field and Spark's vectorized reader resolves
    columns by id — renames across the file set cost nothing. The enabling
    conf stays set for the session (it is resolved at ACTION time, so a
    set-and-restore around the lazy read definition would silently disable
    resolution at execution); it only engages for requested schemas that
    carry field-id metadata, i.e. exactly these reads."""
    req = StructType([
        StructField(f["name"], _spark_type_with_ids(f["type"]), True,
                    {"parquet.field.id": f["id"]})
        for f in fields
    ])
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    raw = spark.read.schema(req).parquet(*files)
    if with_meta:
        return raw.select(
            *[F.col(f"`{f['name']}`") for f in fields], *_meta_cols()
        )
    return raw


def _part_lit(value, dt: DataType):
    """A manifest partition value as a typed Spark literal. Avro decodes
    logical types to their physical carriers (date -> int days,
    timestamp -> long micros)."""
    if value is None:
        return F.lit(None).cast(dt)
    if isinstance(dt, DateType) and isinstance(value, int):
        return F.date_from_unix_date(F.lit(value))
    if isinstance(dt, (TimestampType, TimestampNTZType)) and isinstance(
        value, int
    ):
        return F.timestamp_micros(F.lit(value)).cast(dt)
    return F.lit(value).cast(dt)


# identity-injected partition-tuple groups above which the read switches
# from one-scan-per-tuple (constant injection; zero joins, best for a
# handful of partitions) to ONE scan + a broadcast path-join injecting
# the values (plan size flat no matter how many thousand tuples)
_INJECT_JOIN_MIN_GROUPS = 33

# Avro-physical carrier DDL for identity partition values riding through
# the path-join injection frame (date -> int days, timestamp -> micros).
# A source type outside this map (decimal, uuid, fixed, binary) keeps the
# per-group constant-injection scan, whose _part_lit cast handles any
# primitive — slower plan growth, but never a crash on an exotic
# external table.
_INJECT_PHYS_DDL = {
    "int": "int", "long": "bigint", "string": "string",
    "date": "int", "timestamp": "bigint", "timestamptz": "bigint",
    "boolean": "boolean", "float": "float", "double": "double",
}


def _read_mapped_files(spark: SparkSession, files_parts: list[tuple],
                       fields: list[dict], mapping: dict[int, list[str]],
                       id_part: dict[int, str],
                       with_meta: bool = False) -> DataFrame:
    """Scan of footer-id-less files through the name mapping: each field
    reads as a coalesce over its candidate footer names (a conforming
    table carries each id under at most one name per file). A field with
    NO footer candidate in a file group and an identity-partition source
    injects the manifest partition value as a typed constant (the spec's
    migrated-Hive rule); groups are keyed by partition tuple so the
    constant is per-group. Past ``_INJECT_JOIN_MIN_GROUPS`` tuples the
    per-group unioning would make the LOGICAL PLAN the bottleneck
    (hundreds of scan branches), so the read flips to one scan plus a
    broadcast join on ``_metadata`` file path that carries each file's
    partition values — same rows, flat plan."""
    inject_types_ok = all(
        f["type"] in _INJECT_PHYS_DDL
        for f in fields if id_part.get(f["id"]) is not None
    )
    if (len(files_parts) >= _INJECT_JOIN_MIN_GROUPS and id_part
            and inject_types_ok):
        return _read_mapped_files_joined(
            spark, files_parts, fields, mapping, id_part, with_meta)
    parts = []
    for part_json, files in files_parts:
        pvals = json.loads(part_json)
        read_fields, exprs = [], []
        for f in fields:
            dt = _spark_type(f["type"])
            names = mapping.get(f["id"]) or [f["name"]]
            for n in names:
                read_fields.append(StructField(n, dt, True))
            base = (
                F.coalesce(*[F.col(f"`{n}`") for n in names])
                if len(names) > 1 else F.col(f"`{names[0]}`")
            )
            pname = id_part.get(f["id"])
            if pname is not None and pname in pvals:
                base = F.coalesce(base, _part_lit(pvals[pname], dt))
            exprs.append(base.alias(f["name"]))
        if with_meta:
            exprs = exprs + _meta_cols()
        raw = spark.read.schema(StructType(read_fields)).parquet(*files)
        parts.append(raw.select(*exprs))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _read_mapped_files_joined(
    spark: SparkSession, files_parts: list[tuple], fields: list[dict],
    mapping: dict[int, list[str]], id_part: dict[int, str],
    with_meta: bool,
) -> DataFrame:
    """The many-tuples form of :func:`_read_mapped_files`: ONE scan of
    every file, identity partition values injected through a broadcast
    join on the scan's ``_metadata`` file path against a (file ->
    partition values) frame built from the manifests. The frame is one
    row per FILE — metadata-sized — and the logical plan has a single
    scan branch regardless of how many thousand partition tuples the
    table holds."""
    read_fields, exprs = [], []
    inject = [f for f in fields if id_part.get(f["id"]) is not None]
    for f in fields:
        dt = _spark_type(f["type"])
        names = mapping.get(f["id"]) or [f["name"]]
        for n in names:
            read_fields.append(StructField(n, dt, True))
        base = (
            F.coalesce(*[F.col(f"`{n}`") for n in names])
            if len(names) > 1 else F.col(f"`{names[0]}`")
        )
        exprs.append(base.alias(f["name"]))
    all_files = sorted(f for _pj, fs in files_parts for f in fs)
    raw = spark.read.schema(StructType(read_fields)).parquet(*all_files)
    raw = raw.select(*exprs, *_meta_cols())

    # (normalized path, value per identity field) — values ride in their
    # Avro-physical carriers (date -> int days, timestamp -> micros) and
    # convert to the logical type after the join, exactly like _part_lit.
    # The dispatcher only routes here when every inject type is in
    # _INJECT_PHYS_DDL; anything else stays on the per-group scan.
    phys_ddl = _INJECT_PHYS_DDL
    def phys_val(v, t: str):
        # manifests carry ints already; tolerate an exotic writer's
        # stringly values the same way _part_lit's cast does
        if v is None or not isinstance(v, str) or t == "string":
            return v
        if t == "date":
            import datetime

            return datetime.date.fromisoformat(v).toordinal() - 719163
        if t == "boolean":
            return v.lower() == "true"
        if t in ("float", "double"):
            return float(v)
        return int(v)

    rows = []
    for pj, fs in files_parts:
        pv = json.loads(pj)
        vals = tuple(phys_val(pv.get(id_part[f["id"]]), f["type"])
                     for f in inject)
        for fpath in fs:
            rows.append((os.path.abspath(fpath),) + vals)
    inj_schema = ", ".join(
        ["__inj_src string"]
        + [f"`__inj_{f['id']}` {phys_ddl[f['type']]}" for f in inject]
    )
    inj = spark.createDataFrame(rows, inj_schema)
    out = raw.join(F.broadcast(inj),
                   F.col("__ice_src") == F.col("__inj_src"), "left")

    final = []
    for f in fields:
        col = F.col(f"`{f['name']}`")
        if id_part.get(f["id"]) is not None:
            dt = _spark_type(f["type"])
            injc = F.col(f"`__inj_{f['id']}`")
            if isinstance(dt, DateType):
                injc = F.date_from_unix_date(injc)
            elif isinstance(dt, (TimestampType, TimestampNTZType)):
                injc = F.timestamp_micros(injc).cast(dt)
            else:
                injc = injc.cast(dt)
            col = F.coalesce(col, injc)
        final.append(col.alias(f["name"]))
    if with_meta:
        final += [F.col("__ice_src"), F.col("__ice_pos")]
    return out.select(*final)


def _assemble_read(spark: SparkSession, meta: dict, fields: list[dict],
                   entries: list[tuple],
                   del_entries: list[tuple],
                   keep_meta: bool = False) -> DataFrame:
    """The common scan assembly: group live entries by footer-id presence
    (one native-fieldId scan + one name-mapped scan at most), apply any
    delete files, and surface the logical schema. ``keep_meta`` keeps the
    per-row provenance columns (``__ice_src``, ``__ice_pos``) — the
    delete writer needs them."""
    _guard_entries(entries)
    with_meta = bool(del_entries) or keep_meta
    if not entries:
        extra = ([StructField("__ice_src", StringType(), True),
                  StructField("__ice_pos", LongType(), True)]
                 if keep_meta else [])
        return spark.createDataFrame(
            [], StructType([
                StructField(f["name"], _spark_type(f["type"]), True)
                for f in fields
            ] + extra)
        )
    files = {_from_uri(t[1]): t for t in entries}
    has_ids = _footer_has_ids(sorted(files), spark)
    id_files = sorted(f for f, h in has_ids.items() if h)
    # group footer-id-less files by the partition values that actually
    # INJECT as constants — the identity-transform fields. Non-identity
    # tuple values (bucket/truncate/day...) never materialize as columns,
    # so projecting them away collapses a transform-partitioned table's
    # hundreds of tuples into ONE scan instead of a union of hundreds
    # (plan size stays flat as partition counts grow)
    inject_names = set(_identity_sources(meta).values())
    plain: dict[str, list[str]] = {}
    for f, h in has_ids.items():
        if not h:
            pvals = json.loads(files[f][5])
            key = json.dumps(
                {k: v for k, v in pvals.items() if k in inject_names},
                sort_keys=True)
            plain.setdefault(key, []).append(f)

    parts = []
    if id_files:
        parts.append(_read_id_files(spark, id_files, fields, with_meta))
    if plain:
        parts.append(_read_mapped_files(
            spark, sorted((pj, sorted(fs)) for pj, fs in plain.items()),
            fields, _name_mapping(meta), _identity_sources(meta),
            with_meta,
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if with_meta:
        if del_entries:
            out = _apply_deletes(spark, out, entries, del_entries,
                                 fields, meta)
        keep = [F.col(f"`{f['name']}`") for f in fields]
        if keep_meta:
            keep += [F.col("__ice_src"), F.col("__ice_pos")]
        out = out.select(*keep)
    return out


def read_iceberg_table(spark: SparkSession, path: str,
                       snapshot_id: int | None = None,
                       as_of_ms: int | None = None,
                       metadata_version: int | None = None,
                       ref: str | None = None) -> DataFrame:
    """Materialize an Iceberg table another engine wrote (current
    snapshot, or time travel by ``snapshot_id`` / ``as_of_ms`` / a named
    branch or tag ``ref``). A freshly created table with no snapshot yet
    reads as its (empty) declared schema. A CURRENT read uses the
    table's CURRENT schema (column resolution is by field id, so a
    rename committed after the head snapshot is visible immediately);
    time travel reads each snapshot under the schema it was written
    with — both per the spec's schema-evolution contract."""
    meta = read_metadata(path, metadata_version)
    current_read = (snapshot_id is None and as_of_ms is None
                    and ref is None)
    if current_read and meta.get("current-snapshot-id") in (None, -1):
        fields = _schema_for(meta, {})["fields"]
        return _assemble_read(spark, meta, fields, [], [])
    snap = _select_snapshot(meta, snapshot_id, as_of_ms, ref)
    fields = _schema_for(meta, {} if current_read else snap)["fields"]
    data_mans, del_mans = _split_manifests(meta, snap)
    entries = _live_entry_tuples(spark, data_mans)
    del_entries = _live_entry_tuples(spark, del_mans)
    return _assemble_read(spark, meta, fields, entries, del_entries)


def _apply_deletes(spark: SparkSession, df: DataFrame,
                   entries: list[tuple], del_entries: list[tuple],
                   fields: list[dict], meta: dict) -> DataFrame:
    """Merge-on-read: apply the snapshot's position and equality delete
    files to the scanned rows, per the v2 spec's sequence rules —
    position deletes hit data files with ``data_seq <= delete_seq``,
    equality deletes hit ``data_seq < delete_seq`` strictly; equality
    deletes match NULLs as equal and apply globally when their partition
    tuple is empty, else within their partition. Everything is JVM-side:
    per-row provenance comes from the parquet scan's ``_metadata`` struct
    and application is anti-joins whose strategy is GATED on the delete
    set's size: the manifests already carry each delete file's
    ``record_count``, so choosing broadcast (small side, no shuffle of
    the 100 TB scan) vs shuffle-hash (a delete set too big to ship to
    every executor) costs zero extra jobs. A table whose deletes rival
    its data still wants compaction first — but an over-cap delete set
    now degrades to a shuffle instead of OOMing the broadcast."""
    # per-file (normalized path, partition tuple, data sequence number)
    seq_rows = [(_norm_path(t[1]), t[5], t[8]) for t in entries]
    seq_df = spark.createDataFrame(
        seq_rows, "__ice_src string, __ice_part string, __ice_seq bigint"
    )
    df = df.join(F.broadcast(seq_df), "__ice_src", "left")

    def gated(ddf: DataFrame, n_rows: int) -> DataFrame:
        """Manifest record counts are the (free) size estimate: under the
        cap the delete side broadcasts (no shuffle of the scan side);
        over it, a shuffle-hash anti-join — slower, but it cannot OOM
        every executor the way a multi-GB broadcast would."""
        if n_rows <= _DELETE_BROADCAST_MAX_ROWS:
            return F.broadcast(ddf)
        return ddf.hint("shuffle_hash")

    pos = [t for t in del_entries if t[4] == 1]
    eqs = [t for t in del_entries if t[4] == 2]
    other = [t for t in del_entries if t[4] not in (1, 2)]
    if other:
        raise IcebergProtocolError(
            f"delete manifest entry with content={other[0][4]}: unknown "
            "delete kind"
        )

    if pos:
        by_seq: dict[int, list[str]] = {}
        for t in pos:
            by_seq.setdefault(t[8], []).append(_from_uri(t[1]))
        pieces = []
        for seq in sorted(by_seq):
            pieces.append(
                spark.read.schema("file_path string, pos bigint")
                .parquet(*sorted(by_seq[seq]))
                .withColumn("__del_seq", F.lit(seq))
            )
        pdel = pieces[0]
        for p in pieces[1:]:
            pdel = pdel.unionByName(p)
        pdel = pdel.select(
            F.regexp_replace(
                F.col("file_path"), r"^[A-Za-z0-9+.-]+:/+", "/"
            ).alias("__del_src"),
            F.col("pos").alias("__del_pos"),
            "__del_seq",
        )
        df = df.join(
            gated(pdel, sum(t[3] for t in pos)),
            (F.col("__ice_src") == F.col("__del_src"))
            & (F.col("__ice_pos") == F.col("__del_pos"))
            & (F.col("__del_seq") >= F.col("__ice_seq")),
            "left_anti",
        )

    if eqs:
        id_of = {f["id"]: f for f in fields}
        # group delete files sharing (equality ids, partition, sequence):
        # each group is one read + one null-safe anti-join
        groups: dict[tuple, list[str]] = {}
        group_rows: dict[tuple, int] = {}
        for t in eqs:
            key = (t[9], t[5], t[8])
            groups.setdefault(key, []).append(_from_uri(t[1]))
            group_rows[key] = group_rows.get(key, 0) + t[3]
        for (eq_json, part_json, seq), dfiles in sorted(groups.items()):
            eq_ids = json.loads(eq_json)
            missing = [i for i in eq_ids if i not in id_of]
            if missing:
                raise IcebergProtocolError(
                    f"equality delete references field ids {missing} not "
                    "in the snapshot schema"
                )
            sub_fields = [id_of[i] for i in eq_ids]
            has_ids = _footer_has_ids(sorted(dfiles), spark)
            dparts = []
            idf = sorted(f for f, h in has_ids.items() if h)
            plainf = sorted(f for f, h in has_ids.items() if not h)
            if idf:
                dparts.append(_read_id_files(spark, idf, sub_fields))
            if plainf:
                dparts.append(_read_mapped_files(
                    spark, [("{}", plainf)], sub_fields,
                    _name_mapping(meta), {},
                ))
            ddf = dparts[0]
            for p in dparts[1:]:
                ddf = ddf.unionByName(p)
            ddf = ddf.select(*[
                F.col(f"`{f['name']}`").alias(f"__del_{f['id']}")
                for f in sub_fields
            ]).distinct()
            cond = F.lit(True)
            for f in sub_fields:
                cond = cond & F.col(f"`{f['name']}`").eqNullSafe(
                    F.col(f"__del_{f['id']}"))
            cond = cond & (F.lit(seq) > F.col("__ice_seq"))
            if part_json != "{}":
                cond = cond & (F.col("__ice_part") == F.lit(part_json))
            df = df.join(
                gated(ddf, group_rows[(eq_json, part_json, seq)]),
                cond, "left_anti")

    return df


# --------------------------------------------------------- stats pruning


def _decode_bound(raw: bytes, ice_type: str):
    """Iceberg single-value serialization -> Python value (None = this
    type does not participate in pruning)."""
    if ice_type in ("int", "date"):
        return struct.unpack("<i", raw)[0] if len(raw) == 4 else None
    if ice_type in ("long", "timestamp", "timestamptz"):
        return struct.unpack("<q", raw)[0] if len(raw) == 8 else None
    if ice_type == "float":
        return struct.unpack("<f", raw)[0] if len(raw) == 4 else None
    if ice_type == "double":
        return struct.unpack("<d", raw)[0] if len(raw) == 8 else None
    if ice_type == "string":
        return raw.decode("utf-8", errors="replace")
    return None


def _entry_survives(t: tuple, key: str, ice_type: str | None,
                    lo, hi) -> bool:
    """Bounds check for one decoded entry tuple (conservative keep when
    bounds are absent or the type does not participate)."""
    import base64

    if ice_type is None:
        return True
    lows, ups = json.loads(t[6] or "{}"), json.loads(t[7] or "{}")
    if key not in lows or key not in ups:
        return True
    mn = _decode_bound(base64.b64decode(lows[key]), ice_type)
    mx = _decode_bound(base64.b64decode(ups[key]), ice_type)
    if mn is None or mx is None:
        return True
    return not (mx < lo or mn > hi)


def _pruned_entries(spark: SparkSession, meta: dict, snap: dict,
                    fields: list[dict], column: str, lo, hi,
                    data_mans: list[tuple]) -> tuple[list[tuple], int]:
    """``(surviving live entry tuples, total live files)`` for
    ``lo <= column <= hi`` from manifest bounds. Small manifest sets
    decide driver-side (no Spark job); larger sets decode and decide on
    EXECUTORS, returning only survivors to the driver."""
    fld = next((f for f in fields if f["name"] == column), None)
    if fld is None:
        raise ValueError(f"column {column!r} not in table schema")
    ice_type = fld["type"] if isinstance(fld["type"], str) else None
    key = str(fld["id"])

    if len(data_mans) <= _DRIVER_DECODE_MAX_MANIFESTS:
        live = [t for m in data_mans for t in _decode_manifest(m)
                if t[0] in (0, 1)]
        keep = [t for t in live
                if _entry_survives(t, key, ice_type, lo, hi)]
        return keep, len(live)

    surv = _entry_survives  # bind for the closure

    def decide(arg):
        return [t for t in _decode_manifest(arg)
                if t[0] in (0, 1) and surv(t, key, ice_type, lo, hi)]

    rdd = (spark.sparkContext
           .parallelize(data_mans, len(data_mans))
           .flatMap(decide))
    kept = rdd.collect()
    total = int(
        _live_entries_df(spark, data_mans).count()
    )
    return [tuple(t) for t in kept], total


def iceberg_files_where(spark: SparkSession, path: str, column: str,
                        lo, hi, snapshot_id: int | None = None
                        ) -> tuple[list[str], int]:
    """``(surviving file paths, total live files)`` for ``lo <= column <=
    hi``, decided from manifest bounds BEFORE any data scan. Refuses
    tables with live delete files — paths alone cannot carry them; use
    :func:`read_iceberg_where`, which applies them."""
    meta = read_metadata(path)
    snap = _select_snapshot(meta, snapshot_id, None)
    fields = _schema_for(meta, {} if snapshot_id is None else snap)["fields"]
    data_mans = _live_manifest_paths(meta, snap)
    keep, total = _pruned_entries(
        spark, meta, snap, fields, column, lo, hi, data_mans)
    return sorted(_from_uri(t[1]) for t in keep), total


def read_iceberg_where(spark: SparkSession, path: str, column: str,
                       lo, hi,
                       snapshot_id: int | None = None) -> DataFrame:
    """Range read with manifest-side data skipping: only bounds-matching
    files reach the scan (through the same field-id / name-mapping
    resolution and delete application as the full read — a pruned-away
    data file's deletes no-op by construction), and the exact predicate
    still applies on top."""
    meta = read_metadata(path)
    snap = _select_snapshot(meta, snapshot_id, None)
    fields = _schema_for(meta, {} if snapshot_id is None else snap)["fields"]
    data_mans, del_mans = _split_manifests(meta, snap)
    keep, _total = _pruned_entries(
        spark, meta, snap, fields, column, lo, hi, data_mans)
    del_entries = _live_entry_tuples(spark, del_mans)
    df = _assemble_read(spark, meta, fields, keep, del_entries)
    return df.filter(F.col(f"`{column}`").between(lo, hi))


# ------------------------------------------------------------------ append


_TXN_APP = "monday-etl-txn-app"
_TXN_VER = "monday-etl-txn-version"


def _typed_partition_value(raw: str | None, ice_type: str):
    """A Hive directory value re-typed for the manifest's partition tuple
    (dates carry as epoch days, the Avro physical form)."""
    import datetime

    if raw is None:
        return None
    if ice_type in ("int", "long"):
        return int(raw)
    if ice_type == "date":
        return datetime.date.fromisoformat(raw).toordinal() - 719163
    return raw


class _PartField(NamedTuple):
    name: str           # partition field name (the tuple's key)
    src: dict           # source schema field
    ttype: str          # iceberg type of the TUPLE value the transform emits
    kind: str           # parsed transform kind (identity/bucket/...)
    param: int | None   # bucket N / truncate W


def _resolve_part_fields(spec_fields: list[dict],
                         fields: list[dict]) -> list[_PartField]:
    """The spec's partition fields resolved against the schema, transform
    parsed (identity, bucket[N], truncate[W], year/month/day/hour — the
    full spec §Partition Transforms set). Identity values route
    Hive-style and inject on read; non-identity values are COMPUTED
    per-row (iceberg_transforms.py) and live only in the manifest tuple —
    the source column stays in the data files, since a transform is not
    invertible."""
    from .iceberg_transforms import TransformError, parse_transform, \
        tuple_ice_type

    by_id = {f["id"]: f for f in fields}
    out = []
    for pf_spec in spec_fields:
        src = by_id.get(pf_spec["source-id"])
        if src is None:
            raise IcebergProtocolError(
                f"partition source id {pf_spec['source-id']} not in schema"
            )
        try:
            kind, param = parse_transform(pf_spec["transform"])
        except TransformError as e:
            raise IcebergProtocolError(str(e)) from e
        if not isinstance(src["type"], str):
            raise IcebergProtocolError(
                f"partition source {src['name']!r}: nested types cannot "
                "be partition sources"
            )
        if kind == "identity" and src["type"] not in (
            "int", "long", "string", "date"
        ):
            raise IcebergProtocolError(
                f"identity partition on type {src['type']!r}: this writer "
                "supports int/long/string/date partition columns"
            )
        out.append(_PartField(pf_spec["name"], src,
                              tuple_ice_type(kind, src["type"]),
                              kind, param))
    return out


def _write_data_files(typed: DataFrame, path: str, part_fields: list,
                      prefix: str) -> list[tuple]:
    """Write the rows as parquet under a fresh unique directory. Identity
    partitions route Hive-style — the values live in each manifest
    entry's typed partition tuple, and readers re-derive the columns as
    identity constants: ours does; iceberg-java's PartitionUtil
    constantsMap does the same, which is also the spec's rule for
    migrated files. Non-identity transforms (bucket/truncate/time) route
    by a COMPUTED column (iceberg_transforms.py) that ``partitionBy``
    strips from the files — the SOURCE column stays in the data, since a
    transform is not invertible; only the tuple carries the transform
    value. Returns [(abs path, {partition field: typed value})]."""
    from .iceberg_transforms import TransformError, transform_column

    data_dir = os.path.join(path, "data", prefix)
    part_cols: list[str] = []
    for pf in part_fields:
        if pf.kind == "identity":
            part_cols.append(pf.src["name"])
            continue
        cname = f"__ice_pt_{pf.name}"
        try:
            typed = typed.withColumn(cname, transform_column(
                pf.kind, pf.param, F.col(f"`{pf.src['name']}`"),
                typed.schema[pf.src["name"]].dataType))
        except TransformError as e:
            raise IcebergProtocolError(str(e)) from e
        part_cols.append(cname)
    writer = typed.write
    if part_cols:
        # Iceberg's write.distribution-mode=hash: cluster rows by the
        # partition tuple BEFORE the dynamic-partition write, so each
        # tuple's rows land in one task and each task writes its
        # directories as one sequential run — measured 4.6x faster than
        # the unclustered write at a 9.4k-tuple day+bucket spec, and it
        # is what keeps file count at one per tuple instead of
        # (input tasks x tuples) when the source scatters tuples. The
        # partition COUNT is pinned explicitly: a column-only
        # repartition is AQE-rebalanceable, and at small data AQE
        # coalesces the write to a couple of tasks that then create
        # thousands of directories serially (measured: 122 s vs 28 s at
        # the same spec)
        n_shuffle = int(typed.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "200"))
        typed = typed.repartition(
            n_shuffle, *[F.col(f"`{c}`") for c in part_cols])
        writer = typed.write.partitionBy(*part_cols)
    writer.parquet(data_dir)
    rel_files = []
    for root_dir, _dirs, names in sorted(os.walk(data_dir)):
        rel_sub = os.path.relpath(root_dir, data_dir)
        pv_raw: dict[str, str | None] = {}
        if rel_sub != ".":
            for comp in rel_sub.split(os.sep):
                k, _, v = comp.partition("=")
                v = urllib.parse.unquote(v)
                pv_raw[k] = (None if v == "__HIVE_DEFAULT_PARTITION__"
                             else v)
        if part_fields and set(pv_raw) != set(part_cols):
            continue  # not a leaf partition directory
        tuple_vals = {}
        for pf, cname in zip(part_fields, part_cols):
            raw = pv_raw.get(cname)
            tuple_vals[pf.name] = _typed_partition_value(raw, pf.ttype)
        for name in sorted(names):
            if name.endswith(".parquet"):
                rel_files.append(
                    (os.path.join(root_dir, name), tuple_vals))
    return rel_files


def _footer_file_stats(absf: str) -> tuple[str, int, int, dict]:
    """One data file's manifest raw material: (path, rows, bytes,
    {column: (min, max)}). Self-contained so the manifest builder can
    run it on EXECUTORS — a transform-partitioned append can emit
    thousands of files, and a driver-side sequential footer walk was
    measured at ~12ms/file (2 minutes for a 9.6k-tuple day+bucket
    append at sf0.1) before this moved out."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(absf)
    nrec = pf.metadata.num_rows
    stats: dict[str, tuple] = {}
    for rg in range(pf.metadata.num_row_groups):
        grp = pf.metadata.row_group(rg)
        for ci in range(grp.num_columns):
            col = grp.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            name = col.path_in_schema
            mn, mx = st.min, st.max
            if name in stats:
                omn, omx = stats[name]
                mn, mx = min(omn, mn), max(omx, mx)
            stats[name] = (mn, mx)
    return absf, nrec, os.path.getsize(absf), stats


# footer opens are ~2-12 ms driver-side; one RDD job's flat ~1 s cost
# only amortizes past a few hundred files (same constant as
# _footer_has_ids)
_FOOTER_STATS_DRIVER_MAX = 256


def _data_manifest(path: str, rel_files: list[tuple], fields: list[dict],
                   part_fields: list, spec_fields: list[dict],
                   spec_id: int, schema: dict, seq: int,
                   snapshot_id: int, token: str,
                   content: int = 0,
                   spark: SparkSession | None = None) -> tuple[str, int, int]:
    """Write one Avro manifest for freshly written files, with per-file
    footer bounds (pruning parity); identity partition values also
    publish as point bounds so readers data-skip on the partition column
    without opening the (column-less) files. Footer stats extract on
    EXECUTORS above a small file count (pass ``spark``) — a
    transform-routed append's file count scales with its partition-tuple
    count, and the driver must not pay it serially. Returns
    ``(manifest path, n entries, total rows)``."""
    from .avro_ocf import write_ocf

    if spark is not None and len(rel_files) > _FOOTER_STATS_DRIVER_MAX:
        paths = [absf for absf, _tv in rel_files]
        rdd = spark.sparkContext.parallelize(
            paths, max(1, len(paths) // 64))
        by_path = {p: (n, sz, st) for p, n, sz, st in
                   rdd.map(_footer_file_stats).collect()}
    else:
        by_path = {}
        for absf, _tv in rel_files:
            p, n, sz, st = _footer_file_stats(absf)
            by_path[p] = (n, sz, st)

    type_of = {f["name"]: f["type"] for f in fields}
    fid = {f["name"]: f["id"] for f in fields}
    entries, total_rows = [], 0
    for absf, tuple_vals in rel_files:
        nrec, fsize, stats = by_path[absf]
        stats = dict(stats)
        total_rows += nrec
        lower, upper = [], []
        for pf in part_fields:
            # identity values publish as point bounds: the column is not
            # in the (Hive-routed) file, so footer stats can't carry it.
            # Non-identity sources stay IN the files — their bounds come
            # from the footers above.
            if pf.kind != "identity":
                continue
            v = tuple_vals.get(pf.name)
            if v is not None:
                stats[pf.src["name"]] = (v, v)
        for name, (mn, mx) in sorted(stats.items()):
            t = type_of.get(name)
            if not isinstance(t, str):
                continue
            lo_b, hi_b = _bound_bytes(mn, t), _bound_bytes(mx, t)
            if lo_b is not None and hi_b is not None:
                lower.append({"key": fid[name], "value": lo_b})
                upper.append({"key": fid[name], "value": hi_b})
        entries.append({
            "status": 1, "snapshot_id": snapshot_id,
            "sequence_number": seq, "file_sequence_number": seq,
            "data_file": {
                "content": content,
                "file_path": "file://" + urllib.parse.quote(
                    absf.replace(os.sep, "/"), safe="/=%-._~"),
                "file_format": "PARQUET",
                "partition": dict(tuple_vals),
                "record_count": nrec,
                "file_size_in_bytes": fsize,
                "lower_bounds": lower or None,
                "upper_bounds": upper or None,
            },
        })

    man_schema = json.loads(json.dumps(_MANIFEST_ENTRY))
    if part_fields:
        avro_of = {"int": "int", "long": "long", "string": "string",
                   "date": "int"}
        dfile = next(f for f in man_schema["fields"]
                     if f["name"] == "data_file")
        prec = next(f for f in dfile["type"]["fields"]
                    if f["name"] == "partition")
        prec["type"]["fields"] = [
            {"name": pf.name, "type": ["null", avro_of[pf.ttype]],
             "default": None, "field-id": pf_spec["field-id"]}
            for pf, pf_spec in zip(part_fields, spec_fields)
        ]

    manifest_path = os.path.join(_meta_dir(path), f"{token}-m0.avro")
    write_ocf(
        manifest_path, man_schema, entries,
        metadata={
            "schema": json.dumps(schema),
            "schema-id": str(schema.get("schema-id", 0)),
            "partition-spec": json.dumps(spec_fields),
            "partition-spec-id": str(spec_id),
            "format-version": "2",
            "content": "data" if content == 0 else "deletes",
        },
    )
    return manifest_path, len(entries), total_rows


def _manifest_list_record(manifest_path: str, spec_id: int, content: int,
                          seq: int, snapshot_id: int, n_added: int,
                          n_rows: int, n_deleted_rows: int = 0) -> dict:
    return {
        "manifest_path": "file://" + manifest_path.replace(os.sep, "/"),
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": spec_id, "content": content,
        "sequence_number": seq, "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": n_added, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": n_rows,
        "existing_rows_count": 0, "deleted_rows_count": n_deleted_rows,
        "partitions": None,
    }


def _write_manifest_list(path: str, snapshot_id: int, seq: int,
                         token: str, records: list[dict],
                         parent_id: int | None) -> str:
    from .avro_ocf import write_ocf
    from .iceberg_export import _MANIFEST_FILE

    list_path = os.path.join(
        _meta_dir(path), f"snap-{snapshot_id}-1-{token}.avro")
    write_ocf(
        list_path, _MANIFEST_FILE, records,
        metadata={"format-version": "2", "snapshot-id": str(snapshot_id),
                  "sequence-number": str(seq),
                  "parent-snapshot-id": str(parent_id)
                  if parent_id is not None else "null"},
    )
    return list_path


def last_iceberg_txn(path: str, app_id: str) -> int | None:
    """The highest txn version this ``app_id`` ever committed, from
    snapshot summaries (the public pattern Flink's Iceberg sink uses for
    its ``flink.max-committed-checkpoint-id``)."""
    best = None
    for s in read_metadata(path).get("snapshots", []):
        summ = s.get("summary") or {}
        if summ.get(_TXN_APP) == app_id:
            v = int(summ[_TXN_VER])
            best = v if best is None else max(best, v)
    return best


def expire_iceberg_snapshots(path: str, keep_last: int = 1,
                             older_than_ms: int | None = None) -> int:
    """Expire old snapshots (Iceberg's ``expireSnapshots`` maintenance):
    keep the newest ``keep_last`` (and, when ``older_than_ms`` is given,
    everything at or after it), plus every snapshot a branch/tag ref
    pins. Commits the trimmed metadata as ``v(N+1)`` through the
    conditional-put seam and deletes the storage only an expired snapshot
    can reach: its manifest LIST always (unique per snapshot), and any
    manifest file no retained snapshot references. Data files are never
    deleted here — retained manifests may share them; full data-file GC
    needs the reachability sweep a native engine's remove-orphan-files
    runs. Returns the new metadata version (or the current one when
    nothing expires)."""
    versions = metadata_versions(path)
    cur_v = max(versions)
    meta = read_metadata(path, cur_v)
    snaps = sorted(
        meta.get("snapshots", []),
        key=lambda s: (s.get("sequence-number", 0),
                       s.get("timestamp-ms", 0)),
    )
    if not snaps:
        return cur_v
    pinned = {r["snapshot-id"] for r in (meta.get("refs") or {}).values()}
    pinned.add(meta.get("current-snapshot-id"))
    retain = set(s["snapshot-id"] for s in snaps[-max(1, keep_last):])
    if older_than_ms is not None:
        retain |= {s["snapshot-id"] for s in snaps
                   if s.get("timestamp-ms", 0) >= older_than_ms}
    retain |= pinned
    expired = [s for s in snaps if s["snapshot-id"] not in retain]
    if not expired:
        return cur_v

    newmeta = json.loads(json.dumps(meta))
    newmeta["snapshots"] = [s for s in snaps
                            if s["snapshot-id"] in retain]
    newmeta["snapshot-log"] = [
        e for e in meta.get("snapshot-log", [])
        if e["snapshot-id"] in retain
    ]
    newmeta.setdefault("metadata-log", []).append({
        "timestamp-ms": int(meta.get("last-updated-ms", 0)),
        "metadata-file": "file://" + versions[cur_v].replace(os.sep, "/"),
    })
    new_v = cur_v + 1
    final = os.path.join(_meta_dir(path), f"v{new_v}.metadata.json")
    try:
        _tf._LOG_STORE.put_if_absent(final, json.dumps(newmeta, indent=2))
    except FileExistsError:
        raise ConcurrentCommitError(
            f"{final}: another writer committed metadata version {new_v} "
            "first; re-read the table and retry the expiry"
        ) from None
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    tmp = f"{hint}.{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        fh.write(str(new_v))
    os.replace(tmp, hint)

    # storage only the expired snapshots reach: their manifest lists, and
    # manifests no retained snapshot references
    kept_manifests = {
        m["manifest_path"]
        for s in newmeta["snapshots"]
        for m in _manifest_paths(meta, s)
    }
    for s in expired:
        dead = []
        if s.get("manifest-list"):
            dead.append(s["manifest-list"])
        for m in _manifest_paths(meta, s):
            if m["manifest_path"] not in kept_manifests:
                dead.append(m["manifest_path"])
        for uri in dead:
            p = _from_uri(uri)
            if os.path.exists(p):
                os.unlink(p)
    return new_v


def append_iceberg(spark: SparkSession, df: DataFrame, path: str,
                   app_id: str | None = None,
                   txn_version: int | None = None,
                   branch: str | None = None) -> int:
    """Append ``df`` as a new snapshot under the HadoopCatalog commit
    protocol; returns the new metadata version. The new
    ``v(N+1).metadata.json`` publishes through the LogStore conditional
    put, so two racing appenders get one winner and one
    ``ConcurrentCommitError`` — never a clobbered commit. Spark writes the
    data files (no footer field ids), so the commit also ensures
    ``schema.name-mapping.default`` covers every current column name —
    any compliant reader resolves our files through the mapping.

    ``app_id``/``txn_version`` make the append idempotent (exactly-once
    streaming sinks): the pair is stamped into the snapshot summary, and
    a replayed batch whose version the table already absorbed is SKIPPED
    — decided from the table's own metadata, so it survives anything that
    loses the producer's memory.

    ``branch`` commits onto a named branch ref instead of main (create it
    first with :func:`create_iceberg_branch`): per the spec only main
    moves ``current-snapshot-id`` and the snapshot-log, so branch commits
    are invisible to readers until :func:`fast_forward_iceberg` publishes
    them — the write-audit-publish staging pattern."""
    import pyarrow.parquet as pq

    if (app_id is None) != (txn_version is None):
        raise ValueError("app_id and txn_version must be given together")
    versions = metadata_versions(path)
    cur_v = max(versions)
    meta = read_metadata(path, cur_v)
    if app_id is not None:
        prev = last_iceberg_txn(path, app_id)
        if prev is not None and prev >= txn_version:
            return cur_v  # replayed batch: already committed
    if meta.get("format-version", 1) != 2:
        raise IcebergProtocolError(
            "append requires a format-version 2 table (v1 manifests use "
            "the legacy schema this writer does not emit)"
        )
    spec_id = meta.get("default-spec-id", 0)
    spec_fields = next(
        (s.get("fields", []) for s in meta.get("partition-specs", [])
         if s.get("spec-id", 0) == spec_id),
        [],
    )
    snap_prev = None
    if branch is not None and branch != "main":
        refs = meta.get("refs") or {}
        if branch not in refs:
            raise ValueError(
                f"branch {branch!r} not in table refs (create it with "
                f"create_iceberg_branch); known: {sorted(refs)}"
            )
        if refs[branch].get("type") == "tag":
            raise ValueError(f"ref {branch!r} is a tag — tags are "
                             "immutable, append to a branch")
        snap_prev = _select_snapshot(meta, None, None, ref=branch)
    elif meta.get("current-snapshot-id") not in (None, -1):
        snap_prev = _select_snapshot(meta, None, None)
    # writes go under the CURRENT schema: a rename/add committed by
    # evolve_iceberg_schema applies to the next append, while old
    # files keep resolving by field id / name mapping
    schema = _schema_for(meta, {})
    fields = schema["fields"]
    want = [f["name"] for f in fields]
    if sorted(df.columns) != sorted(want):
        raise ValueError(
            f"append columns {sorted(df.columns)} != table schema "
            f"{sorted(want)}"
        )
    typed = df.select(*[
        F.col(f["name"]).cast(_spark_type(f["type"])) for f in fields
    ])
    part_fields = _resolve_part_fields(spec_fields, fields)

    token = uuid.uuid4().hex
    rel_files = _write_data_files(typed, path, part_fields,
                                  f"append-{token}")

    seq = int(meta.get("last-sequence-number", 0)) + 1
    snapshot_id = uuid.uuid4().int & ((1 << 62) - 1)
    now_ms = (int(os.stat(rel_files[0][0]).st_mtime * 1000)
              if rel_files else 0)

    manifest_path, n_entries, total_rows = _data_manifest(
        path, rel_files, fields, part_fields, spec_fields, spec_id,
        schema, seq, snapshot_id, token, spark=spark)

    # ---- manifest list: prior snapshot's manifests carried + the new one
    carried = _manifest_paths(meta, snap_prev) if snap_prev else []
    new_entry = _manifest_list_record(
        manifest_path, spec_id, 0, seq, snapshot_id, n_entries, total_rows)
    list_path = _write_manifest_list(
        path, snapshot_id, seq, token, carried + [new_entry],
        snap_prev["snapshot-id"] if snap_prev else None)

    # ---- new metadata, committed via the conditional-put seam
    newmeta = json.loads(json.dumps(meta))  # deep copy
    _ensure_name_mapping(newmeta, fields)
    return _commit_snapshot(
        path, newmeta, versions[cur_v], snapshot_id, seq, now_ms,
        list_path,
        {"operation": "append",
         "added-data-files": str(n_entries),
         "added-records": str(total_rows),
         **({_TXN_APP: app_id, _TXN_VER: str(txn_version)}
            if app_id is not None else {})},
        schema.get("schema-id", 0),
        snap_prev["snapshot-id"] if snap_prev else None,
        cur_v=cur_v,
        ref_name=branch or "main",
    )


def create_iceberg_branch(path: str, name: str,
                          snapshot_id: int | None = None,
                          tag: bool = False) -> int:
    """Create a branch (or immutable tag) ref at ``snapshot_id`` (default:
    the current main head) — metadata-only, published through the
    conditional put. The first half of the write-audit-publish workflow:
    stage appends on a branch, audit them, then
    :func:`fast_forward_iceberg` main."""
    versions = metadata_versions(path)
    cur_v = max(versions)
    meta = read_metadata(path, cur_v)
    refs = meta.get("refs") or {}
    if name in refs:
        raise ValueError(f"ref {name!r} already exists")
    sid = snapshot_id
    if sid is None:
        sid = meta.get("current-snapshot-id")
        if sid in (None, -1):
            raise ValueError("table has no current snapshot to branch from")
    if sid not in {s["snapshot-id"] for s in meta.get("snapshots", [])}:
        raise ValueError(f"snapshot {sid} not in table metadata")
    newmeta = json.loads(json.dumps(meta))
    newmeta.setdefault("refs", {})[name] = {
        "snapshot-id": sid, "type": "tag" if tag else "branch"}
    return _publish_metadata(path, newmeta, versions, cur_v)


def fast_forward_iceberg(path: str, branch: str,
                         to: str = "main") -> int:
    """Fast-forward ref ``to`` (default main) to ``branch``'s head — the
    publish step of write-audit-publish. Refuses unless ``to``'s current
    head is an ancestor of the branch head (otherwise the move would drop
    commits — that needs a merge, which Iceberg does not define). Moving
    main also updates ``current-snapshot-id`` and appends a snapshot-log
    entry stamped with the publish wall-clock (NOT the staged snapshot's
    original timestamp — the data became visible on main now), so
    ``as_of_ms`` time travel sees the publish instant."""
    versions = metadata_versions(path)
    cur_v = max(versions)
    meta = read_metadata(path, cur_v)
    refs = meta.get("refs") or {}
    if branch not in refs:
        raise ValueError(f"branch {branch!r} not in table refs")
    head = refs[branch]["snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    target = refs.get(to, {}).get("snapshot-id",
                                  meta.get("current-snapshot-id"))
    # ancestry walk: head -> parents must reach the target's head
    cur: int | None = head
    ancestors = set()
    while cur is not None and cur in snaps:
        ancestors.add(cur)
        cur = snaps[cur].get("parent-snapshot-id")
    if target not in (None, -1) and target not in ancestors:
        raise ValueError(
            f"{to!r} head {target} is not an ancestor of {branch!r} head "
            f"{head}: fast-forward would drop commits"
        )
    if target == head:
        return cur_v  # already published
    now_ms = int(time.time() * 1000)
    newmeta = json.loads(json.dumps(meta))
    newmeta.setdefault("refs", {})[to] = {
        "snapshot-id": head, "type": "branch"}
    if to == "main":
        newmeta["current-snapshot-id"] = head
        newmeta.setdefault("snapshot-log", []).append({
            "snapshot-id": head,
            "timestamp-ms": now_ms,
        })
    return _publish_metadata(path, newmeta, versions, cur_v, now_ms)


def _publish_metadata(path: str, newmeta: dict, versions: dict,
                      cur_v: int, now_ms: int | None = None) -> int:
    """Publish ``newmeta`` as v(cur_v+1) through the conditional put,
    recording the metadata-log entry — the shared tail of the
    metadata-only operations (branch/tag creation, fast-forward).
    The metadata-log entry keeps the PREVIOUS file's last-updated-ms
    (it records when that file was current); the new metadata's own
    ``last-updated-ms`` is stamped with the publish wall-clock, the way
    iceberg-java stamps every TableMetadata update — so ``as_of_ms``
    time travel over a fast-forward or rollback resolves to what was
    visible on main at that instant, not to the staged snapshot's
    original write time."""
    newmeta.setdefault("metadata-log", []).append({
        "timestamp-ms": int(newmeta.get("last-updated-ms", 0)),
        "metadata-file": "file://" + versions[cur_v].replace(os.sep, "/"),
    })
    newmeta["last-updated-ms"] = int(
        now_ms if now_ms is not None else time.time() * 1000)
    new_v = cur_v + 1
    final = os.path.join(_meta_dir(path), f"v{new_v}.metadata.json")
    try:
        _tf._LOG_STORE.put_if_absent(final, json.dumps(newmeta, indent=2))
    except FileExistsError:
        raise ConcurrentCommitError(
            f"{final}: another writer committed metadata version {new_v} "
            "first; re-read the table and retry"
        ) from None
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    tmp = f"{hint}.{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        fh.write(str(new_v))
    os.replace(tmp, hint)
    return new_v


def delete_iceberg_where(spark: SparkSession, path: str, column: str,
                         lo, hi) -> int:
    """DELETE WHERE ``lo <= column <= hi`` without rewriting any data: a
    merge-on-read commit that writes POSITION delete files (the spec's
    content=1 shape, sorted by file path then position) naming exactly
    the matching rows — provenance comes from the scan's ``_metadata``
    struct, deletes already in force are respected (a row deleted twice
    is named once), and the new snapshot carries every prior manifest
    plus the delete manifest. Returns the new metadata version (current
    one when nothing matches). A table that accumulates many delete
    files wants :func:`compact_iceberg` afterwards."""
    versions = metadata_versions(path)
    cur_v = max(versions)
    meta = read_metadata(path, cur_v)
    if meta.get("format-version", 1) != 2:
        raise IcebergProtocolError(
            "delete requires a format-version 2 table (v1 has no "
            "delete files)"
        )
    snap = _select_snapshot(meta, None, None)
    fields = _schema_for(meta, {})["fields"]
    if column not in {f["name"] for f in fields}:
        raise ValueError(f"column {column!r} not in table schema")
    data_mans, del_mans = _split_manifests(meta, snap)
    entries = _live_entry_tuples(spark, data_mans)
    del_entries = _live_entry_tuples(spark, del_mans)
    df = _assemble_read(spark, meta, fields, entries, del_entries,
                        keep_meta=True)
    hits = (df.filter(F.col(f"`{column}`").between(lo, hi))
            .select("__ice_src", "__ice_pos"))
    # map the normalized provenance path back to the manifest's URI
    # spelling (delete files must name data files as the manifests do)
    uri_df = spark.createDataFrame(
        [(_norm_path(t[1]), t[1]) for t in entries],
        "__ice_src string, file_path string",
    )
    pos = (hits.join(F.broadcast(uri_df), "__ice_src")
           .select("file_path", F.col("__ice_pos").alias("pos"))
           .repartition(1)
           .sortWithinPartitions("file_path", "pos"))
    token = uuid.uuid4().hex
    out_dir = os.path.join(path, "data", f"delete-{token}")
    pos.write.parquet(out_dir)
    del_files = [(os.path.join(out_dir, n), {})
                 for n in sorted(os.listdir(out_dir))
                 if n.endswith(".parquet")]
    seq = int(meta.get("last-sequence-number", 0)) + 1
    snapshot_id = uuid.uuid4().int & ((1 << 62) - 1)
    newmeta = json.loads(json.dumps(meta))
    del_spec = _ensure_unpartitioned_spec(newmeta)
    man_path, n_files, n_positions = _data_manifest(
        path, del_files, fields, [], [], del_spec, _schema_for(meta, {}),
        seq, snapshot_id, token, content=1, spark=spark)
    if n_positions == 0:
        import shutil

        os.unlink(man_path)
        shutil.rmtree(out_dir, ignore_errors=True)
        return cur_v  # nothing matched: no commit
    carried = _manifest_paths(meta, snap)
    del_rec = _manifest_list_record(
        man_path, del_spec, 1, seq, snapshot_id, n_files, 0,
        n_deleted_rows=n_positions)
    list_path = _write_manifest_list(
        path, snapshot_id, seq, token, carried + [del_rec],
        snap["snapshot-id"])
    now_ms = int(os.stat(del_files[0][0]).st_mtime * 1000)
    return _commit_snapshot(
        path, newmeta, versions[cur_v], snapshot_id, seq, now_ms,
        list_path,
        {"operation": "delete",
         "added-delete-files": str(n_files),
         "added-position-deletes": str(n_positions)},
        _schema_for(meta, {}).get("schema-id", 0),
        snap["snapshot-id"],
        cur_v=cur_v,
    )


def delete_iceberg_cow(spark: SparkSession, path: str, column: str,
                       lo, hi) -> int:
    """DELETE WHERE ``lo <= column <= hi`` COPY-ON-WRITE: one
    ``overwrite`` snapshot that marks every data file containing a
    matching row DELETED (status 2, the deleting snapshot's id) in
    REWRITTEN manifests — unaffected entries carry forward as EXISTING
    (status 0) with their original snapshot ids and EXPLICIT sequence
    numbers, per the spec's manifest-rewrite rules — and appends the
    affected files' SURVIVING rows as fresh files. This is the commit
    shape engines without merge-on-read write (Spark on a v1 table,
    Trino's delete), and exactly the foreign-COW shape
    ``read_iceberg_changes`` and the streaming changelog emit as
    delete+insert rows. Unaffected files are untouched. Partitioned
    tables route survivors through the same per-tuple writer appends
    use (identity Hive-style, transforms by computed column). Returns
    the new metadata version (current when nothing matches)."""
    # survivors: the affected files' live rows that do NOT match —
    # NULL column values always survive (between() is null there)
    return _cow_overwrite(
        spark, path, column, lo, hi,
        lambda df, cond: df.filter(~F.coalesce(cond, F.lit(False))))


def update_iceberg_cow(spark: SparkSession, path: str, column: str,
                       lo, hi, assignments: dict[str, str]) -> int:
    """UPDATE ... SET WHERE ``lo <= column <= hi`` COPY-ON-WRITE: one
    ``overwrite`` snapshot rewriting every data file containing a
    matching row — matching rows take the ``assignments`` (column ->
    SQL expression over the pre-update row), non-matching rows of the
    same files carry verbatim, and the old files are marked DELETED in
    rewritten manifests exactly like :func:`delete_iceberg_cow`. This
    completes the foreign-COW write matrix (DELETE + UPDATE): the
    changelog readers emit the gross delete+insert shape for it.
    Returns the new metadata version (current when nothing matches)."""
    def rewrite(df: DataFrame, cond):
        names = set(df.columns)
        missing = [c for c in assignments if c not in names]
        if missing:
            raise ValueError(
                f"assignment columns {missing} not in table schema")
        hit = F.coalesce(cond, F.lit(False))
        out = df
        # all assignments evaluate over the PRE-update row (SQL UPDATE
        # semantics): compute into staging columns first
        for c, expr in assignments.items():
            out = out.withColumn(f"__upd_{c}",
                                 F.when(hit, F.expr(expr))
                                 .otherwise(F.col(f"`{c}`")))
        for c in assignments:
            out = out.withColumn(c, F.col(f"__upd_{c}")) \
                     .drop(f"__upd_{c}")
        return out

    return _cow_overwrite(spark, path, column, lo, hi, rewrite)


def _cow_overwrite(spark: SparkSession, path: str, column: str,
                   lo, hi, rewrite) -> int:
    """Shared copy-on-write engine for DELETE/UPDATE: find the data
    files with rows matching ``lo <= column <= hi``, apply ``rewrite``
    (a ``(affected_live_rows, cond) -> DataFrame`` transform) to their
    live rows, commit ONE overwrite snapshot with the old files marked
    DELETED in rewritten manifests and the transform's output appended
    as fresh files."""
    from .avro_ocf import read_ocf as _read_ocf
    from .avro_ocf import write_ocf as _write_ocf

    versions = metadata_versions(path)
    cur_v = max(versions)
    meta = read_metadata(path, cur_v)
    if meta.get("format-version", 1) != 2:
        raise IcebergProtocolError("copy-on-write DML requires a "
                                   "format-version 2 table")
    snap = _select_snapshot(meta, None, None)
    schema = _schema_for(meta, {})
    fields = schema["fields"]
    if column not in {f["name"] for f in fields}:
        raise ValueError(f"column {column!r} not in table schema")
    spec_id = meta.get("default-spec-id", 0)
    spec_fields = next(
        (s.get("fields", []) for s in meta.get("partition-specs", [])
         if s.get("spec-id", 0) == spec_id),
        [],
    )
    part_fields = _resolve_part_fields(spec_fields, fields)

    data_mans, del_mans = _split_manifests(meta, snap)
    entries = _live_entry_tuples(spark, data_mans)
    del_entries = _live_entry_tuples(spark, del_mans)
    live = _assemble_read(spark, meta, fields, entries, del_entries,
                          keep_meta=True)
    cond = F.col(f"`{column}`").between(lo, hi)
    affected = {
        r["__ice_src"]
        for r in live.filter(cond).select("__ice_src").distinct().collect()
    }
    if not affected:
        return cur_v  # nothing matched: no commit

    token = uuid.uuid4().hex
    seq = int(meta.get("last-sequence-number", 0)) + 1
    snapshot_id = uuid.uuid4().int & ((1 << 62) - 1)

    surv = rewrite(
        live.filter(F.col("__ice_src").isin(sorted(affected))), cond
    ).select(*[F.col(f"`{f['name']}`").cast(_spark_type(f["type"]))
               for f in fields])
    rel_files = _write_data_files(surv, path, part_fields,
                                  f"cowdel-{token}")

    carried: list[dict] = []
    rewritten: list[dict] = []
    n_removed_files = n_removed_rows = 0
    for i, m in enumerate(_manifest_paths(meta, snap)):
        mpath = _from_uri(m["manifest_path"])
        mseq = int(m.get("sequence_number", 0) or 0)
        madded = m.get("added_snapshot_id")
        if m.get("content", 0) == 1:
            carried.append(m)  # delete manifests: still apply to carried
            continue
        oschema, ometa, oentries = _read_ocf(mpath)
        touches = any(
            _norm_path((e.get("data_file") or {}).get("file_path") or "")
            in affected
            for e in oentries if e.get("status", 1) != 2
        )
        if not touches:
            carried.append(m)
            continue
        new_entries = []
        n_exist = exist_rows = n_del = del_rows = 0
        own_del = own_del_rows = 0
        min_seq = seq
        for e in oentries:
            st = e.get("status", 1)
            d = e["data_file"]
            eseq = e.get("sequence_number")
            eseq = int(eseq) if eseq is not None else mseq
            efseq = e.get("file_sequence_number")
            efseq = int(efseq) if efseq is not None else eseq
            ne = dict(e)
            ne["sequence_number"] = eseq  # explicit: no inheritance after
            ne["file_sequence_number"] = efseq  # a rewrite, per the spec
            if st == 2:
                # prior tombstones: this repo's readers only need them in
                # their own snapshot's manifests, but iceberg-java keeps
                # DELETED entries through manifest rewrites until their
                # snapshot expires — carry them (every reader skips them
                # via the entry snapshot_id filter) rather than dropping
                # entries a stricter external engine expects to see
                n_del += 1
                del_rows += int(d.get("record_count", 0))
                min_seq = min(min_seq, eseq)
                new_entries.append(ne)
                continue
            removed_here = _norm_path(d.get("file_path") or "") in affected
            if removed_here:
                ne["status"] = 2
                ne["snapshot_id"] = snapshot_id
                n_del += 1
                del_rows += int(d.get("record_count", 0))
                own_del += 1
                own_del_rows += int(d.get("record_count", 0))
            else:
                ne["status"] = 0
                ne["snapshot_id"] = (int(e["snapshot_id"])
                                     if e.get("snapshot_id") is not None
                                     else madded)
                n_exist += 1
                exist_rows += int(d.get("record_count", 0))
            min_seq = min(min_seq, eseq)
            new_entries.append(ne)
        new_mpath = os.path.join(_meta_dir(path), f"{token}-rw{i}.avro")
        _write_ocf(new_mpath, oschema, new_entries,
                   metadata={k: v.decode() if isinstance(v, bytes) else v
                             for k, v in (ometa or {}).items()
                             if not k.startswith("avro.")})
        rewritten.append({
            "manifest_path": "file://" + new_mpath.replace(os.sep, "/"),
            "manifest_length": os.path.getsize(new_mpath),
            "partition_spec_id": m.get("partition_spec_id", 0),
            "content": 0,
            "sequence_number": seq, "min_sequence_number": min_seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": 0, "existing_files_count": n_exist,
            "deleted_files_count": n_del, "added_rows_count": 0,
            "existing_rows_count": exist_rows,
            "deleted_rows_count": del_rows,
            "partitions": None,
        })
        # snapshot summary counts THIS commit's removals only — carried
        # prior tombstones are in the manifest header counts, not here
        n_removed_files += own_del
        n_removed_rows += own_del_rows

    records = carried + rewritten
    n_added_files = added_rows = 0
    if rel_files:
        man_path, n_added_files, added_rows = _data_manifest(
            path, rel_files, fields, part_fields, spec_fields, spec_id,
            schema, seq, snapshot_id, token, spark=spark)
        records.append(_manifest_list_record(
            man_path, spec_id, 0, seq, snapshot_id,
            n_added_files, added_rows))
    list_path = _write_manifest_list(
        path, snapshot_id, seq, token, records, snap["snapshot-id"])
    now_ms = (int(os.stat(rel_files[0][0]).st_mtime * 1000) if rel_files
              else int(os.stat(list_path).st_mtime * 1000))
    newmeta = json.loads(json.dumps(meta))
    return _commit_snapshot(
        path, newmeta, versions[cur_v], snapshot_id, seq, now_ms,
        list_path,
        {"operation": "overwrite",
         "deleted-data-files": str(n_removed_files),
         "deleted-records": str(n_removed_rows),
         "added-data-files": str(n_added_files),
         "added-records": str(added_rows)},
        schema.get("schema-id", 0),
        snap["snapshot-id"],
        cur_v=cur_v,
    )


def _ensure_unpartitioned_spec(newmeta: dict) -> int:
    """Spec id of an UNPARTITIONED spec, registering one in
    ``partition-specs`` when the table lacks it. Global/position delete
    manifests carry EMPTY partition tuples; the manifest-list record must
    reference a spec those tuples conform to — external readers bind the
    tuple via ``specsById[manifest.partitionSpecId()]`` (iceberg-java's
    DeleteFileIndex), so stamping spec 0 of an identity-partitioned table
    there mis-scopes or errors their delete application."""
    specs = newmeta.setdefault("partition-specs", [])
    if not specs:
        specs.append({
            "spec-id": newmeta.get("default-spec-id", 0),
            "fields": newmeta.get("partition-spec") or [],
        })
    for s in specs:
        if not s.get("fields"):
            return s.get("spec-id", 0)
    new_id = max(s.get("spec-id", 0) for s in specs) + 1
    specs.append({"spec-id": new_id, "fields": []})
    return new_id


def _ensure_name_mapping(newmeta: dict, fields: list[dict]) -> None:
    """Extend ``schema.name-mapping.default`` to cover every current
    column name — Spark-written files carry no footer ids, so compliant
    readers resolve them through the mapping."""
    props = newmeta.setdefault("properties", {})
    mapping = json.loads(props.get("schema.name-mapping.default", "[]"))
    by_id = {m.get("field-id"): m for m in mapping}
    for f in fields:
        m = by_id.get(f["id"])
        if m is None:
            mapping.append({"field-id": f["id"], "names": [f["name"]]})
        elif f["name"] not in m.get("names", []):
            m.setdefault("names", []).append(f["name"])
    props["schema.name-mapping.default"] = json.dumps(mapping)


def upsert_iceberg(spark: SparkSession, df: DataFrame, path: str,
                   key, app_id: str | None = None,
                   txn_version: int | None = None) -> int:
    """MERGE by key, merge-on-read style: ONE snapshot that equality-
    deletes the incoming keys from every prior file AND appends the
    incoming rows — the shape Flink's CDC sink commits per checkpoint.
    The spec's sequencing makes the single snapshot sound: the equality
    delete and the new data files share a sequence number, and equality
    deletes apply only to STRICTLY older data, so prior versions of a
    key vanish while the incoming row survives. Incoming duplicates are
    kept as-is (dedup within the batch is the producer's contract, as in
    Flink's upsert mode). Unpartitioned and identity-partitioned tables
    (the delete is a global equality delete, which our reader and the
    spec scope to the whole table). Supports the same ``app_id`` /
    ``txn_version`` exactly-once stamps as append."""
    keys = [key] if isinstance(key, str) else list(key)
    if (app_id is None) != (txn_version is None):
        raise ValueError("app_id and txn_version must be given together")
    versions = metadata_versions(path)
    cur_v = max(versions)
    meta = read_metadata(path, cur_v)
    if app_id is not None:
        prev = last_iceberg_txn(path, app_id)
        if prev is not None and prev >= txn_version:
            return cur_v  # replayed batch
    if meta.get("format-version", 1) != 2:
        raise IcebergProtocolError("upsert requires a v2 table")
    snap = _select_snapshot(meta, None, None)
    schema = _schema_for(meta, {})
    fields = schema["fields"]
    by_name = {f["name"]: f for f in fields}
    for k in keys:
        if k not in by_name:
            raise ValueError(f"key column {k!r} not in table schema")
        if not isinstance(by_name[k]["type"], str):
            raise IcebergProtocolError(
                f"key column {k!r}: nested types cannot carry an "
                "equality delete"
            )
    want = [f["name"] for f in fields]
    if sorted(df.columns) != sorted(want):
        raise ValueError(
            f"upsert columns {sorted(df.columns)} != table schema "
            f"{sorted(want)}"
        )
    spec_id = meta.get("default-spec-id", 0)
    spec_fields = next(
        (s.get("fields", []) for s in meta.get("partition-specs", [])
         if s.get("spec-id", 0) == spec_id),
        [],
    )
    part_fields = _resolve_part_fields(spec_fields, fields)
    typed = df.select(*[
        F.col(f["name"]).cast(_spark_type(f["type"])) for f in fields
    ])

    token = uuid.uuid4().hex
    seq = int(meta.get("last-sequence-number", 0)) + 1
    snapshot_id = uuid.uuid4().int & ((1 << 62) - 1)

    newmeta = json.loads(json.dumps(meta))
    del_spec = _ensure_unpartitioned_spec(newmeta)
    # equality-delete file: the incoming keys, one consolidated file
    key_fields = [by_name[k] for k in keys]
    del_dir = os.path.join(path, "data", f"upsert-del-{token}")
    (typed.select(*[F.col(f"`{k}`") for k in keys]).distinct()
     .repartition(1).write.parquet(del_dir))
    del_files = [(os.path.join(del_dir, n), {})
                 for n in sorted(os.listdir(del_dir))
                 if n.endswith(".parquet")]
    del_man, n_del_files, n_del_keys = _data_manifest(
        path, del_files, key_fields, [], [], del_spec, schema,
        seq, snapshot_id, f"{token}-del", content=2, spark=spark)
    # stamp the equality ids into the manifest entries (the writer above
    # emits data_file records; patch content=2 entries with equality_ids)
    _patch_equality_ids(del_man, [f["id"] for f in key_fields], schema)

    rel_files = _write_data_files(typed, path, part_fields,
                                  f"upsert-{token}")
    data_man, n_files, total_rows = _data_manifest(
        path, rel_files, fields, part_fields, spec_fields, spec_id,
        schema, seq, snapshot_id, token, spark=spark)

    carried = _manifest_paths(meta, snap)
    records = carried + [
        _manifest_list_record(del_man, del_spec, 1, seq, snapshot_id,
                              n_del_files, 0, n_deleted_rows=n_del_keys),
        _manifest_list_record(data_man, spec_id, 0, seq, snapshot_id,
                              n_files, total_rows),
    ]
    list_path = _write_manifest_list(
        path, snapshot_id, seq, token, records, snap["snapshot-id"])
    now_ms = (int(os.stat(rel_files[0][0]).st_mtime * 1000)
              if rel_files else 0)
    _ensure_name_mapping(newmeta, fields)
    return _commit_snapshot(
        path, newmeta, versions[cur_v], snapshot_id, seq, now_ms,
        list_path,
        {"operation": "overwrite",
         "added-data-files": str(n_files),
         "added-records": str(total_rows),
         "added-equality-deletes": str(n_del_keys),
         **({_TXN_APP: app_id, _TXN_VER: str(txn_version)}
            if app_id is not None else {})},
        schema.get("schema-id", 0),
        snap["snapshot-id"],
        cur_v=cur_v,
    )


def _patch_equality_ids(man_path: str, eq_ids: list[int],
                        schema: dict) -> None:
    """Rewrite a freshly written delete manifest with ``equality_ids``
    stamped on every entry (the writer's shared entry builder emits the
    data-file shape)."""
    from .avro_ocf import read_ocf, write_ocf

    sch, meta_kv, entries = read_ocf(man_path)
    for e in entries:
        e["data_file"]["equality_ids"] = list(eq_ids)
    write_ocf(man_path, sch,
              entries, metadata={
                  k: v for k, v in meta_kv.items()
                  if not k.startswith("avro.")
              })


def compact_iceberg(spark: SparkSession, path: str) -> int:
    """Rewrite the table's live rows (deletes applied) into fresh data
    files and commit a REPLACE snapshot referencing only them — the
    merge-on-read lifecycle's compaction step (Iceberg's
    rewrite_data_files). Old files stay on disk for time travel until
    :func:`expire_iceberg_snapshots` drops the snapshots naming them.
    Readers before/after see identical rows; the streaming source skips
    the replace snapshot under ``skip_rewrites`` (its files carry no new
    rows)."""
    versions = metadata_versions(path)
    cur_v = max(versions)
    meta = read_metadata(path, cur_v)
    if meta.get("format-version", 1) != 2:
        raise IcebergProtocolError("compact requires a v2 table")
    snap = _select_snapshot(meta, None, None)
    schema = _schema_for(meta, {})
    fields = schema["fields"]
    spec_id = meta.get("default-spec-id", 0)
    spec_fields = next(
        (s.get("fields", []) for s in meta.get("partition-specs", [])
         if s.get("spec-id", 0) == spec_id),
        [],
    )
    part_fields = _resolve_part_fields(spec_fields, fields)

    live = read_iceberg_table(spark, path)
    typed = live.select(*[
        F.col(f"`{f['name']}`").cast(_spark_type(f["type"]))
        for f in fields
    ])
    token = uuid.uuid4().hex
    rel_files = _write_data_files(typed, path, part_fields,
                                  f"compact-{token}")
    seq = int(meta.get("last-sequence-number", 0)) + 1
    snapshot_id = uuid.uuid4().int & ((1 << 62) - 1)
    man_path, n_files, total_rows = _data_manifest(
        path, rel_files, fields, part_fields, spec_fields, spec_id,
        schema, seq, snapshot_id, token, spark=spark)
    rec = _manifest_list_record(
        man_path, spec_id, 0, seq, snapshot_id, n_files, total_rows)
    list_path = _write_manifest_list(
        path, snapshot_id, seq, token, [rec], snap["snapshot-id"])
    now_ms = (int(os.stat(rel_files[0][0]).st_mtime * 1000)
              if rel_files else 0)
    newmeta = json.loads(json.dumps(meta))
    return _commit_snapshot(
        path, newmeta, versions[cur_v], snapshot_id, seq, now_ms,
        list_path,
        {"operation": "replace",
         "added-data-files": str(n_files),
         "added-records": str(total_rows)},
        schema.get("schema-id", 0),
        snap["snapshot-id"],
        cur_v=cur_v,
    )


def _commit_snapshot(path: str, newmeta: dict, cur_meta_file: str,
                     snapshot_id: int, seq: int, now_ms: int,
                     list_path: str, summary: dict, schema_id: int,
                     parent_id: int | None, cur_v: int | None = None,
                     ref_name: str = "main") -> int:
    """Install a new snapshot into ``newmeta`` and publish it as the next
    metadata version through the LogStore conditional put (one winner per
    version; losers raise). The shared tail of every write operation —
    append, delete, compact.

    ``cur_v`` is the metadata version the OPERATION read when it built
    ``newmeta``; the publish targets exactly ``cur_v + 1`` so a writer that
    committed in the meantime makes this put fail (ConcurrentCommitError)
    instead of being silently dropped. Recomputing max(versions)+1 here
    would publish v(N+2) built from vN — a lost update.

    ``ref_name`` is the branch the snapshot lands on. Per the spec only
    MAIN moves ``current-snapshot-id`` and appends to ``snapshot-log``;
    a staging-branch commit (write-audit-publish) leaves both untouched
    and only advances its own ref."""
    prev_ms = int(newmeta.get("last-updated-ms", 0))
    newmeta["last-sequence-number"] = seq
    newmeta["last-updated-ms"] = now_ms
    newsnap = {
        "snapshot-id": snapshot_id, "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": "file://" + list_path.replace(os.sep, "/"),
        "summary": summary,
        "schema-id": schema_id,
    }
    if parent_id is not None:
        newsnap["parent-snapshot-id"] = parent_id
    newmeta.setdefault("snapshots", []).append(newsnap)
    if ref_name == "main":
        newmeta["current-snapshot-id"] = snapshot_id
        newmeta.setdefault("snapshot-log", []).append(
            {"snapshot-id": snapshot_id, "timestamp-ms": now_ms})
    newmeta.setdefault("metadata-log", []).append({
        "timestamp-ms": prev_ms,
        "metadata-file": "file://" + cur_meta_file.replace(os.sep, "/"),
    })
    newmeta.setdefault("refs", {})[ref_name] = {
        "snapshot-id": snapshot_id, "type": "branch"}

    if cur_v is None:  # legacy callers: best-effort, still conditional
        cur_v = max(metadata_versions(path))
    new_v = cur_v + 1
    final = os.path.join(_meta_dir(path), f"v{new_v}.metadata.json")
    try:
        _tf._LOG_STORE.put_if_absent(final, json.dumps(newmeta, indent=2))
    except FileExistsError:
        raise ConcurrentCommitError(
            f"{final}: another writer committed metadata version {new_v} "
            "first; re-read the table and retry the operation"
        ) from None
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    tmp = f"{hint}.{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        fh.write(str(new_v))
    os.replace(tmp, hint)  # advisory: readers fall back to listing
    return new_v


def create_iceberg_table(path: str, columns: list[tuple],
                         partition_by: list[tuple] | None = None) -> int:
    """Create an EMPTY v2 Iceberg table: ``columns`` is
    ``[(name, iceberg_type)]``; ``partition_by`` is
    ``[(source column, transform)]`` with any spec transform ("identity",
    "bucket[N]", "truncate[W]", "year"/"month"/"day"/"hour"). Partition
    field names follow iceberg-java's convention (``col_day``,
    ``col_bucket`` ...). Publishes ``v1.metadata.json`` through the
    LogStore conditional put (two racing creators get one winner) and
    returns the metadata version. Appends, DML, and reads then work like
    on any external table — this is how a pipeline lays down a
    transform-partitioned table (``day(ts) + bucket(N, id)``) before its
    first :func:`append_iceberg`."""
    from .iceberg_transforms import TransformError, parse_transform

    fields = [
        {"id": i + 1, "name": n, "required": False, "type": t}
        for i, (n, t) in enumerate(columns)
    ]
    by_name = {f["name"]: f for f in fields}
    spec_fields = []
    for i, (src_name, transform) in enumerate(partition_by or []):
        src = by_name.get(src_name)
        if src is None:
            raise ValueError(f"partition source {src_name!r} not a column")
        try:
            kind, param = parse_transform(transform)
        except TransformError as e:
            raise IcebergProtocolError(str(e)) from e
        suffix = {"identity": "", "bucket": "_bucket",
                  "truncate": "_trunc"}.get(kind, f"_{kind}")
        spec_fields.append({
            "name": f"{src_name}{suffix}" if suffix else src_name,
            "transform": transform, "source-id": src["id"],
            "field-id": 1000 + i,
        })
    # validate transform/type pairings eagerly (same refusal appends give)
    _resolve_part_fields(spec_fields, fields)
    schema = {"type": "struct", "schema-id": 0, "fields": fields}
    meta = {
        "format-version": 2, "table-uuid": str(uuid.uuid4()),
        "location": "file://" + os.path.abspath(path),
        "last-sequence-number": 0, "last-updated-ms": 0,
        "last-column-id": len(fields),
        "current-schema-id": 0, "schemas": [schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": 999 + len(spec_fields),
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {}, "current-snapshot-id": -1,
        "refs": {}, "snapshots": [], "snapshot-log": [],
        "metadata-log": [],
    }
    os.makedirs(_meta_dir(path), exist_ok=True)
    final = os.path.join(_meta_dir(path), "v1.metadata.json")
    try:
        _tf._LOG_STORE.put_if_absent(final, json.dumps(meta, indent=2))
    except FileExistsError:
        raise ConcurrentCommitError(
            f"{final}: table already created by another writer"
        ) from None
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    tmp = f"{hint}.{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        fh.write("1")
    os.replace(tmp, hint)
    return 1


def iceberg_metadata_table(spark: SparkSession, path: str,
                           kind: str,
                           snapshot_id: int | None = None) -> DataFrame:
    """Iceberg's inspection ("metadata") tables over a bridge-readable
    table — the surfaces ``SELECT * FROM tbl.files`` etc. expose in
    iceberg-spark, rebuilt from the same structures:

    - ``snapshots``: committed_at_ms, snapshot_id, parent_id, operation,
      manifest_list, summary (map)
    - ``history``: made_current_at_ms, snapshot_id, parent_id,
      is_current_ancestor (main-branch lineage walk, like the spec's)
    - ``refs``: name, type, snapshot_id
    - ``manifests``: path, length, partition_spec_id, content,
      added_snapshot_id, added/existing/deleted file counts
    - ``files``: content, file_path, file_format, record_count,
      file_size_in_bytes (0 when unrecorded), partition (map) — live
      entries of the selected snapshot, decoded DISTRIBUTED above the
      driver threshold (``_live_entries_df``), so a million-file table's
      files listing is a DataFrame job, not a driver loop
    - ``partitions``: partition (map), file_count, record_count — a
      groupBy over the files frame, fully distributed

    Driver-side kinds (snapshots/history/refs/manifests) are metadata-
    sized by construction."""
    meta = read_metadata(path)
    if kind == "snapshots":
        rows = [(int(s.get("timestamp-ms", 0)), int(s["snapshot-id"]),
                 s.get("parent-snapshot-id"),
                 (s.get("summary") or {}).get("operation"),
                 s.get("manifest-list"),
                 {k: str(v) for k, v in (s.get("summary") or {}).items()})
                for s in meta.get("snapshots", [])]
        return spark.createDataFrame(
            rows, "committed_at_ms bigint, snapshot_id bigint, "
                  "parent_id bigint, operation string, "
                  "manifest_list string, summary map<string,string>")
    if kind == "history":
        snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
        cur = meta.get("current-snapshot-id")
        ancestors = set()
        while cur is not None and cur in snaps:
            ancestors.add(cur)
            cur = snaps[cur].get("parent-snapshot-id")
        rows = [(int(e.get("timestamp-ms", 0)), int(e["snapshot-id"]),
                 snaps.get(e["snapshot-id"], {}).get("parent-snapshot-id"),
                 e["snapshot-id"] in ancestors)
                for e in meta.get("snapshot-log", [])]
        return spark.createDataFrame(
            rows, "made_current_at_ms bigint, snapshot_id bigint, "
                  "parent_id bigint, is_current_ancestor boolean")
    if kind == "refs":
        rows = [(n, r.get("type", "branch"), int(r["snapshot-id"]))
                for n, r in sorted((meta.get("refs") or {}).items())]
        return spark.createDataFrame(
            rows, "name string, type string, snapshot_id bigint")

    snap = _select_snapshot(meta, snapshot_id, None)
    if kind == "manifests":
        rows = [(m["manifest_path"], int(m.get("manifest_length", 0)),
                 int(m.get("partition_spec_id", 0)),
                 int(m.get("content", 0)),
                 int(m.get("added_snapshot_id", 0)),
                 int(m.get("added_files_count", 0) or 0),
                 int(m.get("existing_files_count", 0) or 0),
                 int(m.get("deleted_files_count", 0) or 0))
                for m in _manifest_paths(meta, snap)]
        return spark.createDataFrame(
            rows, "path string, length bigint, partition_spec_id int, "
                  "content int, added_snapshot_id bigint, "
                  "added_files_count int, existing_files_count int, "
                  "deleted_files_count int")
    if kind in ("files", "partitions"):
        data_mans, del_mans = _split_manifests(meta, snap)
        df = _live_entries_df(spark, data_mans + del_mans).select(
            F.col("content"),
            F.col("file_path"),
            F.col("file_format"),
            F.col("record_count"),
            F.from_json(
                "partition_json", "map<string,string>"
            ).alias("partition"),
        )
        if kind == "files":
            return df
        return (df.filter(F.col("content") == 0)
                .groupBy("partition")
                .agg(F.count(F.lit(1)).alias("file_count"),
                     F.sum("record_count").alias("record_count")))
    raise ValueError(
        f"unknown metadata table {kind!r} (snapshots, history, refs, "
        "manifests, files, partitions)")


def remove_orphan_iceberg_files(path: str,
                                grace_s: float = 3600.0) -> list[str]:
    """Delete data files under the table location that NO snapshot's
    manifests reference — Iceberg's remove_orphan_files maintenance (the
    debris of failed/abandoned commits: a writer that lost its
    conditional put leaves fully-written files nothing points at).
    Conservative by construction: references are unioned across EVERY
    retained metadata version, not just the current one — a snapshot
    already expired from the head metadata but still reachable through
    an older ``vN.metadata.json`` kept for ``read_metadata(path, old_v)``
    audit replay keeps its files (the metadata-only-expire shape other
    engines produce) — and within each, every file named by any manifest
    of any snapshot (live, deleted-status, or delete-file) is kept, so
    time travel over the full READABLE history is unaffected. A snapshot
    whose manifest-list/manifest storage :func:`expire_iceberg_snapshots`
    already deleted is skipped: its replay is gone either way, so its
    data files become sweepable here — that composition IS the full
    data-file GC expire's docstring defers to. ``grace_s`` skips
    recently-modified files, the same modification-time window iceberg's
    own procedure uses so an IN-FLIGHT writer's not-yet-committed files
    survive. Returns the deleted absolute paths."""
    import time as _time

    path = os.path.abspath(path)
    referenced: set[str] = set()
    seen_manifests: set[str] = set()
    for v in sorted(metadata_versions(path)):
        meta = read_metadata(path, v)
        for s in meta.get("snapshots", []):
            try:
                mans = _manifest_paths(meta, s)
            except FileNotFoundError:
                continue  # manifest list expired: nothing readable here
            for m in mans:
                mp = m["manifest_path"]
                if mp in seen_manifests:
                    continue  # shared across versions: decode once
                seen_manifests.add(mp)
                try:
                    entries = _decode_manifest((mp, 0), want_bounds=False)
                except FileNotFoundError:
                    continue  # manifest expired underneath an old version
                for t in entries:
                    # ALL statuses: a deleted-status entry's file may
                    # still be read through an older snapshot's manifests
                    referenced.add(os.path.abspath(_norm_path(t[1])))
    now = _time.time()
    deleted: list[str] = []
    meta_dir = _meta_dir(path)
    for root, dirs, names in os.walk(path):
        if root == path and _META_DIR in dirs:
            dirs.remove(_META_DIR)  # metadata tree is never data
        for name in names:
            if not name.endswith(".parquet"):
                continue
            absf = os.path.abspath(os.path.join(root, name))
            if absf in referenced or absf.startswith(meta_dir + os.sep):
                continue
            if now - os.path.getmtime(absf) < grace_s:
                continue  # possibly an in-flight writer's staged file
            os.unlink(absf)
            deleted.append(absf)
    return sorted(deleted)


def rollback_iceberg(path: str, snapshot_id: int) -> int:
    """Roll main back to an EXISTING ancestor snapshot (Iceberg's
    rollback_to_snapshot): metadata-only — main's ref,
    ``current-snapshot-id``, and a fresh snapshot-log entry move to the
    target; no snapshot is deleted, so the rolled-past commits stay
    addressable (and expirable) and a second rollback can undo this one.
    Refuses a target that is not an ancestor of the current head — that
    is a cherry-pick, which the spec does not define."""
    versions = metadata_versions(path)
    cur_v = max(versions)
    meta = read_metadata(path, cur_v)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if snapshot_id not in snaps:
        raise ValueError(f"snapshot {snapshot_id} not in table metadata")
    cur = meta.get("current-snapshot-id")
    if cur == snapshot_id:
        return cur_v
    walk: int | None = cur
    ancestors = set()
    while walk is not None and walk in snaps:
        ancestors.add(walk)
        walk = snaps[walk].get("parent-snapshot-id")
    if snapshot_id not in ancestors:
        raise ValueError(
            f"snapshot {snapshot_id} is not an ancestor of the current "
            f"head {cur}: rollback only rewinds main's own history"
        )
    now_ms = int(time.time() * 1000)
    newmeta = json.loads(json.dumps(meta))
    newmeta["current-snapshot-id"] = snapshot_id
    newmeta.setdefault("refs", {})["main"] = {
        "snapshot-id": snapshot_id, "type": "branch"}
    newmeta.setdefault("snapshot-log", []).append({
        "snapshot-id": snapshot_id,
        "timestamp-ms": now_ms,
    })
    return _publish_metadata(path, newmeta, versions, cur_v, now_ms)


# the spec's safe primitive promotions (§Schema Evolution): anything
# else loses information or changes representation and must refuse
_SAFE_PROMOTIONS = {("int", "long"), ("float", "double")}


def _check_promotion(old_t: str, new_t: str, col: str) -> None:
    if (old_t, new_t) in _SAFE_PROMOTIONS:
        return
    m_old = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", old_t)
    m_new = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", new_t)
    if m_old and m_new and m_old.group(2) == m_new.group(2) \
            and int(m_new.group(1)) >= int(m_old.group(1)):
        return  # widen precision, same scale
    raise IcebergProtocolError(
        f"promote {col!r}: {old_t} -> {new_t} is not a safe promotion "
        "(spec allows int->long, float->double, decimal precision "
        "widening at the same scale)"
    )


def evolve_iceberg_schema(path: str,
                          add_columns: list[tuple] | None = None,
                          rename_columns: dict[str, str] | None = None,
                          drop_columns: list[str] | None = None,
                          promote_columns: dict[str, str] | None = None,
                          ) -> int:
    """Schema evolution, the Iceberg way: a METADATA-ONLY commit that
    installs a new schema-id — adds allocate fresh field ids (old files
    NULL-fill the new column on read), renames keep the field id (old
    footers keep resolving through the id / the name mapping, which
    grows the new name alongside the old), drops REMOVE the field
    without ever reusing its id (``last-column-id`` never decreases, so
    a later add cannot resurrect dropped data under a recycled id), and
    promotes rewrite a field's type along the spec's SAFE promotions
    only (int->long, float->double, decimal precision widening — the
    parquet reader upcasts old footers natively, so no data moves).
    Snapshots keep the schema-id they were written under, so time
    travel reads each snapshot with its own column names AND types —
    exactly the spec's contract. Dropping a column any partition spec
    or sort order still references refuses (the spec forbids it: the
    transform would dangle). Appends after the evolution expect the NEW
    column set. Published through the conditional put like every other
    commit."""
    versions = metadata_versions(path)
    cur_v = max(versions)
    meta = read_metadata(path, cur_v)
    cur_sid = meta.get("current-schema-id", 0)
    schemas = meta.get("schemas")
    if schemas is None:
        raise IcebergProtocolError(
            "v1 single-schema metadata: evolution requires the v2 "
            "schemas list"
        )
    cur_schema = next(s for s in schemas
                      if s.get("schema-id", 0) == cur_sid)
    fields = json.loads(json.dumps(cur_schema["fields"]))
    by_name = {f["name"]: f for f in fields}
    last_id = int(meta.get("last-column-id",
                           max((f["id"] for f in fields), default=0)))

    for old, new in sorted((rename_columns or {}).items()):
        if old not in by_name:
            raise ValueError(f"rename source {old!r} not in schema")
        if new in by_name:
            raise ValueError(f"rename target {new!r} already a column")
        by_name[old]["name"] = new
        by_name[new] = by_name.pop(old)
    for col, new_t in sorted((promote_columns or {}).items()):
        if col not in by_name:
            raise ValueError(f"promote source {col!r} not in schema")
        old_t = by_name[col]["type"]
        if not isinstance(old_t, str):
            raise IcebergProtocolError(
                f"promote {col!r}: only primitive fields promote")
        _spark_type(new_t)  # validate eagerly
        _check_promotion(old_t, new_t, col)
        by_name[col]["type"] = new_t

    for col in sorted(drop_columns or []):
        if col not in by_name:
            raise ValueError(f"drop column {col!r} not in schema")
        fid = by_name[col]["id"]
        for spec in meta.get("partition-specs") or []:
            for pf in spec.get("fields") or []:
                if pf.get("source-id") == fid:
                    raise IcebergProtocolError(
                        f"drop {col!r}: partition spec "
                        f"{spec.get('spec-id')} transforms it — dropping "
                        "would dangle the spec's source field")
        for so in meta.get("sort-orders") or []:
            for sf in so.get("fields") or []:
                if sf.get("source-id") == fid:
                    raise IcebergProtocolError(
                        f"drop {col!r}: sort order "
                        f"{so.get('order-id')} references it")
        fields.remove(by_name.pop(col))

    for n, t in add_columns or []:
        if n in by_name:
            raise ValueError(f"column {n!r} already exists")
        if not isinstance(t, str):
            raise IcebergProtocolError(
                "added columns must be primitive-typed strings here "
                "(nested adds need explicit nested field ids)"
            )
        _spark_type(t)  # validate the type name eagerly
        last_id += 1
        f = {"id": last_id, "name": n, "required": False, "type": t}
        fields.append(f)
        by_name[n] = f

    new_sid = max((s.get("schema-id", 0) for s in schemas)) + 1
    newmeta = json.loads(json.dumps(meta))
    newmeta["schemas"] = newmeta["schemas"] + [
        {"type": "struct", "schema-id": new_sid, "fields": fields}
    ]
    newmeta["current-schema-id"] = new_sid
    newmeta["last-column-id"] = last_id
    _ensure_name_mapping(newmeta, fields)
    return _publish_metadata(path, newmeta, versions, cur_v)


def evolve_iceberg_partition_spec(path: str,
                                  partition_by: list[tuple]) -> int:
    """Partition evolution, the Iceberg way: a METADATA-ONLY commit that
    installs a new default partition spec (``ALTER TABLE ... ADD/DROP
    PARTITION FIELD``). ``partition_by`` is the COMPLETE new spec as
    ``[(source column, transform)]`` — same shape as
    :func:`create_iceberg_table`; ``[]`` evolves to unpartitioned.

    Per the v2 spec, no data moves: files already written keep the spec
    they were written under (their manifests carry its spec-id), and only
    appends AFTER the evolution route by the new spec. A (source,
    transform) pair that appeared in ANY earlier spec re-uses its
    historical partition-field id and name — the spec's field-id-reuse
    rule, which is also what keeps by-name identity injection unambiguous
    across the table's whole history (see :func:`_identity_sources`);
    genuinely new fields allocate ids above ``last-partition-id``. A new
    field whose derived name collides with a DIFFERENT historical
    (source, transform) refuses loudly instead of shadowing it. Readers
    handle the resulting mixed-spec file set already: identity values
    inject per file group from each file's own manifest tuple, transform
    values never materialize as columns, and manifest point/footer bounds
    keep pruning working on both eras. Published through the LogStore
    conditional put like every commit (racing evolutions: one winner)."""
    from .iceberg_transforms import TransformError, parse_transform

    versions = metadata_versions(path)
    cur_v = max(versions)
    meta = read_metadata(path, cur_v)
    if meta.get("format-version", 1) != 2:
        raise IcebergProtocolError(
            "partition evolution requires a format-version 2 table "
            "(v1 pins one spec for the table's life)"
        )
    schema = _schema_for(meta, {})
    fields = schema["fields"]
    by_name = {f["name"]: f for f in fields}
    specs = meta.get("partition-specs") or [{"spec-id": 0, "fields": []}]

    prior: dict[tuple, tuple[int, str]] = {}   # (src id, transform) -> (fid, name)
    prior_names: dict[str, tuple] = {}         # name -> (src id, transform)
    last_pid = int(meta.get("last-partition-id", 999))
    for s in specs:
        for pf in s.get("fields", []):
            key = (pf["source-id"], pf["transform"])
            prior[key] = (pf["field-id"], pf["name"])
            prior_names.setdefault(pf["name"], key)
            last_pid = max(last_pid, int(pf["field-id"]))

    new_fields: list[dict] = []
    for src_name, transform in partition_by:
        src = by_name.get(src_name)
        if src is None:
            raise ValueError(f"partition source {src_name!r} not a column")
        try:
            kind, _param = parse_transform(transform)
        except TransformError as e:
            raise IcebergProtocolError(str(e)) from e
        key = (src["id"], transform)
        if key in prior:
            fid, name = prior[key]  # spec rule: re-use id AND name
        else:
            suffix = {"identity": "", "bucket": "_bucket",
                      "truncate": "_trunc"}.get(kind, f"_{kind}")
            name = f"{src_name}{suffix}" if suffix else src_name
            if name in prior_names and prior_names[name] != key:
                raise IcebergProtocolError(
                    f"partition field name {name!r} already means "
                    f"{prior_names[name]} in an earlier spec: a second "
                    "meaning would make by-name identity injection "
                    "ambiguous for old files — pick a different source "
                    "column or transform"
                )
            last_pid += 1
            fid = last_pid
        new_fields.append({"name": name, "transform": transform,
                           "source-id": src["id"], "field-id": fid})
    names = [f["name"] for f in new_fields]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate partition field names: {names}")
    # validate transform/type pairings eagerly (same refusal appends give)
    _resolve_part_fields(new_fields, fields)

    def _canon(flist: list[dict]) -> list[tuple]:
        return [(f["name"], f["transform"], f["source-id"], f["field-id"])
                for f in flist]

    newmeta = json.loads(json.dumps(meta))  # deep copy
    for s in specs:
        if _canon(s.get("fields", [])) == _canon(new_fields):
            # identical spec already registered: just re-point the default
            newmeta["default-spec-id"] = s.get("spec-id", 0)
            break
    else:
        new_spec_id = max(s.get("spec-id", 0) for s in specs) + 1
        newmeta["partition-specs"] = newmeta.get("partition-specs", []) + [
            {"spec-id": new_spec_id, "fields": new_fields}
        ]
        newmeta["default-spec-id"] = new_spec_id
    newmeta["last-partition-id"] = last_pid
    return _publish_metadata(path, newmeta, versions, cur_v)
