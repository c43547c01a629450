"""Iceberg changelog scan: row-level changes per committed snapshot.

``read_iceberg_changes`` walks the main ancestry between two snapshots
and emits each commit's row-level delta — the Delta bridge's
``read_delta_changes`` twin, built from Iceberg's own commit anatomy
(spec: a snapshot's changes are the manifests whose
``added_snapshot_id`` is the snapshot, entries with status ADDED):

- added DATA files are that commit's ``insert`` rows;
- added POSITION-delete files resolve back to concrete rows by joining
  (file path, position) against the PARENT snapshot's read — exactly
  the rows the commit deleted;
- added GLOBAL equality-delete files resolve by a null-safe semi-join
  of the parent's live rows on the equality columns (the Flink-CDC
  upsert's delete half);
- ``replace`` snapshots (compaction) change no logical rows and are
  skipped.

iceberg-spark's ``create_changelog_view`` refuses merge-on-read delete
files outright; this reader resolves them, so MoR DML history is served
as rows. Partition-SCOPED equality deletes refuse loudly (resolving
them needs per-partition sequence reasoning this reader does not carry)
— the bridge's own writers never produce them.

Output: the requested (default current) schema plus ``_change_type`` /
``_change_ordinal`` (0-based commit position within the range) /
``_commit_snapshot_id`` — iceberg-spark's changelog column names.

Scale shape: per-commit additions decode from exactly the manifests the
commit added; delete resolution is one provenance-joined scan of the
parent's live set per delete commit, with the delete side read
distributed. The driver holds manifests and file lists only.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .iceberg_import import (
    IcebergProtocolError,
    _assemble_read,
    _decode_manifest,
    _from_uri,
    _live_entry_tuples,
    _manifest_paths,
    _schema_for,
    _spark_type,
    _split_manifests,
    read_metadata,
)

__all__ = ["read_iceberg_changes"]


def _ancestry(meta: dict, from_id: int | None,
              to_id: int | None) -> list[dict]:
    """Snapshots on main's parent chain in (from, to], oldest first."""
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    cur = to_id if to_id is not None else meta.get("current-snapshot-id")
    if cur in (None, -1):
        return []
    chain: list[dict] = []
    while cur is not None:
        if cur == from_id:
            return list(reversed(chain))
        s = snaps.get(cur)
        if s is None:
            raise IcebergProtocolError(
                f"snapshot {cur} on the ancestry chain is expired: the "
                "changelog below it is gone")
        chain.append(s)
        cur = s.get("parent-snapshot-id")
    if from_id is not None:
        raise ValueError(
            f"from_snapshot_id {from_id} is not an ancestor of the "
            "range's end snapshot")
    return list(reversed(chain))


def _added_entries(meta: dict, snap: dict) -> tuple[list, list]:
    """(data entries, delete entries) ADDED by this snapshot — status
    ADDED in manifests whose added_snapshot_id is the snapshot."""
    data, dele = [], []
    for m in _manifest_paths(meta, snap):
        if m.get("added_snapshot_id") != snap["snapshot-id"]:
            continue
        pair = (m["manifest_path"],
                int(m.get("sequence_number", 0) or 0))
        entries = [t for t in _decode_manifest(pair) if t[0] == 1]
        (dele if m.get("content", 0) == 1 else data).extend(entries)
    return data, dele


def _stamp(df: DataFrame, names: list[str], change: str | None,
           ordinal: int, snap_id: int) -> DataFrame:
    ct = (F.lit(change) if change is not None
          else F.col("_change_type"))
    return df.select(
        *[F.col(n) for n in names],
        ct.alias("_change_type"),
        F.lit(ordinal).cast("int").alias("_change_ordinal"),
        F.lit(snap_id).cast("long").alias("_commit_snapshot_id"),
    )


def read_iceberg_changes(
    spark: SparkSession,
    path: str,
    from_snapshot_id: int | None = None,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Row-level changes committed by each snapshot in
    ``(from_snapshot_id, to_snapshot_id]`` along main's ancestry
    (defaults: from the first snapshot, to the current one)."""
    meta = read_metadata(path)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    chain = _ancestry(meta, from_snapshot_id, to_snapshot_id)

    fields = _schema_for(
        meta, chain[-1] if chain else {})["fields"]
    names = [f["name"] for f in fields]
    id_of = {f["id"]: f for f in fields}

    pieces: list[DataFrame] = []
    for ordinal, snap in enumerate(chain):
        sid = snap["snapshot-id"]
        op = (snap.get("summary") or {}).get("operation")
        if op == "replace":
            continue  # compaction: no logical rows changed
        data_added, del_added = _added_entries(meta, snap)

        if data_added:
            ins = _assemble_read(spark, meta, fields, data_added, [])
            pieces.append(_stamp(ins, names, "insert", ordinal, sid))

        if del_added:
            parent_id = snap.get("parent-snapshot-id")
            parent = snaps.get(parent_id)
            if parent is None:
                raise IcebergProtocolError(
                    f"snapshot {sid} deletes rows but its parent "
                    f"{parent_id} is expired: the deleted rows cannot "
                    "be reconstructed")
            data_mans, del_mans = _split_manifests(meta, parent)
            parent_read = _assemble_read(
                spark, meta, fields,
                _live_entry_tuples(spark, data_mans),
                _live_entry_tuples(spark, del_mans),
                keep_meta=True,
            )
            pos = [t for t in del_added if t[4] == 1]
            eqs = [t for t in del_added if t[4] == 2]
            other = [t for t in del_added if t[4] not in (1, 2)]
            if other:
                raise IcebergProtocolError(
                    f"delete entry with content={other[0][4]}: unknown "
                    "delete kind")
            if pos:
                pdel = (
                    spark.read.schema("file_path string, pos bigint")
                    .parquet(*sorted(_from_uri(t[1]) for t in pos))
                    .select(
                        F.regexp_replace(
                            F.col("file_path"),
                            r"^[A-Za-z0-9+.-]+:/+", "/"
                        ).alias("__del_src"),
                        F.col("pos").alias("__del_pos"),
                    )
                )
                hit = parent_read.join(
                    F.broadcast(pdel),
                    (F.col("__ice_src") == F.col("__del_src"))
                    & (F.col("__ice_pos") == F.col("__del_pos")),
                )
                pieces.append(
                    _stamp(hit, names, "delete", ordinal, sid))
            if eqs:
                for t in eqs:
                    part = json.loads(t[5]) if t[5] else {}
                    if part:
                        raise IcebergProtocolError(
                            "partition-scoped equality delete: the "
                            "changelog resolves only GLOBAL equality "
                            "deletes (empty partition tuple)")
                groups: dict[str, list[str]] = {}
                for t in eqs:
                    groups.setdefault(t[9], []).append(_from_uri(t[1]))
                for eq_json, files in sorted(groups.items()):
                    eq_ids = json.loads(eq_json)
                    cols = [id_of[i]["name"] for i in eq_ids]
                    edf = (
                        spark.read.schema(", ".join(
                            f"`{id_of[i]['name']}` "
                            f"{_spark_type(id_of[i]['type']).simpleString()}"
                            for i in eq_ids))
                        .parquet(*sorted(files)).distinct()
                    )
                    cond = None
                    for c in cols:
                        term = F.col(f"l.`{c}`").eqNullSafe(
                            F.col(f"r.`{c}`"))
                        cond = term if cond is None else cond & term
                    hit = parent_read.alias("l").join(
                        F.broadcast(edf.alias("r")), cond, "left_semi")
                    pieces.append(
                        _stamp(hit, names, "delete", ordinal, sid))

    if not pieces:
        from pyspark.sql.types import (
            IntegerType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        return spark.createDataFrame([], StructType(
            [StructField(f["name"], _spark_type(f["type"]), True)
             for f in fields]
            + [StructField("_change_type", StringType(), True),
               StructField("_change_ordinal", IntegerType(), True),
               StructField("_commit_snapshot_id", LongType(), True)]
        ))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
