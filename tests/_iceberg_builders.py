"""Hand-built 'external engine wrote this' Iceberg table scaffolding,
shared by the import and streaming test files."""

from __future__ import annotations

import json
import os
import struct
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from monday_etl_spark.avro_ocf import write_ocf
from monday_etl_spark.iceberg_export import _MANIFEST_ENTRY, _MANIFEST_FILE


def write_data_file(path, names, ids, cols, types=None):
    """A parquet data file 'an external engine' wrote: footer field ids
    stamped via PARQUET:field_id (what iceberg-java/pyiceberg do)."""
    types = types or [pa.int64()] * len(names)
    arrays = [pa.array(c, t) for c, t in zip(cols, types)]
    fields = [
        pa.field(n, t, metadata={b"PARQUET:field_id": str(i).encode()})
        for n, t, i in zip(names, types, ids)
    ]
    tbl = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    pq.write_table(tbl, path)
    return path


def entry(abs_path, nrec, snapshot_id, partition=None, bounds=None,
          content=0, status=1, seq=1, equality_ids=None):
    lower = upper = None
    if bounds:
        lower = [{"key": k, "value": struct.pack("<q", lo)}
                 for k, (lo, _hi) in bounds.items()]
        upper = [{"key": k, "value": struct.pack("<q", hi)}
                 for k, (_lo, hi) in bounds.items()]
    return {
        "status": status, "snapshot_id": snapshot_id,
        "sequence_number": seq, "file_sequence_number": seq,
        "data_file": {
            "content": content,
            "file_path": "file://" + abs_path,
            "file_format": "PARQUET",
            "partition": partition or {},
            "record_count": nrec,
            "file_size_in_bytes": os.path.getsize(abs_path),
            "lower_bounds": lower, "upper_bounds": upper,
            "equality_ids": equality_ids,
        },
    }


def manifest(meta_dir, entries, schema, codec="null", partition=None):
    """Write one manifest; external partition tuples need the entry
    schema's empty partition record swapped for a typed one."""
    man_schema = json.loads(json.dumps(_MANIFEST_ENTRY))
    if partition:
        data_file = next(f for f in man_schema["fields"]
                         if f["name"] == "data_file")
        part = next(f for f in data_file["type"]["fields"]
                    if f["name"] == "partition")
        part["type"]["fields"] = [
            {"name": n, "type": ["null", t], "default": None,
             "field-id": 1000 + i}
            for i, (n, t) in enumerate(partition.items())
        ]
    p = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
    write_ocf(p, man_schema, entries, codec=codec,
              metadata={"schema": json.dumps(schema), "schema-id": "0",
                        "partition-spec": "[]", "partition-spec-id": "0",
                        "format-version": "2", "content": "data"})
    return p


def manifest_list(meta_dir, snapshot_id, manifest_paths, nrows,
                  content=0, sequence_number=1):
    p = os.path.join(
        meta_dir, f"snap-{snapshot_id}-1-{uuid.uuid4().hex}.avro")
    write_ocf(p, _MANIFEST_FILE, [
        {"manifest_path": "file://" + m,
         "manifest_length": os.path.getsize(m),
         "partition_spec_id": 0, "content": content,
         "sequence_number": sequence_number,
         "min_sequence_number": sequence_number,
         "added_snapshot_id": snapshot_id,
         "added_files_count": 1, "existing_files_count": 0,
         "deleted_files_count": 0, "added_rows_count": nrows,
         "existing_rows_count": 0, "deleted_rows_count": 0,
         "partitions": None}
        for m in manifest_paths
    ], metadata={"format-version": "2", "snapshot-id": str(snapshot_id),
                 "sequence-number": str(sequence_number),
                 "parent-snapshot-id": "null"})
    return p


def manifest_list_mixed(meta_dir, snapshot_id, items):
    """A manifest list with per-manifest content/sequence:
    ``items = [(manifest_path, content, sequence_number)]`` — the shape a
    merge-on-read writer produces (data manifests + delete manifests in
    one snapshot)."""
    p = os.path.join(
        meta_dir, f"snap-{snapshot_id}-1-{uuid.uuid4().hex}.avro")
    write_ocf(p, _MANIFEST_FILE, [
        {"manifest_path": "file://" + m,
         "manifest_length": os.path.getsize(m),
         "partition_spec_id": 0, "content": content,
         "sequence_number": seq, "min_sequence_number": seq,
         "added_snapshot_id": snapshot_id,
         "added_files_count": 1, "existing_files_count": 0,
         "deleted_files_count": 0, "added_rows_count": 1,
         "existing_rows_count": 0, "deleted_rows_count": 0,
         "partitions": None}
        for m, content, seq in items
    ], metadata={"format-version": "2", "snapshot-id": str(snapshot_id),
                 "sequence-number": str(max(s for _m, _c, s in items)),
                 "parent-snapshot-id": "null"})
    return p


def metadata(path, schemas, snapshots, snapshot_log, current,
             fmt=2, specs=None, props=None, hint=True, version=1):
    meta_dir = os.path.join(path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    meta = {
        "format-version": fmt, "table-uuid": str(uuid.uuid4()),
        "location": "file://" + path, "last-sequence-number": max(
            (s.get("sequence-number", 1) for s in snapshots), default=1),
        "last-updated-ms": max(
            (s["timestamp-ms"] for s in snapshots), default=0),
        "last-column-id": 99, "current-schema-id": schemas[-1].get(
            "schema-id", 0),
        "schemas": schemas, "default-spec-id": 0,
        "partition-specs": specs or [{"spec-id": 0, "fields": []}],
        "last-partition-id": 1001, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": props or {},
        "current-snapshot-id": current,
        "refs": {"main": {"snapshot-id": current, "type": "branch"}},
        "snapshots": snapshots, "snapshot-log": snapshot_log,
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"),
              "w") as fh:
        json.dump(meta, fh)
    if hint:
        with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
            fh.write(str(version))
    return meta
