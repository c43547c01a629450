"""Export a frozen tableformat snapshot as a Delta Lake table.

The interop bridge the r06 verdict asked for (TODO.md #1, reduced scope):
``tableformat`` has Delta-grade semantics but a private manifest format,
so no external engine can read it. delta-spark isn't in this container —
but the Delta *protocol* is a public spec (github.com/delta-io/delta
PROTOCOL.md): a ``_delta_log/`` directory of newline-delimited JSON
actions beside plain parquet data files. A snapshot export therefore
needs ZERO data movement: the table's existing immutable parquet files
are referenced by relative path from ``add`` actions, and any Delta
reader (delta-spark, delta-rs, DuckDB's delta extension, Trino) opens the
same directory as a Delta table.

What is written (Delta log version 0, one commit file):

- ``protocol``  minReaderVersion 1 / minWriterVersion 2 — the baseline
  feature set; nothing in the export needs column mapping or DVs;
- ``metaData``  id (deterministic uuid5 of path+version, so re-exports of
  the same snapshot are idempotent), schemaString (the manifest's logical
  schema — ALREADY Spark StructType JSON, which is exactly Delta's schema
  serialization), no partition columns (``__bucket`` is a physical layout
  detail: it lives in directory names only, not in file footers, so the
  exported table is a plain unpartitioned Delta table);
- one ``add`` per manifest-referenced file: relative path (URL-quoted per
  the spec), size, modificationTime, dataChange=true, and a ``stats``
  JSON carrying numRecords (from the parquet footer) plus
  minValues/maxValues for the manifest's tracked stats columns — Delta
  readers data-skip on the same bounds ``read_where`` prunes with.

Refused cases (loud, not silent): a manifest with rename ``aliases``
whose old files physically carry pre-rename column names — baseline
Delta resolves columns BY NAME from footers, so those files would surface
nulls. (Full fidelity needs Delta column mapping, i.e. field ids — the
same machinery tableformat itself would need for rename-with-reuse.)

The snapshot is FROZEN: later tableformat commits do not appear in the
Delta log (and a later vacuum may collect files the export references —
export retained/tagged versions, exactly as you'd expect of a handoff).
"""

from __future__ import annotations

import json
import os
import urllib.parse
import uuid

from .tableformat import _read_manifest, current_version

_LOG_DIR = "_delta_log"


def _file_num_records(abs_path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(abs_path).metadata.num_rows


def export_delta_log(path: str, version: int | None = None) -> str:
    """Write ``<path>/_delta_log/00000000000000000000.json`` describing the
    given tableformat ``version`` (default: latest) and return the log file
    path. Idempotent for the same snapshot; raises if a DIFFERENT snapshot
    was already exported there (Delta logs are append-only — re-pointing
    version 0 would corrupt any reader's cached state)."""
    version = version if version is not None else current_version(path)
    if version is None:
        raise FileNotFoundError(f"no committed version at {path}")
    man = _read_manifest(path, version)
    if man.get("aliases"):
        raise NotImplementedError(
            "snapshot has rename aliases: baseline Delta resolves columns "
            "by footer name, so pre-rename files would read as null. "
            "Rewrite the files under current names first (compact after "
            "rename) or use a column-mapping-aware exporter."
        )

    rel_files = sorted(f for fs in man["buckets"].values() for f in fs)
    committed_ms = int(float(man.get("committed_at", 0)) * 1000)
    stats_map = man.get("stats", {}) or {}

    actions: list[dict] = [
        {
            # the exported version's commit time is the ORIGINAL manifest
            # commit time, not the export run's clock: timestamp
            # addressing (AS OF reads, startingTimestamp streams) on the
            # exported table then reflects the table's true history, and
            # log-file mtime never needs consulting
            "commitInfo": {
                "timestamp": committed_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": "ErrorIfExists"},
                "engineInfo": "monday-etl-spark delta bridge",
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid5(
                    uuid.NAMESPACE_URL,
                    f"monday-etl-spark-tableformat:{os.path.abspath(path)}"
                    f"@v{version}",
                )),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": man["schema"],
                "partitionColumns": [],
                "configuration": {},
                "createdTime": committed_ms,
            }
        },
    ]
    for rel in rel_files:
        absf = os.path.join(path, rel)
        stats: dict = {"numRecords": _file_num_records(absf)}
        per_col = stats_map.get(rel)
        if per_col:
            stats["minValues"] = {c: b[0] for c, b in per_col.items()}
            stats["maxValues"] = {c: b[1] for c, b in per_col.items()}
        actions.append({
            "add": {
                # Delta paths are RFC 2396-encoded relative URIs; '=' and
                # '/' stay literal ('safe'), everything else quotes
                "path": urllib.parse.quote(rel.replace(os.sep, "/"),
                                           safe="/=%"),
                "partitionValues": {},
                "size": os.path.getsize(absf),
                "modificationTime": int(os.path.getmtime(absf) * 1000),
                "dataChange": True,
                "stats": json.dumps(stats),
            }
        })

    payload = "\n".join(json.dumps(a) for a in actions) + "\n"
    log_dir = os.path.join(path, _LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    log_file = os.path.join(log_dir, f"{0:020d}.json")
    if os.path.exists(log_file):
        with open(log_file) as fh:
            if fh.read() == payload:
                return log_file  # same snapshot: idempotent no-op
        raise FileExistsError(
            f"{log_file} already exports a different snapshot; Delta logs "
            "are append-only — remove _delta_log/ explicitly to re-export"
        )
    tmp = f"{log_file}.{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        fh.write(payload)
    os.replace(tmp, log_file)
    return log_file


def read_exported_files(log_file: str) -> tuple[dict, list[dict]]:
    """Parse an exported log: returns (metaData, add-actions) — the test /
    debugging helper a reader-less environment verifies the bridge with."""
    meta: dict | None = None
    adds: list[dict] = []
    with open(log_file) as fh:
        for line in fh:
            if not line.strip():
                continue
            action = json.loads(line)
            if "metaData" in action:
                meta = action["metaData"]
            elif "add" in action:
                adds.append(action["add"])
    if meta is None:
        raise ValueError(f"{log_file}: no metaData action")
    return meta, adds
