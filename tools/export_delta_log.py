#!/usr/bin/env python
"""CLI for the Delta snapshot export bridge.

Usage: python tools/export_delta_log.py <table_path> [version]

Writes ``<table_path>/_delta_log/00000000000000000000.json`` so any Delta
reader (delta-spark, delta-rs, DuckDB delta, Trino) can open the frozen
tableformat snapshot in place. See monday_etl_spark/delta_export.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from monday_etl_spark.delta_export import export_delta_log  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    version = int(sys.argv[2]) if len(sys.argv) > 2 else None
    print(export_delta_log(sys.argv[1], version))
    return 0


if __name__ == "__main__":
    sys.exit(main())
