"""Z-order layout: the measurable contract is row-group stats tightness.

A z-ordered rewrite of events clustered on (user_id, ts) must (a) preserve
rows exactly and (b) leave parquet row-group min/max spans narrow on BOTH
columns simultaneously — that's what makes stats-based skipping work for
predicates on either column. A single-column sort can only achieve it for
one column; the source data (ts-ordered) is the natural baseline where
user_id row groups span ~the full range.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from monday_etl_spark.io import load_table
from monday_etl_spark.layout import write_zordered

from .conftest import SF_ORACLE


def _avg_span(path_glob: str, col: str, to_us=False) -> float:
    """Mean per-row-group (max-min) of ``col`` across all files,
    normalized by the global range."""
    spans, gmin, gmax = [], None, None
    for f in glob.glob(path_glob):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            mn, mx = st.min, st.max
            if to_us:
                mn, mx = mn.timestamp() * 1e6, mx.timestamp() * 1e6
            spans.append(mx - mn)
            gmin = mn if gmin is None else min(gmin, mn)
            gmax = mx if gmax is None else max(gmax, mx)
    return (sum(spans) / len(spans)) / max(gmax - gmin, 1)


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_ORACLE, "events")
    out = str(tmp_path / "events_z")
    # enough output files that each covers a short z-range: a z-curve cut
    # into few long pieces straddles quadrant seams and spans a full
    # dimension; ~32 pieces keep every piece inside a small hyper-rectangle
    write_zordered(ev, out, cols=["user_id", "ts"], n_files=32)

    # (a) rows preserved exactly
    orig = sorted(map(tuple, ev.collect()))
    back = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert back == orig

    # (b) both dimensions' row-group spans are a small fraction of the
    # global range; the ts-ordered source file is the one-dimensional
    # baseline, where user_id must span ~everything
    src = os.path.join(SF_ORACLE, "events.parquet")
    base_user = _avg_span(src, "user_id")
    z_user = _avg_span(os.path.join(out, "*.parquet"), "user_id")
    z_ts = _avg_span(os.path.join(out, "*.parquet"), "ts", to_us=True)

    assert base_user > 0.8, f"baseline not one-dimensional? {base_user}"
    assert z_user < 0.4, f"user_id row-group span not tightened: {z_user}"
    assert z_ts < 0.4, f"ts row-group span not tightened: {z_ts}"
