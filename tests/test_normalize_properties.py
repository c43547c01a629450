"""Property-based pinning of the EAV→wide semantics (SURVEY §5 strategy):
random cell lists through extract_subitems must match a direct Python
re-implementation of the reference's imperative loop
(monday_etl_automated.py:300-322) on every draw — dirty values included."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from monday_etl_spark.fixtures import RUN_DATE, RUN_TS
from monday_etl_spark.normalize import board_df, extract_subitems, items_df

TEXTS = st.one_of(
    st.none(),
    st.just(""),
    st.just("100"),
    st.just("1500.50"),
    st.just("abc"),
    st.just("-3.5"),
    st.just("2025-01-01 - 2025-02-01"),
    st.just("2025-01-01"),
    st.just("bad - data"),
    st.just("2025-13-99 - 2025-01-01"),
    st.just("2025-01-15 - garbage"),
    st.just("Done"),
    st.just("Alice"),
)
TYPES = st.sampled_from(["numbers", "person", "timeline", "status", "text", "other"])


def reference_subitem_semantics(cells: list[dict]) -> dict:
    """The reference loop, verbatim semantics (not copied code): last
    successful parse wins for numbers/person/timeline, first non-empty wins
    for status, empty text skips the cell entirely."""
    out = {"po": None, "timeline_start": None, "timeline_end": None,
           "revenue_amount": 0.0, "status": None}
    for cell in cells:
        ctype = cell["column"]["type"]
        text = cell.get("text") or ""
        if not text:
            continue
        if ctype == "numbers":
            try:
                out["revenue_amount"] = float(text)
            except ValueError:
                pass
        elif ctype == "person":
            out["po"] = text
        elif ctype == "timeline":
            try:
                dates = text.split(" - ")
                if len(dates) == 2:
                    # partial assignment, exactly like the reference: start
                    # lands before end parses, so 'valid - garbage' updates
                    # start and keeps the previous end
                    out["timeline_start"] = dt.datetime.strptime(
                        dates[0], "%Y-%m-%d"
                    ).date()
                    out["timeline_end"] = dt.datetime.strptime(
                        dates[1], "%Y-%m-%d"
                    ).date()
            except ValueError:
                pass
        elif ctype == "status":
            if not out["status"]:
                out["status"] = text
    return out


@st.composite
def cell_lists(draw):
    n = draw(st.integers(min_value=0, max_value=8))
    cells = []
    for i in range(n):
        cells.append(
            {
                "id": f"c{i}",
                "text": draw(TEXTS),
                "value": None,
                "column": {"id": f"c{i}", "title": f"c{i}", "type": draw(TYPES)},
            }
        )
    return cells


@given(cells=cell_lists())
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_subitem_mapping_matches_reference_loop(spark, cells):
    board = {
        "data": {"boards": [{"items_page": {"cursor": None, "items": [
            {"id": "1", "name": "item", "created_at": None, "updated_at": None,
             "column_values": [], "subitems": [
                 {"id": "s1", "name": "sub", "created_at": None,
                  "updated_at": None, "column_values": cells}]}
        ]}}]}
    }
    row = extract_subitems(items_df(board_df(spark, board)), RUN_DATE, RUN_TS).first()
    want = reference_subitem_semantics(cells)
    got = {
        "po": row.po,
        "timeline_start": row.timeline_start,
        "timeline_end": row.timeline_end,
        "revenue_amount": row.revenue_amount,
        "status": row.status,
    }
    assert got == want, f"cells={cells}"
