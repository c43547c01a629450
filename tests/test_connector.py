"""Connector behaviors: retry (O-2), pagination (O-3), probing (O-30),
page union (O-45). Offline via FixtureTransport."""

from __future__ import annotations

import copy

import pytest

from monday_etl_spark import fixtures as FX
from monday_etl_spark.source_graphql import (
    FixtureTransport,
    GraphQLError,
    MondayConnector,
    RetryPolicy,
    fetch_board_items,
    pages_to_df,
)


def _page(items, cursor):
    return {"data": {"boards": [{"items_page": {"cursor": cursor, "items": items}}]}}


def _item(i):
    return {
        "id": str(i),
        "name": f"item{i}",
        "created_at": None,
        "updated_at": None,
        "column_values": [],
        "subitems": None,
    }


def test_retry_succeeds_after_failures():
    t = FixtureTransport(pages=[FX.PROJECTS_BOARD], fail_times=2)
    c = MondayConnector(t, RetryPolicy(max_retries=3))
    resp = c.call("query {}")
    assert resp is FX.PROJECTS_BOARD
    assert len(t.calls) == 3  # 2 failures + 1 success


def test_retry_exhausted_reraises():
    t = FixtureTransport(pages=[FX.PROJECTS_BOARD], fail_times=5)
    c = MondayConnector(t, RetryPolicy(max_retries=3))
    with pytest.raises(GraphQLError, match="after 3 attempts"):
        c.call("query {}")
    assert len(t.calls) == 3


def test_cursor_pagination_follows_until_null(spark):
    pages = [
        _page([_item(1), _item(2)], cursor="page1"),
        _page([_item(3)], cursor="page2"),
        _page([_item(4)], cursor=None),
    ]
    c = MondayConnector(FixtureTransport(pages=pages))
    df = fetch_board_items(spark, c, board_id="111")
    ids = sorted(r.id for r in df.select("id").collect())
    assert ids == ["1", "2", "3", "4"]


def test_pagination_stops_on_empty_page(spark):
    pages = [
        _page([_item(1)], cursor="page1"),
        _page([], cursor="page2"),  # empty page: stop even with a cursor
        _page([_item(9)], cursor=None),
    ]
    c = MondayConnector(FixtureTransport(pages=pages))
    df = fetch_board_items(spark, c, board_id="111")
    assert [r.id for r in df.collect()] == ["1"]


def test_dialect_probe_falls_back():
    calls = []

    def transport(q):
        calls.append(q)
        if "items_page" in q:
            raise GraphQLError("unsupported syntax")
        return _page([], None)

    c = MondayConnector(transport, RetryPolicy(max_retries=1))
    assert c.negotiate_dialect("111") == "items"


def test_pages_to_df_empty(spark):
    assert pages_to_df(spark, []).count() == 0


def test_fixture_boards_parse(spark):
    for board in (FX.PROJECTS_BOARD, FX.PERSONNEL_BOARD, FX.TRAVEL_BOARD,
                  FX.SUPPLIER_BOARD):
        df = pages_to_df(spark, [copy.deepcopy(board)])
        assert df.count() >= 2
