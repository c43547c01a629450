"""HttpTransport against a loopback mock GraphQL server: proves O-1 scan,
O-2 retry and O-3 cursor pagination over a REAL socket while staying
offline-safe (stdlib http.server on 127.0.0.1, ephemeral port)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from monday_etl_spark.source_graphql import (
    GraphQLError,
    HttpTransport,
    MondayConnector,
    RetryPolicy,
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


class _MockGraphQL(BaseHTTPRequestHandler):
    """Serves 3 cursor-linked pages; fails the first `fail_times` requests
    with a 500 to exercise retry over the socket."""

    pages = {
        None: _page([_item(1), _item(2)], "page1"),
        "page1": _page([_item(3)], "page2"),
        "page2": _page([_item(4)], None),
    }
    fail_times = 0
    seen: list[dict] = []

    def do_POST(self):  # noqa: N802 (BaseHTTPRequestHandler API)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).seen.append(
            {"auth": self.headers.get("Authorization"), "body": body}
        )
        if type(self).fail_times > 0:
            type(self).fail_times -= 1
            self.send_response(500)
            self.end_headers()
            return
        query = body["query"]
        cursor = None
        for tok in ("page1", "page2"):
            if f'cursor: "{tok}"' in query:
                cursor = tok
        payload = json.dumps(self.pages[cursor]).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture()
def mock_server():
    _MockGraphQL.fail_times = 0
    _MockGraphQL.seen = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _MockGraphQL)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/graphql"
    finally:
        srv.shutdown()
        thread.join(timeout=5)


def test_http_pagination_follows_cursors(mock_server):
    t = HttpTransport(endpoint=mock_server, api_token="test-token")
    c = MondayConnector(t)
    pages = list(c.fetch_pages("111"))
    ids = [
        it["id"]
        for p in pages
        for it in p["data"]["boards"][0]["items_page"]["items"]
    ]
    assert ids == ["1", "2", "3", "4"]
    # the auth header reached the wire on every request
    assert all(s["auth"] == "test-token" for s in _MockGraphQL.seen)


def test_http_retry_recovers_from_500(mock_server):
    _MockGraphQL.fail_times = 2
    t = HttpTransport(endpoint=mock_server)
    c = MondayConnector(t, RetryPolicy(max_retries=3))
    resp = c.call("query {}")
    assert resp["data"]["boards"][0]["items_page"]["cursor"] == "page1"
    assert len(_MockGraphQL.seen) == 3  # 2 refused + 1 served


def test_http_retry_exhausted_raises(mock_server):
    _MockGraphQL.fail_times = 10
    t = HttpTransport(endpoint=mock_server)
    c = MondayConnector(t, RetryPolicy(max_retries=3))
    with pytest.raises(GraphQLError, match="after 3 attempts"):
        c.call("query {}")
    assert len(_MockGraphQL.seen) == 3
