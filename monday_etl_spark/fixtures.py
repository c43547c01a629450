"""Deterministic Monday-shaped GraphQL response fixtures (FIXTURES.md §B).

These cover every dirty-value case the reference handles silently
(monday_etl_automated.py:256-322, :386-395): empty text, unparseable numbers
and dates, 1-part timelines, malformed/empty link JSON, repeated cells
(last-successful-parse wins for value cells, first-match-wins for status),
missing created_at, items with no subitems, unknown column ids.

The normalization queries run on these fixtures and their oracles are literal
VALUES of the hand-derived expected output — pinning the semantics exactly.
"""

from __future__ import annotations

# run stamp injected as literals for deterministic re-runs (SURVEY O-11)
RUN_DATE = "2025-06-25"
RUN_TS = "2025-06-25 09:00:00"


def _cv(col_id: str, text, value=None, col_type=None, col_title=None):
    cell = {"id": col_id, "text": text, "value": value}
    if col_type is not None:
        cell["column"] = {"id": col_id, "title": col_title or col_id, "type": col_type}
    return cell


PROJECTS_BOARD = {
    "data": {
        "boards": [
            {
                "items_page": {
                    "cursor": None,
                    "items": [
                        {
                            "id": "101",
                            "name": "Alpha",
                            "created_at": "2025-06-20T07:10:00Z",
                            "updated_at": "2025-06-24T18:30:00Z",
                            "column_values": [
                                _cv("person", "Alice"),
                                _cv("date4", "2025-06-01"),
                                _cv("status__1", "Var"),
                                _cv("status_1", "Radical"),
                                _cv("status0", "TipoA"),
                                _cv("status1", "Pipeline1"),
                                _cv("status6", "Aperto"),
                                _cv("text9", "ignored-unknown-id"),
                            ],
                            "subitems": [
                                {
                                    "id": "201",
                                    "name": "Sub1",
                                    "created_at": "2025-06-21T08:00:00Z",
                                    "updated_at": None,
                                    "column_values": [
                                        _cv("numbers", "1500.50", col_type="numbers"),
                                        _cv("person", "Bob", col_type="person"),
                                        _cv("timeline", "2025-01-01 - 2025-02-01",
                                            col_type="timeline"),
                                        # partial assignment (ref :313-319):
                                        # start parses, end is garbage ->
                                        # start updates, end keeps previous
                                        _cv("timeline_b", "2025-01-15 - garbage",
                                            col_type="timeline"),
                                        _cv("status", "Done", col_type="status"),
                                        # second status cell: first-match-wins
                                        _cv("status_x", "IgnoredLater", col_type="status"),
                                    ],
                                },
                                {
                                    "id": "202",
                                    "name": "Sub2",
                                    "created_at": None,
                                    "updated_at": None,
                                    "column_values": [
                                        # float("abc") fails -> default 0
                                        _cv("numbers", "abc", col_type="numbers"),
                                        # 1-part timeline -> both nulls
                                        _cv("timeline", "2025-01-01", col_type="timeline"),
                                        # empty text -> skipped
                                        _cv("status", "", col_type="status"),
                                        _cv("person", "", col_type="person"),
                                    ],
                                },
                            ],
                        },
                        {
                            "id": "102",
                            "name": "Beta",
                            "created_at": None,
                            "updated_at": None,
                            "column_values": [
                                # bad date: non-empty but unparseable -> stays null
                                _cv("date4", "2025-13-99"),
                                _cv("person", ""),
                                _cv("status_1", "WoW"),
                            ],
                            "subitems": [
                                {
                                    "id": "203",
                                    "name": "Sub3",
                                    "created_at": "2025-06-22T10:00:00Z",
                                    "updated_at": "2025-06-23T10:00:00Z",
                                    "column_values": [
                                        # two numbers cells: "100" parses, later
                                        # "abc" fails -> keeps 100.0
                                        _cv("numbers", "100", col_type="numbers"),
                                        _cv("numbers2", "abc", col_type="numbers"),
                                        # two person cells: last non-empty wins
                                        _cv("people", "X", col_type="person"),
                                        _cv("people2", "Y", col_type="person"),
                                        # second timeline fails parse -> keeps first
                                        _cv("timeline", "2025-03-01 - 2025-03-31",
                                            col_type="timeline"),
                                        _cv("timeline2", "bad - data", col_type="timeline"),
                                        # empty then non-empty status -> "First"
                                        _cv("status", "", col_type="status"),
                                        _cv("status9", "First", col_type="status"),
                                    ],
                                },
                            ],
                        },
                        {
                            "id": "103",
                            "name": "Gamma",
                            "created_at": "2025-06-25T07:10:00Z",
                            "updated_at": None,
                            "column_values": [],
                            "subitems": None,
                        },
                    ],
                }
            }
        ]
    }
}


LINK_201 = '{"linkedPulseIds": [{"linkedPulseId": 201}]}'
LINK_202 = '{"linkedPulseIds": [{"linkedPulseId": 202}]}'

PERSONNEL_BOARD = {
    "data": {
        "boards": [
            {
                "items_page": {
                    "cursor": None,
                    "items": [
                        {
                            "id": "301",
                            "name": "Cost A",
                            "created_at": "2025-06-01T00:00:00Z",
                            "updated_at": None,
                            "column_values": [
                                _cv("person", "Alice"),
                                _cv("numbers", "250.75"),
                                _cv("board_relation1", "Sub1", value=LINK_201),
                            ],
                            "subitems": None,
                        },
                        {
                            "id": "302",
                            "name": "Cost B",
                            "created_at": None,
                            "updated_at": None,
                            "column_values": [
                                _cv("numbers", "abc"),  # -> 0.0
                                # empty link JSON -> name set, id null
                                _cv("board_relation1", "SubX", value="{}"),
                            ],
                            "subitems": None,
                        },
                        {
                            "id": "303",
                            "name": "Cost C",
                            "created_at": None,
                            "updated_at": None,
                            "column_values": [
                                _cv("person", ""),
                                # empty text -> whole cell skipped even with value
                                _cv("board_relation1", "", value=LINK_201),
                            ],
                            "subitems": None,
                        },
                    ],
                }
            }
        ]
    }
}

TRAVEL_BOARD = {
    "data": {
        "boards": [
            {
                "items_page": {
                    "cursor": None,
                    "items": [
                        {
                            "id": "401",
                            "name": "Trip A",
                            "created_at": "2025-06-10T12:00:00Z",
                            "updated_at": "2025-06-11T12:00:00Z",
                            "column_values": [
                                _cv("person", "Carol"),
                                _cv("numbers", "99.99"),
                                _cv("date", "2025-06-10"),
                                _cv("status", "Pagata"),
                                _cv("dropdown", "Carta aziendale"),
                                _cv("board_relation39", "Sub2", value=LINK_202),
                            ],
                            "subitems": None,
                        },
                        {
                            "id": "402",
                            "name": "Trip B",
                            "created_at": None,
                            "updated_at": None,
                            "column_values": [
                                _cv("date", "bad-date"),  # -> null
                                _cv("status", ""),  # -> null
                                # malformed JSON -> name set, id null
                                _cv("board_relation39", "SubY", value="{bad json"),
                            ],
                            "subitems": None,
                        },
                    ],
                }
            }
        ]
    }
}

SUPPLIER_BOARD = {
    "data": {
        "boards": [
            {
                "items_page": {
                    "cursor": None,
                    "items": [
                        {
                            "id": "501",
                            "name": "Supplier A",
                            "created_at": "2025-05-01T09:30:00Z",
                            "updated_at": None,
                            "column_values": [
                                _cv("numbers", "1000"),
                                _cv("numbers8", "220"),
                                _cv("status", "TipoX"),
                                _cv("status_1", "Ordinato"),
                                _cv("board_relation", "Sub1", value=LINK_201),
                            ],
                            "subitems": None,
                        },
                        {
                            "id": "502",
                            "name": "Supplier B",
                            "created_at": None,
                            "updated_at": None,
                            "column_values": [
                                # empty linkedPulseIds list -> id null
                                _cv("board_relation", "SubZ",
                                    value='{"linkedPulseIds": []}'),
                            ],
                            "subitems": None,
                        },
                    ],
                }
            }
        ]
    }
}
