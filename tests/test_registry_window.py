"""Verification-window invariants (the driver checks only the FIRST 50
registered queries — see queries_registry._WINDOW_PRIORITY):

  * every window slot must be oracle-bearing — a rows-only query inside
    the window burns a driver slot on a check that cannot hash-match;
  * rows-only-by-design queries stay pinned to the tail;
  * every registered query has a callable, and every oracle has a query.
"""

from __future__ import annotations

from weightlifting_wod_etl_spark.queries_registry import DRIVER_WINDOW_SIZE as WINDOW


def test_window_slots_all_oracle_bearing():
    from weightlifting_wod_etl_spark.queries_registry import ORACLES, QUERIES

    window = list(QUERIES)[:WINDOW]
    rows_only = [n for n in window if n not in ORACLES]
    assert not rows_only, (
        f"rows-only queries occupy driver window slots: {rows_only}; "
        "move them to _WINDOW_TAIL"
    )


def test_rows_only_queries_registered_last():
    from weightlifting_wod_etl_spark.queries_registry import (
        _WINDOW_TAIL,
        ORACLES,
        QUERIES,
    )

    names = list(QUERIES)
    for t in _WINDOW_TAIL:
        assert t in names and t not in ORACLES
    # guard the empty tail: names[-0:] is the WHOLE list, not []
    if _WINDOW_TAIL:
        assert names[-len(_WINDOW_TAIL):] == list(_WINDOW_TAIL)


def test_registry_is_consistent():
    from weightlifting_wod_etl_spark.queries_registry import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    assert all(callable(fn) for fn in QUERIES.values())
    # the declared non-SQL-expressible set is exactly the oracle-less set
    assert set(QUERIES) - set(ORACLES) == {"q_approx_distinct"}
