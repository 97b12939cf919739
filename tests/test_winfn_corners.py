"""Cross-engine window-function corner pins (r18 sweep).

Seventh member of the gate family. The window semantics every ranked/
framed oracle sits on (q_rank_fns, q_ntile_bucket, q_window_frames,
q_window_dedup, q_cumulative_distinct, q_streaks, the sessionizers),
probed against BOTH live engines on a ties-and-NULL corpus.

AGREE (asserted — a remarkably clean matrix): rank/dense_rank/
percent_rank/cume_dist on tie groups, ntile remainder distribution
(front-loaded on both), lag/lead defaults and IGNORE NULLS, lag with
NEGATIVE offset (acts as lead on both), the DEFAULT frame being
RANGE UNBOUNDED PRECEDING..CURRENT ROW with PEER-GROUP inclusion
(sum/count/last_value over ties include the whole tie group —
last_value under the default frame is the PEER-GROUP's last, not the
current row), explicit ROWS frames, numeric RANGE offsets (a NULL
order key gets a NULL aggregate on both), nth_value, and ntile(0)
erroring on both.

DIVERGE (asserted divergent):

1. DEFAULT NULL ORDERING, the r10 bug class made explicit: Spark
   ``ORDER BY v`` (ASC) puts NULLS FIRST; DuckDB puts NULLS LAST —
   every rank/row_number/frame boundary over a nullable key shifts
   between engines when the order is left unpinned. DESC agrees
   (NULLS LAST on both) — which is exactly why the class is
   insidious: a query tested only on DESC orders looks portable.
   Additionally DuckDB 1.0's window NULL placement was measured
   UNSTABLE run-to-run in r10; the standing rule — every nullable
   window/sort order column carries an explicit NULLS FIRST/LAST on
   BOTH sides — is enforced end-to-end by tests/test_null_seams.py's
   dirty rows; this pin documents the root cause.
2. ``nth_value(v, 0)``: Spark rejects at analysis time
   (VALUE_OUT_OF_RANGE); DuckDB evaluates to NULL rows. Offsets >= 1
   agree.
"""

from __future__ import annotations

import duckdb
import pytest

# (id, v): tie group at 10 (x2) and 20 (x3), singleton 30, one NULL
SROWS = ("(1,10.0D),(2,10.0D),(3,20.0D),(4,20.0D),(5,20.0D),"
         "(6,30.0D),(7,CAST(NULL AS DOUBLE))")
DROWS = ("(1,10.0::DOUBLE),(2,10.0::DOUBLE),(3,20.0::DOUBLE),"
         "(4,20.0::DOUBLE),(5,20.0::DOUBLE),(6,30.0::DOUBLE),"
         "(7,NULL::DOUBLE)")


def _s(spark, expr: str):
    return [
        r.o
        for r in spark.sql(
            f"SELECT id, {expr} AS o FROM VALUES {SROWS} t(id, v)"
            " ORDER BY id"
        ).collect()
    ]


def _d(expr: str):
    con = duckdb.connect()
    try:
        return [
            r[0]
            for r in con.execute(
                f"SELECT o FROM (SELECT id, {expr} AS o FROM"
                f" (VALUES {DROWS}) t(id, v) ORDER BY id) x"
            ).fetchall()
        ]
    finally:
        con.close()


@pytest.mark.parametrize(
    "label,expr",
    [
        ("row_number", "row_number() OVER (ORDER BY v ASC NULLS LAST, id)"),
        ("rank_ties", "rank() OVER (ORDER BY v ASC NULLS LAST)"),
        ("dense_rank", "dense_rank() OVER (ORDER BY v ASC NULLS LAST)"),
        ("percent_rank", "percent_rank() OVER (ORDER BY v ASC NULLS LAST)"),
        ("cume_dist", "cume_dist() OVER (ORDER BY v ASC NULLS LAST)"),
        # remainder buckets front-load on both: 7 rows / 5 tiles ->
        # sizes [2,2,1,1,1]
        ("ntile3", "ntile(3) OVER (ORDER BY v ASC NULLS LAST, id)"),
        ("ntile5", "ntile(5) OVER (ORDER BY v ASC NULLS LAST, id)"),
        ("lag_default", "lag(v, 1, -1.0) OVER (ORDER BY id)"),
        ("lead", "lead(v, 1) OVER (ORDER BY id)"),
        # negative lag == lead on BOTH engines
        ("lag_negative", "lag(v, -1) OVER (ORDER BY id)"),
        # the DEFAULT frame: RANGE UNBOUNDED..CURRENT with PEER
        # inclusion — the whole tie group is in-frame for all peers
        ("sum_default_frame", "sum(v) OVER (ORDER BY v ASC NULLS LAST)"),
        ("count_default_frame",
         "count(*) OVER (ORDER BY v ASC NULLS LAST)"),
        ("last_value_default_frame",
         "last_value(v) OVER (ORDER BY v ASC NULLS LAST)"),
        ("first_value_default_frame",
         "first_value(v) OVER (ORDER BY v ASC NULLS LAST)"),
        ("sum_rows_frame",
         "sum(v) OVER (ORDER BY v ASC NULLS LAST, id"
         " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"),
        # numeric RANGE offset: the NULL-key row aggregates to NULL
        # on both
        ("sum_range_offset",
         "sum(v) OVER (ORDER BY v ASC NULLS LAST"
         " RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)"),
        ("nth_value2",
         "nth_value(v, 2) OVER (ORDER BY v ASC NULLS LAST, id)"),
    ],
)
def test_window_semantics_agree(spark, label, expr):
    got, want = _s(spark, expr), _d(expr)
    assert got == want, (label, got, want)


def test_lag_ignore_nulls_agrees(spark):
    got = _s(spark, "lag(v, 1) IGNORE NULLS OVER (ORDER BY id)")
    want = _d("lag(v, 1 IGNORE NULLS) OVER (ORDER BY id)")
    assert got == want, (got, want)


def test_ntile_zero_rejected_on_both(spark):
    with pytest.raises(Exception):
        _s(spark, "ntile(0) OVER (ORDER BY v ASC NULLS LAST)")
    con = duckdb.connect()
    try:
        with pytest.raises(duckdb.Error):
            con.execute(
                f"SELECT ntile(0) OVER (ORDER BY v) FROM"
                f" (VALUES {DROWS}) t(id, v)"
            ).fetchall()
    finally:
        con.close()


def test_default_null_ordering_divergence(spark):
    """DOCUMENTED divergent #1: unpinned ASC puts the NULL row first
    on Spark, last on DuckDB — rank 2 vs 1 for the same row. DESC
    agrees (NULLS LAST both), which is what makes the class easy to
    miss. Never ship an unpinned nullable order key."""
    asc_s = _s(spark, "rank() OVER (ORDER BY v)")
    asc_d = _d("rank() OVER (ORDER BY v)")
    assert asc_s != asc_d, "engines aligned ASC NULL defaults — re-audit"
    # the NULL row (id 7, last list position) ranks 1 on Spark
    # (NULLS FIRST), 7 on DuckDB (NULLS LAST)
    assert asc_s[-1] == 1 and asc_d[-1] == 7, (asc_s, asc_d)
    desc_s = _s(spark, "rank() OVER (ORDER BY v DESC)")
    desc_d = _d("rank() OVER (ORDER BY v DESC)")
    assert desc_s == desc_d, (desc_s, desc_d)


def test_nth_value_zero_divergence(spark):
    """DOCUMENTED divergent #2: offset 0 is an analysis error on
    Spark, NULL on DuckDB."""
    with pytest.raises(Exception):
        _s(spark, "nth_value(v, 0) OVER (ORDER BY id)")
    assert _d("nth_value(v, 0) OVER (ORDER BY id)") == [None] * 7
