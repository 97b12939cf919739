"""Cross-engine date-function corner pins (r18 sweep).

Same discipline as the string (r17, ``test_strfn_corners``), JSON
(r17, ``test_json_channels``) and casefold (r16, ``test_casefold``)
gate families: every date primitive an oracled value path shares
between Spark and DuckDB is probed on a corner-date corpus against
BOTH live engines. Agreements are asserted so an engine upgrade that
breaks one fails here instead of as a driver hash mismatch;
divergences are asserted AS divergent with a note on why no shipped
path can reach them.

r18 sweep findings (12 corner dates x 11 primitives + 12 lenient-parse
shapes):

AGREE (asserted below): ``date_trunc`` week/month/quarter/year,
``last_day``, ``add_months`` +/-1 incl. the end-of-month clamp
(2021-01-31 +1mo -> 2021-02-28 on both), ``datediff`` from epoch,
``year``, ``dayofyear``, ``weekofyear`` (both ISO) — across the full
corpus including the year-0 underflow (0001-01-01 - 1mo ->
0000-12-01 on BOTH engines) and the year-10000 overflow
(9999-12-31 + 1mo), where only Spark's ``date_format`` PRINTS a
leading '+' ('+10000-01-31'); the date VALUES are equal, so mirrors
that compare dates (not formatted strings) are safe.

CONVENTION MIRRORS (asserted): Spark ``dayofweek`` (1=Sun..7=Sat) ==
DuckDB ``dayofweek`` (0=Sun..6=Sat) + 1; Spark ``weekday``
(0=Mon..6=Sun) == DuckDB ``isodow`` (1=Mon..7=Sun) - 1. Raw
same-named ``dayofweek`` is OFF BY ONE between the engines — never
mirror it bare. Shipped oracles already comply (audited r18:
``functions_surface.py`` uses weekday()+1 <-> isodow;
``dates_clean.py``/``wod_e2e.py`` mirror ``week_start_sunday`` via
isodow; no other oracle touches a weekday-numbering primitive).

DIVERGE — lenient string->DATE parsing (asserted divergent below).
Spark's ANSI ``CAST(s AS DATE)`` THROWS on invalid input
('2021-02-30' aborts the job); ``try_to_date``/``try_cast`` are the
NULL-degrading forms and the two agree with each other on all probed
shapes. Against DuckDB ``TRY_CAST(s AS DATE)``:

1. '2021/01/03' — DuckDB accepts slash separators, Spark does not
   (NULL).
2. '2021-01-03x' — DuckDB ignores TRAILING GARBAGE after a valid
   date prefix, Spark requires the full token to parse (NULL).
3. '2021-01' and '2021' — Spark completes partial ISO dates to the
   first day (2021-01-01); DuckDB rejects them (NULL).

No shipped value path can reach the divergent domain: the only
string->DATE sites are ``operators/clean.py:61`` (an explicit
try_to_timestamp format list — format-pinned, not lenient-cast) and
casts of ``o_orderdate``/``ts``, which are TIMESTAMP-typed in every
testdata table (truncation, no string parse). A new oracled query
that casts a *hostile string* column to DATE must pin its own parse
domain the way ``q_clean_normalize`` does — this module is the
reminder that the bare lenient casts do NOT mirror.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

CORNERS = [
    "1970-01-01",  # epoch
    "1969-12-31",  # pre-epoch
    "2000-02-29",  # century leap day
    "2020-12-31",  # ISO week 53 spill
    "2021-01-01",  # ISO week-53-of-prior-year member
    "2016-01-03",  # Sunday belonging to prior ISO year's week 53
    "2024-02-29",  # leap day
    "1900-02-28",  # non-leap century February
    "2021-01-31",  # end-of-month clamp source
    "2021-08-16",  # mid-year control
    "0001-01-01",  # domain floor (a Monday; -1mo underflows to year 0)
    "9999-12-31",  # domain ceiling (+1mo overflows to year 10000)
]

PARSE_SHAPES = [
    "2021-1-3", "2021-02-30", " 2021-01-03 ", "2021-01-03T00:00:00",
    "2021-01-03 12:30:45", "2021/01/03", "20210103", "2021-01",
    "2021", "01-03-2021", "2021-01-03x", "\t2021-01-03",
]


def _both(spark, spark_expr: str, duck_sql: str, rows=CORNERS,
          as_date=False):
    """Evaluate (spark_expr over column d, duck_sql over ?::DATE) on the
    corner corpus. ``as_date=True`` formats BOTH sides to strings
    ENGINE-side (date_format / strftime) because year-0 and year-10000
    results exist on both engines but are outside ``datetime.date``'s
    [1, 9999] — collecting them raw crashes each Python client. Spark
    prints years > 9999 with a leading '+' ('+10000-01-31'); that
    print-format-only divergence is normalized here and pinned in its
    own test below."""
    df = spark.createDataFrame([(r,) for r in rows], "s string").select(
        F.to_date("s").alias("d")
    )
    if as_date:
        spark_expr = f"date_format({spark_expr}, 'yyyy-MM-dd')"
        duck_sql = f"strftime({duck_sql}, '%Y-%m-%d')"
    got = [
        r.o.lstrip("+") if isinstance(r.o, str) else r.o
        for r in df.select(F.expr(spark_expr).alias("o")).collect()
    ]
    con = duckdb.connect()
    try:
        want = [
            con.execute(f"SELECT {duck_sql}", [r]).fetchone()[0]
            for r in rows
        ]
    finally:
        con.close()
    return list(zip(rows, got, want))


@pytest.mark.parametrize(
    "label,spark_expr,duck_sql",
    [
        ("trunc_week", "date_trunc('week', d)", "date_trunc('week', ?::DATE)::DATE"),
        ("trunc_month", "date_trunc('month', d)", "date_trunc('month', ?::DATE)::DATE"),
        ("trunc_quarter", "date_trunc('quarter', d)", "date_trunc('quarter', ?::DATE)::DATE"),
        ("trunc_year", "date_trunc('year', d)", "date_trunc('year', ?::DATE)::DATE"),
        ("last_day", "last_day(d)", "last_day(?::DATE)"),
        ("add_month", "add_months(d, 1)", "(?::DATE + INTERVAL 1 MONTH)::DATE"),
        ("sub_month", "add_months(d, -1)", "(?::DATE - INTERVAL 1 MONTH)::DATE"),
        (
            "datediff_epoch",
            "datediff(d, DATE'1970-01-01')",
            "date_diff('day', DATE '1970-01-01', ?::DATE)",
        ),
        ("year", "year(d)", "year(?::DATE)"),
        ("doy", "dayofyear(d)", "dayofyear(?::DATE)"),
        ("weekofyear", "weekofyear(d)", "weekofyear(?::DATE)"),
        # convention mirrors — the ONLY portable spellings:
        ("dayofweek_mirror", "dayofweek(d)", "dayofweek(?::DATE) + 1"),
        ("weekday_mirror", "weekday(d)", "isodow(?::DATE) - 1"),
    ],
)
def test_shared_date_primitives_agree(spark, label, spark_expr, duck_sql):
    """date_trunc casts to ::DATE on the DuckDB side so the mirror is
    copy-pasteable into oracle SQL (its date_trunc returns DATE for
    date input already; the cast is a no-op there)."""
    as_date = label.startswith(("trunc_", "last_day", "add_", "sub_"))
    diffs = [
        (r, g, w)
        for r, g, w in _both(spark, spark_expr, duck_sql, as_date=as_date)
        if g != w
    ]
    assert not diffs, f"{label} split the engines: {diffs}"


def test_out_of_python_domain_dates(spark):
    """Year-0 and year-10000 dates are VALID on both engines but
    OUTSIDE datetime.date — collecting them raw raises ValueError in
    the PySpark type converter, i.e. a driver-contract query whose
    result column can reach them would crash at toPandas() time, not
    diverge. Both facts pinned: the collect crash, and the
    format-level divergence (Spark date_format prints '+10000-...',
    DuckDB strftime prints '10000-...')."""
    df = spark.createDataFrame([("9999-12-31",)], "s string").select(
        F.add_months(F.to_date("s"), 1).alias("o")
    )
    with pytest.raises(Exception):
        df.collect()
    got = df.select(F.date_format("o", "yyyy-MM-dd").alias("f")).collect()
    assert got[0].f == "+10000-01-31"
    con = duckdb.connect()
    try:
        want = con.execute(
            "SELECT strftime((DATE '9999-12-31' + INTERVAL 1 MONTH),"
            " '%Y-%m-%d')"
        ).fetchone()[0]
    finally:
        con.close()
    assert want == "10000-01-31"


def test_raw_dayofweek_is_off_by_one(spark):
    """DOCUMENTED divergent convention: same-named ``dayofweek`` is
    1=Sun..7=Sat on Spark but 0=Sun..6=Sat on DuckDB. Asserted
    divergent so the +1 mirror above can never silently become a
    no-op (if an engine upgrade aligned them, the mirror would then
    be the bug)."""
    pairs = _both(spark, "dayofweek(d)", "dayofweek(?::DATE)")
    assert all(g == w + 1 for _, g, w in pairs), pairs


def test_lenient_parse_agree_domain(spark):
    """try_to_date == try_cast(DATE) on Spark (asserted), and both
    agree with DuckDB TRY_CAST on: ISO, non-padded ISO, space/tab-led
    and space-trailed, 'T'- and space-separated datetime suffixes,
    compact digits (both NULL), US order (both NULL), and invalid
    day-of-month (both NULL, where ANSI CAST would throw)."""
    agree = [
        s for s in PARSE_SHAPES
        if s not in ("2021/01/03", "2021-01-03x", "2021-01", "2021")
    ]
    df = spark.createDataFrame([(p,) for p in agree], "s string")
    rows = df.select(
        "s",
        F.try_to_date("s").alias("f"),
        F.col("s").try_cast("date").alias("c"),
    ).collect()
    assert all(r.f == r.c for r in rows), rows
    con = duckdb.connect()
    try:
        for r in rows:
            want = con.execute(
                "SELECT TRY_CAST(? AS DATE)", [r.s]
            ).fetchone()[0]
            assert r.f == want, (r.s, r.f, want)
    finally:
        con.close()


@pytest.mark.parametrize(
    "shape,spark_side,duck_side",
    [
        ("2021/01/03", None, datetime.date(2021, 1, 3)),
        ("2021-01-03x", None, datetime.date(2021, 1, 3)),
        ("2021-01", datetime.date(2021, 1, 1), None),
        ("2021", datetime.date(2021, 1, 1), None),
    ],
)
def test_lenient_parse_divergent_domain(spark, shape, spark_side, duck_side):
    """DOCUMENTED divergent corners: slash separators and trailing
    garbage parse ONLY on DuckDB; partial ISO dates parse ONLY on
    Spark. Unreachable today (module docstring audit); any future
    hostile-string->DATE oracle must format-pin its parse instead of
    using either engine's lenient cast."""
    df = spark.createDataFrame([(shape,)], "s string")
    got = df.select(F.try_to_date("s").alias("o")).collect()[0].o
    assert got == spark_side, (shape, got)
    con = duckdb.connect()
    try:
        want = con.execute(
            "SELECT TRY_CAST(? AS DATE)", [shape]
        ).fetchone()[0]
    finally:
        con.close()
    assert want == duck_side, (shape, want)


def test_randomized_date_mirror_sweep(spark):
    """Seeded 80-date sweep over the full proleptic-Gregorian domain
    [0001-01-01, 9999-12-31] through every shipped mirror pair — the
    hand-picked corner corpus above pins the KNOWN edges; this sweep
    guards the edges nobody thought to pick (r18: 0 diffs across 8
    primitive families x 80 dates). Seed fixed so a failure is
    reproducible; date_format/strftime normalize engine-side (year-0/
    year-10000 can't round-trip datetime.date, see _both)."""
    import random

    rng = random.Random(1318)
    dates = sorted({
        (datetime.date(1, 1, 1)
         + datetime.timedelta(days=rng.randrange(0, 3652058))).isoformat()
        for _ in range(80)
    })
    pairs = [
        ("trunc_week", "date_format(date_trunc('week', d), 'yyyy-MM-dd')",
         "strftime(date_trunc('week', ?::DATE), '%Y-%m-%d')"),
        ("last_day", "date_format(last_day(d), 'yyyy-MM-dd')",
         "strftime(last_day(?::DATE), '%Y-%m-%d')"),
        ("add_month7", "date_format(add_months(d, 7), 'yyyy-MM-dd')",
         "strftime((?::DATE + INTERVAL 7 MONTH)::DATE, '%Y-%m-%d')"),
        ("weekofyear", "weekofyear(d)", "weekofyear(?::DATE)"),
        ("dow_mirror", "dayofweek(d)", "dayofweek(?::DATE) + 1"),
        ("weekday_mirror", "weekday(d)", "isodow(?::DATE) - 1"),
        ("datediff", "datediff(d, DATE'1970-01-01')",
         "date_diff('day', DATE '1970-01-01', ?::DATE)"),
        ("doy", "dayofyear(d)", "dayofyear(?::DATE)"),
    ]
    df = spark.createDataFrame([(x,) for x in dates], "s string").select(
        F.to_date("s").alias("d")
    )
    con = duckdb.connect()
    try:
        for label, se, de in pairs:
            got = [r.o for r in df.select(F.expr(se).alias("o")).collect()]
            want = [
                con.execute(f"SELECT {de}", [x]).fetchone()[0]
                for x in dates
            ]
            if isinstance(got[0], str):
                want = [str(w) for w in want]
            diffs = [
                (x, g, w) for x, g, w in zip(dates, got, want) if g != w
            ]
            assert not diffs, (label, diffs[:5])
    finally:
        con.close()
