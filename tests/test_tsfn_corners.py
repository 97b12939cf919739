"""Cross-engine timestamp/interval corner pins (r18 sweep).

Sixth member of the gate family (casefold r16; strings, JSON r17;
dates, numerics, aggregates r18): the timestamp primitives the
events/timeseries oracles share, probed against BOTH live engines
(session TZ pinned UTC on both, as the registry wrapper does).

AGREE (asserted): the whole lenient parse matrix (ISO with T or
space, ms/ns fractions — nanos TRUNCATE to the engines' common
microsecond precision on both, '+02:00' offsets and 'Z' converting
to UTC, bare dates, compact digits rejected by both),
``unix_micros`` <-> ``epoch_us`` EXACTLY incl. negative (pre-epoch)
values and the make/roundtrip, whole-second ``unix_timestamp`` <->
``epoch()::BIGINT`` on integral-second inputs, ``date_trunc`` at
hour/ms incl. PRE-EPOCH seconds (both floor toward -infinity:
23:59:59.5 -> :59, NOT a truncation toward zero), month-addition
clamping on timestamps, ``second()`` as integer, and the
timestamp->string print format (space separator, fraction printed
shortest: '.5', '.000001', nothing for whole seconds).

DIVERGE (asserted divergent):

1. ``unix_timestamp`` on PRE-EPOCH FRACTIONAL timestamps: Spark
   truncates toward zero (-0.5 s -> 0); DuckDB has no direct
   equivalent and the naive ``floor(epoch())`` mirror floors
   (-0.5 -> -1). The portable mirror is ``trunc(epoch(ts))::BIGINT``
   — or stay in exact microseconds, as every shipped query does.
2. ``unix_millis`` has the INVERTED convention: Spark FLOORS
   (-0.5 ms -> -1, Java floorDiv of the micros); DuckDB's
   ``epoch_ms`` truncates toward zero (-> 0). Two adjacent Spark
   APIs with opposite negative-value behavior — seconds truncate,
   millis floor; only the microsecond channel is conversion-free.
3. ``extract(SECOND)``: Spark returns DECIMAL(8,6) WITH the
   fractional part ('45.750000'); DuckDB returns the integer second
   (45). second() agrees (int on both); extract does not.
4. ``extract(EPOCH)``: not a valid Spark extract field at all
   (INVALID_EXTRACT_FIELD); DuckDB returns the exact epoch double.
5. Footgun (Spark-side, pinned): ``CAST(timestamp AS BIGINT)``
   yields SECONDS (truncated), not microseconds — a 1 us delta
   casts to a 0 s delta. DuckDB refuses the direct cast entirely.

Audit r18: every shipped epoch conversion is the exact
``unix_micros`` <-> ``epoch_us`` pair (cdc_interval, core,
events_analytics, timeseries — grepped); the divergent
seconds/millis channels and extract forms appear nowhere.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest


def _s(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS o").collect()[0].o


def _d(sql: str):
    con = duckdb.connect()
    try:
        con.execute("SET TimeZone='UTC'")
        return con.execute(f"SELECT {sql}").fetchone()[0]
    finally:
        con.close()


@pytest.mark.parametrize(
    "label,shape,expected",
    [
        ("iso_t", "2021-01-03T12:30:45",
         datetime.datetime(2021, 1, 3, 12, 30, 45)),
        ("frac_ms", "2021-01-03 12:30:45.123",
         datetime.datetime(2021, 1, 3, 12, 30, 45, 123000)),
        # nanos truncate to the common microsecond precision on BOTH
        ("frac_ns", "2021-01-03 12:30:45.123456789",
         datetime.datetime(2021, 1, 3, 12, 30, 45, 123456)),
        ("offset", "2021-01-03 12:30:45+02:00",
         datetime.datetime(2021, 1, 3, 10, 30, 45)),
        ("zulu", "2021-01-03T12:30:45Z",
         datetime.datetime(2021, 1, 3, 12, 30, 45)),
        ("date_only", "2021-01-03", datetime.datetime(2021, 1, 3, 0, 0)),
        ("compact_rejected", "20210103", None),
    ],
)
def test_lenient_timestamp_parse_agrees(spark, label, shape, expected):
    got = _s(spark, f"try_to_timestamp('{shape}')")
    want = _d(f"TRY_CAST('{shape}' AS TIMESTAMP)")
    assert got == expected and want == expected, (label, got, want)


@pytest.mark.parametrize(
    "label,spark_expr,duck_sql",
    [
        ("micros_preepoch",
         "unix_micros(timestamp'1969-12-31 23:59:59.5')",
         "epoch_us(TIMESTAMP '1969-12-31 23:59:59.5')"),
        ("micros_roundtrip",
         "unix_micros(timestamp_micros(-1500000))",
         "epoch_us(make_timestamp(-1500000))"),
        ("seconds_integral",
         "unix_timestamp(timestamp'2021-01-03 12:30:45')",
         "epoch(TIMESTAMP '2021-01-03 12:30:45')::BIGINT"),
        ("trunc_hour",
         "cast(date_trunc('hour', timestamp'2021-01-03 12:30:45.7')"
         " as string)",
         "strftime(date_trunc('hour', TIMESTAMP '2021-01-03 12:30:45.7'),"
         " '%Y-%m-%d %H:%M:%S')"),
        ("trunc_ms",
         "cast(date_trunc('millisecond',"
         " timestamp'2021-01-03 12:30:45.1239') as string)",
         "CAST(date_trunc('ms', TIMESTAMP '2021-01-03 12:30:45.1239')"
         " AS VARCHAR)"),
        # floor toward -infinity on BOTH, not truncation toward zero
        ("trunc_sec_preepoch",
         "cast(date_trunc('second', timestamp'1969-12-31 23:59:59.5')"
         " as string)",
         "CAST(date_trunc('second', TIMESTAMP '1969-12-31 23:59:59.5')"
         " AS VARCHAR)"),
        ("month_add_clamp",
         "cast(timestamp'2021-01-31 10:00:00' + interval 1 month"
         " as string)",
         "CAST(TIMESTAMP '2021-01-31 10:00:00' + INTERVAL 1 MONTH"
         " AS VARCHAR)"),
        ("second_int",
         "second(timestamp'2021-01-03 12:30:45.75')",
         "second(TIMESTAMP '2021-01-03 12:30:45.75')"),
        ("print_frac",
         "cast(timestamp'2021-01-03 12:30:45.5' as string)",
         "CAST(TIMESTAMP '2021-01-03 12:30:45.5' AS VARCHAR)"),
        ("print_whole",
         "cast(timestamp'2021-01-03 12:30:45' as string)",
         "CAST(TIMESTAMP '2021-01-03 12:30:45' AS VARCHAR)"),
        ("print_us",
         "cast(timestamp'2021-01-03 12:30:45.000001' as string)",
         "CAST(TIMESTAMP '2021-01-03 12:30:45.000001' AS VARCHAR)"),
    ],
)
def test_shared_timestamp_primitives_agree(spark, label, spark_expr,
                                           duck_sql):
    got, want = _s(spark, spark_expr), _d(duck_sql)
    assert got == want, (label, got, want)


def test_unix_timestamp_preepoch_fraction_divergence(spark):
    """DOCUMENTED divergent #1: Spark truncates toward zero; the
    naive floor(epoch()) mirror floors. trunc(epoch()) is the
    faithful mirror."""
    assert _s(
        spark, "unix_timestamp(timestamp'1969-12-31 23:59:59.5')") == 0
    assert _d(
        "floor(epoch(TIMESTAMP '1969-12-31 23:59:59.5'))::BIGINT") == -1
    assert _d(
        "trunc(epoch(TIMESTAMP '1969-12-31 23:59:59.5'))::BIGINT") == 0


def test_unix_millis_inverted_convention_divergence(spark):
    """DOCUMENTED divergent #2: millis FLOOR on Spark but TRUNCATE on
    DuckDB — the opposite split of #1. Only unix_micros/epoch_us is
    conversion-free."""
    assert _s(
        spark, "unix_millis(timestamp'1969-12-31 23:59:59.9995')") == -1
    assert _d("epoch_ms(TIMESTAMP '1969-12-31 23:59:59.9995')") == 0


def test_extract_second_fraction_divergence(spark):
    """DOCUMENTED divergent #3: extract(SECOND) keeps the fraction on
    Spark (DECIMAL(8,6)) and drops it on DuckDB."""
    got = _s(
        spark,
        "cast(extract(second from timestamp'2021-01-03 12:30:45.75')"
        " as string)",
    )
    assert got == "45.750000"
    assert _d(
        "extract(second FROM TIMESTAMP '2021-01-03 12:30:45.75')") == 45


def test_extract_epoch_is_spark_gap(spark):
    """DOCUMENTED divergent #4: EPOCH is not a Spark extract field;
    DuckDB returns the exact double. unix_micros is the portable
    spelling."""
    with pytest.raises(Exception):
        _s(spark, "extract(epoch from timestamp'2021-01-03 12:30:45')")
    assert _d(
        "extract(epoch FROM TIMESTAMP '2021-01-03 12:30:45.75')"
    ) == 1609677045.75


def test_timestamp_to_bigint_is_seconds_footgun(spark):
    """DOCUMENTED footgun #5: Spark CAST(ts AS BIGINT) is SECONDS —
    a 1 us delta collapses to 0. Keep deltas in unix_micros."""
    assert _s(
        spark,
        "cast(timestamp'2021-01-03 12:00:00.000001' as long)"
        " - cast(timestamp'2021-01-03 12:00:00' as long)",
    ) == 0
    assert _s(
        spark,
        "unix_micros(timestamp'2021-01-03 12:00:00.000001')"
        " - unix_micros(timestamp'2021-01-03 12:00:00')",
    ) == 1
