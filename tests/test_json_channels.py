"""Cross-engine JSON numeric-extraction pins (ADVICE r16 #1, VERDICT
r16 Next #5).

Two oracled queries extract a numeric from the ``events.props`` JSON
property bag through DIFFERENT Spark channels with different
semantics, each mirrored in its DuckDB oracle by a json_type split:

- ``q_variant_json``: ``try_variant_get(try_parse_json(props), '$.k',
  'long')`` — exact-decimal/double TRUNCATION toward zero for numbers,
  STRICT-integral cast for strings ("1.5" -> NULL), true/false -> 1/0,
  duplicate-key bags rejected at ANY depth.
- ``q_json_fns``: ``get_json_object(props, '$.k').cast('int')`` under
  non-ANSI — the extracted TEXT is cast, truncating decimal text
  toward zero ('1.5' -> 1, '.5' -> 0), but non-integer numbers
  re-print through Jackson's Double.toString first, so values outside
  [1e-3, 1e7) surface in exponent form and NULL.

These tests run the exact oracle CASE expressions against live DuckDB
and the exact Spark channel expressions against the live session, over
a corpus of hostile bags, and assert value-identity — plus the two
DOCUMENTED residuals asserted as divergent, so an engine upgrade that
silently closes (or widens) either gap fails loudly here instead of
surfacing as a driver hash mismatch.
"""

from __future__ import annotations

import json

import duckdb
import pytest
from pyspark.sql import functions as F

# the exact k-extraction subexpressions the two oracles interpolate —
# imported, never copied, so this pin cannot drift from the shipped SQL
from weightlifting_wod_etl_spark.queries.joins_dedup import (
    JSONFNS_ORACLE_K,
    VARIANT_ORACLE_K,
)

# hostile bags where the engines' NATIVE casts disagree (fractionals:
# Spark truncates, DuckDB's string->int cast rounds) or where one
# channel NULLs and the other doesn't — the corpus both pins below run
HOSTILE_BAGS = [
    '{"k": 5, "v": "x"}',
    '{"k":1,"k":2}',              # top-level duplicate keys
    '{k:1}',                      # malformed
    '{"k": "12"}',
    '{"k": {"x": 1}}',
    '{"k": [1,2]}',
    '{"k": null}',
    '{}',
    '  {"k": 9}  ',
    '{"k": 3.0}',
    '{"k": true}',
    '{"k": false}',
    '{"k": "true"}',
    '{"k": 1.5}',                 # ADVICE r16 #1: 1 (trunc), not 2
    '{"k": 2.5}',
    '{"k": -2.5}',
    '{"k": -1.5}',
    '{"k": 1.9999}',
    '{"k": "1.5"}',
    '{"k": "  12  "}',
    '{"k": "+12"}',
    '{"k": ".5"}',
    '{"k": "5."}',
    '{"k": "1e2"}',
    '{"k": 1e3}',
    '{"k": 1.5e7}',               # Jackson exponent band edge
    '{"k": 15000000.0}',
    '{"k": 9999999.5}',
    '{"k": 10000000.5}',
    '{"k": 0.001}',
    '{"k": 0.0009}',
    '{"k": 0.0}',
    '{"k": -0.0}',
    '{"k": -0.5}',
    '{"k": 1.5e10}',
    '{"k": 9.3e18}',
    '{"k": 1.5e300}',
    '{"k": 9223372036854775807}',
    '{"k": -9223372036854775808}',
    '{"k": 2147483648}',
    '{"k": 123456789012345678901}',
    '{"k": "9223372036854775808"}',
    '{"k": "2147483648"}',
    '{"k": "0012"}',
    '{"k": "abc"}',
    '{"k": ""}',
] + [
    # r17 whitespace corners: Spark's cast trims exactly the
    # single-byte class [\x00-\x20\x7F]; DuckDB's trim() instead
    # strips Unicode spaces and keeps control chars — a bare trim()
    # in the oracle split both directions on these
    json.dumps({"k": s})
    for s in [
        "\t12", "12\t", "\n12", "\r12", "\x0b12", "\x0c12",
        "\x0112", "\x1f12", "\x7f12",       # ISO controls: trimmed
        "\x8512",                            # NEL (2-byte): NOT trimmed
        " 12", "12 ",              # NBSP: NOT trimmed
        "　12", " 12",              # Unicode spaces: NOT trimmed
        "\t1.5", " 1.5",
    ]
]


def _duckdb_k(expr: str, bags: list[str]) -> list:
    con = duckdb.connect()
    try:
        return [
            r[0]
            for r in con.execute(
                f"SELECT {expr} AS k FROM ("
                "  SELECT try_cast(b AS JSON) AS pj"
                "  FROM (SELECT unnest(?) AS b)"
                ")",
                [bags],
            ).fetchall()
        ]
    finally:
        con.close()


def test_variant_channel_matches_oracle_on_hostile_bags(spark):
    """The variant long-cast and its json_type-split oracle mirror must
    agree value-for-value on every hostile bag — including the
    fractional set where DuckDB's native TRY_CAST would round."""
    df = spark.createDataFrame([(b,) for b in HOSTILE_BAGS], "props string")
    got = [
        r.k
        for r in df.select(
            F.expr(
                "try_variant_get(try_parse_json(props), '$.k', 'long')"
            ).alias("k")
        ).collect()
    ]
    want = _duckdb_k(VARIANT_ORACLE_K, HOSTILE_BAGS)
    diffs = [
        (b, s, d) for b, s, d in zip(HOSTILE_BAGS, got, want) if s != d
    ]
    assert not diffs, f"variant channel split from oracle: {diffs}"


def test_json_fns_channel_matches_oracle_on_hostile_bags(spark):
    """get_json_object + non-ANSI int cast and its oracle mirror —
    including the Jackson exponent-band NULLs the flat TRY_CAST form
    missed."""
    df = spark.createDataFrame([(b,) for b in HOSTILE_BAGS], "props string")
    got = [
        r.k
        for r in df.select(
            F.get_json_object("props", "$.k").cast("int").alias("k")
        ).collect()
    ]
    want = _duckdb_k(JSONFNS_ORACLE_K, HOSTILE_BAGS)
    diffs = [
        (b, s, d) for b, s, d in zip(HOSTILE_BAGS, got, want) if s != d
    ]
    assert not diffs, f"json_fns channel split from oracle: {diffs}"


def test_nested_duplicate_key_divergence(spark):
    """DOCUMENTED residual #1 (VERDICT r16 Next #5), pinned as
    divergent: Spark's try_parse_json rejects duplicate keys at NESTED
    depth (whole bag -> NULL), while the oracle's json_keys CASE only
    sees top-level duplicates, so DuckDB still extracts k=5. Such bags
    are OUTSIDE the oracled domain (q_variant_json docstring). If an
    engine upgrade changes either side — Spark accepting nested dups,
    or DuckDB growing a recursive rejection — this fails loudly and
    the domain note must be revisited."""
    bag = '{"a": {"k": 1, "k": 2}, "k": 5}'
    df = spark.createDataFrame([(bag,)], "props string")
    spark_k = df.select(
        F.expr("try_variant_get(try_parse_json(props), '$.k', 'long')").alias(
            "k"
        )
    ).collect()[0].k
    assert spark_k is None, (
        "Spark now ACCEPTS nested duplicate keys — the q_variant_json "
        f"oracle's top-level-only dup CASE may now be exact; got {spark_k}"
    )
    duck_k = _duckdb_k(VARIANT_ORACLE_K, [bag])[0]
    assert duck_k == 5, (
        "DuckDB now rejects nested duplicate keys — the documented "
        f"residual has closed; tighten the oracle instead; got {duck_k}"
    )


def test_high_precision_decimal_divergence(spark):
    """DOCUMENTED residual #2, pinned as divergent: Spark's variant
    keeps plain-decimal tokens EXACT (0.99999999999999999 truncates to
    0) while DuckDB's JSON parser stores the nearest double at parse
    time (1.0 -> 1) — the original digits are unrecoverable from the
    oracle side, so >17-significant-digit fractional bags are outside
    the oracled domain. q_json_fns is NOT affected (both engines
    double-ize on that channel — asserted too)."""
    bag = '{"k": 0.99999999999999999}'
    df = spark.createDataFrame([(bag,)], "props string")
    row = df.select(
        F.expr("try_variant_get(try_parse_json(props), '$.k', 'long')").alias(
            "kv"
        ),
        F.get_json_object("props", "$.k").cast("int").alias("kj"),
    ).collect()[0]
    assert row.kv == 0, f"variant channel no longer exact-decimal: {row.kv}"
    assert _duckdb_k(VARIANT_ORACLE_K, [bag])[0] == 1
    # the get_json_object channel double-izes on BOTH sides -> agrees
    assert row.kj == 1
    assert _duckdb_k(JSONFNS_ORACLE_K, [bag])[0] == 1
