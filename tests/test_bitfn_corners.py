"""Cross-engine bit-op and edit-distance corner pins (r18 sweep).

Ninth member of the gate family. Bit ops are the minhash/simhash/
z-order cores (Spark-side only today — audited: no oracle SQL
contains a shift; sign-bit extraction in the simhash oracle is
arithmetic) and levenshtein is the fuzzy-dedup primitive
(q_fuzzy_dedup's oracle DOES mirror it), so the corners matter the
moment either surface widens.

AGREE (asserted): xor/and/or/not on negative BIGINTs (two's
complement both), arithmetic shiftright on negatives, shiftleft for
in-range amounts, bit_count, levenshtein on ASCII (incl. empty and
the transposition-free classic), strpos/instr incl. no-match 0,
translate (via replace-chain mirror), repeat incl. the
negative-count -> '' edge.

DIVERGE (asserted divergent):

1. ``shiftleft`` at or past the sign/width boundary: Spark keeps
   Java semantics — 1<<63 wraps to LONG_MIN and the shift amount is
   taken MOD 64 (1<<64 == 1, 1<<65 == 2); DuckDB raises Out of
   Range for both the overflowing value and amounts >= 64. Audit
   r18: the engine's largest Spark-side shift is z-order's
   bits*cols-1 (< 63 for every shipped call) and minhash uses only
   shiftright; any future oracle-mirrored shift must bound the
   amount to [0, 62] on values that cannot overflow.
2. ``shiftrightunsigned`` has no DuckDB twin — and the obvious
   ``x::UBIGINT`` mirror FAILS because DuckDB's signed->unsigned
   cast is VALUE-checked, not bit-reinterpreting (a negative BIGINT
   raises Conversion Error). The working mirror reconstructs the
   unsigned value in HUGEINT arithmetic:
   ``(CASE WHEN x < 0 THEN x::HUGEINT + 2^64 ELSE x::HUGEINT END)
   // 2^n`` — asserted equal here so the spelling is on record
   before anyone needs it.
3. ``levenshtein`` on NON-ASCII: Spark counts CODEPOINT edits
   ('héllo'->'hello' = 1), DuckDB counts BYTE edits (= 2; a
   supplementary-plane char costs 4). Audit r18: the one oracled
   levenshtein runs on TPC-H ``p_name`` — generated from an ASCII
   word list, where bytes == codepoints. A future fuzzy-dedup over
   real document text must either normalize to ASCII first or drop
   the oracle mirror; Spark's bounded 3-arg levenshtein(a, b, k)
   mirrors fine as ``levenshtein(a, b) <= k`` ON ASCII (also
   asserted — the early-exit changes cost, not value).
4. ``overlay`` is Spark-only (DuckDB: no such function).
"""

from __future__ import annotations

import duckdb
import pytest


def _s(spark, sql: str):
    return spark.sql(f"SELECT {sql} AS o").collect()[0].o


def _d(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(f"SELECT {sql}").fetchone()[0]
    finally:
        con.close()


def _d_raises(sql: str) -> bool:
    con = duckdb.connect()
    try:
        con.execute(f"SELECT {sql}").fetchone()
        return False
    except duckdb.Error:
        return True
    finally:
        con.close()


@pytest.mark.parametrize(
    "label,spark_expr,duck_sql",
    [
        ("xor_neg", "-5L ^ 3L", "xor(-5::BIGINT, 3::BIGINT)"),
        ("and_neg", "-5L & 3L", "-5::BIGINT & 3::BIGINT"),
        ("or_neg", "-5L | 3L", "-5::BIGINT | 3::BIGINT"),
        ("not", "~5L", "~(5::BIGINT)"),
        ("shl_inrange", "shiftleft(1L, 62)", "(1::BIGINT << 62)"),
        ("shr_neg_arith", "shiftright(-16L, 2)", "(-16::BIGINT >> 2)"),
        ("bit_count", "bit_count(255L)", "bit_count(255::BIGINT)"),
        ("shru_mirror", "shiftrightunsigned(-16L, 2)",
         "((CASE WHEN -16::BIGINT < 0"
         " THEN -16::HUGEINT + 18446744073709551616::HUGEINT"
         " ELSE -16::HUGEINT END) // 4)::BIGINT"),
        ("lev_classic", "levenshtein('kitten', 'sitting')",
         "levenshtein('kitten', 'sitting')"),
        ("lev_empty", "levenshtein('', 'abc')", "levenshtein('', 'abc')"),
        ("lev_case", "levenshtein('abc', 'ABC')",
         "levenshtein('abc', 'ABC')"),
        ("lev_bounded_ascii", "levenshtein('kitten', 'sitting', 3) <= 3",
         "levenshtein('kitten', 'sitting') <= 3"),
        ("instr", "instr('foobar', 'bar')", "strpos('foobar', 'bar')"),
        ("instr_miss", "instr('foobar', 'zz')", "strpos('foobar', 'zz')"),
        ("translate", "translate('abcba', 'ab', 'xy')",
         "replace(replace('abcba', 'a', 'x'), 'b', 'y')"),
        ("repeat", "repeat('ab', 3)", "repeat('ab', 3)"),
        ("repeat_neg", "repeat('ab', -1)", "repeat('ab', -1)"),
    ],
)
def test_bit_and_editdist_primitives_agree(spark, label, spark_expr,
                                           duck_sql):
    got, want = _s(spark, spark_expr), _d(duck_sql)
    assert got == want, (label, got, want)


def test_shiftleft_boundary_divergence(spark):
    """DOCUMENTED divergent #1: Java wrap + mod-64 amounts vs DuckDB
    range errors."""
    assert _s(spark, "shiftleft(1L, 63)") == -9223372036854775808
    assert _s(spark, "shiftleft(1L, 64)") == 1
    assert _s(spark, "shiftleft(1L, 65)") == 2
    assert _d_raises("(1::BIGINT << 63)")
    assert _d_raises("(1::BIGINT << 64)")


def test_levenshtein_nonascii_divergence(spark):
    """DOCUMENTED divergent #3: codepoint edits vs byte edits."""
    assert _s(spark, "levenshtein('héllo', 'hello')") == 1
    assert _d("levenshtein('héllo', 'hello')") == 2
    assert _s(spark, "levenshtein('𝄞a', 'a')") == 1
    assert _d("levenshtein('𝄞a', 'a')") == 4


def test_fuzzy_dedup_levenshtein_domain_is_ascii(spark, sf_dir):
    """Guard the audit: q_fuzzy_dedup's oracle mirrors levenshtein on
    p_name, which must stay pure-ASCII for bytes == codepoints. If
    the generator ever emits a non-ASCII part name, fail HERE with
    the explanation instead of as a driver hash mismatch."""
    from weightlifting_wod_etl_spark.io import load_table
    from pyspark.sql import functions as F

    bad = (
        load_table(spark, sf_dir, "part")
        .filter(~F.col("p_name").rlike(r"^[\x00-\x7F]*$"))
        .count()
    )
    assert bad == 0, (
        f"{bad} non-ASCII p_name rows: the levenshtein oracle mirror "
        "counts bytes there while Spark counts codepoints"
    )


def test_overlay_is_spark_only(spark):
    """DOCUMENTED API gap #4."""
    assert _s(spark, "overlay('hello' PLACING 'XY' FROM 2)") == "hXYlo"
    assert _d_raises("overlay('hello' PLACING 'XY' FROM 2)")
