"""Cross-engine numeric-primitive corner pins (r18 sweep).

Fourth member of the gate family (casefold r16, strings r17, JSON
r17, dates r18): every numeric primitive an oracled value path shares
between Spark and DuckDB, probed against BOTH live engines.
Agreements asserted so an engine upgrade fails here, not as a driver
hash mismatch; divergences asserted AS divergent with the audit of
why no shipped path reaches them.

AGREE (asserted): the full mod-sign family (``%`` follows the
DIVIDEND's sign on both; float mod too), integer ``div``/``//``,
int/int ``/`` -> double, zero divisors -> NULL on both (under the
engine's ANSI-off regime the plain operators suffice; try_divide/
try_mod give the same NULLs and stay safe under any regime),
floor/ceil on negative halves, power incl. 0^0=1 and
power(-8, 1/3)=NaN, the whole NaN algebra (NaN=NaN true, NaN>Inf
true, max() propagates NaN, Inf-Inf=NaN), ``bround`` <->
``round_even``, DECIMAL round (half-up: 2.5->3, -2.5->-3), DOUBLE
round at positive/negative digits (Spark rounds the
shortest-decimal repr via BigDecimal.valueOf, so round(1.05D,1)=1.1
matches DuckDB — NOT the exact-binary 1.0499.. one might fear),
bit-identical double arithmetic (0.1+0.2), and greatest/least
NULL-skipping.

DIVERGE (asserted divergent):

1. ``ln``/``log10`` at 0 or negative: Spark -> NULL, DuckDB ->
   OutOfRangeException (the whole oracle query ABORTS). Audit r18:
   every shipped ln/log site (text_mining tfidf/entropy/lm-score)
   feeds exact integer counts >= 1 by construction, so the domain is
   unreachable — but a new log-bearing oracle must keep proving its
   argument positive ON BOTH SIDES.
2. ``sqrt(-1)``: Spark NaN, DuckDB raises.
3. DOUBLE -> INT cast: Spark TRUNCATES toward zero (2.7 -> 2,
   3.5 -> 3); DuckDB rounds HALF-EVEN (2.7 -> 3, 3.5 -> 4). Third
   member of the numeric-cast family — r17 already pinned that
   DuckDB's STRING -> INT rounds half-AWAY, so DuckDB has two
   different rounding modes where Spark has one truncation. Audit
   r18: every shipped float->int cast is on a ``round(...)`` output
   (an integral double — truncation == rounding there), so
   unreachable; mirror a genuine float->int cast as
   ``trunc(x)::BIGINT``, never a bare cast.
4. DOUBLE -> STRING cast: Spark prints Java Double.toString
   (scientific outside [1e-3, 1e7): '1.0E7', '1.0E-4'); DuckDB
   prints plain decimal ('10000000.0', '0.0001'). Same class the
   JSON gate pinned for get_json_object re-printing; pinned here for
   the PLAIN cast so no oracle ever string-compares a double.
5. BIGINT overflow: the engine regime WRAPS silently (ANSI off:
   MAX+1 -> MIN, and abs(INT_MIN) -> INT_MIN, still negative!);
   DuckDB ABORTS with OutOfRange. Sum-of-cents style oracles must
   size their scaling so products fit BIGINT at every SF — an
   overflow would be a silent wrong VALUE on the Spark side and a
   loud abort on the oracle side.
6. ``sign(-0.0)``: Spark preserves the negative zero (-0.0), DuckDB
   returns 0. Unreachable: no shipped path applies sign() to a
   float.

ANSI regime note: the engine pins ``spark.sql.ansi.enabled=false``
BOTH in its own session factory and in ``tune_for_session``
(``session.py:40,79``), which the registry wrapper applies to
driver-provided sessions — so the shipped regime is ANSI-OFF
everywhere, and the agree-table's zero-divisor rows hold for the
PLAIN ``/`` and ``%``. A raw vanilla Spark 4 session (ANSI on)
instead ABORTS on zero division, fractional casts, and overflow;
the regime test below pins the conf so losing the pin fails loudly
here rather than as a driver-run crash.

Also measured (not asserted — type-level note): DECIMAL / INT
division returns DECIMAL(scale 6) on Spark but DOUBLE on DuckDB;
values agree to 6 dp so the driver's %.6f canonicalization masks it,
but an oracle must not depend on the result's TYPE.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with family)


def _spark_val(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS o").collect()[0].o


def _duck_val(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(f"SELECT {sql}").fetchone()[0]
    finally:
        con.close()


def _duck_raises(sql: str) -> bool:
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
        ("mod_pos_neg", "7 % -3", "7 % -3"),
        ("mod_neg_pos", "-7 % 3", "-7 % 3"),
        ("mod_neg_neg", "-7 % -3", "-7 % -3"),
        ("fmod_neg", "-7.5D % 2.0D", "-7.5::DOUBLE % 2.0::DOUBLE"),
        ("intdiv_neg", "-7 div 2", "-7 // 2"),
        ("div_ints", "7 / 2", "7 / 2"),
        ("try_div_zero", "try_divide(7, 0)", "7 / 0"),
        ("try_div_zero_d", "try_divide(7.0D, 0.0D)",
         "7.0::DOUBLE / 0.0::DOUBLE"),
        ("try_mod_zero", "try_mod(7, 0)", "7 % 0"),
        ("floor_neg", "floor(-2.5D)", "floor(-2.5::DOUBLE)::BIGINT"),
        ("ceil_neg", "ceil(-2.5D)", "ceil(-2.5::DOUBLE)::BIGINT"),
        ("pow_00", "power(0, 0)", "power(0, 0)"),
        ("greatest_null", "greatest(1, NULL)", "greatest(1, NULL)"),
        ("least_null", "least(1, NULL)", "least(1, NULL)"),
        ("round_d_half", "round(2.5D, 0)", "round(2.5::DOUBLE, 0)"),
        ("round_d_neg_half", "round(-2.5D, 0)", "round(-2.5::DOUBLE, 0)"),
        # Spark rounds the SHORTEST-DECIMAL repr of the double
        # (BigDecimal.valueOf), so 1.05 -> 1.1 despite the binary value
        # being 1.0499..; DuckDB agrees. The exact-rational helper pair
        # (functions/money.py) stays mandatory for RATIOS of integers,
        # where the composed double genuinely differs between engines.
        ("round_d_105", "round(1.05D, 1)", "round(1.05::DOUBLE, 1)"),
        ("round_d_2675", "round(2.675D, 2)", "round(2.675::DOUBLE, 2)"),
        ("round_negdigits", "round(1250.0D, -2)",
         "round(1250.0::DOUBLE, -2)"),
        ("round_dec_half", "round(2.5BD, 0)",
         "round(2.5::DECIMAL(10,1), 0)"),
        ("round_dec_neghalf", "round(-2.5BD, 0)",
         "round(-2.5::DECIMAL(10,1), 0)"),
        ("round_dec_105", "round(1.05BD, 1)",
         "round(1.05::DECIMAL(10,2), 1)"),
        ("bround_25", "bround(2.5D, 0)", "round_even(2.5::DOUBLE, 0)"),
        ("bround_35", "bround(3.5D, 0)", "round_even(3.5::DOUBLE, 0)"),
        ("dbl_sum_bits", "0.1D + 0.2D", "0.1::DOUBLE + 0.2::DOUBLE"),
        ("pow_neg_frac_nan", "isnan(power(-8, 1.0D/3))",
         "isnan(power(-8, 1.0::DOUBLE/3))"),
        ("nan_eq_nan", "cast('NaN' as double) = cast('NaN' as double)",
         "'NaN'::DOUBLE = 'NaN'::DOUBLE"),
        ("nan_gt_inf", "cast('NaN' as double) > cast('Infinity' as double)",
         "'NaN'::DOUBLE > 'Infinity'::DOUBLE"),
        ("inf_minus_inf",
         "isnan(cast('Infinity' as double) - cast('Infinity' as double))",
         "isnan('Infinity'::DOUBLE - 'Infinity'::DOUBLE)"),
        ("nan_max",
         "(SELECT isnan(max(x)) FROM VALUES (1.0D),"
         " (cast('NaN' as double)), (2.0D) t(x))",
         "(SELECT isnan(max(x)) FROM (VALUES (1.0::DOUBLE),"
         " ('NaN'::DOUBLE), (2.0::DOUBLE)) t(x))"),
    ],
)
def test_shared_numeric_primitives_agree(spark, label, spark_expr, duck_sql):
    got, want = _spark_val(spark, spark_expr), _duck_val(duck_sql)
    if isinstance(got, float) and isinstance(want, float):
        assert (math.isnan(got) and math.isnan(want)) or got == want, (
            label, got, want)
    else:
        assert got == want, (label, got, want)


def test_bigint_overflow_wrap_divergence(spark):
    """DOCUMENTED divergent class #5: the ANSI-off engine regime
    WRAPS on BIGINT overflow — silently wrong values, including the
    classic abs(INT_MIN) == INT_MIN — while DuckDB aborts. The money
    helpers' 10^4 cent scale keeps every shipped sum far inside
    BIGINT at all testdata SFs."""
    assert (
        _spark_val(spark, "9223372036854775807L + 1L")
        == -9223372036854775808
    )
    assert (
        _spark_val(spark, "abs(-9223372036854775807L - 1L)")
        == -9223372036854775808
    )
    assert _duck_raises("9223372036854775807 + 1")
    assert _duck_raises("abs((-9223372036854775807 - 1))")


@pytest.mark.parametrize(
    "label,spark_expr,spark_result,duck_sql",
    [
        ("ln_zero", "ln(0)", None, "ln(0)"),
        ("ln_neg", "ln(-1)", None, "ln(-1)"),
        ("log10_zero", "log10(0)", None, "log10(0)"),
        ("sqrt_neg", "isnan(sqrt(-1))", True, "sqrt(-1)"),
    ],
)
def test_log_sqrt_domain_divergence(
    spark, label, spark_expr, spark_result, duck_sql
):
    """DOCUMENTED divergent class #1/#2: out-of-domain log/sqrt is
    NULL/NaN on Spark but an ABORT on DuckDB. All shipped ln sites
    feed exact counts >= 1 (module docstring audit)."""
    assert _spark_val(spark, spark_expr) == spark_result, label
    assert _duck_raises(duck_sql), f"{label}: DuckDB stopped raising"


@pytest.mark.parametrize(
    "label,dval,spark_int,duck_int",
    [
        ("trunc_vs_halfeven_27", "2.7", 2, 3),
        ("trunc_vs_halfeven_35", "3.5", 3, 4),
        ("agree_halfeven_25", "2.5", 2, 2),
        ("trunc_vs_halfeven_neg27", "-2.7", -2, -3),
    ],
)
def test_double_to_int_cast_divergence(spark, label, dval, spark_int,
                                       duck_int):
    """DOCUMENTED divergent class #3: Spark truncates, DuckDB rounds
    half-even. Unreachable today (every shipped float->int cast sits
    on a round() output); mirror real ones as trunc(x)::BIGINT."""
    assert _spark_val(spark, f"try_cast({dval}D as int)") == spark_int
    assert _duck_val(f"TRY_CAST({dval}::DOUBLE AS INTEGER)") == duck_int


def test_double_to_string_cast_divergence(spark):
    """DOCUMENTED divergent class #4: Java scientific notation vs
    DuckDB plain decimal. No oracle may string-compare a double."""
    assert _spark_val(spark, "cast(10000000.0D as string)") == "1.0E7"
    assert _spark_val(spark, "cast(0.0001D as string)") == "1.0E-4"
    assert _duck_val("CAST(10000000.0::DOUBLE AS VARCHAR)") == "10000000.0"
    assert _duck_val("CAST(0.0001::DOUBLE AS VARCHAR)") == "0.0001"


def test_ansi_off_regime_is_pinned(spark):
    """The whole agree-table assumes the engine's ANSI-OFF pin
    (session.py:40,79): plain / and % on zero divisors NULL like
    DuckDB (asserted here for the double case too — NULL, not
    Infinity), and would instead ABORT on a vanilla ANSI session.
    If this conf pin is ever lost, fail here with the explanation
    rather than as a DIVIDE_BY_ZERO crash mid-driver-run."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "false", (
        "the engine regime is ANSI-off (session.py:40 and "
        "tune_for_session); losing the pin flips zero-division, "
        "fractional casts, and overflow from NULL/wrap to ABORT"
    )
    for expr in ("7 / 0", "7.0D / 0.0D", "7 % 0"):
        assert _spark_val(spark, expr) is None, expr
    assert _duck_val("7 / 0") is None
    assert _duck_val("7.0::DOUBLE / 0.0::DOUBLE") is None
    assert _duck_val("7 % 0") is None


def test_negative_zero_sign_divergence(spark):
    """DOCUMENTED divergent class #6: signum(-0.0) keeps the sign bit
    on Spark (-0.0) and drops it on DuckDB (0). No shipped path
    applies sign() to a float."""
    got = _spark_val(spark, "signum(-0.0D)")
    assert got == 0.0 and math.copysign(1.0, got) == -1.0
    assert str(_duck_val("sign(-0.0::DOUBLE)")) in ("0", "0.0")
