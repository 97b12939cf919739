"""Cross-engine aggregate-function corner pins (r18 sweep).

Fifth member of the gate family (casefold r16; strings, JSON r17;
dates, numerics r18): the statistical aggregates shared by oracled
value paths (q_corr_stats, q_linreg_trend, q_autocorr, q_chi_square,
q_zscore_normalize, q_percentile, q_mode_per_group), probed against
BOTH live engines.

AGREE (asserted):

- The Welford-family co-moments (stddev_samp/pop, var_samp/pop,
  covar_samp, corr) agree to ~1e-12 RELATIVE but NOT bit-for-bit
  (different merge orders); asserted here at 1e-9 relative plus at
  the 6-dp round every shipped stats query applies — raw-double
  equality on a co-moment is NEVER a valid oracle contract.
- Exact percentiles: median, percentile(p) <-> quantile_cont(p)
  (exact linear interpolation both sides), and the discrete form at
  small n.
- The degenerate-input lattice: single-row stddev/var_samp/corr/
  regr_slope -> NULL on both, single-row stddev_pop -> 0.0 on both,
  corr against a constant -> NULL on both, sum of all-NULL -> NULL,
  count of all-NULL -> 0, regr_slope of an exact line -> the slope,
  regr_r2 of a constant response -> 1.0.
- bool_and / any_value on deterministic input.

DIVERGE (asserted divergent):

1. ``skewness``: Spark computes the POPULATION skewness g1 =
   m3/m2^1.5; DuckDB the SAMPLE-corrected G1 = g1*sqrt(n(n-1))/(n-2)
   — at n=3 the factor is sqrt(6), turning 0.3818 into 0.9352: a
   MATERIAL divergence no rounding hides. At n=2 Spark returns 0.0,
   DuckDB NULL (G1 needs n >= 3).
2. ``kurtosis``: Spark the population EXCESS kurtosis g2 (n=3 ->
   -1.5); DuckDB the sample-corrected G2, which needs n >= 4 and
   returns NULL below. Both skew and kurtosis are UNUSED by shipped
   paths (audited r18 — grep hits only write.mode); a future
   moments-bearing oracle must mirror the correction factor
   explicitly.
3. ``mode``: native mode() has no tie-break contract — on all-
   distinct input Spark returns an arbitrary member while DuckDB
   picks its own; q_mode_per_group therefore implements the
   deterministic (count DESC, value ASC) tie-break with an ordered
   struct max on BOTH sides (events_analytics.py:907) and native
   mode() must never appear in an oracled path.
"""

from __future__ import annotations

import math

import duckdb
import pytest


def _spark_rows(spark, expr: str, values_sql: str):
    return spark.sql(
        f"SELECT {expr} AS o FROM VALUES {values_sql} t(x)"
    ).collect()[0].o


def _duck_rows(expr: str, values_sql: str):
    con = duckdb.connect()
    try:
        return con.execute(
            f"SELECT {expr} FROM (VALUES {values_sql}) t(x)"
        ).fetchone()[0]
    finally:
        con.close()


S3 = "(1.0D),(2.0D),(4.0D)"
D3 = "(1.0::DOUBLE),(2.0::DOUBLE),(4.0::DOUBLE)"
S1 = "(1.0D)"
D1 = "(1.0::DOUBLE)"


@pytest.mark.parametrize(
    "label,spark_expr,duck_expr",
    [
        ("stddev_samp", "stddev_samp(x)", "stddev_samp(x)"),
        ("stddev_pop", "stddev_pop(x)", "stddev_pop(x)"),
        ("var_samp", "var_samp(x)", "var_samp(x)"),
        ("var_pop", "var_pop(x)", "var_pop(x)"),
        ("covar_samp", "covar_samp(x, 2*x)", "covar_samp(x, 2*x)"),
        ("corr_line", "corr(x, 3*x + 1)", "corr(x, 3*x + 1)"),
    ],
)
def test_comoments_agree_to_tolerance_not_bits(spark, label, spark_expr,
                                               duck_expr):
    """1e-9 relative + the shipped 6-dp contract — NOT raw equality;
    the two engines' merge orders differ in the last ulp or two."""
    got = _spark_rows(spark, spark_expr, S3)
    want = _duck_rows(duck_expr, D3)
    assert math.isclose(got, want, rel_tol=1e-9), (label, got, want)
    assert round(got, 6) == round(want, 6), (label, got, want)


@pytest.mark.parametrize(
    "label,spark_expr,duck_expr",
    [
        ("median", "median(x)", "median(x)"),
        ("perc50", "percentile(x, 0.5)", "quantile_cont(x, 0.5)"),
        ("perc25", "percentile(x, 0.25)", "quantile_cont(x, 0.25)"),
        ("perc90", "percentile(x, 0.9)", "quantile_cont(x, 0.9)"),
        ("regr_slope", "regr_slope(2*x + 1, x)", "regr_slope(2*x + 1, x)"),
        ("regr_r2_const", "regr_r2(1.0D, x)", "regr_r2(1.0, x)"),
        ("bool_and", "bool_and(x > 0)", "bool_and(x > 0)"),
        ("any_value", "any_value(x)", "any_value(x)"),
    ],
)
def test_exact_aggregates_agree(spark, label, spark_expr, duck_expr):
    got = _spark_rows(spark, spark_expr, S3)
    want = _duck_rows(duck_expr, D3)
    assert got == want, (label, got, want)


@pytest.mark.parametrize(
    "label,spark_expr,duck_expr,expected",
    [
        ("stddev_1row", "stddev_samp(x)", "stddev_samp(x)", None),
        ("var_samp_1row", "var_samp(x)", "var_samp(x)", None),
        ("corr_1row", "corr(x, x)", "corr(x, x)", None),
        ("regr_slope_1row", "regr_slope(x, x)", "regr_slope(x, x)", None),
        ("stddev_pop_1row", "stddev_pop(x)", "stddev_pop(x)", 0.0),
        ("sum_all_null", "sum(x)", "sum(x)", None),
        ("count_all_null", "count(x)", "count(x)", 0),
    ],
)
def test_degenerate_input_lattice_agrees(spark, label, spark_expr,
                                         duck_expr, expected):
    if "null" in label:
        sv = _spark_rows(spark, spark_expr, "(CAST(NULL AS DOUBLE))")
        dv = _duck_rows(duck_expr, "(NULL::DOUBLE)")
    else:
        sv = _spark_rows(spark, spark_expr, S1)
        dv = _duck_rows(duck_expr, D1)
    assert sv == expected and dv == expected, (label, sv, dv)


def test_corr_against_constant_is_null_on_both(spark):
    assert _spark_rows(spark, "corr(x, 1.0D)", S3) is None
    assert _duck_rows("corr(x, 1.0)", D3) is None


def test_skewness_population_vs_sample_divergence(spark):
    """DOCUMENTED divergent #1: at n=3 on [1,2,4] Spark's population
    g1 and DuckDB's sample G1 differ by exactly sqrt(n(n-1))/(n-2) =
    sqrt(6). The relation is asserted so an engine release moving to
    the other convention flips this loudly."""
    g1 = _spark_rows(spark, "skewness(x)", S3)
    G1 = _duck_rows("skewness(x)", D3)
    n = 3
    factor = math.sqrt(n * (n - 1)) / (n - 2)
    assert math.isclose(G1, g1 * factor, rel_tol=1e-9), (g1, G1)
    assert not math.isclose(g1, G1, rel_tol=1e-3)
    # n=2: population form is defined (0.0 for any 2 points), sample
    # correction needs n >= 3
    assert _spark_rows(spark, "skewness(x)", "(1.0D),(2.0D)") == 0.0
    assert _duck_rows(
        "skewness(x)", "(1.0::DOUBLE),(2.0::DOUBLE)") is None


def test_kurtosis_population_vs_sample_divergence(spark):
    """DOCUMENTED divergent #2: Spark's population excess kurtosis is
    defined from n=1 up (n=3 -> -1.5 for any non-constant triple);
    DuckDB's sample-corrected G2 needs n >= 4."""
    assert _spark_rows(spark, "kurtosis(x)", S3) == -1.5
    assert _duck_rows("kurtosis(x)", D3) is None


def test_mode_has_no_cross_engine_tie_contract(spark):
    """DOCUMENTED divergent #3: on all-distinct input each engine
    returns SOME value; nothing guarantees the same one (measured
    r18: Spark 2.0, DuckDB 1.0 on [1,2,4]). Only the membership is
    asserted — q_mode_per_group's ordered-struct-max tie-break is the
    portable spelling."""
    sv = _spark_rows(spark, "mode(x)", S3)
    dv = _duck_rows("mode(x)", D3)
    assert sv in (1.0, 2.0, 4.0)
    assert dv in (1.0, 2.0, 4.0)


def test_struct_max_null_field_divergence(spark):
    """DOCUMENTED divergent #4 (r18 struct probe): max over structs
    whose ORDERING FIELD can be NULL picks OPPOSITE rows — Spark's
    struct ordering sorts a NULL field LOW (max = the best non-NULL
    row), DuckDB's ROW comparison sorts it HIGH (max = the NULL row).
    Scalar struct comparison likewise splits: (1, NULL) < (1, 3) is
    TRUE on Spark, NULL (three-valued) on DuckDB. Unreachable today:
    every ordered-struct/argmax path packs a total-ordered non-NULL
    BIGINT key instead (q_argmax_events' cents<<27|id packing,
    q_mode_per_group's count-desc/value-asc struct of non-NULL
    counts) — any future struct-ordered oracle must keep the ordering
    fields provably non-NULL on both sides."""
    got = spark.sql(
        "SELECT max(struct(v, id)) AS o FROM VALUES"
        " (CAST(NULL AS DOUBLE), 9), (1.0D, 1) t(v, id)"
    ).collect()[0].o
    assert (got.v, got.id) == (1.0, 1)
    con = duckdb.connect()
    try:
        want = con.execute(
            "SELECT max(ROW(v, id)) FROM (VALUES (NULL::DOUBLE, 9),"
            " (1.0::DOUBLE, 1)) t(v, id)"
        ).fetchone()[0]
        assert want == (None, 9), want
        tv = con.execute(
            "SELECT ROW(1, NULL::INT) < ROW(1, 3)").fetchone()[0]
        assert tv is None
    finally:
        con.close()
    assert spark.sql(
        "SELECT struct(1, CAST(NULL AS INT)) < struct(1, 3) AS o"
    ).collect()[0].o is True


def test_max_by_skips_null_keys_but_has_no_tie_contract(spark):
    """AGREE: max_by/arg_max both SKIP rows whose ordering key is NULL
    (asserted — the load-bearing half). DIVERGE: on exactly tied keys
    each engine returns its own arbitrary row (measured r18: Spark
    id 2, DuckDB id 1) — same class as native mode(); the packed
    unique-suffix key (q_argmax_events) is the portable spelling."""
    assert spark.sql(
        "SELECT max_by(id, v) AS o FROM VALUES (1.0D, 1), (3.0D, 3),"
        " (CAST(NULL AS DOUBLE), 2) t(v, id)"
    ).collect()[0].o == 3
    con = duckdb.connect()
    try:
        assert con.execute(
            "SELECT arg_max(id, v) FROM (VALUES (1.0, 1), (3.0, 3),"
            " (NULL, 2)) t(v, id)"
        ).fetchone()[0] == 3
        duck_tie = con.execute(
            "SELECT arg_max(id, v) FROM (VALUES (3.0, 1), (3.0, 2))"
            " t(v, id)"
        ).fetchone()[0]
    finally:
        con.close()
    spark_tie = spark.sql(
        "SELECT max_by(id, v) AS o FROM VALUES (3.0D, 1), (3.0D, 2)"
        " t(v, id)"
    ).collect()[0].o
    assert spark_tie in (1, 2) and duck_tie in (1, 2)
