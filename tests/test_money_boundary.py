"""Boundary behavior of the exact-rational rounding helper (r14).

VERDICT r13 #5 named the decimal(38,0) boundary as a hostile class:
Spark types decimal(38,0)/decimal(38,0) as decimal(38,6) — only 32
integral digits — so the exact floor quotient silently NULLed once
|num·10^s/den| reached 10^32 (reproduced at num = 10^33, den = 3,
round_to = 4), while the DuckDB twin kept returning values up to
HUGEINT's ~1.7e38. A silent NULL in a money path is the
silent-wrong-answer class the engine guards loudly everywhere else.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weightlifting_wod_etl_spark.functions.money import (
    oracle_round_ratio_sql,
    round_ratio_exact,
)


def _ratio(spark, num: int, den: int, round_to: int = 4):
    df = spark.createDataFrame([(str(num), str(den))], "n string, d string")
    return df.select(
        round_ratio_exact(
            F.col("n").cast("decimal(38,0)"),
            F.col("d").cast("decimal(38,0)"),
            round_to,
        ).alias("r")
    ).collect()[0].r


def test_round_ratio_exact_matches_oracle_through_1e27(spark):
    """Values across the realistic domain (a 100 TB cents sum is ~1e18;
    1e27 is nine orders beyond it) must match the DuckDB twin exactly."""
    import duckdb

    for num, den in [
        (3, 20000),            # the r13 knife-edge midpoint
        (5257, 20000),         # the r14 jaccard dirty-group midpoint
        (-5257, 20000),        # negative tie goes away from zero
        (10**18, 7),           # long-scale cents sum
        (10**27, 999999937),   # far past int64, huge prime denominator
    ]:
        got = _ratio(spark, num, den)
        want = duckdb.sql(
            "SELECT " + oracle_round_ratio_sql(str(num), str(den), 4)
        ).fetchone()[0]
        assert got == want, (num, den, got, want)


def test_round_ratio_exact_raises_loudly_past_decimal_domain(spark):
    """Past ~10^32 on the scaled quotient the decimal division overflows;
    the helper must RAISE, never return the silent NULL it used to."""
    with pytest.raises(Exception, match="round_ratio_exact"):
        _ratio(spark, 10**33, 3)


def test_round_ratio_exact_huge_denominator_tie_is_exact(spark):
    """The tie test is r vs d−r, not 2·r vs d: 2·r overflows
    decimal(38,0) for den > 5·10^37 and the NULL comparison silently
    picked half = 0. num/den = 1/2 at a denominator near the cap must
    still round away from zero."""
    den = 2 * 10**37
    num = 10**27  # quotient 5e-11 -> scaled 5e-7 ... pick a true tie:
    # num·10^4/den = 1/2 exactly: num = den/(2·10^4) = 10^33
    got = _ratio(spark, 10**33, den)
    assert got == 0.0001  # 0.00005 ties away from zero at 4 digits


def test_round_ratio_exact_zero_and_null_denominator_stay_null(spark):
    assert _ratio(spark, 123, 0) is None
    df = spark.createDataFrame([(None, None)], "n string, d string")
    r = df.select(
        round_ratio_exact(
            F.col("n").cast("decimal(38,0)"),
            F.col("d").cast("decimal(38,0)"),
            4,
        ).alias("r")
    ).collect()[0].r
    assert r is None


def test_round_ratio_exact_negative_denominator_is_sign_normalized(spark):
    """Review r14 (reproduced): every step of the helper assumes d > 0 —
    with a negative denominator Spark's pmod and the oracle's
    ((t%d)+d)%d return DIFFERENT residue conventions, and both rounded
    wrongly (7/-3 at 4 digits: Spark -2.3332, DuckDB -2.3334, true
    -2.3333; 1/-2 gave -0.4999 in both). The fix multiplies num and den
    by sign(den) — exact — so both engines now agree with the true
    half-away-from-zero rounding of the exact rational."""
    import decimal

    import duckdb

    for num, den in [
        (7, -3),
        (-7, -3),
        (1, -2),
        (3, -20000),           # knife-edge midpoint, negative side
        (5257, -20000),        # the jaccard dirty midpoint, negative den
        (10**18, -7),          # long-scale magnitude
    ]:
        got = _ratio(spark, num, den)
        want = duckdb.sql(
            "SELECT " + oracle_round_ratio_sql(str(num), str(den), 4)
        ).fetchone()[0]
        q = decimal.Decimal(num) * 10**4 / decimal.Decimal(den)
        true = float(q.to_integral_value(rounding=decimal.ROUND_HALF_UP)) / 10**4
        assert got == want == true, (num, den, got, want, true)


def test_round_ratio_exact_i64_matches_decimal_form_on_its_domain(spark):
    """The long fast path must be value-identical to the decimal general
    form (and hence to the shared HUGEINT oracle) across sign/tie/edge
    cases inside its |num|*10^s < 2^63 domain."""
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.functions.money import (
        round_ratio_exact_i64,
    )

    cases = [
        (3, 20000), (5257, 20000), (-5257, 20000), (1, 2), (-1, 2),
        (7, -3), (-7, -3), (1, -2), (3, -20000), (0, 7),
        (9 * 10**12, 7), (123, 0),
    ]
    df = spark.createDataFrame(
        [(n, d) for n, d in cases], "n long, d long"
    )
    out = df.select(
        round_ratio_exact(F.col("n"), F.col("d"), 4).alias("dec"),
        round_ratio_exact_i64(F.col("n"), F.col("d"), 4).alias("i64"),
    ).collect()
    for (n, d), row in zip(cases, out):
        assert row.dec == row.i64, (n, d, row.dec, row.i64)


def test_round_ratio_exact_i64_overflow_raises_loudly(spark):
    """Past |num|*10^s >= 2^63 the long multiply would WRAP under the
    ANSI-off session — the fast path must raise and name the decimal
    form instead."""
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.functions.money import (
        round_ratio_exact_i64,
    )

    df = spark.createDataFrame([(10**16, 3)], "n long, d long")
    with pytest.raises(Exception, match="round_ratio_exact_i64"):
        df.select(round_ratio_exact_i64(F.col("n"), F.col("d"), 4)).collect()


def test_round_ratio_exact_randomized_against_fraction_ground_truth(spark):
    """Both helper forms vs exact Fraction arithmetic on 300 seeded-random
    ratios spanning signs, magnitudes (1..1e11), and engineered ties —
    one vectorized pass, plus the DuckDB twin on the same rows. The
    half-away-from-zero convention is computed independently here with
    Fraction (no floats), so a shared bug in both engine forms cannot
    self-confirm."""
    import random
    from fractions import Fraction

    import duckdb
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.functions.money import (
        oracle_round_ratio_sql,
        round_ratio_exact,
        round_ratio_exact_i64,
    )

    rng = random.Random(0xC0FFEE)
    cases = []
    for _ in range(250):
        den = rng.choice([1, -1]) * rng.randint(1, 10**11)
        num = rng.choice([1, -1, 0]) * rng.randint(0, 10**11)
        cases.append((num, den))
    # engineered ties: num·10^4/den = m + 1/2 exactly, via
    # num = (2m+1)·t and den = 2·10^4·t — all four sign combinations
    for _ in range(50):
        t = rng.randint(1, 10**6)
        m = rng.choice([1, -1]) * rng.randint(0, 10**6)
        sd = rng.choice([1, -1])
        cases.append(((2 * m + 1) * t * sd, 2 * 10**4 * t * sd))

    df = spark.createDataFrame(cases, "n long, d long")
    got = df.select(
        "n", "d",
        round_ratio_exact(F.col("n"), F.col("d"), 4).alias("dec"),
        round_ratio_exact_i64(F.col("n"), F.col("d"), 4).alias("i64"),
    ).collect()
    duck = duckdb.connect()
    for row in got:
        n, d = row.n, row.d
        q = Fraction(n * 10**4, d)
        half = Fraction(1, 2)
        fl = q.numerator // q.denominator
        frac = q - fl
        # half-away-from-zero on the exact rational, floats never touched
        if frac > half:
            k = fl + 1
        elif frac == half:
            k = fl + 1 if q >= 0 else fl
        else:
            k = fl
        truth = float(k) / 10**4
        want = duck.sql(
            "SELECT " + oracle_round_ratio_sql(str(n), str(d), 4)
        ).fetchone()[0]
        assert row.dec == row.i64 == want == truth, (n, d, row.dec, row.i64, want, truth)


def test_round_ratio_exact_i64_domain_edge_no_wrap(spark):
    """Review r14 (self-review of the r14 helper): the first i64 cut
    computed floor as div(t - r, d), and |t - r| reaches |t| + d ≈ 2^64
    when num and den both sit near the long edge — a silent ANSI-off
    wrap. floor is now trunc-div with a negative-inexact adjustment
    (div(t, d) cannot overflow). Pin the exact edge: round_to=0,
    num = -(2^63-1), den = 2^63-2 → true quotient ≈ -1.0000000002,
    half-away rounds to -1.0 (the wrapped form returned a garbage
    magnitude ~1.8e19/d)."""
    import decimal

    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.functions.money import (
        round_ratio_exact_i64,
    )

    cases = [
        (-(2**63 - 1), 2**63 - 2),
        (2**63 - 1, -(2**63 - 2)),
        (-(2**63 - 1), 2**63 - 1),   # exactly -1
        (2**63 - 1, 2**63 - 1),      # exactly 1
    ]
    df = spark.createDataFrame(cases, "n long, d long")
    out = df.select(
        "n", "d", round_ratio_exact_i64(F.col("n"), F.col("d"), 0).alias("r")
    ).collect()
    for row in out:
        q = decimal.Decimal(row.n) / decimal.Decimal(row.d)
        true = float(q.to_integral_value(rounding=decimal.ROUND_HALF_UP))
        assert row.r == true, (row.n, row.d, row.r, true)


def test_round_ratio_exact_i64_long_min_operands_raise(spark):
    """Advisory r14: Long.MIN is its own negation under the ANSI-off
    session, so abs(-2^63) wraps back to -2^63 and the magnitude guard
    FAILED OPEN — num=-2^63 silently returned 0.0 (MIN/3) and den=-2^63
    a wrong residue (MIN/MIN -> 0.0001) instead of raising. The guard
    now tests the RAW operands for the edge before any negation."""
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.functions.money import (
        round_ratio_exact_i64,
    )

    for n, d in [(-(2**63), 3), (5, -(2**63)), (-(2**63), -(2**63))]:
        df = spark.createDataFrame([(n, d)], "n long, d long")
        with pytest.raises(Exception, match="round_ratio_exact_i64"):
            df.select(
                round_ratio_exact_i64(F.col("n"), F.col("d"), 4)
            ).collect()


def test_round_ratio_exact_posden_matches_general_form(spark):
    """r15: the let-bound positive-denominator variant (for per-row HOF
    contexts, where internal re-references multiply interpreted decimal
    work) must be value-identical to the general form on its restricted
    domain — non-negative numerators, strictly positive denominators,
    ties included."""
    import random

    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.functions.money import (
        round_ratio_exact,
        round_ratio_exact_posden,
    )

    rng = random.Random(0xBEEF)
    cases = [(rng.randint(0, 10**15), rng.randint(1, 10**12)) for _ in range(120)]
    cases += [(3, 20000), (1, 2), (0, 7), (10**18, 7)]
    # engineered ties on the posden domain
    for _ in range(30):
        t = rng.randint(1, 10**6)
        m = rng.randint(0, 10**6)
        cases.append(((2 * m + 1) * t, 2 * 10**4 * t))
    df = spark.createDataFrame(cases, "n long, d long")
    out = df.select(
        round_ratio_exact(F.col("n"), F.col("d"), 4).alias("gen"),
        round_ratio_exact_posden(F.col("n"), F.col("d"), 4).alias("pos"),
    ).collect()
    for (n, d), row in zip(cases, out):
        assert row.gen == row.pos, (n, d, row.gen, row.pos)


def test_round_ratio_exact_posden_guards_raise(spark):
    """ADVICE r15 #2: the posden fast path must fail LOUDLY outside its
    proved domain instead of silently mis-rounding (den <= 0, where the
    residue convention breaks) or silently NULLing (scaled quotient at
    10^32, past decimal(38,6)'s integral digits)."""
    from decimal import Decimal

    import pytest
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.functions.money import (
        round_ratio_exact_posden,
    )

    # 10^33: division overflow (t fits, t/d exceeds decimal(38,6)).
    # 10^35: SCALING overflow (ADVICE r16 #2 — n*10^4 >= 10^38 NULLs the
    # multiply itself; the old t.isNotNull() guard failed open on this
    # channel and returned NULL silently).
    for n, d in [(7, -3), (1, -2), (5, 0), (10**33, 3), (10**35, 3)]:
        df = spark.createDataFrame(
            [(Decimal(n), Decimal(d))], "n decimal(38,0), d decimal(38,0)"
        )
        with pytest.raises(Exception, match="round_ratio_exact_posden"):
            df.select(
                round_ratio_exact_posden(F.col("n"), F.col("d"), 4)
            ).collect()
    # NULL operands stay NULL (not a raise) — same as the general form
    df = spark.createDataFrame(
        [(None, Decimal(3)), (Decimal(5), None)],
        "n decimal(38,0), d decimal(38,0)",
    )
    rows = df.select(
        round_ratio_exact_posden(F.col("n"), F.col("d"), 4).alias("o")
    ).collect()
    assert [r.o for r in rows] == [None, None]


def test_posden_plan_carries_single_pmod(spark):
    """The whole point of the posden variant is ONE occurrence of every
    expensive subtree in the (interpreted, HOF-context) plan. The r15
    guard addition let-binds the result, so pmod and the decimal
    division must still appear exactly once each."""
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.functions.money import (
        round_ratio_exact_posden,
    )

    df = spark.range(1).select(
        F.lit(7).cast("decimal(38,0)").alias("n"),
        F.lit(3).cast("decimal(38,0)").alias("d"),
    )
    plan = (
        df.select(
            # alias: the auto-generated column NAME would otherwise
            # repeat the whole expression text and double the count
            round_ratio_exact_posden(F.col("n"), F.col("d"), 4).alias("q")
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.lower().count("pmod") == 1, plan
