"""Distributed exact percentiles via value-count cumulation.

``F.percentile`` buffers every raw value in the aggregation buffer — with
few groups that is one reducer holding a whole group's data, the classic
low-cardinality-groupBy skew (fine for sketches, fatal for 2B rows/group).

This operator computes the SAME linear-interpolation percentile from the
value HISTOGRAM instead of the value list:

  1. ``groupBy(group, value).count()`` — map-side combinable, shuffle
     volume = distinct (group, value) pairs, not rows;
  2. cumulative count over values per group — a window over DISTINCT
     values (bounded by the value domain, e.g. ≤ ~1M distinct cents,
     regardless of row count);
  3. the p-quantile's lower/upper neighbors fall out of two conditional
     mins over the cumulation; interpolate exactly.

Cut positions use the standard ``pos = p·(n-1)`` definition (same as
DuckDB ``quantile_cont`` and Spark ``percentile``). With dyadic cuts and
integer inputs every intermediate is an exactly-representable double, so
results are bit-identical to any engine using either interpolation form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    cuts: list[float],
    out_prefix: str = "p",
) -> DataFrame:
    """Per-group exact linear-interpolation percentiles of ``value_col``
    (numeric) at each fraction in ``cuts``; also returns ``n_items``.

    Output columns: ``{out_prefix}{cut*100:g}`` per cut with '.' → '_',
    e.g. p25, p50, p11_5 — exact formatting so two distinct cuts can never
    silently share (or fight over) one column name.

    NULL values of ``value_col`` are ignored, matching Spark/DuckDB
    ``percentile``/``quantile_cont`` — and like them, a group whose
    values are ALL NULL is KEPT (NULL percentiles, ``n_items`` 0), not
    silently dropped from the output (review r11: the old pre-groupBy
    filter erased such groups, so a downstream join lost them). The NULL
    rows ride along as zero-weight count rows — no second scan or
    group-recovery join is paid for the fix.
    """
    if len(set(cuts)) != len(cuts):
        raise ValueError(f"duplicate cuts: {cuts}")
    bad = [p for p in cuts if not 0.0 <= p <= 1.0]
    if bad:
        # out-of-range cuts would silently yield all-NULL columns (no
        # cumulation row ever exceeds the index) where SQL quantile_cont
        # raises — fail as loudly as the engines do
        raise ValueError(f"cuts outside [0, 1]: {bad}")
    # minted names must be UNIQUE (review r12): the ':g' format keeps 6
    # significant digits, so two distinct cuts closer than that (e.g.
    # 0.123456 vs 0.1234561) mint the same column name and the final
    # select would die later with AMBIGUOUS_REFERENCE instead of the
    # loud ValueError the docstring promises. '+'/'-' additionally cover
    # scientific-notation names for sub-1e-6 cuts ('p1e-05').
    minted = [
        f"{out_prefix}{p * 100:g}".replace(".", "_")
        .replace("-", "_")
        .replace("+", "_")
        for p in cuts
    ]
    dup = sorted({n for n in minted if minted.count(n) > 1})
    if dup:
        raise ValueError(
            f"cuts {cuts} mint colliding column names {dup} (names keep 6 "
            "significant digits) — space the cuts or alias the results"
        )
    from .util import require_free_columns

    # only the SURVIVING columns (group cols + value col) can clash —
    # other df columns are dropped by the first groupBy
    require_free_columns(
        "exact_percentiles",
        {"__c", "__v", "__cum", "__n", "n_items", *minted},
        df.select(*group_cols, value_col),
    )
    counts = df.groupBy(*group_cols, value_col).agg(
        # NULL-value rows keep their group alive but carry zero weight:
        # they never enter __cum/__n, so every index and count below is
        # computed over non-NULL values exactly as before
        F.sum(F.when(F.col(value_col).isNotNull(), 1).otherwise(0)).alias("__c")
    )
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(value_col).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    cum = counts.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.sum("__c").over(wcum).alias("__cum"),
        F.sum("__c").over(wall).alias("__n"),
    )

    aggs = [F.first("__n").alias("n_items")]
    names: list[str] = []
    for p, name in zip(cuts, minted):
        # idx in [0, n-1]; lower neighbor covers idx, upper covers idx+1.
        # __n is group-constant: per-row uses the raw column (inside the
        # aggregate's input), the final arithmetic uses first(__n).
        row_idx = F.floor(F.lit(p) * (F.col("__n") - 1))
        agg_pos = F.lit(p) * (F.first("__n") - 1)
        frac = agg_pos - F.floor(agg_pos)
        lo = F.min(F.when(F.col("__cum") > row_idx, F.col("__v")))
        hi = F.min(F.when(F.col("__cum") > row_idx + 1, F.col("__v")))
        names.append(name)
        aggs.append((lo + frac * (F.coalesce(hi, lo) - lo)).alias(name))
    out = cum.groupBy(*group_cols).agg(*aggs)
    return out.select(*group_cols, *names, "n_items")
