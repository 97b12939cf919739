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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_weight_cumsum(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_expr: Column,
    bucket_bits: int = 16,
    pre_aggregate: bool = False,
) -> DataFrame:
    """Distributed prefix sum: raw (group, value, weight) rows → one row
    per (group, DISTINCT value) carrying ``__v`` (the value), ``__w``
    (summed weight), ``__cum`` (running cumulative weight in ascending
    value order, NULLs last) and ``__n`` (group total weight).

    The naive form — groupBy(group, value) then a cumulative window
    partitioned by group — has TWO scale ceilings (r18 optimization
    round, guide §2.2/§2.5): the (group, value) exchange shuffles every
    distinct value only to re-shuffle them by group for the window, and
    the window itself runs ONE task per group (3 tasks for 3 return
    flags, at any cluster size). This operator instead partitions once
    by (group, value-range bucket) — ``bucket = value >> bucket_bits``,
    monotone in the value, so buckets tile the sorted order — cumulates
    within buckets in parallel, and adds per-bucket offsets computed
    from the bucket totals (a relation bounded by groups × value-domain
    / 2^bucket_bits, broadcast back). ONE full shuffle, parallelism =
    groups × occupied buckets; all arithmetic stays exact integer, so
    the result is bit-identical to the single-window form.

    ``pre_aggregate``: when True, rows collapse to DISTINCT
    (group, bucket, value) triples through an ordinary groupBy FIRST —
    map-side combine applies, so only distinct pairs ever cross the wire
    (the mad/percentile "counts-first" byte contract), at the cost of a
    second (smaller, distinct-row) exchange for the bucket windows. When
    False, raw projected rows shuffle once by (group, bucket) and
    aggregate after — fewer exchanges, the right trade when values are
    near-distinct anyway (measured: q_weighted_median's 594k distinct
    cents over 600k rows).

    Preconditions: ``value_col`` is integral (or at least NaN-free —
    long truncation must be monotone) and ``weight_expr`` is integral.
    NULL values sort last (NULL bucket last) exactly like the
    single-window form; give them zero weight if they must not count.
    """
    bucket = F.shiftright(F.col(value_col).cast("long"), bucket_bits)
    d = df.select(
        *group_cols,
        value_col,
        weight_expr.alias("__w0"),
        bucket.alias("__bkt"),
    )
    if pre_aggregate:
        # distinct pairs cross the wire (map-side combine); the bucket
        # windows then need one more — distinct-row-sized — exchange
        counts = d.groupBy(*group_cols, "__bkt", value_col).agg(
            F.sum("__w0").alias("__w")
        )
    else:
        # the ONE exchange: everything below rides (group, bucket)
        counts = (
            d.repartition(*group_cols, "__bkt")
            .groupBy(*group_cols, "__bkt", value_col)
            .agg(F.sum("__w0").alias("__w"))
        )
    w_in = (
        Window.partitionBy(*group_cols, "__bkt")
        .orderBy(F.col(value_col).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_in = counts.withColumn("__cum_in", F.sum("__w").over(w_in))
    # bucket totals: tiny (groups × occupied buckets); the branch re-reads
    # the same exchange (ReuseExchange — both subtrees are identical).
    # Renamed output columns make the offset join's self-join condition
    # unambiguous by construction.
    gren = {c: f"__g{i}" for i, c in enumerate(group_cols)}
    btot = counts.groupBy(*group_cols, "__bkt").agg(
        F.sum("__w").alias("__btot")
    )
    w_prev = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__bkt").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # identical partition AND order spec as w_prev (r19 optimization
    # round, guide §2.4): Spark fuses window expressions into one Window
    # operator only when both specs match, so the former orderBy-less
    # form planned a SECOND Window pass over btot just for the group
    # total. An unbounded-both-sides frame over the same order is
    # value-identical (the frame covers the whole partition either way;
    # integer sum, order-independent) and rides w_prev's operator —
    # 3 Window nodes → 2 in the committed plans.
    w_all = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__bkt").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    off = btot.select(
        *[F.col(c).alias(gren[c]) for c in group_cols],
        F.col("__bkt").alias("__bkt_r"),
        F.coalesce(F.sum("__btot").over(w_prev), F.lit(0).cast("long")).alias(
            "__off"
        ),
        F.sum("__btot").over(w_all).alias("__tot"),
    )
    # null-safe equi-join on EVERY key: the NULL-value bucket and NULL
    # group values are real window partitions in the single-window form
    # and must pick up their offset rows identically here
    join_cond = F.col("__bkt").eqNullSafe(F.col("__bkt_r"))
    for c in group_cols:
        join_cond = join_cond & F.col(c).eqNullSafe(F.col(gren[c]))
    out = cum_in.join(F.broadcast(off), join_cond)
    return out.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        "__w",
        (F.col("__cum_in") + F.col("__off")).alias("__cum"),
        F.col("__tot").alias("__n"),
    )


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
        {
            "__c", "__v", "__cum", "__n", "n_items",
            # grouped_weight_cumsum internals
            "__w0", "__w", "__bkt", "__bkt_r", "__cum_in", "__btot",
            "__off", "__tot",
            *[f"__g{i}" for i in range(len(group_cols))],
            *minted,
        },
        df.select(*group_cols, value_col),
    )
    # NULL-value rows keep their group alive but carry zero weight: they
    # never enter __cum/__n, so every index and count below is computed
    # over non-NULL values exactly as before. The cumulation itself runs
    # through the bucketed distributed prefix sum (one shuffle, parallel
    # within value-range buckets) instead of one window task per group.
    cum = grouped_weight_cumsum(
        df.select(*group_cols, value_col),
        group_cols,
        value_col,
        F.when(F.col(value_col).isNotNull(), 1).otherwise(0),
        # distinct (group, value) pairs cross the wire (map-side combine)
        # — the counts-first byte contract this operator documents and
        # test_plan_shapes pins for q_mad_anomaly
        pre_aggregate=True,
    ).select(*group_cols, "__v", "__cum", "__n")

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
