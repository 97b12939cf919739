"""Incremental rollup maintenance: merge(agg(base), agg(incr)) must equal
agg(base ∪ incr) exactly — for every mergeable measure kind, across an
arbitrary 3-way chained merge."""

from __future__ import annotations

from tests.conftest import SF_SMOKE

from pyspark.sql import functions as F

from weightlifting_wod_etl_spark.functions.money import to_fixed
from weightlifting_wod_etl_spark.io import load_table
from weightlifting_wod_etl_spark.operators.incremental import (
    Measure,
    build_rollup,
    merge_rollup,
)

KEYS = ["l_returnflag", "l_linestatus"]
MEASURES = [
    Measure("n_rows", "count"),
    Measure("sum_qty_fp", "sum", "qty_fp"),
    Measure("min_ship", "min", "l_shipdate"),
    Measure("max_ship", "max", "l_shipdate"),
    Measure("supp_hll", "hll", "l_suppkey"),
]


def _src(spark):
    return load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "qty_fp", to_fixed("l_quantity")
    )


def _canon(df):
    return sorted(
        (
            r.l_returnflag,
            r.l_linestatus,
            r.n_rows,
            r.sum_qty_fp,
            r.min_ship,
            r.max_ship,
            r.n_supp_est,
        )
        for r in df.select(
            *KEYS,
            "n_rows",
            "sum_qty_fp",
            "min_ship",
            "max_ship",
            F.hll_sketch_estimate("supp_hll").alias("n_supp_est"),
        ).collect()
    )


def test_chained_merge_equals_full_rebuild(spark):
    src = _src(spark)
    # deterministic 3-way split on orderkey residue
    parts = [src.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    full = build_rollup(src, KEYS, MEASURES)
    merged = build_rollup(parts[0], KEYS, MEASURES)
    for p in parts[1:]:
        merged = merge_rollup(merged, build_rollup(p, KEYS, MEASURES), KEYS, MEASURES)
    assert _canon(merged) == _canon(full)
    # HLL estimate from merged sketches == estimate from one-shot sketch
    # (union-of-sketches IS sketch-of-union) — covered by _canon equality


def test_merge_handles_groups_absent_from_increment(spark):
    src = _src(spark)
    base = src.filter(F.col("l_returnflag") != "R")
    incr = src.filter(F.col("l_returnflag") == "R")
    merged = merge_rollup(
        build_rollup(base, KEYS, MEASURES),
        build_rollup(incr, KEYS, MEASURES),
        KEYS,
        MEASURES,
    )
    assert _canon(merged) == _canon(build_rollup(src, KEYS, MEASURES))


def test_avg_derives_from_sum_and_count(spark):
    src = _src(spark)
    half = src.filter(F.col("l_orderkey") % 2 == 0)
    rest = src.filter(F.col("l_orderkey") % 2 == 1)
    merged = merge_rollup(
        build_rollup(half, KEYS, MEASURES),
        build_rollup(rest, KEYS, MEASURES),
        KEYS,
        MEASURES,
    )
    got = {
        (r.l_returnflag, r.l_linestatus): r.avg_qty
    for r in merged.select(
            *KEYS,
            F.round(F.col("sum_qty_fp") / F.col("n_rows") / 100.0, 6).alias("avg_qty"),
        ).collect()
    }
    want = {
        (r.l_returnflag, r.l_linestatus): r.avg_qty
        for r in src.groupBy(*KEYS)
        .agg(
            F.round(F.sum("qty_fp") / F.count(F.lit(1)) / 100.0, 6).alias("avg_qty")
        )
        .collect()
    }
    assert got == want
