"""Bloom-bitmap semi join: exact equivalence to a plain left-semi join at
any false-positive rate, real pruning before the verify join, broadcast
bitmap in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from weightlifting_wod_etl_spark.operators.bloomjoin import (
    _with_slot,
    bloom_semi_join,
)


def _sets(df, col):
    return {r[col] for r in df.collect()}


def test_bloom_semi_join_equals_plain_semi_join(spark):
    fact = spark.range(10_000).select(F.col("id").alias("k"))
    dim = spark.range(10_000).filter("id % 37 = 0").select(F.col("id").alias("d"))
    got = bloom_semi_join(fact, dim, "k", "d")
    want = fact.join(dim, fact.k == dim.d, "left_semi")
    assert _sets(got, "k") == _sets(want, "k")
    assert got.columns == fact.columns  # no helper columns leak


def test_exact_even_when_bitmap_saturates(spark):
    """num_bits far below the key count → near-100% false positives; the
    verify join must still make the result exact."""
    fact = spark.range(5_000).select(F.col("id").alias("k"))
    dim = spark.range(5_000).filter("id % 11 = 3").select(F.col("id").alias("d"))
    got = bloom_semi_join(fact, dim, "k", "d", num_bits=64)
    want = fact.join(dim, fact.k == dim.d, "left_semi")
    assert _sets(got, "k") == _sets(want, "k")


def test_bitmap_prunes_most_nonmatching_rows(spark):
    """At the default sizing the bit-test alone (no verify join) must drop
    the overwhelming majority of non-matching fact rows — that reduction
    is the whole point (the verify join's shuffle shrinks accordingly)."""
    fact = spark.range(50_000).select(F.col("id").alias("k"))
    dim = spark.range(50_000).filter("id % 100 = 0").select(F.col("id").alias("d"))
    bitmap = (
        _with_slot(dim.select("d"), "d", 1 << 22)
        .groupBy("__bf_word")
        .agg(F.bit_or("__bf_mask").alias("__bf_bits"))
    )
    survivors = (
        _with_slot(fact, "k", 1 << 22)
        .join(F.broadcast(bitmap), "__bf_word")
        .filter(F.col("__bf_bits").bitwiseAND(F.col("__bf_mask")) != 0)
        .count()
    )
    true_matches = 500
    # 500 true keys + expected fp ≈ 50k * 500/2^22 ≈ 6 — allow generous slack
    assert true_matches <= survivors < true_matches + 200


def test_bitmap_join_is_broadcast_in_plan(spark):
    fact = spark.range(1_000).select(F.col("id").alias("k"))
    dim = spark.range(100).select(F.col("id").alias("d"))
    plan = (
        bloom_semi_join(fact, dim, "k", "d")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Pin the WORD-INDEX join specifically: a bare "BroadcastHashJoin in
    # plan" check also matches the tiny verify semi join, so dropping
    # F.broadcast(bitmap) (fact shuffling on __bf_word) would slip by.
    import re

    assert re.search(r"BroadcastHashJoin \[__bf_word", plan), plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2  # word-index + verify semi


def test_bloom_semi_join_coerces_mismatched_key_types(spark):
    """Review r11: xxhash64 is TYPE-sensitive — an INT fact key probing a
    BIGINT dim bitmap found every bit unset and the prune silently
    dropped TRUE matches the exact semi join would have kept. Mismatched
    numeric keys now hash through a common cast; non-numeric mismatches
    are refused loudly."""
    import pytest
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.operators.bloomjoin import bloom_semi_join

    fact = spark.range(10).select(F.col("id").cast("int").alias("k"))
    dim = spark.createDataFrame([(3,), (7,)], "k2 long")  # bigint keys
    got = sorted(r.k for r in bloom_semi_join(fact, dim, "k", "k2").collect())
    assert got == [3, 7]  # INT 3/7 match BIGINT 3/7 through the cast

    sdim = spark.createDataFrame([("3",)], "k2 string")
    with pytest.raises(ValueError, match="incompatible types"):
        bloom_semi_join(fact, sdim, "k", "k2")
