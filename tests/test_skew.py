"""Skew operators: salted plans must be row-identical to the direct ones."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events(spark, sf_dir):
    from weightlifting_wod_etl_spark.io import load_table

    return load_table(spark, sf_dir, "events")


def test_salted_groupby_equals_direct(spark, sf_dir):
    from weightlifting_wod_etl_spark.operators.skew import salted_groupby

    ev = _events(spark, sf_dir)
    # reference must mirror the operator's NULL-SKIPPING count(col)
    # semantics — count(*) only agrees because sf events.value happens to
    # contain no NULLs, which would mask a count(*) regression in skew.py
    direct = (
        ev.groupBy("user_id")
        .agg(F.count("value").alias("n"), F.max("value").alias("mx"))
        .orderBy("user_id")
        .collect()
    )
    salted = (
        salted_groupby(
            ev,
            keys=["user_id"],
            aggs=[("value", "count", "n"), ("value", "max", "mx")],
            salt_on="event_id",
            buckets=7,
        )
        .orderBy("user_id")
        .collect()
    )
    assert direct == salted


def test_replicated_salted_join_equals_direct(spark, sf_dir):
    from weightlifting_wod_etl_spark.io import load_table
    from weightlifting_wod_etl_spark.operators.skew import replicated_salted_join

    ev = _events(spark, sf_dir).select("event_id", "user_id")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    direct = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .select("event_id", "c_mktsegment")
        .orderBy("event_id")
        .collect()
    )
    salted = (
        replicated_salted_join(
            ev, cust, big_key="user_id", small_key="c_custkey",
            salt_on="event_id", buckets=5,
        )
        .select("event_id", "c_mktsegment")
        .orderBy("event_id")
        .collect()
    )
    assert direct == salted


def test_salt_deterministic(spark):
    """Same input → same salt (retry safety); range within [0, buckets)."""
    from weightlifting_wod_etl_spark.operators.skew import deterministic_salt

    df = spark.range(1000).select(
        deterministic_salt("id", 16).alias("s1"),
        deterministic_salt("id", 16).alias("s2"),
    )
    rows = df.agg(
        F.max(F.col("s1") != F.col("s2")).alias("any_diff"),
        F.min("s1").alias("lo"),
        F.max("s1").alias("hi"),
        F.countDistinct("s1").alias("nd"),
    ).first()
    assert rows.any_diff is False
    assert 0 <= rows.lo and rows.hi <= 15
    assert rows.nd > 8  # salt actually spreads


def test_planted_hot_key_spreads_over_buckets(spark):
    """Planted 10%-hot-key proof of the SCALE.md skew claims, measured as
    partition-row counts (deterministic), not wall time (noisy).

    A naive exchange on the bare key funnels every hot-key row into ONE
    post-shuffle partition — the at-scale straggler. The salted exchange
    on (key, salt) must cut the max partition by the bucket spread."""
    from weightlifting_wod_etl_spark.operators.skew import (
        deterministic_salt,
        salted_groupby,
    )

    n = 100_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(997)))
        .alias("key"),
        F.col("id").alias("uid"),
        (F.col("id") % 13).cast("double").alias("v"),
    )

    def max_partition_rows(frame):
        return (
            frame.select(F.spark_partition_id().alias("p"))
            .groupBy("p")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

    naive_max = max_partition_rows(df.repartition(32, "key"))
    salted_max = max_partition_rows(
        df.withColumn("__salt", deterministic_salt("uid", 16)).repartition(
            32, "key", "__salt"
        )
    )
    assert naive_max >= 0.10 * n  # the hot key really is a straggler
    assert salted_max < 0.06 * n  # spread over the 16 salt buckets
    assert salted_max < 0.5 * naive_max

    # and the two-phase plan stays row-identical on the skewed data
    direct = (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.max("v").alias("mx"))
        .orderBy("key")
        .collect()
    )
    salted = (
        salted_groupby(
            df,
            keys=["key"],
            aggs=[("v", "count", "n"), ("v", "max", "mx")],
            salt_on="uid",
            buckets=16,
        )
        .orderBy("key")
        .collect()
    )
    assert direct == salted


def test_salted_groupby_phase1_exchange_carries_salt(spark, sf_dir):
    """Plan-shape pin: phase 1's exchange must partition on (key, salt) —
    if Catalyst ever collapsed the two-phase agg back to the bare key the
    skew protection would silently vanish."""
    from weightlifting_wod_etl_spark.operators.skew import salted_groupby

    ev = _events(spark, sf_dir)
    plan = (
        salted_groupby(
            ev,
            keys=["user_id"],
            aggs=[("value", "sum", "s")],
            salt_on="event_id",
            buckets=16,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    first_exchange = plan.split("Exchange hashpartitioning(")[-1][:200]
    assert "__salt" in first_exchange


def test_salted_ops_reject_salt_clash_and_unknown_fn(spark):
    """Review r11: a caller column named __salt was silently overwritten
    then dropped; an unsupported aggregate fn raised a bare KeyError."""
    import pytest
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.operators.skew import (
        replicated_salted_join,
        salted_groupby,
    )

    df = spark.range(10).select("id", F.lit(1).alias("__salt"))
    with pytest.raises(ValueError, match="__salt"):
        salted_groupby(df, ["id"], [("id", "sum", "s")], salt_on="id")
    with pytest.raises(ValueError, match="__salt"):
        replicated_salted_join(df, spark.range(2), "id", "id", salt_on="id")

    clean = spark.range(10).selectExpr("id", "id AS v")
    with pytest.raises(ValueError, match="avg"):
        salted_groupby(clean, ["id"], [("v", "avg", "a")], salt_on="id")
