"""Skew operators: salted plans must be row-identical to the direct ones."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events(spark, sf_dir):
    from weightlifting_wod_etl_spark.io import load_table

    return load_table(spark, sf_dir, "events")


def test_salted_groupby_equals_direct(spark, sf_dir):
    from weightlifting_wod_etl_spark.operators.skew import salted_groupby

    ev = _events(spark, sf_dir)
    direct = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
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
