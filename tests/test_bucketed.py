"""Bucketed tables: co-located join must plan with no shuffle Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    from weightlifting_wod_etl_spark.io import load_table, write_bucketed

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    # Force the sort-merge path so the assertion is about bucketing, not
    # broadcast: a bucketed SMJ reads both sides pre-partitioned.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        l = spark.table("b_lineitem")
        joined = l.join(o, l.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and it still computes the right thing
        n = joined.count()
        direct = (
            spark.table("b_lineitem")
            .join(F.broadcast(spark.table("b_orders")), on=[F.expr("l_orderkey = o_orderkey")])
            .count()
        )
        assert n == direct > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the at-rest partitioning."""
    agg = spark.table("b_lineitem").groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
