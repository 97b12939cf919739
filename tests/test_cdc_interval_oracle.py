"""Parity + plan pins for the r11-staged CDC-apply and interval-join
oracle queries (queries/cdc_interval.py). These run the exact comparison
the driver will run once the queries register in round 11 — catching a
hash mismatch two rounds before it could burn a driver slot."""

from __future__ import annotations

import pytest

from tests.parity import assert_frames_match
from weightlifting_wod_etl_spark.queries.cdc_interval import (
    ORACLE_CDC_APPLY,
    ORACLE_INTERVAL_JOIN,
    q_cdc_apply,
    q_interval_join,
)


def test_cdc_apply_matches_oracle(spark, duck, sf_dir):
    got = q_cdc_apply(spark, sf_dir).toPandas()
    want = duck.execute(ORACLE_CDC_APPLY).df()
    assert len(got) > 0
    assert_frames_match(got, want, "q_cdc_apply")


def test_cdc_apply_is_rerun_deterministic(spark, sf_dir):
    """The scratch table is rebuilt per run — two invocations must agree
    (the driver runs the Spark side and the oracle in one process but a
    bench rerun must not double-apply)."""
    from tests.parity import canonicalize

    a = canonicalize(q_cdc_apply(spark, sf_dir).toPandas())
    b = canonicalize(q_cdc_apply(spark, sf_dir).toPandas())
    assert a == b


def test_interval_join_matches_oracle(spark, duck, sf_dir):
    got = q_interval_join(spark, sf_dir).toPandas()
    want = duck.execute(ORACLE_INTERVAL_JOIN).df()
    assert len(got) > 0
    assert_frames_match(got, want, "q_interval_join")


def test_interval_join_plan_has_no_cartesian(spark, sf_dir):
    """VERDICT r7 #5: the interval join must execute as a hash equi-join
    on user_id with the time band as a post-join filter — a cartesian /
    nested-loop plan would be quadratic in events per user cluster and
    unusable at scale."""
    plan = q_interval_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
