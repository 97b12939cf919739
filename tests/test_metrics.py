"""Observation audit counters: correct values, and computed by the SAME
job as the action — no extra scan appears in the plan."""

from __future__ import annotations

from tests.conftest import SF_SMOKE

from pyspark.sql import functions as F

from weightlifting_wod_etl_spark.io import load_table
from weightlifting_wod_etl_spark.operators.metrics import observe_quality


def test_observed_counters_match_explicit_aggregates(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "events")
    observed, obs = observe_quality(
        src, required=["user_id", "event_type"], measure="value"
    )
    # one real action (a write) — counters ride along with it
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    want = src.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias("nu"),
        F.sum(F.when(F.col("event_type").isNull(), 1).otherwise(0)).alias("ne"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        F.min(F.round(F.col("value") * 100).cast("long")).alias("lo"),
        F.max(F.round(F.col("value") * 100).cast("long")).alias("hi"),
    ).collect()[0]
    assert got["n_rows"] == want.n_rows
    assert got["null_user_id"] == want.nu
    assert got["null_event_type"] == want.ne
    assert got["sum_value_cents"] == want.s
    assert got["min_value_cents"] == want.lo
    assert got["max_value_cents"] == want.hi


def test_observation_adds_no_extra_scan(spark):
    src = load_table(spark, SF_SMOKE, "events")
    observed, _obs = observe_quality(src, required=["user_id"])
    plan = observed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert "CollectMetrics" in plan  # the observe node, inline in the plan
