"""Physical-plan regressions: the scale properties we claim must show up
in .explain output, not just in docstrings."""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    from weightlifting_wod_etl_spark.queries_registry import QUERIES

    df = QUERIES["q_tpch_q6"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    # at least the date + quantity predicates reach the parquet reader
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    assert "l_quantity" in plan.split("PushedFilters")[1][:400]


def test_scan_prunes_columns(spark, sf_dir):
    from weightlifting_wod_etl_spark.io import load_table

    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema  # widest column must be pruned


def test_pivot_no_extra_distinct_job(spark, sf_dir):
    """Explicit pivot values ⇒ single aggregate, no values-discovery scan."""
    from weightlifting_wod_etl_spark.queries_registry import QUERIES

    df = QUERIES["q_pivot_wide"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("FileScan") == 1


def test_wholestage_codegen_covers_hot_path(spark, sf_dir):
    from weightlifting_wod_etl_spark.queries_registry import QUERIES

    df = QUERIES["q_tpch_q1"](spark, sf_dir)
    df.collect()  # finalize the AQE plan on THIS QueryExecution
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd operators print as "*(n) Op" in the final adaptive plan
    assert "isFinalPlan=true" in plan
    assert "*(" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere
