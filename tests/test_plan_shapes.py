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


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """Bin bucketing must turn the pure range predicate into an equi-join;
    a BroadcastNestedLoopJoin/CartesianProduct here dies at scale."""
    from weightlifting_wod_etl_spark.queries_registry import QUERIES

    df = QUERIES["q_range_join"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_exchange_no_join_node(spark, sf_dir):
    """The union-sort as-of join is a window, not a join: no join operator
    and exactly one Exchange on the key."""
    from weightlifting_wod_etl_spark.queries_registry import QUERIES

    df = QUERIES["q_asof_join"](spark, sf_dir)
    plan = _plan(df)
    assert "Join" not in plan
    # one exchange for the right-side dedup window + carry window share the
    # same (key) partitioning, so they reuse a single shuffle
    assert plan.count("Exchange hashpartitioning") == 1


def test_sampling_queries_are_scan_local(spark, sf_dir):
    """Hash sampling and token chunking must be pure projections/filters —
    zero Exchanges: at 100 TB they run entirely inside the scan stage."""
    from weightlifting_wod_etl_spark.queries_registry import QUERIES

    for name in ("q_hash_sample", "q_chunk_bounds", "q_token_chunks"):
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert "Exchange" not in plan, f"{name} shuffles: not scan-local"


def test_dataset_split_single_shuffle(spark, sf_dir):
    """Split assignment is map-side; only the (split, lang) agg shuffles."""
    from weightlifting_wod_etl_spark.queries_registry import QUERIES

    plan = _plan(QUERIES["q_dataset_split"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
