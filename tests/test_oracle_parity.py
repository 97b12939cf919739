"""Every registered query must match its DuckDB oracle at sf0.001.

This is the local mirror of the driver's correctness gate
(CORRECTNESS_r{N}.json) — run it before every commit.
"""

from __future__ import annotations

import pytest

from tests.parity import assert_frames_match


def _registry():
    from weightlifting_wod_etl_spark import queries_registry

    return queries_registry


def _query_names():
    return sorted(_registry().QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    reg = _registry()
    sdf = reg.QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in reg.ORACLES:
        # rows-only check for non-SQL-expressible ops
        assert spark_pdf is not None
        return
    duck_pdf = duck.execute(reg.ORACLES[name]).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert df.columns == [
        "user_id",
        "session_id",
        "session_start",
        "session_end",
        "n_events",
        "sum_value",
    ]
    assert len(rows) > 0
