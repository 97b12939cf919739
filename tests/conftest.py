from __future__ import annotations

import os
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)
# The driver-side sys.path insert above does NOT reach Python datasource/
# UDF worker processes — they import from PYTHONPATH. Without this, any
# test exercising the Python data source (sources/rest_posts.py) fails
# with ModuleNotFoundError when pytest runs from outside the repo root
# (e.g. /tmp, the documented way to keep scratch files out of the repo).
if REPO_DIR not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        REPO_DIR + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else REPO_DIR
    )

# sf0.001 keeps the pre-commit sweep fast; before shipping a new query,
# re-run at the driver's correctness scale with
#   SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/
SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from weightlifting_wod_etl_spark.session import get_spark

    spark = get_spark(
        app_name="wod-etl-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/wod-etl-test-warehouse"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the star-schema tables registered as views,
    mirroring the driver's oracle harness."""
    import duckdb

    from weightlifting_wod_etl_spark.io import TABLES, table_path

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_SMOKE, name)}')"
        )
    yield con
    con.close()
