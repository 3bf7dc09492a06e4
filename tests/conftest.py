from __future__ import annotations

import os
import time

import pytest

# Pin the driver process to UTC before any Spark/pandas import touches
# timezones — keeps Spark collect() and DuckDB df() datetimes aligned.
os.environ["TZ"] = "UTC"
time.tzset()

# Run every two_level_cumulative call with the in-plan total-order
# guard so each house caller's order spec is tie-swept on real data
# every test run (VERDICT r10 carried item; production paths skip it).
os.environ.setdefault("BDT_DISTCUM_VALIDATE", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from bigdata_twitter_spark.session import get_session

    spark = get_session(app_name="bdt-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
