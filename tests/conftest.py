"""Shared fixtures: one SparkSession per test run, one DuckDB oracle
connection per sf dir (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from lambda_hive_spark.session import get_spark
from lambda_hive_spark.testing import duck_connection

SF_DIR = "/root/testdata/sf0.01"  # same sf as the driver's t2 gate
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lambda_hive_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()
