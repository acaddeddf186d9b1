"""Shared SparkSession for the test suite (one JVM for the whole run)."""

from __future__ import annotations

import pytest

from cl_data_frame_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("cl_data_frame_spark_tests", master="local[4]")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    import os
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
