"""Shared fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os

import pytest

from stream_processor_spark.session import get_spark
from stream_processor_spark.vendor import ensure_protobuf

# Activate the vendored google.protobuf shim (transformWithStateInPandas
# state protocol) BEFORE any SparkSession exists: the worker processes
# inherit $PYTHONPATH captured at JVM launch.
ensure_protobuf()

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("stream_processor_spark-tests", master="local[4]")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    # SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 replays the parity suite at
    # the driver's correctness-gate scale.
    return os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMALL)
