"""Every hash-checkable query must match its DuckDB oracle exactly.

This is a local, stricter replica of the driver's t2 gate (sf0.001 for
speed; the driver runs sf0.01). Rows-only queries are smoke-run instead.
"""

from __future__ import annotations

import pytest

from stream_processor_spark.queries import REGISTRY
from tests.oracle_harness import compare

HASHED = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", HASHED)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    result = compare(name, spec.fn(spark, sf_dir), spec.oracle, sf_dir)
    assert result.ok, f"{name}: {result.detail}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.schema is not None
