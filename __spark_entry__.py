"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``stream_processor_spark``; this module only adapts
it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference pipeline as a batch analog at sf0.001.

    events → json-decode → parse_k → capitalize → appendString chain with
    per-step DLQ routing (reference semantics, src/consumer.js:86-151),
    returning the routed stream — one Catalyst projection over the scan.
    """
    from stream_processor_spark.queries import REGISTRY

    return REGISTRY["dlq_split"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from stream_processor_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from stream_processor_spark import queries as q

    return q.oracle_sql()
