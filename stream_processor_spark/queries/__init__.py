"""Query registry: every operator from SURVEY.md §2 as a (Spark, oracle) pair.

Importing this package populates ``REGISTRY``; ``__spark_entry__.py`` exposes
it to the driver. Each entry is a named PySpark callable plus (where the
semantics are SQL-expressible) an equivalent DuckDB SQL string hash-checked
against it at sf0.01.
"""

from stream_processor_spark.queries.base import REGISTRY, QuerySpec, register  # noqa: F401

# Importing these modules registers their queries.
from stream_processor_spark.queries import reference  # noqa: E402,F401
from stream_processor_spark.queries import relational  # noqa: E402,F401
from stream_processor_spark.queries import windows  # noqa: E402,F401
from stream_processor_spark.queries import scalars  # noqa: E402,F401
from stream_processor_spark.queries import streaming_analogs  # noqa: E402,F401
from stream_processor_spark.queries import llm_data  # noqa: E402,F401
from stream_processor_spark.queries import udfs  # noqa: E402,F401
from stream_processor_spark.queries import advanced  # noqa: E402,F401
from stream_processor_spark.queries import subqueries  # noqa: E402,F401
from stream_processor_spark.queries import tpch_extra  # noqa: E402,F401
from stream_processor_spark.queries import llm_extra  # noqa: E402,F401
from stream_processor_spark.queries import llm_pipeline  # noqa: E402,F401
from stream_processor_spark.queries import curation_extra  # noqa: E402,F401
from stream_processor_spark.queries import matview  # noqa: E402,F401
from stream_processor_spark.queries import retrieval  # noqa: E402,F401
from stream_processor_spark.queries import lookup  # noqa: E402,F401
from stream_processor_spark.queries import multimodal_extra  # noqa: E402,F401


def queries():
    """name -> callable(spark, sf_dir) -> DataFrame (driver contract)."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    """name -> DuckDB SQL (only for hash-checkable queries)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
