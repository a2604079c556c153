"""Registry plumbing for (Spark query, DuckDB oracle) pairs."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from stream_processor_spark.catalog import Tables

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register ``fn(t: Tables) -> DataFrame`` under ``name``.

    The registered callable conforms to the driver contract
    ``(spark, sf_dir) -> DataFrame``; the decorated function receives a
    :class:`Tables` catalog for brevity.
    """

    def deco(fn: Callable[[Tables], DataFrame]) -> Callable[[Tables], DataFrame]:
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(Tables(spark, sf_dir))

        wrapper.__name__ = name
        wrapper.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(name=name, fn=wrapper, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco
