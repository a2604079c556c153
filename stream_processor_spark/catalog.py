"""Table catalog: lazy parquet-backed DataFrames for a scale-factor dir.

Mirrors the reference's catalog indirection (pipeline/topics/schemas rows in
Postgres, ``src/listen.js:46-87``) for the *analytics* surface: a named set
of tables resolved once, then referenced declaratively. At 100 TB these
would be partitioned/ bucketed external tables; locally they are single
parquet files. All access is lazy — a catalog lookup never triggers a scan,
so Catalyst sees the full plan (filter pushdown + column pruning reach the
parquet reader).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from stream_processor_spark.session import tune_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Tables:
    """Lazy accessor: ``Tables(spark, sf_dir).lineitem`` → DataFrame."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        tune_session(spark)
        self._spark = spark
        self._dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        # unknown attributes must raise AttributeError (not KeyError) so
        # hasattr()/getattr(default)/introspection behave normally
        if name.startswith("_") or name not in TABLE_NAMES:
            raise AttributeError(name)
        return self.table(name)

    def table(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
        if name not in self._cache:
            path = os.path.join(self._dir, f"{name}.parquet")
            df = self._spark.read.parquet(path)
            if name == "events" and dict(df.dtypes).get("ts") == "bigint":
                # TIMESTAMP(NANOS) parquet read as epoch-nanos long (see
                # session._RUNTIME_CONFS); values are µs-aligned → lossless.
                # Integer DIV (not /) so int64 nanos never round through double.
                from pyspark.sql import functions as F

                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            self._cache[name] = df
        return self._cache[name]


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> Tables:
    return Tables(spark, sf_dir)
