"""Storage layout operators: partitioned & bucketed writes for scale reads.

At 100 TB the dominant costs are scans and shuffles; both are controlled at
WRITE time:

- ``write_partitioned``: hive-style directory partitioning (e.g. by date) —
  partition pruning turns time-range queries into reads of only the
  matching directories.
- ``write_bucketed``: pre-hash the rows by join/aggregation key into N
  buckets (persistent table). Two tables bucketed on the same key with the
  same N join with ZERO exchange on either side — the shuffle happened once
  at write time and is amortized over every subsequent join/aggregation.
  ``tests/test_storage.py`` asserts the no-Exchange plan.

Bucket-count guidance: N ≈ (table size / 256 MiB) rounded to a power of
two; all tables sharing a join key must share N (or be exact multiples,
with AQE bucket coalescing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet: one directory per partition value."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (+ optionally sorted) persistent table.

    Bucketing requires ``saveAsTable`` (bucket metadata lives in the
    catalog). Sorted buckets additionally enable merge-join without an
    in-memory sort.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
