"""Storage-layout proofs: bucketed joins skip the shuffle, partition
pruning skips the read. These are the two write-time levers the 100 TB
design leans on (docs/SCALE.md)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stream_processor_spark.catalog import Tables
from stream_processor_spark.operators.storage import (
    read_table,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    t = Tables(spark, sf_dir)
    write_bucketed(t.orders, "b_orders", "o_custkey", 8)
    write_bucketed(t.customer, "b_customer", "c_custkey", 8)
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    """Same-key same-N bucketed tables join with zero shuffle on either side."""
    orders, customer = (read_table(spark, n) for n in bucketed_tables)
    # disable broadcast so the join strategy decision is about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).select("o_orderkey", "c_name")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        t = Tables(spark, sf_dir)
        expected = (
            t.orders.join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_partition_pruning_reads_only_matching_dirs(spark, sf_dir, tmp_path):
    t = Tables(spark, sf_dir)
    path = str(tmp_path / "events_by_type")
    write_partitioned(t.events, path, ["event_type"])

    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the predicate must appear as a PartitionFilter (pruned read), not a
    # post-scan data filter
    partition_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in partition_filters
    n_click = df.count()
    expected = t.events.filter(F.col("event_type") == "click").count()
    assert n_click == expected
