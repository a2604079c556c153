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


def test_ann_probe_is_partition_pruned_read(spark, sf_dir, tmp_path):
    """The ANN scale story made real: materialize the embedding corpus
    PARTITIONED BY its list assignment (here the deterministic LSH
    sign-bucket; trained IVF list_id is the same shape), then run the
    probe as a filter on the partition column — the scan must prune to
    the probed lists' directories (PartitionFilters), not read the
    corpus and filter after. This is the 'lists become partition keys'
    claim in sim_ann_ivf/sim_ann_bucketed's docstrings, proven."""
    from stream_processor_spark.operators.similarity import cosine, sign_bucket

    t = Tables(spark, sf_dir)
    path = str(tmp_path / "embeddings_by_list")
    listed = t.embeddings.withColumn("list_id", sign_bucket(F.col("embedding"), 3))
    write_partitioned(listed, path, ["list_id"])

    # the query's own bucket = the probe
    probe = (
        listed.filter(F.col("vec_id") == 0).select("list_id").head()[0]
    )
    probed = spark.read.parquet(path).filter(F.col("list_id") == probe)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    partition_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "list_id" in partition_filters

    # and the pruned read serves the exact same rerank results
    qv = t.embeddings.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    top = (
        probed.crossJoin(F.broadcast(qv))
        .select("vec_id", cosine(F.col("embedding"), F.col("qv")).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(5)
        .collect()
    )
    full_top = (
        listed.filter(F.col("list_id") == probe)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", cosine(F.col("embedding"), F.col("qv")).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(5)
        .collect()
    )
    assert [(r.vec_id, r.cosine) for r in top] == [
        (r.vec_id, r.cosine) for r in full_top
    ]


def test_join_bucketed_query_zero_exchange(spark, sf_dir):
    """The registered join_bucketed query's join shape: with broadcast
    disabled (the 100 TB premise — neither fact fits memory), the
    bucketed-by-orderkey lineitem/orders pair must sort-merge-join with
    zero Exchange on either side."""
    from stream_processor_spark.operators.storage import bucketed_pair

    li, o = bucketed_pair(spark, sf_dir)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_orderstatus"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # bucketing must not change the joined row multiset
        from stream_processor_spark.catalog import Tables

        t = Tables(spark, sf_dir)
        expected = t.lineitem.join(
            t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_compact_files_coalesces_and_clusters(spark, sf_dir, tmp_path):
    """Small-file compaction: a 64-way fragmented write collapses to
    ~n/rows_per_file range-clustered files; rows survive exactly and
    each output file's sort-key range is disjoint (what makes parquet
    min/max footer stats prune range predicates post-compaction)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from stream_processor_spark.operators.storage import compact_files

    t = Tables(spark, sf_dir)
    frag = str(tmp_path / "fragmented")
    t.events.repartition(64).write.parquet(frag)
    assert len(glob.glob(os.path.join(frag, "*.parquet"))) == 64

    compacted = str(tmp_path / "compacted")
    n = t.events.count()
    n_files = compact_files(spark, frag, compacted, ["event_id"],
                            rows_per_file=-(-n // 4))
    assert n_files <= 5  # ~4 plus range-sampling slack
    out = spark.read.parquet(compacted)
    assert out.count() == n
    assert out.select(F.sum("event_id")).head()[0] == \
        t.events.select(F.sum("event_id")).head()[0]

    # disjoint event_id ranges across files -> footer stats prune
    ranges = []
    for f in glob.glob(os.path.join(compacted, "*.parquet")):
        md = pq.read_metadata(f)
        los, his = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "event_id"
            )
            los.append(col.statistics.min)
            his.append(col.statistics.max)
        ranges.append((min(los), max(his)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges {ranges}"


def test_zorder_write_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order layout: after write_zordered on (user_id, event_id), each
    file covers a small rectangle in both dimensions — the sum of
    per-file min/max spans on EACH dimension must be far below
    n_files x full_span (which is what a single-key sort gives the
    non-sorted dimension)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from stream_processor_spark.operators.storage import write_zordered

    t = Tables(spark, sf_dir)
    path = str(tmp_path / "zordered")
    n_files = 16
    write_zordered(t.events, path, "user_id", "event_id", n_files)

    spans = {"user_id": [], "event_id": []}
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) >= n_files // 2
    for f in files:
        md = pq.read_metadata(f)
        for col_name in spans:
            los, his = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col_name
                )
                los.append(col.statistics.min)
                his.append(col.statistics.max)
            spans[col_name].append(max(his) - min(los))
    full = {
        c: (t.events.agg(F.max(c) - F.min(c)).head()[0]) for c in spans
    }
    for c in spans:
        avg_span = sum(spans[c]) / len(spans[c])
        # each dimension's per-file coverage must be a small fraction of
        # the full domain (a 1-D sort leaves the other dimension at ~1.0)
        assert avg_span < 0.5 * full[c], (c, avg_span, full[c])

    # layout change must not change content
    assert spark.read.parquet(path).count() == t.events.count()


def test_swap_tables_publishes_and_recovers_from_crash_states(spark):
    """Round-7 ADVICE: the compaction swap is documented as non-atomic
    (single writer, quiesced readers) but must be crash-LOSSLESS: the
    old table is renamed aside, and recover_swap finishes or rolls back
    any half-swapped state."""
    from stream_processor_spark.operators.storage import (
        drop_warehouse_dir,
        recover_swap,
        swap_tables,
    )

    pub, staged = "swaptest_pub", "swaptest_pub__staged"
    retired = f"{pub}__retired"
    for n in (pub, staged, retired):
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        drop_warehouse_dir(spark, n)

    spark.range(3).write.saveAsTable(pub)
    spark.range(10, 15).write.saveAsTable(staged)

    # happy path: staged content takes the published name
    swap_tables(spark, pub, staged)
    assert sorted(r.id for r in spark.table(pub).collect()) == [10, 11, 12, 13, 14]
    assert not spark.catalog.tableExists(staged)
    assert not spark.catalog.tableExists(retired)

    # crash state A: old renamed aside, staged not yet published
    spark.range(20, 22).write.saveAsTable(staged)
    spark.sql(f"ALTER TABLE {pub} RENAME TO {retired}")
    assert recover_swap(spark, pub, staged)
    assert sorted(r.id for r in spark.table(pub).collect()) == [20, 21]
    assert not spark.catalog.tableExists(retired)

    # crash state B: staged lost, only the retired copy survives —
    # recovery rolls back to it (no data loss)
    spark.sql(f"ALTER TABLE {pub} RENAME TO {retired}")
    assert recover_swap(spark, pub, staged)
    assert sorted(r.id for r in spark.table(pub).collect()) == [20, 21]

    # nothing to recover → published untouched
    assert recover_swap(spark, pub, staged)
    spark.sql(f"DROP TABLE IF EXISTS {pub}")
    drop_warehouse_dir(spark, pub)
