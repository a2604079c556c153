"""Zone-map skipping index: manifest invariants, pruning, rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processor_spark.catalog import Tables
from stream_processor_spark.operators import zonemap as zm


def test_manifest_covers_table_exactly(spark, sf_dir):
    data_name, map_name = zm.ensure_zonemap(spark, sf_dir)
    total = spark.table(data_name).count()
    rows = zm.manifest_rows(spark, map_name)
    assert sum(r["rows"] for r in rows) == total
    # doc_id is unique and the table is range-clustered: file key spans
    # must be disjoint — that disjointness IS the pruning power
    spans = sorted((r["min_key"], r["max_key"]) for r in rows)
    for (_, amax), (bmin, _) in zip(spans, spans[1:]):
        assert amax < bmin
    assert len(rows) > 1  # pruning is meaningful only with multiple files


def test_point_lookup_prunes_and_matches(spark, sf_dir):
    data_name, map_name = zm.ensure_zonemap(spark, sf_dir)
    keys = [1, 7, 103]
    files = zm.pruned_files_for_keys(spark, map_name, keys)
    nfiles_total = len(zm.manifest_rows(spark, map_name))
    assert 0 < len(files) <= len(keys) < nfiles_total
    got = zm.lookup_by_keys(spark, sf_dir, keys)
    # the scan reads exactly the pruned file set, nothing else
    assert sorted(got.inputFiles()) == sorted(files)
    expect = (
        Tables(spark, sf_dir)
        .documents.filter(F.col("doc_id").isin(keys))
        .select("doc_id", "n_chars")
    )
    assert sorted(got.select("doc_id", "n_chars").collect()) == sorted(
        expect.collect()
    )


def test_range_lookup_prunes_and_matches(spark, sf_dir):
    _, map_name = zm.ensure_zonemap(spark, sf_dir)
    lo, hi = 10, 29
    files = zm.pruned_files_for_range(spark, map_name, lo, hi)
    assert 0 < len(files) < len(zm.manifest_rows(spark, map_name))
    got = zm.lookup_by_range(spark, sf_dir, lo, hi)
    assert got.count() == (
        Tables(spark, sf_dir)
        .documents.filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
        .count()
    )


def test_lookup_beyond_every_zone_reads_nothing(spark, sf_dir):
    _, map_name = zm.ensure_zonemap(spark, sf_dir)
    files = zm.pruned_files_for_keys(spark, map_name, [10**15])
    assert files == []
    got = zm.lookup_by_keys(spark, sf_dir, [10**15])
    assert got.count() == 0


def test_half_built_pair_is_rebuilt(spark, sf_dir):
    data_name, map_name = zm.ensure_zonemap(spark, sf_dir)
    # crash window: manifest lost after the data write (ensure_postings
    # contract — cache only when BOTH tables exist)
    spark.sql(f"DROP TABLE IF EXISTS {map_name}")
    d2, m2 = zm.ensure_zonemap(spark, sf_dir)
    assert (d2, m2) == (data_name, map_name)
    assert spark.catalog.tableExists(map_name)
    assert zm.lookup_by_keys(spark, sf_dir, [1]).count() == 1


def test_zonemap_generalizes_to_any_table_key(spark, sf_dir):
    """The layout works for any catalog table/key pair — embeddings by
    vec_id here — with its own deterministic table names."""
    d_docs, _ = zm.zonemap_names(sf_dir)
    d_emb, m_emb = zm.zonemap_names(sf_dir, table="embeddings", key="vec_id")
    assert d_emb != d_docs
    zm.ensure_zonemap(spark, sf_dir, table="embeddings", key="vec_id")
    got = zm.lookup_by_keys(
        spark, sf_dir, [1, 5], table="embeddings", key="vec_id"
    )
    assert sorted(r["vec_id"] for r in got.select("vec_id").collect()) == [1, 5]
    assert len(got.inputFiles()) < len(zm.manifest_rows(spark, m_emb))


def test_append_extends_manifest_incrementally(spark, sf_dir):
    """Appends scan only the NEW files for stats (O(batch) maintenance),
    lookups see appended rows immediately, and recluster restores
    disjoint zones with identical lookup results."""
    # a private table/key namespace so the documents layout is untouched
    zm.ensure_zonemap(spark, sf_dir, table="embeddings", key="vec_id")
    d_name, m_name = zm.zonemap_names(sf_dir, "embeddings", "vec_id")
    base_rows = spark.table(d_name).count()
    base_files = len(zm.manifest_rows(spark, m_name))

    batch = (
        spark.table(d_name)
        .limit(3)
        .select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
    )
    added = zm.append_zonemap(spark, sf_dir, batch, table="embeddings", key="vec_id")
    assert added >= 1
    assert len(zm.manifest_rows(spark, m_name)) == base_files + added
    got = zm.lookup_by_keys(
        spark, sf_dir, [1_000_000, 1_000_002], table="embeddings", key="vec_id"
    )
    assert got.count() == 2
    # the appended zone is probed alone — old zones don't match 1e6 keys
    assert len(got.inputFiles()) == added

    # replaying the same append adds new duplicate rows (append is not
    # idempotent by itself — TxnTable txn_ids are the replay guard);
    # here we just verify recluster repairs layout with rows intact
    total = spark.table(d_name).count()
    zm.recluster_zonemap(spark, sf_dir, table="embeddings", key="vec_id")
    assert spark.table(d_name).count() == total == base_rows + 3
    spans = sorted(
        (r["min_key"], r["max_key"]) for r in zm.manifest_rows(spark, m_name)
    )
    for (_, amax), (bmin, _) in zip(spans, spans[1:]):
        assert amax <= bmin  # disjoint again (<= : duplicate keys allowed)
    assert (
        zm.lookup_by_keys(
            spark, sf_dir, [1_000_001], table="embeddings", key="vec_id"
        ).count()
        == 1
    )


def test_reconcile_folds_unmanifested_files(spark, sf_dir):
    """Round-7 ADVICE: a crash in append_zonemap between the data-table
    append and the manifest extend leaves committed files invisible to
    pruning. The lookup-path reconcile folds them back in, so indexed
    lookups never silently under-return."""
    zm.ensure_zonemap(spark, sf_dir, table="orders", key="o_orderkey")
    d_name, m_name = zm.zonemap_names(sf_dir, "orders", "o_orderkey")
    before = len(zm.manifest_rows(spark, m_name))

    # simulate the crash: data lands, manifest never extended
    batch = (
        spark.table(d_name)
        .limit(2)
        .withColumn("o_orderkey", F.col("o_orderkey") + 5_000_000)
    )
    batch.write.mode("append").format("parquet").saveAsTable(d_name)

    got = zm.lookup_by_keys(
        spark,
        sf_dir,
        [r["o_orderkey"] for r in batch.select("o_orderkey").collect()],
        table="orders",
        key="o_orderkey",
    )
    assert got.count() == 2  # healed — not silently missing
    assert len(zm.manifest_rows(spark, m_name)) > before


def test_reconcile_rebuilds_on_dead_manifest_paths(spark, sf_dir):
    """Manifest rows pointing at files that no longer exist (crash in
    recluster between the data swap and the manifest rewrite) trigger a
    wholesale manifest rebuild from the live files."""
    zm.ensure_zonemap(spark, sf_dir, table="orders", key="o_orderkey")
    d_name, m_name = zm.zonemap_names(sf_dir, "orders", "o_orderkey")
    spark.sql(
        f"INSERT INTO {m_name} VALUES "
        "('file:/nonexistent/dead.parquet', 0, 9223372036854775807, 1)"
    )
    # the corruption happened 'in a crashed process'; a restarted
    # process starts with an empty reconcile memo (round-9: steady-state
    # lookups skip the repair probe, so clear the memo to model restart)
    zm._RECONCILED.clear()
    got = zm.lookup_by_keys(
        spark, sf_dir, [1], table="orders", key="o_orderkey"
    )
    assert got.count() == 1  # dead path never scanned
    paths = {r["path"] for r in zm.manifest_rows(spark, m_name)}
    assert not any("nonexistent" in p for p in paths)
    # manifest again covers the table exactly
    assert sum(
        r["rows"] for r in zm.manifest_rows(spark, m_name)
    ) == spark.table(d_name).count()


def test_foreign_append_invalidates_memo_snapshot(spark, sf_dir):
    """Round-10 ADVICE: the reconcile memo is keyed by a DATA-directory
    snapshot, so appends from ANOTHER process sharing the warehouse
    (modeled here by appending to the managed table after a lookup has
    already populated the memo, with NO in-process invalidation) are
    detected and healed on the next lookup — previously the memo served
    stale pruned file lists until restart."""
    zm.ensure_zonemap(spark, sf_dir, table="orders", key="o_orderkey")
    d_name, m_name = zm.zonemap_names(sf_dir, "orders", "o_orderkey")

    # populate the memo: steady-state lookup path
    assert zm.lookup_by_keys(
        spark, sf_dir, [1], table="orders", key="o_orderkey"
    ).count() == 1
    mk = zm._memo_key(spark, d_name, m_name)
    assert mk in zm._RECONCILED

    # 'another process' appends: direct table write, memo NOT touched
    batch = (
        spark.table(d_name)
        .limit(3)
        .withColumn("o_orderkey", F.col("o_orderkey") + 7_000_000)
    )
    keys = [r["o_orderkey"] for r in batch.select("o_orderkey").collect()]
    batch.write.mode("append").format("parquet").saveAsTable(d_name)
    assert mk in zm._RECONCILED  # no in-process invalidation happened

    got = zm.lookup_by_keys(
        spark, sf_dir, keys, table="orders", key="o_orderkey"
    )
    assert got.count() == 3  # snapshot mismatch -> reconcile -> healed
