"""Zone-map data-skipping index: file-level min/max pruning for lookups.

Parquet footers already carry row-group min/max, but Spark still has to
LIST and OPEN every file of a table to use them — at 100 TB that is
millions of footer reads per point lookup. Real warehouses (Snowflake
micro-partitions, Delta/Iceberg file stats, ClickHouse minmax skip
indexes) lift those stats into a manifest consulted at PLANNING time,
so the files a query touches scale with the files that can MATCH, not
with the corpus. This module is that layer for the engine's key-lookup
path, the third member of the persisted-layout family
(`operators/postings.py`, `operators/annindex.py`):

- ``ensure_zonemap`` writes the table CLUSTERED by the key
  (`repartitionByRange` + `sortWithinPartitions`, so each file owns a
  narrow disjoint key range) plus a manifest table of one row per data
  file: (path, min_key, max_key, rows).
- ``lookup_by_keys`` / ``lookup_by_range`` hydrate the manifest (one
  row per FILE — KB-scale even at 100 TB), select intersecting files
  driver-side, and scan ONLY those paths; the residual predicate
  re-applies inside the scan, so pruning can never change answers —
  a file set that over-approximates is merely slower, never wrong.

Correctness does not depend on how `repartitionByRange` draws its
range boundaries (the manifest is computed FROM the written files);
clustering only determines how few files a lookup touches.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zonemap_names(
    sf_dir: str, table: str = "documents", key: str = "doc_id"
) -> tuple[str, str]:
    """Deterministic (clustered data, manifest) table names — pure tag
    computation so the router can probe the layout without building."""
    tag = hashlib.md5(f"{sf_dir}|zonemap|{table}|{key}".encode()).hexdigest()[:8]
    return f"zm_{table[:4]}_{tag}", f"zm_map_{tag}"


def ensure_zonemap(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    key: str = "doc_id",
    nfiles: int = 16,
) -> tuple[str, str]:
    """Build (once per sf_dir) the key-clustered copy of ``table``
    (any `catalog.Tables` name) and its file-stats manifest; return
    (data_table, manifest_table).

    Cached only when BOTH tables exist (a crash between the two writes
    rebuilds — the `ensure_postings` contract); stale directories are
    cleared via the Hadoop FileSystem API (round-6 ADVICE pattern).
    """
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.operators.storage import (
        drop_warehouse_dir,
        recover_swap,
    )

    data_name, map_name = zonemap_names(sf_dir, table, key)
    # heal a crash mid-recluster non-destructively before the existence
    # check — a rebuild from source would discard appended rows
    recover_swap(spark, data_name, f"{data_name}__staged")
    if spark.catalog.tableExists(data_name) and spark.catalog.tableExists(
        map_name
    ):
        return data_name, map_name

    for name in (data_name, map_name):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        drop_warehouse_dir(spark, name)

    docs = getattr(Tables(spark, sf_dir), table)
    (
        docs.repartitionByRange(nfiles, F.col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(data_name)
    )

    # manifest FROM the written files — whatever boundaries the range
    # partitioner chose, these stats are exact for the layout on disk
    manifest = (
        spark.table(data_name)
        .withColumn("path", F.input_file_name())
        .groupBy("path")
        .agg(
            F.min(key).cast("long").alias("min_key"),
            F.max(key).cast("long").alias("max_key"),
            F.count(F.lit(1)).alias("rows"),
        )
    )
    manifest.write.mode("overwrite").format("parquet").saveAsTable(map_name)
    return data_name, map_name


def manifest_rows(spark: SparkSession, map_name: str) -> list:
    """The hydrated manifest — one row per data file (KB-scale)."""
    return spark.table(map_name).collect()


def _canon(p: str) -> str:
    for pre in ("file://", "file:"):
        if p.startswith(pre):
            p = p[len(pre):]
            break
    return "/" + p.lstrip("/")


def _file_stats(spark: SparkSession, files: list[str], key: str) -> DataFrame:
    return (
        spark.read.parquet(*files)
        .withColumn("path", F.input_file_name())
        .groupBy("path")
        .agg(
            F.min(key).cast("long").alias("min_key"),
            F.max(key).cast("long").alias("max_key"),
            F.count(F.lit(1)).alias("rows"),
        )
    )


# Zonemaps verified consistent this process: memo key
# (applicationId, data_name, map_name) -> the DATA-directory snapshot
# (file count, max mtime, total bytes from ONE Hadoop listStatus) the
# manifest was last verified against. Lookups skip the full repair probe
# (refreshTable + inputFiles + manifest collect = a fixed latency tax on
# the point-lookup serve path — round-8 ADVICE) while the snapshot still
# matches; a changed snapshot — including appends from ANOTHER process
# sharing the warehouse, the round-9 ADVICE gap where a memo keyed only
# by (applicationId, table) served stale pruned file lists until restart
# — re-runs the reconcile. The listStatus is one FS metadata call (no
# Spark job, no file-footer reads), so the steady-state lookup tax the
# round-8 fix removed stays removed. A fresh process (the crash-recovery
# case the probe exists for) starts with an empty memo, so the FIRST
# lookup after a crash still heals.
_RECONCILED: dict = {}


def _memo_key(spark: SparkSession, data_name: str, map_name: str) -> tuple:
    return (spark.sparkContext.applicationId, data_name, map_name)


def _dir_snapshot(spark: SparkSession, table_name: str) -> tuple:
    """(file count, max mtime, total bytes) of a managed table's
    warehouse directory — one Hadoop FileSystem listStatus, correct on
    HDFS/S3A/GCS as well as file:// (the `drop_warehouse_dir`
    rationale). Any append/compact/swap changes at least one component."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(warehouse + "/" + table_name)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return (0, 0, 0)
    n = mt = ln = 0
    for st in fs.listStatus(jpath):
        n += 1
        mt = max(mt, st.getModificationTime())
        ln += st.getLen()
    return (n, mt, ln)


def reconcile_zonemap_once(
    spark: SparkSession, data_name: str, map_name: str, key: str
) -> int:
    """Steady-state guard for the lookup path: full reconcile when the
    (session, table) pair is new OR the data directory changed since
    the last verification (cross-process appends included), no-op
    otherwise."""
    mk = _memo_key(spark, data_name, map_name)
    if _RECONCILED.get(mk) == _dir_snapshot(spark, data_name):
        return 0
    return reconcile_zonemap(spark, data_name, map_name, key)


def reconcile_zonemap(
    spark: SparkSession, data_name: str, map_name: str, key: str
) -> int:
    """Two-way manifest repair (driver-side set compare of two KB-scale
    file listings — round-7 ADVICE), memoized per session+table for the
    lookup path (round-8 ADVICE; see :func:`reconcile_zonemap_once`).

    The manifest is a CACHE of per-file stats, fully rederivable from
    the data table, so any half-applied maintenance state is healable:

    - files in the table but NOT in the manifest (crash in
      :func:`append_zonemap` between the data append and the manifest
      extend) would silently vanish from pruned lookups — their stats
      are computed and appended;
    - manifest rows whose file no longer EXISTS (crash in
      :func:`recluster_zonemap` between the data swap and the manifest
      rewrite) would make lookups scan dead paths — the manifest is
      rebuilt wholesale from the live files (KB-scale write).

    Returns the number of manifest rows added (wholesale rebuild counts
    every live file)."""
    mk = _memo_key(spark, data_name, map_name)
    # snapshot BEFORE the probe: a concurrent append racing this
    # reconcile then mismatches on the next lookup and heals there
    snap = _dir_snapshot(spark, data_name)
    spark.catalog.refreshTable(data_name)
    actual = {_canon(f): f for f in spark.table(data_name).inputFiles()}
    have = {_canon(r["path"]) for r in manifest_rows(spark, map_name)}
    missing = [f for c, f in actual.items() if c not in have]
    if have - set(actual):
        stats = _file_stats(spark, sorted(actual.values()), key).localCheckpoint()
        stats.write.mode("overwrite").format("parquet").saveAsTable(map_name)
        spark.catalog.refreshTable(map_name)
        _RECONCILED[mk] = snap
        return len(actual)
    if not missing:
        _RECONCILED[mk] = snap
        return 0
    new_rows = _file_stats(spark, missing, key)
    n = new_rows.count()
    new_rows.write.mode("append").format("parquet").insertInto(map_name)
    spark.catalog.refreshTable(map_name)
    _RECONCILED[mk] = snap
    return n


def pruned_files_for_keys(spark: SparkSession, map_name: str, keys) -> list[str]:
    """Files whose [min,max] span contains at least one probe key."""
    ks = sorted(set(keys))
    return [
        r["path"]
        for r in manifest_rows(spark, map_name)
        if any(r["min_key"] <= k <= r["max_key"] for k in ks)
    ]


def pruned_files_for_range(
    spark: SparkSession, map_name: str, lo: int, hi: int
) -> list[str]:
    """Files whose [min,max] span intersects [lo, hi]."""
    return [
        r["path"]
        for r in manifest_rows(spark, map_name)
        if r["min_key"] <= hi and r["max_key"] >= lo
    ]


def _scan(spark: SparkSession, files: list[str], schema_table: str) -> DataFrame:
    """Scan exactly ``files``; empty file set → empty frame with the
    table's schema (a lookup for keys beyond every zone reads nothing)."""
    if not files:
        return spark.table(schema_table).limit(0)
    return spark.read.parquet(*files)


def lookup_by_keys(
    spark: SparkSession,
    sf_dir: str,
    keys,
    table: str = "documents",
    key: str = "doc_id",
) -> DataFrame:
    """Point lookup through the zone map: scan only files whose key
    range can contain a probe key, residual ``IN`` re-applied inside."""
    data_name, map_name = ensure_zonemap(spark, sf_dir, table=table, key=key)
    reconcile_zonemap_once(spark, data_name, map_name, key)
    files = pruned_files_for_keys(spark, map_name, keys)
    return _scan(spark, files, data_name).filter(
        F.col(key).isin([int(k) for k in keys])
    )


def lookup_by_range(
    spark: SparkSession,
    sf_dir: str,
    lo: int,
    hi: int,
    table: str = "documents",
    key: str = "doc_id",
) -> DataFrame:
    """Range lookup through the zone map."""
    data_name, map_name = ensure_zonemap(spark, sf_dir, table=table, key=key)
    reconcile_zonemap_once(spark, data_name, map_name, key)
    files = pruned_files_for_range(spark, map_name, lo, hi)
    return _scan(spark, files, data_name).filter(
        (F.col(key) >= lo) & (F.col(key) <= hi)
    )


def append_zonemap(
    spark: SparkSession,
    sf_dir: str,
    batch: DataFrame,
    table: str = "documents",
    key: str = "doc_id",
) -> int:
    """Append a batch to the zone-mapped table: the batch's rows land
    as NEW files and only THOSE files are scanned to extend the
    manifest — O(|Δ|) maintenance, never a table rescan (the engine's
    append contract, `append_postings`/`append_ivf_index` style).

    Appended files may overlap existing zones (clustering degrades,
    pruning stays CORRECT — the manifest is exact per file and lookups
    re-apply the predicate); :func:`recluster_zonemap` is the repair
    that restores one-zone-per-lookup pruning power. Returns the number
    of manifest rows added."""
    data_name, map_name = ensure_zonemap(spark, sf_dir, table=table, key=key)
    mk = _memo_key(spark, data_name, map_name)
    _RECONCILED.pop(mk, None)
    spark.catalog.refreshTable(data_name)
    before = {r["path"] for r in manifest_rows(spark, map_name)}
    batch.write.mode("append").format("parquet").saveAsTable(data_name)
    spark.catalog.refreshTable(data_name)
    # snapshot after OUR append lands; a racing foreign append after
    # this point mismatches on the next lookup and heals there
    snap = _dir_snapshot(spark, data_name)
    after = set(spark.table(data_name).inputFiles())
    new_files = sorted(after - before)
    if not new_files:
        _RECONCILED[mk] = snap
        return 0
    new_rows = _file_stats(spark, new_files, key)
    n = new_rows.count()
    new_rows.write.mode("append").format("parquet").insertInto(map_name)
    spark.catalog.refreshTable(map_name)
    _RECONCILED[mk] = snap
    return n


def recluster_zonemap(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    key: str = "doc_id",
    nfiles: int = 16,
) -> tuple[str, str]:
    """Rewrite the zone-mapped table from its CURRENT contents (base +
    appends) back into disjoint key ranges and rebuild the manifest —
    the compaction that restores minimal per-lookup file counts after
    append churn. Lookups before and after return identical rows.

    Crash discipline (round-7 ADVICE): the clustered copy is STAGED and
    published via `storage.swap_tables` (old data renamed aside, never
    a window holding zero copies — the previous drop-then-rewrite left
    appended rows only in session memory); the manifest rewrite that
    follows is healed by :func:`reconcile_zonemap`'s dead-path rebuild
    if interrupted, because rename moves the warehouse directory and
    stale manifest paths then point nowhere."""
    from stream_processor_spark.operators.storage import (
        drop_warehouse_dir,
        recover_swap,
        swap_tables,
    )

    data_name, map_name = zonemap_names(sf_dir, table, key)
    mk = _memo_key(spark, data_name, map_name)
    _RECONCILED.pop(mk, None)
    staged = f"{data_name}__staged"
    recover_swap(spark, data_name, staged)
    spark.catalog.refreshTable(data_name)
    spark.sql(f"DROP TABLE IF EXISTS {staged}")
    drop_warehouse_dir(spark, staged)
    (
        spark.table(data_name)
        .repartitionByRange(nfiles, F.col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(staged)
    )
    swap_tables(spark, data_name, staged)
    spark.catalog.refreshTable(data_name)
    manifest = _file_stats(
        spark, sorted(spark.table(data_name).inputFiles()), key
    ).localCheckpoint()
    manifest.write.mode("overwrite").format("parquet").saveAsTable(map_name)
    spark.catalog.refreshTable(map_name)
    _RECONCILED[mk] = _dir_snapshot(spark, data_name)
    return data_name, map_name
