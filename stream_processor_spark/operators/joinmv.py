"""Incremental JOIN-view maintenance (delta joins, the IVM classic).

`operators/aggmv.py` maintains an aggregate view from partial states;
this module does the same for a JOIN view — the other half of classic
incremental view maintenance (Blakeley et al., SIGMOD'86): for
V = A ⋈ B, an insert batch ΔA contributes exactly ΔA ⋈ B_current, and
interleaved appends on both sides cover every (a, b) pair exactly once
— so the maintained view equals the from-scratch join bit-for-bit (the
algebra is hash-pinned by the `join_incremental_mv` registry entry;
the persisted surfaces live here and are pinned in
tests/test_joinmv.py).

The concrete view is ``orders ⋈ customer ON o_custkey = c_custkey``
(the engine's aggmv convention: one concrete view, generalizable
schema-by-schema).

Scale design:
- Both ACCUMULATED sides are bucketed by the join key, so the
  per-batch delta join shuffles ONLY the batch — the accumulated scan
  is bucket-local. Per-append cost is O(|Δ| + matched buckets), never
  O(|A|+|B|).
- Commit state lives in a LOG table of one row per applied batch —
  replay detection and serve filtering read the log, never an
  accumulated table (an O(corpus) batch-id scan per append is exactly
  the anti-pattern the round-6 verdict flagged in `append_postings`).
- Every data write is REPLAY-IDEMPOTENT: the view is partitioned by
  producing batch and the accumulators by batch id, and all three
  writes are dynamic-partition OVERWRITES of the batch's own
  partition. The log append is the single commit point, so the
  protocol (view → acc → log) converges under at-least-once
  redelivery from ANY crash window: uncommitted partitions are
  invisible to ``serve`` (it filters on logged ids) and the replay
  rewrites them in place.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_N_BUCKETS = 8

LEFT_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
RIGHT_COLS = ["c_custkey", "c_name"]
VIEW_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "c_name"]


def joinmv_names(sf_dir: str) -> tuple[str, str, str, str]:
    """Deterministic (left, right, view, log) table names."""
    tag = hashlib.md5(f"{sf_dir}|joinmv2".encode()).hexdigest()[:8]
    return (
        f"jmv_left_{tag}",
        f"jmv_right_{tag}",
        f"jmv_view_{tag}",
        f"jmv_log_{tag}",
    )


def _fingerprint(batch: DataFrame, cols: list[str], side: str) -> str:
    """Order-independent content fingerprint (XOR of md5-int64s +
    count) prefixed by the side so left/right ids can never collide."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *[F.col(c) for c in cols])), 1, 15),
        16,
        10,
    ).cast("long")
    row = (
        batch.select(h.alias("__h"))
        .agg(F.count(F.lit(1)).alias("c"), F.expr("bit_xor(__h)").alias("s"))
        .collect()[0]
    )
    return f"{side}_{row['c']}_{row['s']}"


def init_join_mv(spark: SparkSession, sf_dir: str) -> tuple[str, str, str, str]:
    """Create the four EMPTY state tables once; return their names.
    Accumulators are bucketed by the join key (the delta-join
    co-location) and partitioned by batch id (the replay-idempotence
    unit); the view is partitioned by producing batch; the log is the
    commit record (one row per applied batch — KB-scale forever)."""
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.operators.storage import drop_warehouse_dir

    names = joinmv_names(sf_dir)
    left_name, right_name, view_name, log_name = names
    if all(spark.catalog.tableExists(n) for n in names):
        return names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        drop_warehouse_dir(spark, name)

    t = Tables(spark, sf_dir)
    empty_left = t.orders.select(*LEFT_COLS).limit(0).withColumn(
        "batch_id", F.lit("")
    )
    empty_right = t.customer.select(*RIGHT_COLS).limit(0).withColumn(
        "batch_id", F.lit("")
    )
    (
        empty_left.write.format("parquet")
        .partitionBy("batch_id")
        .bucketBy(_N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable(left_name)
    )
    (
        empty_right.write.format("parquet")
        .partitionBy("batch_id")
        .bucketBy(_N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable(right_name)
    )
    empty_view = (
        t.orders.select(*LEFT_COLS)
        .limit(0)
        .join(t.customer.select(*RIGHT_COLS).limit(0), F.expr("o_custkey = c_custkey"))
        .select(*VIEW_COLS)
        .withColumn("src_batch", F.lit(""))
    )
    (
        empty_view.write.format("parquet")
        .partitionBy("src_batch")
        .saveAsTable(view_name)
    )
    log = spark.createDataFrame([], "batch_id string, side string")
    log.write.format("parquet").saveAsTable(log_name)
    return names


def _committed(spark: SparkSession, log_name: str) -> set[str]:
    """Applied batch ids — a read of the LOG (one row per batch), not
    of any accumulated data."""
    spark.catalog.refreshTable(log_name)
    return {r["batch_id"] for r in spark.table(log_name).collect()}


def _overwrite_own_partition(
    spark: SparkSession, table: str, df: DataFrame
) -> None:
    """Dynamic-partition overwrite of the frame's own batch partition:
    an at-least-once replay REWRITES it, never duplicates."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").insertInto(table)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _apply(
    spark: SparkSession,
    names: tuple[str, str, str, str],
    b: DataFrame,
    fp: str,
    acc_name: str,
    delta: DataFrame,
) -> bool:
    """The shared commit protocol: view partition → accumulator
    partition → log row. Every step before the log append is an
    idempotent overwrite of the batch's own partition."""
    _, _, view_name, log_name = names
    _overwrite_own_partition(
        spark, view_name, delta.withColumn("src_batch", F.lit(fp))
    )
    _overwrite_own_partition(
        spark, acc_name, b.withColumn("batch_id", F.lit(fp))
    )
    side = fp.split("_", 1)[0]
    spark.createDataFrame([(fp, side)], "batch_id string, side string").write.mode(
        "append"
    ).insertInto(log_name)
    return True


def append_left(
    spark: SparkSession, names: tuple[str, str, str, str], batch: DataFrame
) -> bool:
    """Apply an orders batch: view += Δ ⋈ right_acc, accumulate Δ,
    commit. Returns False on a replayed batch."""
    # foreachBatch hands a frame bound to a CLONED session; every state
    # read must come from THAT session or the delta join mixes plans
    # across sessions (the aggmv refresh note, one step further)
    spark = batch.sparkSession
    left_name, right_name, view_name, log_name = names
    b = batch.select(*LEFT_COLS)
    fp = _fingerprint(b, LEFT_COLS, "L")
    if fp in _committed(spark, log_name):
        return False
    spark.catalog.refreshTable(right_name)
    delta = (
        b.join(
            spark.table(right_name),
            b["o_custkey"] == F.col("c_custkey"),
        )
        .select(*VIEW_COLS)
    )
    return _apply(spark, names, b, fp, left_name, delta)


def append_right(
    spark: SparkSession, names: tuple[str, str, str, str], batch: DataFrame
) -> bool:
    """Apply a customer batch: view += left_acc ⋈ Δ, accumulate Δ,
    commit."""
    spark = batch.sparkSession  # cloned-session rule, see append_left
    left_name, right_name, view_name, log_name = names
    b = batch.select(*RIGHT_COLS)
    fp = _fingerprint(b, RIGHT_COLS, "R")
    if fp in _committed(spark, log_name):
        return False
    spark.catalog.refreshTable(left_name)
    delta = (
        spark.table(left_name)
        .join(b, F.col("o_custkey") == b["c_custkey"])
        .select(*VIEW_COLS)
    )
    return _apply(spark, names, b, fp, right_name, delta)


def serve_join_mv(
    spark: SparkSession, names: tuple[str, str, str, str]
) -> DataFrame:
    """The maintained join view, restricted to COMMITTED batches (an IN
    on the partition column → partition-pruned scan), so a crash
    between a data write and its log commit is invisible."""
    _, _, view_name, log_name = names
    committed = _committed(spark, log_name)
    spark.catalog.refreshTable(view_name)
    return (
        spark.table(view_name)
        .filter(F.col("src_batch").isin(sorted(committed)))
        .drop("src_batch")
    )


def stream_join_mv_updates(
    spark: SparkSession,
    left_stream: DataFrame,
    names: tuple[str, str, str, str],
    checkpoint_dir: str,
):
    """Maintain the join view from a STREAM of left-side inserts: each
    micro-batch runs :func:`append_left` through foreachBatch —
    O(|Δ| + matched buckets) per trigger. A foreachBatch retry
    redelivers identical rows, hits the same content fingerprint in
    the log, and is skipped before any write; a retry after a partial
    apply rewrites the SAME partitions (dynamic-partition overwrite),
    so the fold stays exact under at-least-once delivery — the
    `stream_agg_mv_updates` contract carried to join views."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        append_left(spark, names, batch_df)

    return (
        left_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
