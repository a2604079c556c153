"""Banded (coarse-bucket) range join: the large×large interval-join plan.

`join_range`'s BroadcastNestedLoopJoin is right while one side is small;
with TWO fact-sized sides a nested loop is O(n·m) and a non-equi join
cannot hash-partition. The scalable formulation quantizes the range
dimension into coarse buckets of the window width: the probe side
explodes to its bucket ± 1 (any match within ±width lies in one of
those), the build side keeps its single bucket, and the join becomes an
EQUI join on (key, bucket) — hash-partitionable, AQE-skew-splittable —
followed by the exact residual range predicate. Each true pair is
produced exactly once (the build row has one bucket; the probe row
covers it once), so no dedup pass is needed.

Cost: 3× probe-side row replication buys O(matching-bucket pairs)
instead of O(n·m) — the standard trick (DuckDB's IEJoin, Flink's
interval join state buckets, and Spark's own range-join hints on
Databricks all quantize the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_sec: int,
) -> DataFrame:
    """All (left, right) pairs with equal ``key`` and
    ``|right_ts - left_ts| <= window_sec``.

    Returns the joined frame (all columns of both inputs). Bucket
    arithmetic uses integer epoch seconds (truncation only affects
    candidate generation; the residual predicate on the full-precision
    timestamps decides membership exactly).
    """
    width = F.lit(int(window_sec))
    # NTZ timestamps cannot cast to long directly; route via timestamp
    # (session tz is pinned UTC engine-wide, and the bucket value only
    # steers candidate generation anyway).
    lb = F.floor(F.col(left_ts).cast("timestamp").cast("long") / width)
    rb = F.floor(F.col(right_ts).cast("timestamp").cast("long") / width)
    probe = left.withColumn(
        "__band", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    build = right.withColumn("__band", rb)
    residual = (
        F.col(right_ts)
        >= F.col(left_ts) - F.make_interval(secs=width.cast("double"))
    ) & (
        F.col(right_ts)
        <= F.col(left_ts) + F.make_interval(secs=width.cast("double"))
    )
    return (
        probe.join(build, [key, "__band"])
        .filter(residual)
        .drop("__band")
    )
