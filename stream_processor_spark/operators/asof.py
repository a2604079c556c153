"""As-of join: for each left row, the latest right row at-or-before its time.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the scalable formulation
is the union-tag trick:

    1. tag left/right rows, union them on (key, time),
    2. one window pass per key ordered by (time, tag):
       ``last(right_value, ignoreNulls=True)`` over
       rows UNBOUNDED PRECEDING..CURRENT carries the most recent right
       value forward,
    3. filter back to left rows.

One shuffle on the key (the window exchange), no per-row Python, no
nested-loop — O(n log n) per key group vs O(n·m) for the naive range join.
This is the standard large-scale as-of pattern (cf. time-series joins in
Flink/kdb land).

Tie semantics: a right row with ts == left ts IS visible (at-or-before);
right rows sort before left rows on equal timestamps via the tag column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. ``direction="backward"`` (default): latest
    ``right`` row with ``right_ts <= left_ts`` per ``key``;
    ``"forward"``: earliest right row with ``right_ts >= left_ts`` (the
    same single window pass over the reverse time order — equal
    timestamps remain visible). Appends ``<value_col><suffix>`` columns
    to ``left``."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # The right row's values are carried as ONE struct so the match is
    # row-atomic: a legitimately-NULL value inside the latest right row
    # stays NULL (carrying columns independently with last(ignorenulls)
    # would backfill it from an older row and could mix rows).
    null_rv = F.when(
        F.lit(False),
        F.struct(
            *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in value_cols]
        ),
    )
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        null_rv.alias("__rv"),
    )
    null_left = F.when(
        F.lit(False),
        F.struct(
            *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns]
        ),
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        null_left.alias("__left"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
    )
    unioned = lt.unionByName(rt)
    # __rv in the sort gives a deterministic winner among right rows tied
    # on (key, ts): the greatest struct (field-wise) wins via last().
    # forward = the identical carry pass over DESCENDING time; __side
    # ascends either way so an equal-timestamp right row sorts before the
    # left row and stays visible (at-or-before / at-or-after).
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, "__side", "__rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__left",
        F.last(F.col("__rv"), ignorenulls=True).over(w).alias("__carried"),
    )
    out = carried.filter(F.col("__side") == 1).select(
        "__left.*",
        *[F.col(f"__carried.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
