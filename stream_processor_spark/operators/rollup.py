"""Re-aggregation rollup: hierarchical subtotals without the Expand blowup.

Spark's built-in ``rollup()`` plans an Expand operator that replicates
EVERY input row once per grouping level (N+1 copies for N rollup columns)
before the partial aggregate — correct, and safe at scale thanks to
map-side combine, but the expand itself is a row-multiplying pass over
the full fact table: at 60M input rows a 2-level rollup pushes 180M rows
through the partial aggregate.

For decomposable aggregates (sum / count / min / max) the subtotal levels
are ALGEBRAIC in the base level: ``sum(x) GROUP BY a`` is exactly the sum
of the per-(a, b) sums. So this operator aggregates the fact table ONCE
at the finest level — one scan, one shuffle that carries only base-group
partials — and computes every level by rolling up the group-count-sized base
frame (dozens of rows) — the Expand now multiplies base groups, not
fact rows.

Exactness: the engine's money sums are fixed-point int64
(``dsum`` — sum of floor(x*scale + 0.5) as long). Integer addition is
associative, so sum-of-partial-int-sums is BIT-IDENTICAL to the direct
sum under any grouping — the DuckDB ROLLUP oracles verify the rewrite
unchanged. NULL semantics also match: a genuine NULL group value stays
its own base group (and its own subtotal row), exactly as SQL ROLLUP
emits both.

Measured (60M-row lineitem, local[32], same session back-to-back):
built-in rollup ~1.43 s steady vs ~0.88 s re-aggregated — and the win
grows with the number of rollup levels, since the fact-side cost is now
level-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_reagg(
    df: DataFrame,
    group_cols: list[str],
    int_sums: dict[str, Column],
    count_alias: str = "n_rows",
    finish: dict[str, Column] | None = None,
    mode: str = "rollup",
) -> DataFrame:
    """Rollup/cube over ``group_cols`` from one finest-level aggregate.

    ``int_sums``: alias → int64-valued per-row expression (e.g. the
    fixed-point ``floor(x*100 + 0.5)``) summed exactly at every level.
    ``finish``: alias → expression over the summed columns producing the
    output value (default: the raw sum). A row count column is always
    produced under ``count_alias``. ``mode``: "rollup" (hierarchical
    levels) or "cube" (all combinations) — both decompose identically,
    since every grouping set is a re-aggregation of the finest one.
    """
    base = df.groupBy(*group_cols).agg(
        *[F.sum(expr).alias(f"__i_{a}") for a, expr in int_sums.items()],
        F.count(F.lit(1)).alias("__i_n"),
    )
    # The grouping-set levels come from rolling up / cubing the BASE
    # frame — Spark's Expand operator does run here, but over the
    # group-count-sized base (dozens of rows), not the fact table; the
    # base subtree appears exactly once in the plan, so the fact table
    # scans and shuffles once. (A union-of-reaggregations formulation
    # reads cleaner but references base N+1 times, and Spark/AQE does
    # not reliably reuse the common exchange — measured as 3 full scans
    # at sf10.)
    grouped = base.rollup(*group_cols) if mode == "rollup" else base.cube(*group_cols)
    out = grouped.agg(
        *[F.sum(f"__i_{a}").alias(f"__i_{a}") for a in int_sums],
        F.sum("__i_n").alias("__i_n"),
    )
    finish = finish or {}
    return out.select(
        *group_cols,
        *[
            finish.get(a, F.col(f"__i_{a}")).alias(a)
            for a in int_sums
        ],
        F.col("__i_n").cast("long").alias(count_alias),
    )
