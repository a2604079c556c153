"""Iterative graph operators: connected components for dedup clustering.

Near-duplicate detection yields PAIRS; canonicalization needs CLUSTERS
(pick one survivor per connected component of the similarity graph). This
is the one place the engine runs an iterative DataFrame algorithm:
min-label propagation to a fixpoint.

Scale design:
- Each iteration is one shuffle (join on vertex) + one aggregation —
  the standard BSP step; iterations = graph diameter (near-dup clusters
  are shallow, typically < 10).
- ``localCheckpoint`` after every iteration truncates lineage so plan size
  stays constant (without it, iteration N replays all N-1 prior joins).
- The convergence probe aggregates to ONE scalar per iteration — the only
  driver-side value in the loop (monotone non-increasing label sum;
  fixpoint when unchanged).
- Deterministic: min-label fixpoint is unique regardless of execution
  order, so the result is oracle-checkable (DuckDB recursive CTE computes
  the same fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 30,
    on_unconverged: str = "raise",
) -> DataFrame:
    """Label every vertex with the MIN vertex id of its component.

    ``vertices``: one column ``id_col``; ``edges``: undirected pairs
    (``src_col``, ``dst_col``). Returns (``id_col``, ``component``).

    Min-label propagation converges in at most ``diameter`` iterations,
    so ``max_iter`` bounds the component diameter this call can resolve
    (near-dup clusters are shallow; a 30-hop chain is pathological). If
    the fixpoint is NOT reached within ``max_iter``, labels would be
    silently partial — instead the exit is checked: ``on_unconverged``
    is ``"raise"`` (default) or ``"warn"``.
    """
    labels = vertices.select(
        F.col(id_col).alias("v"), F.col(id_col).alias("comp")
    ).localCheckpoint(eager=True)
    # materialize the edge frame ONCE before the two-direction union:
    # the union's branches are separate consumers of the edges lineage,
    # so an expensive upstream (LSH candidate generation + exact-cosine
    # verify) would otherwise execute twice inside the bidir checkpoint
    # (measured at sf10: dedup_cc_clusters 37 → ~21 s, the CC loop
    # itself being only ~4 s / ~5 rounds on the shallow near-dup graph)
    edges = edges.select(
        F.col(src_col).alias("v"), F.col(dst_col).alias("u")
    ).localCheckpoint(eager=True)
    bidir = edges.union(
        edges.select(F.col("u").alias("v"), F.col("v").alias("u"))
    ).localCheckpoint(eager=True)

    prev_sum = None
    converged = False
    for _ in range(max_iter):
        # plain min-label step. Pointer jumping (comp(v) ← comp(comp(v)))
        # was measured at sf10 and REJECTED: near-dup graphs are shallow
        # (5 rounds to fixpoint at 1M vertices), so the extra
        # vertex-sized self-join per round costs more than the one round
        # it saves (6.1 s vs 4.1 s loop total) — revisit only if a
        # deep-diameter graph ever shows up here.
        msgs = bidir.join(labels, "v").select(F.col("u").alias("v"), "comp")
        labels = (
            labels.union(msgs)
            .groupBy("v")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        msg = (
            f"connected_components did not reach its fixpoint within "
            f"max_iter={max_iter} iterations (component diameter exceeds "
            f"the bound); labels are partial — raise max_iter"
        )
        if on_unconverged == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select(F.col("v").alias(id_col), F.col("comp").alias("component"))
