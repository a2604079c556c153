"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join handling splits oversized SHUFFLE partitions, but two
shapes still need explicit salting at 100 TB:

- ``salted_agg``: a groupBy where one key holds a large fraction of all
  rows (power-law entity). Two-phase: aggregate on (key, salt) first —
  spreading the hot key over N reducers — then merge the N partials.
  Works for any associative aggregate; exactness preserved for the
  fixed-point sums used across this engine.
- ``replicate_broadcast_join``: joining a skewed fact key against a small
  table is already solved by broadcasting (no shuffle at all) — provided
  the small side IS broadcast. The helper forces it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, Callable[[], Column]],
    merges: dict[str, Callable[[str], Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    ``partials[name]()`` builds the phase-1 aggregate expression;
    ``merges[name](col)`` merges the per-salt partials (e.g. sum of sums,
    sum of counts; avg = merged sum / merged count downstream).
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr().alias(f"__p_{name}") for name, expr in partials.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[merge(f"__p_{name}").alias(name) for name, merge in merges.items()]
    )


def replicate_broadcast_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Skew-immune dimension join: broadcast the dim, never shuffle the fact."""
    return fact.join(F.broadcast(dim), on, how)


def salted_shuffle_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-immune fact-fact equi-join (neither side broadcastable).

    The skewed probe side gets a random salt in [0, N); the other side is
    replicated N× with every salt value, and the join key becomes
    (key, salt) — a hot key's rows now land on N reducers instead of one.
    Join RESULTS are identical to the unsalted join (each skewed row
    still meets every matching other-side row exactly once, through its
    single salt replica), so correctness is oracle-checkable while the
    salt only reshapes the shuffle.

    Cost model: N× replication of the smaller-but-unbroadcastable side
    vs an N-way split of the hottest reducer — the classic pre-AQE skew
    fix, still needed when AQE's split granularity (one shuffle block)
    is coarser than one hot KEY, e.g. a single key holding >1 partition
    of rows on the BUILD side of a sort-merge join.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        # The build side is replicated salt_buckets times before the join,
        # so any join that preserves unmatched BUILD rows (right/full)
        # would emit each of them salt_buckets times. Only probe-side-
        # preserving joins keep results identical to the unsalted join.
        raise ValueError(
            f"salted_shuffle_join supports probe-side-preserving joins "
            f"{sorted(allowed)}; got how={how!r} (unmatched build rows "
            f"would be duplicated {salt_buckets}x)"
        )
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    probe = skewed.withColumn("__salt", salt)
    build = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return probe.join(build, [key, "__salt"], how).drop("__salt")
