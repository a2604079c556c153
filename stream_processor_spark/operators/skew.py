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


def auto_salted_join(
    fact: DataFrame,
    other: DataFrame,
    key: str,
    hot_threshold: int,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-ADAPTIVE fact-fact equi-join (round 9): detect the hot keys
    at runtime and salt ONLY them, instead of paying salt_buckets×
    build-side replication across the whole table the way a blanket
    `salted_shuffle_join` does.

    Phase 1 — detect: one map-side-combined count of fact rows per key;
    keys above ``hot_threshold`` form the hot set (broadcast — by
    definition of "hot" there are few of them; if the hot set were
    large, the keys wouldn't be outliers and AQE's block-granular
    skew split would already cope).
    Phase 2 — split: both sides split hot/cold by a broadcast
    semi/anti join (no shuffle). The cold majority joins normally; the
    hot slice goes through the salted join, replicating only the hot
    build rows.

    Results are identical to the plain join for probe-side-preserving
    join types (the `salted_shuffle_join` argument, applied per slice;
    every fact row lands in exactly one slice), so the plain-join SQL
    remains the oracle. This is the production middle ground the two
    existing operators bracket: `replicate_broadcast_join` when the dim
    fits memory, `salted_shuffle_join` when skew is so pervasive that
    everything is hot."""
    counts = fact.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
    hot = counts.filter(F.col("__n") > hot_threshold).select(key)
    fact_hot = fact.join(F.broadcast(hot), key, "left_semi")
    fact_cold = fact.join(F.broadcast(hot), key, "left_anti")
    other_hot = other.join(F.broadcast(hot), key, "left_semi")
    other_cold = other.join(F.broadcast(hot), key, "left_anti")
    cold = fact_cold.join(other_cold, key, how)
    hotj = salted_shuffle_join(
        fact_hot, other_hot, key, salt_buckets=salt_buckets, how=how
    )
    return cold.unionByName(hotj)
