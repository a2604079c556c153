"""Partition-count invariance: the engine's determinism claims say NO
query result may depend on parallelism — fixed-point sums make merge
order irrelevant, hash-rank sampling is partitioning-free, window
tie-breaks are total. Pin it: run a representative slice of the
registry under shuffle.partitions=32 (the suite default) and again
under a deliberately awkward 5 — sorted collected rows must be
IDENTICAL (exact equality, doubles included: the discipline guarantees
bit-equality, not tolerance-equality).

The slice covers every mechanism the claim rests on: partial-combined
fixed-point aggregates, two-level distinct, window functions with
tie-breaks, hash-rank samples, LSH banding, the distributed prefix sum,
min_by structs, and a decorrelated TPC-H composite.
"""

from __future__ import annotations

import pytest

from stream_processor_spark.queries import REGISTRY

QUERIES = [
    "agg_groupby_basic",       # fixed-point partial sums
    "agg_count_distinct",      # two-phase distinct
    "window_rank",             # window tie-breaks
    "sample_uniform_k",        # hash-rank top-k
    "sample_temperature",      # per-stratum hash rank + quotas
    "corpus_shard_by_tokens",  # distributed prefix sum
    "dedup_near",              # LSH banding + hot-bucket cap
    "ts_ohlc",                 # min_by/max_by struct ordering
    "ts_ewma_truncated",       # lag windows + exact division
    "tpch_q21_shape",          # bounded-state decorrelation
    "profile_correlations",    # one-pass moment sums
    "merge_upsert",            # full-outer coalesce
    # round-7 session B mechanisms
    "retrieval_hybrid_rrf",    # two top-k legs + integer rank fusion
    "join_incremental_mv_retract",  # signed-weight delta fold
    "corpus_vocab_growth",     # MIN-bucket first occurrence + running sum
    "feature_hashing_vectorizer",   # hashing-trick bucket counts
    "dq_anomaly_mad",          # interpolated percentiles (dyadic-exact)
]


def _rows(spark, name, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_partition_count_cannot_change_results(spark, sf_dir, name):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _rows(spark, name, sf_dir)
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = _rows(spark, name, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert a == b, f"{name}: results differ between 32 and 5 partitions"
    assert len(a) > 0
