"""Property checks for the round-5 layout + time-series additions:
Morton key bijectivity (Spark expr vs a pure-Python mirror), quantile
bucket monotonicity, and truncated-EWMA equivalence against a
brute-force pandas recompute."""

from __future__ import annotations

import math
import random

import pandas as pd

from pyspark.sql import functions as F

from stream_processor_spark.catalog import Tables
from stream_processor_spark.operators.storage import (
    morton_sql,
    quantile_bucket_expr,
)
from stream_processor_spark.queries import REGISTRY

_MASKS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread_py(v: int) -> int:
    v &= 0xFFFF
    for s, m in _MASKS:
        v = (v | (v << s)) & m
    return v


def _morton_py(x: int, y: int) -> int:
    return _spread_py(x) | (_spread_py(y) << 1)


def test_morton_matches_python_mirror_and_is_bijective(spark):
    rng = random.Random(42)
    pairs = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(1000)]
    pairs += [(0, 0), (65535, 65535), (0, 65535), (65535, 0), (1, 2)]
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", F.expr(morton_sql("x", "y")).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_py(x, y), (x, y, z)
    # bijective on distinct pairs
    assert len(set(got.values())) == len(set(pairs))
    # interleave property: morton of (x, y) fits in 32 bits
    assert all(0 <= z < (1 << 32) for z in got.values())


def test_quantile_bucket_is_monotone_and_balanced(spark, sf_dir):
    t = Tables(spark, sf_dir)
    e = t.events
    bucketed = e.select(
        "event_id", quantile_bucket_expr(e, "event_id", 4).alias("b")
    ).collect()
    by_id = sorted((r.event_id, r.b) for r in bucketed)
    # monotone in the value
    for (_, b1), (_, b2) in zip(by_id, by_id[1:]):
        assert b1 <= b2
    # every bucket index in range; occupancy roughly balanced (exact
    # quantiles on a near-uniform key -> no bucket more than 2x the mean)
    counts: dict[int, int] = {}
    for _, b in by_id:
        assert 0 <= b < 16
        counts[b] = counts.get(b, 0) + 1
    mean = len(by_id) / len(counts)
    assert max(counts.values()) <= 2 * mean


def test_ewma_matches_bruteforce(spark, sf_dir):
    spec = REGISTRY["ts_ewma_truncated"]
    got = {
        (r.user_id, r.event_id): r.ewma
        for r in spec.fn(spark, sf_dir).collect()
    }
    ev = (
        Tables(spark, sf_dir)
        .events.select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    weights = [500000, 250000, 125000, 62500]
    for user, grp in ev.groupby("user_id"):
        vqs = [math.floor(v * 100.0 + 0.5) for v in grp["value"]]
        for i, event_id in enumerate(grp["event_id"]):
            num = den = 0
            for k, w in enumerate(weights):
                if i - k >= 0:
                    num += w * vqs[i - k]
                    den += w
            expect = num / den / 100.0
            assert got[(user, event_id)] == expect, (user, event_id)


def test_scd2_intervals_cover_and_partition_time(spark, sf_dir):
    """Per user: intervals are disjoint, ordered, alternate event_type
    between consecutive rows, and the last interval is open-ended."""
    spec = REGISTRY["scd2_intervals"]
    rows = spec.fn(spark, sf_dir).collect()
    df = pd.DataFrame(
        [(r.user_id, r.event_type, r.valid_from, r.valid_to) for r in rows],
        columns=["user_id", "event_type", "valid_from", "valid_to"],
    )
    for _, grp in df.groupby("user_id"):
        grp = grp.sort_values("valid_from").reset_index(drop=True)
        assert grp["valid_to"].iloc[-1] is None or pd.isna(
            grp["valid_to"].iloc[-1]
        )
        for i in range(len(grp) - 1):
            assert grp["valid_to"].iloc[i] == grp["valid_from"].iloc[i + 1]
            assert grp["event_type"].iloc[i] != grp["event_type"].iloc[i + 1]
