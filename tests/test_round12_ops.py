"""Round-12 surfaces: graph-ANN build scaling law (bits(n) schedule +
hard per-bucket candidate cap — the round-11 verdict's lead item)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream_processor_spark.operators import graphann as ga

SF_SMALL = "/root/testdata/sf0.001"


def test_graph_bits_schedule():
    """bits(n) = round(log2(n/cap)), floored at the fixture value and
    saturated at the flat-hub-mesh ceiling; monotone in n."""
    assert ga.graph_bits_for(500) == ga.GRAPH_BITS  # fixture scale
    assert ga.graph_bits_for(32) == ga.GRAPH_BITS  # n <= target
    assert ga.graph_bits_for(20_000) == 9
    assert ga.graph_bits_for(200_000) == 13
    assert ga.graph_bits_for(2_000_000) == ga.GRAPH_BITS_CEIL  # saturated
    assert ga.graph_bits_for(10**9) == ga.GRAPH_BITS_CEIL
    vals = [ga.graph_bits_for(n) for n in (100, 1000, 10**4, 10**5, 10**6, 10**7)]
    assert vals == sorted(vals)
    # the cap is a SKEW guard, 4x above the schedule's expected bucket —
    # typical buckets must clear it wherever the schedule is unsaturated
    assert ga.GRAPH_MAX_BUCKET == 4 * ga.GRAPH_TARGET_BUCKET
    for n in (5_000, 50_000):
        b = ga.graph_bits_for(n)
        if b < ga.GRAPH_BITS_CEIL:
            assert n / (1 << b) <= 2 * ga.GRAPH_TARGET_BUCKET
            assert n / (1 << b) <= ga.graph_cap_for(n, b) / 2


def test_graph_cap_schedule_covers_corpus():
    """Round 15: the cap keeps >= 4x headroom over the EXPECTED bucket
    at EVERY corpus size — a frozen cap at the bits ceiling left a
    2M-vector corpus with a 524k-candidate dst pool (26% retrievable,
    recall 0.38 on dispersed geometry). 2^bits * cap must always cover
    the corpus with slack, and the floor keeps the r12 constant where
    the schedule is unsaturated."""
    for n in (5_000, 50_000, 200_000, 2_000_000, 50_000_000):
        b = ga.graph_bits_for(n)
        cap = ga.graph_cap_for(n, b)
        assert cap >= ga.GRAPH_MAX_BUCKET
        assert cap >= 4 * (n / (1 << b))  # headroom over expected bucket
        assert (1 << b) * cap >= n  # dst pool covers the corpus
    # unsaturated regime: the scaled cap stays near the r12 constant
    # (exactly it when the schedule lands on-target; within 2x at the
    # rounding's sqrt(2) worst case)
    assert ga.graph_cap_for(2_048) == ga.GRAPH_MAX_BUCKET
    assert ga.graph_cap_for(5_000) <= 2 * ga.GRAPH_MAX_BUCKET
    # saturated regime: the cap grows with the corpus
    assert ga.graph_cap_for(2_000_000) > ga.GRAPH_MAX_BUCKET


def _edge_sets(spark, name):
    rows = spark.table(name).select("src", "dst").collect()
    return {(int(r[0]), int(r[1])) for r in rows}


def test_graph_capped_build_matches_uncapped(spark):
    """With the cap above every bucket population the capped (numpy,
    broadcast-model, no pair shuffle) build must produce EXACTLY the
    uncapped JVM pair-join's edge set — pins the scaled-int64 arithmetic
    parity between `npkernel` and `similarity.cosine` on the build
    path, not just the serve path."""
    (uncapped,) = ga.ensure_graph_index(spark, SF_SMALL)
    (capped,) = ga.ensure_graph_index(spark, SF_SMALL, max_bucket=10_000)
    try:
        assert _edge_sets(spark, capped) == _edge_sets(spark, uncapped)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {capped}")


def test_graph_cap_enforced_and_serveable(spark):
    """A tight cap must hold as a HARD bound: every edge's dst lies in
    its own bucket's `cap` smallest vec_ids (the retained backbone),
    per-src local degree stays <= m, hubs survive truncation (hub = min
    id, always retained), and the capped graph still serves sane
    top-10s."""
    from stream_processor_spark.catalog import Tables

    cap = 4
    (name,) = ga.ensure_graph_index(spark, SF_SMALL, max_bucket=cap)
    try:
        bkt = (
            Tables(spark, SF_SMALL)
            .embeddings.select(
                "vec_id",
                "embedding",
                ga._bucket_col(F.col("embedding"), ga.GRAPH_BITS).alias("b"),
            )
            .collect()
        )
        by_bucket: dict[int, list[int]] = {}
        emb_by_id = {}
        for r in bkt:
            by_bucket.setdefault(int(r[2]), []).append(int(r[0]))
            emb_by_id[int(r[0])] = np.asarray(r[1], dtype=np.float64)
        allowed = {
            b: set(sorted(ids)[:cap]) for b, ids in by_bucket.items()
        }
        assert any(len(ids) > cap for ids in by_bucket.values()), (
            "fixture must actually exercise truncation"
        )
        bucket_of = {
            v: b for b, ids in by_bucket.items() for v in ids
        }
        edges = spark.table(name).select("src", "dst").collect()
        degree: dict[int, int] = {}
        hubs = {min(ids) for ids in by_bucket.values()}
        for r in edges:
            s, d = int(r[0]), int(r[1])
            assert d in allowed[bucket_of[d]], (s, d)
            if s not in hubs or d not in hubs:
                degree[s] = degree.get(s, 0) + 1
        assert degree and max(degree.values()) <= ga.GRAPH_M
        # every corpus node has out-edges (the src side is never capped)
        assert {int(r[0]) for r in edges} == set(emb_by_id)
        got = ga.graph_query_indexed(
            spark, name, emb_by_id[0], topk=10
        ).collect()
        assert len(got) == 10
        assert got[0].cosine == pytest.approx(1.0)  # finds the query itself
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_hamming_point_read_fast_path(spark):
    """The driver-side parquet point read must agree with the Spark
    lookup on a present id, report absence as None (so the caller's
    loud-failure guard still fires), and the serve must stay correct
    end to end."""
    from stream_processor_spark.operators import annindex as ai

    (sig_name,) = ai.ensure_sign_index(spark, SF_SMALL)
    sigs = spark.table(sig_name)
    row = ai._point_read_row(sigs, "vec_id", 0, ["sig_lo", "sig_hi"])
    assert row is not None, "small layout must take the point-read path"
    jrow = sigs.filter("vec_id = 0").select("sig_lo", "sig_hi").head()
    assert row == (jrow[0], jrow[1])
    assert (
        ai._point_read_row(sigs, "vec_id", -999, ["sig_lo", "sig_hi"]) is None
    )
    with pytest.raises(ValueError, match="not found"):
        ai.hamming_query_indexed(spark, sig_name, query_vec_id=-999)
    top = ai.hamming_query_indexed(spark, sig_name, query_vec_id=0).collect()
    assert top[0].vec_id == 0 and top[0].hamming == 0


def test_graph_auto_params_regimes(spark):
    """Auto defaults: the oracle-replayed fixture profile (bits=4,
    uncapped) at every oracle scale, the schedule + hard cap above —
    so registered entries stay hash-green AND a routed build at 2M
    vectors never runs the quadratic bits=4 pair join."""
    assert ga.graph_auto_params(spark, SF_SMALL) == (ga.GRAPH_BITS, None)
    assert ga.graph_auto_params(spark, "/root/testdata/sf0.01") == (
        ga.GRAPH_BITS,
        None,
    )
    assert ga.graph_auto_params(spark, "/root/testdata/sf0.1") == (
        ga.GRAPH_BITS,
        None,
    )
    scratch = "/root/repo/.scratch/sf1"
    import os

    if os.path.exists(os.path.join(scratch, "embeddings.parquet")):
        bits, cap = ga.graph_auto_params(spark, scratch)
        assert bits == ga.graph_bits_for(20_000) == 9
        assert cap == ga.graph_cap_for(20_000, 9)
