"""Semantic invariants for the round-10 operators (beyond the oracle
hash checks): leakage safety of the cluster-granular split, and the
binary-signature ANN's self-consistency."""

from __future__ import annotations

import os

from stream_processor_spark.queries import REGISTRY

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_cluster_split_is_leakage_free_by_construction(spark):
    """The property that makes corpus_split_by_cluster the production
    split: (a) every member of a component gets the SAME split — and so
    (b) no near-dup pair (the edges the clustering was built from) can
    straddle a boundary; (c) the 80/10/10 bands cover every row."""
    rows = REGISTRY["corpus_split_by_cluster"].fn(spark, SF).collect()
    assert rows
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r.component, set()).add(r.split)
        assert r.split in ("train", "val", "test")
        assert 0 <= r.bucket < 100
    assert all(len(s) == 1 for s in by_comp.values())

    split_of = {r.vec_id: r.split for r in rows}
    pairs = REGISTRY["dedup_embedding_cosine"].fn(spark, SF).collect()
    crossers = [
        (p.vec_a, p.vec_b)
        for p in pairs
        if p.cosine > 0.2 and split_of[p.vec_a] != split_of[p.vec_b]
    ]
    assert crossers == []


def test_hamming_signature_self_and_order(spark):
    """The query vector must rank itself first at Hamming 0, and the
    shortlist must be non-decreasing in distance."""
    got = REGISTRY["sim_ann_hamming"].fn(spark, SF).collect()
    assert got[0].vec_id == 0 and got[0].hamming == 0
    dists = [r.hamming for r in got]
    assert dists == sorted(dists) and len(got) == 20
