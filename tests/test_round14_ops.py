"""Round-14 surfaces: the round-13 ADVICE fixes (hamming multiquery
boundary-tie retention when total < topk, graph_auto_params exception
narrowing, append_graph_index frozen-parameter resolution) and the
Spark-fallback graph serve (bucket-cache adjacency: row-identity with
the driver walk, job bounds, LRU eviction under the row budget)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _tiny_tie_corpus(spark, tmp_path, n_pos: int = 3, n_neg: int = 5):
    """A corpus engineered for signature ties: `n_pos` copies of one
    real embedding E (vec_ids 0..) and `n_neg` copies of -E after it.
    Sign signatures are per-dim sign bits, so all copies of E share one
    signature, all copies of -E share the other, and the hamming
    between the two groups is exactly the count of nonzero dims of E —
    deterministic ties at the maximum hamming distance."""
    emb = (
        spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
        .filter("vec_id = 0")
        .select("embedding")
        .head()[0]
    )
    pos = [float(x) for x in emb]
    assert sum(1 for x in pos if x != 0.0) > 0
    neg = [-x for x in pos]
    rows = [(i, pos, 0) for i in range(n_pos)] + [
        (n_pos + i, neg, 1) for i in range(n_neg)
    ]
    d = tmp_path / "ties"
    d.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_hamming_multiquery_keeps_all_boundary_ties(spark, tmp_path):
    """Round-13 ADVICE: with total=8 < topk=10 and 5 rows tying at the
    max hamming (total + counts[max] = 13 > 10), the small-corpus
    fallback must return ALL 8 rows per query. The post-decrement
    `need` (topk - total = 2) kept only 2 of the 5 boundary ties —
    5 rows per query instead of 8 — which the 5-row round-13 test
    could not detect (counts[max] <= topk - total always held there)."""
    from stream_processor_spark.queries.base import REGISTRY

    tiny = _tiny_tie_corpus(spark, tmp_path, n_pos=3, n_neg=5)
    out = REGISTRY["sim_ann_hamming_multiquery"].fn(spark, tiny)
    rows = out.collect()
    # 3 queries x all 8 corpus rows — nothing dropped at the boundary
    assert len(rows) == 24
    per_q: dict[int, set[int]] = {}
    max_h: dict[int, int] = {}
    tie_n: dict[int, int] = {}
    for r in rows:
        q, v, h = int(r.query_id), int(r.vec_id), int(r.hamming)
        per_q.setdefault(q, set()).add(v)
        if h > max_h.get(q, -1):
            max_h[q], tie_n[q] = h, 0
        if h == max_h[q]:
            tie_n[q] += 1
    assert per_q == {q: set(range(8)) for q in (0, 1, 2)}
    for q in (0, 1, 2):
        # the engineered shape really is the bug case: >2 boundary ties
        assert max_h[q] > 0 and tie_n[q] == 5
        # queries 0/1/2 share E's signature: hamming 0 to vec 0/1/2
        assert {r.vec_id for r in rows if r.query_id == q and r.hamming == 0} \
            == {0, 1, 2}


def test_graph_auto_params_propagates_non_analysis_errors(spark, monkeypatch):
    """Round-13 ADVICE: only the missing-table AnalysisException falls
    back to the fixture profile; a transient read/executor failure
    during the count must propagate instead of silently building an
    under-parameterized index."""
    import stream_processor_spark.catalog as cat
    from stream_processor_spark.operators import graphann as ga

    class _Boom:
        def __init__(self, *a, **k):
            pass

        @property
        def embeddings(self):
            raise RuntimeError("executor lost")

    ga._AUTO_N_CACHE.pop(os.path.abspath("/no/such/dir"), None)
    monkeypatch.setattr(cat, "Tables", _Boom)
    with pytest.raises(RuntimeError, match="executor lost"):
        ga.graph_auto_params(spark, "/no/such/dir")
    monkeypatch.undo()
    # the genuinely-missing-table path still reports, doesn't raise
    assert ga.graph_auto_params(spark, "/no/such/dir") == (ga.GRAPH_BITS, None)


def test_append_graph_index_resolves_frozen_params(spark, tmp_path, monkeypatch):
    """Round-13 ADVICE: appending with keyword DEFAULTS to a layout
    BUILT capped must adopt the layout's frozen (bits, m, cap) — from
    the in-process registry or the TBLPROPERTIES the build persists —
    and a contradictory EXPLICIT keyword set must raise instead of
    silently diverging from the frozen-model contract."""
    from stream_processor_spark.operators import graphann as ga

    src = spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
    d = tmp_path / "corpus"
    d.mkdir()
    src.filter("vec_id < 40").write.parquet(str(d / "embeddings.parquet"))
    bits, m, cap = 3, 4, 6
    (edges_name,) = ga.ensure_graph_index(
        spark, str(d), bits=bits, m=m, max_bucket=cap
    )
    # (a) durable record: a fresh process (registry wiped) reads the
    # frozen parameters back from TBLPROPERTIES
    ga._LAYOUT_PARAMS.pop(edges_name, None)
    assert ga._recorded_graph_params(spark, edges_name) == (bits, m, cap)

    # (b) defaults adopt the frozen profile: the candidate pool is
    # derived CAPPED (spy on _dst_pool_from_table's max_bucket)
    seen: dict[str, object] = {}
    real_pool = ga._dst_pool_from_table

    def spy(spark_, edges, bits_, max_bucket_):
        seen["bits"], seen["cap"] = bits_, max_bucket_
        return real_pool(spark_, edges, bits_, max_bucket_)

    monkeypatch.setattr(ga, "_dst_pool_from_table", spy)
    ga._POOL_CACHE.pop(edges_name, None)
    batch = src.filter("vec_id >= 40 and vec_id < 44")
    ga.append_graph_index(spark, edges_name, batch)  # NO keywords
    assert seen == {"bits": bits, "cap": cap}
    # appended nodes are present and reachable (reverse edges exist)
    dsts = {
        int(r[0])
        for r in spark.table(edges_name).select("dst").distinct().collect()
    }
    assert {40, 41, 42, 43} <= dsts

    # (c) contradictory explicit parameters raise
    with pytest.raises(ValueError, match="frozen build parameters"):
        ga.append_graph_index(
            spark, edges_name,
            src.filter("vec_id >= 44 and vec_id < 46"),
            bits=5, m=2, max_bucket=None,
        )


def test_spark_serve_path_parity_and_job_bound(spark, tmp_path):
    """Round-13 verdict item 2: on a NON-local warehouse the serve used
    to pay ~6 sequential jobs/query. The bucket-cache Spark path must
    (a) return rows IDENTICAL to the driver walk for single- and
    multi-query serves, (b) resolve the entry with zero jobs (frozen
    TBLPROPERTIES), and (c) stay within 2 engine reads per cold query
    and 0 jobs per warm-cache query at fixture scale."""
    import numpy as np
    import pyarrow.parquet as pq

    from stream_processor_spark.operators import graphann as ga

    (edges,) = ga.ensure_graph_index(spark, SF_SMALL)
    t = pq.read_table(
        os.path.join(SF_SMALL, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = t.column("vec_id").to_numpy()
    E = (
        t.column("embedding").combine_chunks().flatten().to_numpy()
        .astype(np.float64).reshape(len(ids), -1)
    )
    qs = {0: E[0], 3: E[3], 11: E[11]}

    assert ga._FORCE_SPARK_SERVE is False
    base_single = [tuple(r) for r in ga.graph_query_indexed(spark, edges, E[5]).collect()]
    base_multi = sorted(map(tuple, ga.graph_multi_query_indexed(spark, edges, qs).collect()))
    try:
        ga._FORCE_SPARK_SERVE = True
        ga._SPARK_ADJ_CACHE.pop(edges, None)
        ga._ENTRY_CACHE.pop(edges, None)
        sc = spark.sparkContext
        sc.setJobGroup("r14-cold", "r14-cold")
        got_single = [tuple(r) for r in ga.graph_query_indexed(spark, edges, E[5]).collect()]
        cold_jobs = len(sc.statusTracker().getJobIdsForGroup("r14-cold"))
        sc.setJobGroup("r14-multi", "r14-multi")
        got_multi = sorted(map(tuple, ga.graph_multi_query_indexed(spark, edges, qs).collect()))
        multi_jobs = len(sc.statusTracker().getJobIdsForGroup("r14-multi"))
        # fully-warm repeat: every touched bucket is cached now
        sc.setJobGroup("r14-warm", "r14-warm")
        ga.graph_query_indexed(spark, edges, E[5]).collect()
        ga.graph_multi_query_indexed(spark, edges, qs).collect()
        warm_jobs = len(sc.statusTracker().getJobIdsForGroup("r14-warm"))
        sc.setJobGroup("other", "other")
    finally:
        ga._FORCE_SPARK_SERVE = False
    assert got_single == base_single
    assert got_multi == base_multi
    # entry from TBLPROPERTIES + bucket-batched reads: <=2 engine reads
    # per cold serve (+1 possible result-collect job), 0 once warm
    assert cold_jobs <= 3, f"cold spark serve paid {cold_jobs} jobs"
    assert multi_jobs <= 3, f"cold multiquery serve paid {multi_jobs} jobs"
    assert warm_jobs == 0, f"warm spark serves paid {warm_jobs} jobs"


def test_bucket_adjacency_eviction_and_refetch(spark, monkeypatch):
    """The Spark-path adjacency cache must honor its row budget across
    serves (LRU buckets evicted, never the current need) and refetch
    evicted buckets transparently with identical rows."""
    from stream_processor_spark.operators import graphann as ga

    (edges,) = ga.ensure_graph_index(spark, SF_SMALL)
    df = spark.table(edges)
    adj = ga._BucketCacheAdjacency(spark, df)
    monkeypatch.setattr(ga, "_SPARK_SERVE_MAX_ROWS", 1)  # evict everything evictable

    all_bs = sorted(int(r[0]) for r in df.select("src_b").distinct().collect())
    assert len(all_bs) >= 4
    first, second = set(all_bs[:2]), set(all_bs[2:4])
    adj.ensure(first, set())
    assert first <= set(adj.buckets)
    snap = {
        b: {s: (list(d), e.copy()) for s, (d, e) in adj.buckets[b].items()}
        for b in first
    }
    # a second ensure with a 1-row budget evicts the first buckets
    # (they are not in the new need set) ...
    adj.ensure(second, set())
    assert not (first & set(adj.buckets))
    assert adj.jobs == 2
    # ... and re-needing them refetches identical adjacency
    adj.ensure(first, set())
    assert adj.jobs == 3
    for b in first:
        got = {s: (list(d), e) for s, (d, e) in adj.buckets[b].items()}
        assert set(got) == set(snap[b])
        for s in got:
            assert got[s][0] == snap[b][s][0]
            assert (got[s][1] == snap[b][s][1]).all()


def test_hierarchical_hub_layer_structure(spark):
    """Round 14 retires the flat-mesh 'known scale limit': above
    HUB_MESH_MAX buckets the hub layer is a second NSW level. Pins the
    structural contract on a real hub frame (sf0.01, bits=10 -> 1024
    buckets): (a) level-2 hubs fully meshed; (b) every hub reachable
    from the entry INSIDE the hub layer (star + mesh — the mesh's
    reachability guarantee, preserved); (c) edge volume is O(hubs·m +
    4^(bits/2)), not O(4^bits); (d) every hub has at least one in-edge
    (stays in the append candidate pool's distinct-dst view)."""
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.operators import graphann as ga

    bits = 10
    e = Tables(spark, "/root/testdata/sf0.01").embeddings
    bkt = e.select(
        "vec_id", "embedding",
        ga._bucket_col(F.col("embedding"), bits).alias("b"),
    )
    hubs = {
        int(r[1]): int(r[0])
        for r in bkt.groupBy("b").agg(F.min("vec_id")).collect()
    }  # vec_id -> bucket
    pdf = ga._hub_layer_edges(spark, bkt, bits).toPandas()
    n_hubs = len(hubs)
    assert len(pdf) <= n_hubs * (2 * ga.GRAPH_M + 2) + (1 << bits)
    # src_b is the src hub's LEVEL-1 bucket (partition pruning contract)
    assert all(hubs[int(s)] == int(b) for s, b in zip(pdf["src"], pdf["src_b"]))
    # every hub has an in-edge and an out-edge
    assert set(pdf["src"]) == set(hubs) == set(pdf["dst"])
    # level-2 mesh: min hub per bucket2 fully interconnected
    bits2 = bits // 2
    l2 = {}
    for vid, b in sorted(hubs.items()):
        l2.setdefault(b & ((1 << bits2) - 1), vid)
    pairs = set(zip((int(x) for x in pdf["src"]), (int(x) for x in pdf["dst"])))
    for a in l2.values():
        for c in l2.values():
            if a != c:
                assert (a, c) in pairs
    # reachability: BFS from the entry (global min hub) covers ALL hubs
    adj: dict[int, list[int]] = {}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
    entry = min(hubs)
    seen, todo = {entry}, [entry]
    while todo:
        for d in adj.get(todo.pop(), ()):
            if d not in seen:
                seen.add(d)
                todo.append(d)
    assert seen == set(hubs)


def test_entry_prop_roundtrip_both_formats():
    """The frozen-entry payload round-trips exactly: the r14 b85 form
    (float32 bytes — 4x smaller than JSON, Hive PARAM_VALUE headroom)
    and the earlier JSON form both parse to the identical float64
    embedding."""
    import base64
    import json

    import numpy as np

    from stream_processor_spark.operators import graphann as ga

    emb32 = np.asarray([0.25, -1.5, 3.75, 0.1], dtype="<f4")
    b85 = base64.b85encode(emb32.tobytes()).decode("ascii")
    e1, v1 = ga._parse_entry_prop(f"b85:42:{b85}")
    e2, v2 = ga._parse_entry_prop(
        json.dumps([42, [float(x) for x in emb32]])
    )
    assert e1 == e2 == 42
    assert (v1 == v2).all() and v1.dtype == np.float64
    assert (v1 == emb32.astype(np.float64)).all()


def test_hub_layer_empty_corpus(spark):
    """An empty hub frame yields an empty edge frame (the mesh path's
    behavior), not an np.stack crash."""
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.operators import graphann as ga

    e = Tables(spark, SF_SMALL).embeddings.filter("vec_id < 0")
    bkt = e.select(
        "vec_id", "embedding",
        ga._bucket_col(F.col("embedding"), 10).alias("b"),
    )
    assert ga._hub_layer_edges(spark, bkt, 10).count() == 0


def test_ensure_backfills_props_after_crash_window(spark, tmp_path):
    """A build that crashed between saveAsTable and the property freeze
    leaves a layout without TBLPROPERTIES; the next ensure_graph_index
    call (tableExists early return) must backfill them — otherwise a
    fresh process's append would silently fall back to keyword defaults
    (the round-13 uncapped-append bug, resurrected)."""
    from stream_processor_spark.operators import graphann as ga

    src = spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
    d = tmp_path / "crashwin"
    d.mkdir()
    src.filter("vec_id < 30").write.parquet(str(d / "embeddings.parquet"))
    bits, m, cap = 3, 4, 5
    (edges_name,) = ga.ensure_graph_index(
        spark, str(d), bits=bits, m=m, max_bucket=cap
    )
    # simulate the crash window: strip every frozen property
    for k in ("spark_graft.graph.bits", "spark_graft.graph.m",
              "spark_graft.graph.cap", ga._ENTRY_PROP):
        spark.sql(
            f"ALTER TABLE {edges_name} UNSET TBLPROPERTIES IF EXISTS ('{k}')"
        )
    ga._LAYOUT_PARAMS.pop(edges_name, None)
    ga._ENTRY_CACHE.pop(edges_name, None)
    assert "spark_graft.graph.bits" not in ga._table_props(spark, edges_name)
    (again,) = ga.ensure_graph_index(
        spark, str(d), bits=bits, m=m, max_bucket=cap
    )
    assert again == edges_name
    ga._LAYOUT_PARAMS.pop(edges_name, None)  # force the durable read
    assert ga._recorded_graph_params(spark, edges_name) == (bits, m, cap)
    assert ga._ENTRY_PROP in ga._table_props(spark, edges_name)


def test_append_entry_skips_isolated_batch_min(spark, tmp_path):
    """Freezing the entry to a batch node that received NO edges would
    make every Spark-path serve return only the entry. A batch whose
    global-min node is isolated (its home + Hamming-1 pool buckets hold
    no other candidate) must NOT become the entry; the smallest
    CONNECTED batch node must."""
    import numpy as np

    from stream_processor_spark.operators import graphann as ga

    dim = len(
        spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
        .select("embedding").head()[0]
    )
    pos = [1.0] * dim          # bucket 0b111 under bits=3
    neg = [-1.0] * dim         # bucket 0b000, H1 = {1,2,4} — all empty
    base = [(10 + i, [1.0 + 0.01 * i] * dim, 0) for i in range(6)]
    d = tmp_path / "iso"
    d.mkdir()
    spark.createDataFrame(
        base, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    bits, m, cap = 3, 2, 8
    (edges_name,) = ga.ensure_graph_index(
        spark, str(d), bits=bits, m=m, max_bucket=cap
    )
    assert ga._graph_entry(spark, edges_name, spark.table(edges_name))[0] == 10

    batch = spark.createDataFrame(
        [(0, neg, 1), (1, pos, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    ga.append_graph_index(spark, edges_name, batch)
    # vec 0 is isolated (no candidates anywhere near bucket 0) — the
    # entry must advance to vec 1, the smallest CONNECTED batch node
    entry, emb = ga._graph_entry(spark, edges_name, spark.table(edges_name))
    assert entry == 1
    srcs = {
        int(r[0]) for r in
        spark.table(edges_name).select("src").distinct().collect()
    }
    assert 0 not in srcs and 1 in srcs
    assert entry == min(srcs)  # the frozen prop equals legacy min(src)
    # and the Spark-path serve still walks past the entry
    try:
        ga._FORCE_SPARK_SERVE = True
        ga._SPARK_ADJ_CACHE.pop(edges_name, None)
        got = ga.graph_query_indexed(
            spark, edges_name, np.asarray(pos, dtype=np.float64), bits=bits
        ).collect()
    finally:
        ga._FORCE_SPARK_SERVE = False
    assert len(got) > 1
