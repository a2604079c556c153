#!/usr/bin/env python
"""sf1 scale rehearsal: 10x the fact tables, re-run the heaviest queries,
assert the plans keep their shape, record sf0.1 -> sf1 time ratios.

Generates sf1 deterministically from sf0.1 (facts replicated 10x with
shifted order keys — the join graph scales like real growth: dimensions
fixed, facts x10) under .scratch/sf1, then times the five most expensive
headline queries at both scales (best-of-2 noop materializations) and
audits the executed plans:

- no CartesianProduct anywhere;
- dimension joins stay BroadcastHashJoin at sf1 (dims did not grow — a
  demotion would signal a size-estimation problem / OOM risk at 100 TB);
- aggregations keep partial (map-side) combine;
- the orders date filter stays pushed into the parquet scan.

The fact-fact lineitem<->orders edge is deliberately left to Catalyst/AQE;
a broadcast->SortMergeJoin switch at sf1 is healthy and is REPORTED, not
failed. Results go to docs/SCALE.md.

Usage: python scripts/sf1_rehearsal.py [--regen]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
REPLICAS = 10
QUERIES = [
    "agg_groupby_basic",
    "agg_rollup",
    "join_broadcast",
    "join_star_3way",
    "join_star_5way",
    # round 4: corpus operators (documents/embeddings also replicated 10x)
    "sim_topk",
    "sim_ann_ivf",
    "sim_ann_sq8",
    "dedup_near",
    "dedup_simhash",
    "text_bm25",
]


def generate_documents(spark, dst: str, replicas: int) -> None:
    """Replicate the documents table with a ZIPF-TAILED vocabulary.

    Round-14 (round-13 verdict item 3): plain replication kept the
    fixture's 31-token vocabulary, so at sf100 a BM25 query over doc
    0's token set matched 86.5% of the postings index — a degenerate
    shape no real corpus has. The replicas now carry a Zipf-tailed
    synthetic vocabulary: a small deterministic set of replicas
    (max(2, replicas//20), always including replica 0) keeps the
    ORIGINAL text verbatim — exact-duplicate structure preserved for
    the dedup/dup-span records, and doc 0's query tokens keep
    real-but-rare postings — while every other replica rewrites each
    token t at position i to t_<k> with k = floor(V^u) for a per-token
    uniform u, i.e. P(k) ∝ 1/k over V=65536 suffixes, the classic Zipf
    tail. The randomness is xxhash64(doc_id, i, t) (JVM-side, no
    Python LCG — sidestepping the stride-collapse pitfall documented
    in FIXTURES.md), keyed by the SHIFTED doc_id so each replica shard
    draws an independent vocabulary region. The sf0.001/0.01/0.1
    oracle fixtures are untouched."""
    from pyspark.sql import functions as F

    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__rep")
    documents = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    d_off = documents.agg(F.max("doc_id")).collect()[0][0] + 1
    keep_n = max(2, replicas // 20)
    zipf_text = (
        "CASE WHEN __rep < {k} THEN text ELSE array_join(transform("
        "split(text, ' '), (t, i) -> concat(t, '_', cast(pow(65536.0, "
        "pmod(xxhash64(doc_id, i, t), 1000000) / 1000000.0) as bigint))"
        "), ' ') END"
    ).format(k=keep_n)
    (
        documents.repartition(32).select("*", rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(d_off))
        .withColumn("text", F.expr(zipf_text))
        .withColumn(
            "n_chars",
            F.when(F.col("__rep") < keep_n, F.col("n_chars")).otherwise(
                F.length("text")
            ),
        )
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "documents.parquet"))
    )


#: per-REPLICA jitter amplitude range. The sf0.1 base vectors are
#: unit-norm with per-component std 0.125; a replica with amplitude
#: ``a`` takes per-dim offsets uniform in [-a, a], i.e. a perturbation
#: vector of norm ~4.6a and cos(base, replica) ~ 1/sqrt(1+(4.6a)^2).
#: The amplitude itself is uniform per replica in [MIN, MAX] — cos
#: spread ~[0.66, 0.999] — so each base's neighbor distances DECAY
#: smoothly: the exact top-k is the well-separated smallest-amplitude
#: replicas, not a lottery over an equal-radius shell. (A first cut
#: used one fixed amplitude for all replicas; that removed the clique
#: but left every neighbor at cos ~0.91 +/- 0.04, making recall@10 a
#: near-tie coin flip — graded amplitudes are what real corpora look
#: like.)
EMB_JITTER_MIN = 0.01
EMB_JITTER_MAX = 0.25
#: verbatim embedding replicas kept per base vector (replica ids
#: 0..EMB_KEEP-1). Deliberately NOT the documents keep_n=replicas//20
#: schedule: a query's exact top-k is saturated by verbatim twins at
#: cos=1.0, so 50 verbatim copies at sf100 would re-create the clique
#: degeneracy the perturbation exists to remove. ONE verbatim twin per
#: base preserves the exact-duplicate structure the semantic/embedding
#: dedup records need (N_base known dup pairs) while leaving k-1 of
#: every top-k to real geometry.
EMB_KEEP = 2


def generate_embeddings(spark, dst: str, replicas: int) -> None:
    """Replicate the embeddings table with DISPERSED replicas.

    Round-15 (round-14 verdict lead item): verbatim id-shifted replicas
    made every sf10/sf100 base vector a 100/1000-member identical
    clique, so the large-scale ANN recall/serve records measured clique
    structure, not geometry (the vector twin of the 31-token text
    degeneracy round 14 fixed). Replicas >= EMB_KEEP now carry a
    deterministic JVM-side perturbation with a GRADED amplitude: the
    replica's amplitude is uniform in [EMB_JITTER_MIN, EMB_JITTER_MAX]
    from xxhash64(vec_id), its per-dim offsets uniform in [-a, a] from
    xxhash64(vec_id, dim) — keyed by the SHIFTED vec_id so each replica
    draws independent noise (the generate_documents discipline; no
    Python LCG, sidestepping the stride-collapse pitfall in
    FIXTURES.md). Labels are kept: replicas stay in-class, so
    label-conditioned records still make sense. The sf0.001/0.01/0.1
    oracle fixtures are untouched."""
    from pyspark.sql import functions as F

    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__rep")
    embeddings = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    v_off = embeddings.agg(F.max("vec_id")).collect()[0][0] + 1
    amp = (
        "({mn} + ({mx} - {mn}) * (pmod(xxhash64(vec_id), 1000001)"
        " / 1000000.0))"
    ).format(mn=EMB_JITTER_MIN, mx=EMB_JITTER_MAX)
    jitter_emb = (
        "CASE WHEN __rep < {keep} THEN embedding ELSE transform("
        "embedding, (v, i) -> cast(v + ({amp} * (pmod(xxhash64(vec_id, i),"
        " 1000001) / 500000.0 - 1.0)) as float)) END"
    ).format(keep=EMB_KEEP, amp=amp)
    (
        embeddings.repartition(32).select("*", rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * F.lit(v_off))
        .withColumn("embedding", F.expr(jitter_emb))
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "embeddings.parquet"))
    )


def generate(spark, dst: str = DST, replicas: int = REPLICAS) -> None:
    DSTDIR, repl = dst, replicas
    from pyspark.sql import functions as F

    os.makedirs(DSTDIR, exist_ok=True)
    orders = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    offset = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1

    rep = F.explode(F.sequence(F.lit(0), F.lit(repl - 1))).alias("__rep")

    # Parallelize the explode: the sf0.1 source tables are 1-3 parquet
    # splits, so without a pre-repartition the x100/x1000 row explosion
    # runs on 1-3 tasks (measured ~20 min for sf100 lineitem). One cheap
    # shuffle of the SOURCE rows first gives 32-way explode/write.
    # Values are unaffected — the id shift depends only on (__rep, row).
    def _spread(df):
        return df.repartition(32)

    (
        _spread(orders).select("*", rep)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * F.lit(offset))
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(DSTDIR, "orders.parquet"))
    )
    (
        _spread(lineitem).select("*", rep)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * F.lit(offset))
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(DSTDIR, "lineitem.parquet"))
    )
    # corpus tables replicate 10x too (id-shifted so doc_id/vec_id 0 — the
    # query row — stays unique); dimensions stay fixed
    generate_documents(spark, DSTDIR, repl)
    generate_embeddings(spark, DSTDIR, repl)
    for name in ("region", "nation", "customer", "supplier", "part", "events"):
        link = os.path.join(DSTDIR, f"{name}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), link)


def plan_audit(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "cartesian": "CartesianProduct" in plan,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "partial_agg": "partial_" in plan,
        "pushed_filters": "PushedFilters: [IsNotNull" in plan
        or "PushedFilters: [GreaterThan" in plan
        or "PushedFilters: []" not in plan and "PushedFilters" in plan,
    }


def time_query(spark, fn, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    spark = get_spark("sf1-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    if "--regen" in sys.argv or not os.path.exists(os.path.join(DST, "lineitem.parquet")):
        print("generating sf1 from sf0.1 ...", file=sys.stderr)
        generate(spark)

    out = {}
    failures = []
    for name in QUERIES:
        fn = REGISTRY[name].fn
        t_small = time_query(spark, fn, SRC)
        t_big = time_query(spark, fn, DST)
        audit_small = plan_audit(fn(spark, SRC))
        audit_big = plan_audit(fn(spark, DST))
        out[name] = {
            "sf0.1_sec": round(t_small, 3),
            "sf1_sec": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
            "plan_sf0.1": audit_small,
            "plan_sf1": audit_big,
        }
        if audit_big["cartesian"]:
            failures.append(f"{name}: CartesianProduct at sf1")
        if not audit_big["partial_agg"] and audit_small["partial_agg"]:
            failures.append(f"{name}: lost partial aggregation at sf1")
        if audit_big["broadcast_joins"] + audit_big["sort_merge_joins"] < (
            audit_small["broadcast_joins"] + audit_small["sort_merge_joins"]
        ):
            failures.append(f"{name}: fewer joins planned at sf1?")

    print(json.dumps(out, indent=2))
    if failures:
        print("PLAN AUDIT FAILURES:", failures, file=sys.stderr)
        sys.exit(1)
    print("plan audit: OK", file=sys.stderr)


if __name__ == "__main__":
    main()
