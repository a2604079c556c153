#!/usr/bin/env python
"""Interleaved A/B for dedup_semantic_indexed's `_sem_dropped` shape
(optimization round 15, guide §2.3/§2.4/§8).

A = current: cand ⋈ cluster(id_a) ⋈ cluster(id_b) → filter same-cluster
    → explicit repartition → ⋈ embedding(id_a) ⋈ embedding(id_b)
    → cosine filter  (4 joins + 1 forced Exchange; embeddings enter the
    plan twice as independent subtrees → shuffled twice at scale)
B = side-frame: side = assigned ⋈ embeddings (once); cand ⋈ side_a
    ⋈ side_b → one conjunctive filter (cluster-eq first, then cosine)
    (2 joins, no forced Exchange; the two side subtrees canonicalize to
    the same shuffle → ReusedExchange at scale)

Rows asserted identical (sorted collect) before any timing.
Interleaved best-of-N timings via the noop sink on one session.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> int:
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.operators import similarity as sim
    from stream_processor_spark.operators.semindex import (
        candidate_pairs_from_index,
        ensure_semantic_index,
    )
    from stream_processor_spark.queries.llm_pipeline import _SEM_TAU
    from stream_processor_spark.session import get_spark

    spark = get_spark("r15-sem-ab")
    spark.sparkContext.setLogLevel("ERROR")
    t = Tables(spark, SF_DIR)
    asn_name, band_name, _ = ensure_semantic_index(spark, SF_DIR)
    assigned = spark.table(asn_name)
    e = t.embeddings

    def variant_a():
        cand = candidate_pairs_from_index(spark, band_name)
        ca = assigned.select(
            F.col("vec_id").alias("id_a"), F.col("cluster_id").alias("cl_a")
        )
        cb = assigned.select(
            F.col("vec_id").alias("id_b"), F.col("cluster_id").alias("cl_b")
        )
        same = (
            cand.join(ca, "id_a")
            .join(cb, "id_b")
            .filter(F.col("cl_a") == F.col("cl_b"))
            .select("id_a", "id_b")
            .repartition(spark.sparkContext.defaultParallelism, "id_a")
        )
        ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        dropped = (
            same.join(ea, "id_a")
            .join(eb, "id_b")
            .withColumn("cos", sim.cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cos") > _SEM_TAU)
            .select(F.col("id_b").alias("vec_id"))
            .distinct()
        )
        return assigned.join(dropped, "vec_id", "left_anti").select(
            "vec_id", "cluster_id"
        )

    def variant_b():
        cand = candidate_pairs_from_index(spark, band_name)
        side = assigned.join(e.select("vec_id", "embedding"), "vec_id")
        sa = side.select(
            F.col("vec_id").alias("id_a"),
            F.col("cluster_id").alias("cl_a"),
            F.col("embedding").alias("va"),
        )
        sb = side.select(
            F.col("vec_id").alias("id_b"),
            F.col("cluster_id").alias("cl_b"),
            F.col("embedding").alias("vb"),
        )
        dropped = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(
                (F.col("cl_a") == F.col("cl_b"))
                & (sim.cosine(F.col("va"), F.col("vb")) > _SEM_TAU)
            )
            .select(F.col("id_b").alias("vec_id"))
            .distinct()
        )
        return assigned.join(dropped, "vec_id", "left_anti").select(
            "vec_id", "cluster_id"
        )

    rows_a = sorted(map(tuple, variant_a().collect()))
    rows_b = sorted(map(tuple, variant_b().collect()))
    assert rows_a == rows_b, (
        f"variant results differ: {len(rows_a)} vs {len(rows_b)} rows"
    )
    print(f"results identical: {len(rows_a)} rows", file=sys.stderr)

    variants = {"A_current": variant_a, "B_sideframe": variant_b}
    times: dict[str, list[float]] = {k: [] for k in variants}
    # one unmeasured warm pass each
    for fn in variants.values():
        fn().write.mode("overwrite").format("noop").save()
    for _ in range(N):
        for name, fn in variants.items():
            df = fn()
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        print(
            f"{name:14s} best={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(x, 3) for x in ts]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
