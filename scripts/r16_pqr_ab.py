#!/usr/bin/env python
"""Interleaved A/B for the round-16 sim_ann_pq_residual re-plan.

A = the round-15 registry shape (inline replica: single slim (vec_id, rv)
lazy persist; coarse fit re-embedded by the coding pass; wide shortlist
carrying embedding + __cl).
B = the current registry shape (three per-invocation lazy persists at the
model boundaries — cent / bres / books — slim scoring, per-list base
term, broadcast-semi-join rerank).

Result identity asserted first; then best-of-N interleaved in one session
so host noise hits both shapes equally. BOTH build and execute are timed
(build+exec is the honest total here: the round-16 change removes
Catalyst re-optimization work that the round-15 shape paid partly at
build time and partly per action).

Usage: python scripts/r16_pqr_ab.py [n_runs] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def build_r15(t):
    """Round-15 _pq_residual_frame: single rv_slim persist."""
    import stream_processor_spark.operators.kmeans as kmeans
    import stream_processor_spark.operators.similarity as sim
    import stream_processor_spark.queries.llm_data as ld

    e = t.embeddings
    M, SUB, K = ld._PQ_M, ld._PQ_SUB, ld._PQ_K
    coarse = kmeans.pack_centroids(kmeans.lloyd_fit(e, k=10, iters=2))
    base = (
        sim.fan_out(e)
        .select(
            "vec_id",
            "embedding",
            sim.dot_scaled(F.col("embedding"), F.col("embedding")).alias("__sxx"),
        )
        .crossJoin(F.broadcast(coarse))
        .select(
            "vec_id",
            "embedding",
            "cents",
            F.array_max(
                F.transform(
                    F.col("cents"),
                    lambda c: F.struct(
                        (
                            sim.dot_scaled(F.col("embedding"), c["carr"]).cast("double")
                            / (
                                F.sqrt(F.col("__sxx").cast("double"))
                                * F.sqrt(c["scc"].cast("double"))
                            )
                        ).alias("cos"),
                        c["clabel"].alias("clabel"),
                    ),
                )
            )["clabel"].alias("list_id"),
        )
        .select(
            "vec_id",
            "embedding",
            F.element_at(
                F.filter(F.col("cents"), lambda c: c["clabel"] == F.col("list_id")), 1
            )["carr"].alias("__cl"),
        )
        .select(
            "vec_id",
            "embedding",
            "__cl",
            F.zip_with(
                F.col("embedding"), F.col("__cl"), lambda x, y: x.cast("double") - y
            ).alias("rv"),
        )
    )
    rv_slim = base.select("vec_id", "rv").persist()
    ld._PQR_PERSISTED.append(rv_slim)
    books = kmeans.pack_codebooks(
        kmeans.lloyd_fit_pq(
            rv_slim, n_sub=M, sub_dim=SUB, k=K, iters=ld._PQ_ITERS, vec_col="rv"
        )
    )
    coded = base.crossJoin(F.broadcast(books)).select(
        "vec_id",
        "embedding",
        "__cl",
        kmeans.pq_code_expr("rv", M, SUB).alias("code"),
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    qb = q.crossJoin(F.broadcast(books)).select(
        "qv", kmeans.pq_adc_expr("qv", SUB).alias("__adc")
    )
    score = sim.dot_scaled(F.col("qv"), F.col("__cl")) + kmeans.pq_adc_score(M)
    shortlist_df = (
        coded.crossJoin(F.broadcast(qb))
        .select("vec_id", "embedding", "qv", score.alias("__s"))
        .orderBy(F.col("__s").desc(), F.col("vec_id"))
        .limit(ld._PQR_SHORTLIST)
    )
    return (
        shortlist_df.select(
            "vec_id", sim.cosine(F.col("embedding"), F.col("qv")).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import stream_processor_spark.queries.llm_data as ld
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.session import get_spark

    spark = get_spark("r16-pqr-ab")
    spark.sparkContext.setLogLevel("ERROR")
    t = Tables(spark, sf_dir)

    a = [tuple(r) for r in build_r15(t).collect()]
    ld._pqr_drop_previous()
    b = [tuple(r) for r in ld._pq_residual_frame(t).collect()]
    print(f"identity: {a == b} n={len(a)}")
    assert a == b
    ld._pqr_drop_previous()

    shapes = {
        "r15_slimcache": lambda: build_r15(t),
        "r16_threecache": lambda: ld._pq_residual_frame(t),
    }
    tot: dict[str, list[float]] = {n: [] for n in shapes}
    exc: dict[str, list[float]] = {n: [] for n in shapes}
    for _ in range(n_runs):
        for name, build in shapes.items():
            spark.sparkContext.setJobDescription(f"pqr-ab16: {name}")
            t0 = time.perf_counter()
            df = build()
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            tot[name].append(t2 - t0)
            exc[name].append(t2 - t1)
            spark.sparkContext.setJobDescription(None)
            # both shapes register caches in _PQR_PERSISTED; drop them so
            # the other shape's next run cannot read leftovers
            ld._pqr_drop_previous()
    for name in shapes:
        ts = sorted(tot[name])
        es = sorted(exc[name])
        print(
            f"{name:16s} total best={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"exec best={es[0]:.3f} med={es[len(es) // 2]:.3f} "
            f"all_total={[round(x, 3) for x in ts]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
