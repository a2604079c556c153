#!/usr/bin/env python
"""Round-15 straggler A/B at sf10: the two remaining >2x members.

A (current registry shape) vs candidate B, interleaved best-of-N in one
session; result identity asserted before timing.

  rarity:  B = per-doc (doc_id, gh) pre-aggregate shared by the
           frequency build AND the probe (one corpus tokenize via AQE
           exchange reuse -- the section-6 trick applied to the token
           dictionary).
  colloc:  B = single-pass groupBy(xxhash64(w1,w2)) carrying
           first(w1)/first(w2) (the untried shape named in the r15
           report's candidate list).

Usage: python scripts/r15_strag_ab.py [n_runs] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def build_rarity_a(spark, t):
    from stream_processor_spark.queries import REGISTRY

    return REGISTRY["text_rarity_score"].fn(spark, t)


def build_rarity_b(spark, sf_dir):
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.operators import text as tx

    t = Tables(spark, sf_dir)
    d = t.documents
    tok = d.select(
        "doc_id",
        F.explode(
            F.transform(tx.tokens(F.col("text")), lambda x: F.xxhash64(x))
        ).alias("gh"),
    ).filter(F.col("gh").isNotNull())
    per = tok.groupBy("doc_id", "gh").agg(F.count(F.lit(1)).alias("c"))
    freq = per.groupBy("gh").agg(F.sum("c").alias("cnt"))
    tot = freq.agg(F.sum("cnt").cast("long").alias("n_total"))
    term = F.round(
        F.lit(1e6) * (F.col("n_total").cast("double") / F.col("cnt")), 0
    ).cast("long")
    return (
        per.join(F.broadcast(freq), "gh")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            (
                F.sum(F.col("c") * term).cast("double")
                / (F.lit(1e6) * F.sum("c"))
            ).alias("rarity"),
        )
    )


def build_colloc_a(spark, t):
    from stream_processor_spark.queries import REGISTRY

    return REGISTRY["text_collocations_lift"].fn(spark, t)


def build_colloc_b(spark, sf_dir):
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.operators import text as tx

    t = Tables(spark, sf_dir)
    d = t.documents.filter(F.col("text").isNotNull()).select(
        tx.tokens(F.col("text")).alias("tk")
    )
    pairs = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - 1),
            lambda i: F.struct(
                F.element_at(F.col("tk"), i).alias("w1"),
                F.element_at(F.col("tk"), i + 1).alias("w2"),
            ),
        ),
        lambda s: (s["w1"] != "") & (s["w2"] != ""),
    )
    big = (
        d.filter(F.size("tk") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.xxhash64("p.w1", "p.w2").alias("h"), "p.w1", "p.w2")
    )
    c12 = (
        big.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("c12"),
            F.first("w1").alias("w1"),
            F.first("w2").alias("w2"),
        )
        .drop("h")
    )
    uni = (
        d.select(F.explode("tk").alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    return (
        c12.filter(F.col("c12") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            "c12",
            F.expr("CAST(c12 * 1000000000 AS BIGINT) div (c1 * c2)").alias(
                "lift_scaled"
            ),
        )
        .orderBy(F.col("lift_scaled").desc(), "w1", "w2")
        .limit(30)
    )


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf10"

    from stream_processor_spark.session import get_spark

    spark = get_spark("r15-strag-ab")
    spark.sparkContext.setLogLevel("ERROR")

    shapes = {
        "rarity_A": lambda: build_rarity_a(spark, sf_dir),
        "rarity_B": lambda: build_rarity_b(spark, sf_dir),
        "colloc_A": lambda: build_colloc_a(spark, sf_dir),
        "colloc_B": lambda: build_colloc_b(spark, sf_dir),
    }

    # Identity first: B must reproduce A row-for-row.
    ra = build_rarity_a(spark, sf_dir)
    rb = build_rarity_b(spark, sf_dir)
    diff = ra.exceptAll(rb).count() + rb.exceptAll(ra).count()
    print(f"rarity identity: diff_rows={diff}")
    assert diff == 0, "rarity B != A"
    ca = [tuple(r) for r in build_colloc_a(spark, sf_dir).collect()]
    cb = [tuple(r) for r in build_colloc_b(spark, sf_dir).collect()]
    print(f"colloc identity: equal={ca == cb} n={len(ca)}")
    assert ca == cb, "colloc B != A"

    times: dict[str, list[float]] = {n: [] for n in shapes}
    for _ in range(n_runs):
        for name, build in shapes.items():
            df = build()
            spark.sparkContext.setJobDescription(f"strag-ab: {name}")
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            times[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for name, ts in times.items():
        ts = sorted(ts)
        print(
            f"{name:12s} best={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(x, 3) for x in ts]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
