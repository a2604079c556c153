#!/usr/bin/env python
"""Round-16 straggler A/B at sf10: text_collocations_lift, the one
UNTRIED shape named by the round-15 verdict (item 4).

A = current registry shape (string-keyed bigram aggregate, two
    string-keyed dictionary joins).
B = hash-only bigram aggregate: the bigram counts group by
    (xxhash64(w1), xxhash64(w2)) — NO string columns and NO first()
    buffers cross the aggregate (the r15-falsified variant carried
    first(w1)/first(w2) through it; this one carries none) — and the
    w1/w2 strings plus unigram counts are re-attached AFTER the
    c12 >= 5 filter by joining the unigram dictionary (tok, c,
    h=xxhash64(tok)) on each hash. The unigram aggregate stays
    string-keyed: it IS the dictionary that re-attaches the strings
    (any distinct-token table costs one string shuffle), and it was
    never the dominant cost. Hash-keying relies on the engine's
    documented xxhash64 collision convention (text_rarity_score,
    shingle keys); identity is asserted on the fixture before timing.

ABBA-interleaved best-of-N in one session; identity asserted first.

Usage: PYTHONPATH=scripts python scripts/r16_strag_ab.py [n_runs] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_colloc_a(spark, sf_dir):
    from stream_processor_spark.queries import REGISTRY

    return REGISTRY["text_collocations_lift"].fn(spark, sf_dir)


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
    # hash-only bigram aggregate: two longs per row cross the exchange
    big_h = (
        d.filter(F.size("tk") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(
            F.xxhash64("p.w1").alias("h1"),
            F.xxhash64("p.w2").alias("h2"),
        )
    )
    c12 = big_h.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("c12"))
    uni = (
        d.select(F.explode("tk").alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    u1 = uni.select(
        F.xxhash64("tok").alias("h1"),
        F.col("tok").alias("w1"),
        F.col("c").alias("c1"),
    )
    u2 = uni.select(
        F.xxhash64("tok").alias("h2"),
        F.col("tok").alias("w2"),
        F.col("c").alias("c2"),
    )
    return (
        c12.filter(F.col("c12") >= 5)
        .join(u1, "h1")
        .join(u2, "h2")
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


def loadavg() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf10"

    from stream_processor_spark.session import get_spark

    spark = get_spark("r16-strag-ab")
    spark.sparkContext.setLogLevel("ERROR")

    a = [tuple(r) for r in build_colloc_a(spark, sf_dir).collect()]
    b = [tuple(r) for r in build_colloc_b(spark, sf_dir).collect()]
    print(f"identity: {a == b} n={len(a)}", flush=True)
    assert a == b

    shapes = {
        "colloc_registry": lambda: build_colloc_a(spark, sf_dir),
        "colloc_hashkeys": lambda: build_colloc_b(spark, sf_dir),
    }
    times: dict[str, list[float]] = {n: [] for n in shapes}
    for rnd in range(n_runs):
        order = list(shapes) if rnd % 2 == 0 else list(reversed(list(shapes)))
        for name in order:
            df = shapes[name]()
            spark.sparkContext.setJobDescription(f"strag16: {name}")
            la0 = loadavg()
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            spark.sparkContext.setJobDescription(None)
            print(
                f"round{rnd} {name}: {dt:.3f} load_at_start={la0:.1f}",
                flush=True,
            )
    for name, ts in times.items():
        ts = sorted(ts)
        print(
            f"{name:16s} best={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(x, 3) for x in ts]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
