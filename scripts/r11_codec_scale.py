#!/usr/bin/env python
"""Round-11 continuation: codec-family scale rehearsal.

The new real codecs (GIF/LZW, G.711, IMA-ADPCM, MJPEG-AVI, mixed-format
dispatch) are map-only operators — the scale question is Arrow-crossing
+ pure-Python decode throughput over MANY SMALL payloads (the thumbnail/
telephony-snippet shape of a real multimodal corpus), not shuffle
geometry. This rehearsal replicates the sf0.1 documents table 10x
(sf1-equivalent, 50k docs) and 100x (sf10-equivalent, 500k docs),
runs every codec entry end to end (fixture ENCODE + real DECODE per
row), and times the same oracle SQL in DuckDB on the same parquet —
including the recursive-CTE ADPCM trajectory replay at 13.5M recursive
steps.

Writes docs/CODECS_SCALE_r11.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(ROOT, ".scratch")

ENTRIES = [
    "multimodal_gif_stats",
    "multimodal_gif_interlaced",
    "multimodal_ulaw_stats",
    "multimodal_alaw_stats",
    "multimodal_adpcm_stats",
    "multimodal_jpeg_stats",
    "multimodal_jpeg_progressive_stats",
    "multimodal_jpeg_restart_stats",
    "multimodal_png_adam7",
    "multimodal_png_paletted",
    "multimodal_png_rgba",
    "multimodal_mjpeg_frames",
    "multimodal_mixed_stats",
    "multimodal_decode_resilient",
]


def generate(spark, replicas: int, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    # the oracle harness registers every table in the dir — symlink the
    # ones this rehearsal does not scale
    for name in os.listdir(SRC):
        link = os.path.join(dst, name)
        if name != "documents.parquet" and not os.path.exists(link):
            os.symlink(os.path.join(SRC, name), link)
    if os.path.exists(os.path.join(dst, "documents.parquet", "_SUCCESS")):
        return
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    n = docs.count()
    out = None
    for r in range(replicas):
        part = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(r * n)).cast("long")
        )
        out = part if out is None else out.unionByName(part)
    (
        out.repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "documents.parquet"))
    )


def time_spark(spark, name: str, sf_dir: str, runs: int = 2) -> float:
    from stream_processor_spark.queries import REGISTRY

    fn = REGISTRY[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def time_duck(name: str, sf_dir: str, runs: int = 2) -> float:
    from stream_processor_spark.queries import REGISTRY
    from tests.oracle_harness import duck_con

    sql = REGISTRY[name].oracle
    best = float("inf")
    for _ in range(runs):
        con = duck_con(sf_dir)
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
        con.close()
    return best


def main() -> None:
    from stream_processor_spark.session import get_spark

    spark = get_spark("codec-scale")
    spark.sparkContext.setLogLevel("ERROR")

    report = {"src": SRC, "scales": {}}
    for replicas, label in ((10, "sf1_equiv"), (100, "sf10_equiv")):
        dst = os.path.join(SCRATCH, f"codecs_x{replicas}")
        generate(spark, replicas, dst)
        n_docs = spark.read.parquet(
            os.path.join(dst, "documents.parquet")
        ).count()
        rows = {}
        for name in ENTRIES:
            s = time_spark(spark, name, dst)
            d = time_duck(name, dst)
            rows[name] = {
                "spark_s": round(s, 3),
                "duckdb_oracle_s": round(d, 3),
                "ratio": round(s / d, 2) if d > 0 else None,
                "docs_per_s": round(n_docs / s),
            }
            print(f"x{replicas} {name:28s} spark {s:7.2f}s  duck {d:7.2f}s "
                  f"({n_docs / s:,.0f} docs/s)", flush=True)
        report["scales"][label] = {"n_docs": n_docs, "entries": rows}

    out = os.path.join(ROOT, "docs", "CODECS_SCALE_r11.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
