#!/usr/bin/env python
"""Round-14 refresh (round-13 verdict item 5): EVERY routed (indexed) serve at sf100 —
600M lineitem / 150M orders / 5M documents / 2M embeddings, 10x the
usual sf10 rehearsal on the fact tables.

Round-14 surface: SF100_ROUTED_r12 predates the graph serve/append
rework, the routed DLQ extraction, the round-13 closing commits, AND
the round-14 Zipf-vocabulary documents regeneration. This re-records
every route on the current tree and the current corpus. The BM25-family
absolute times are NOT comparable to r12's (the corpus vocabulary
changed BY DESIGN — see docs/BM25_ZIPF_r14.json); every other route
compares 1:1 against docs/SF100_ROUTED_r12.json.

One session: Router.ensure_all builds every layout, then each route's
indexed serve is timed (min of 2 warm runs, noop sink). This is the
100 TB-direction datapoint: serve costs should track the layout-pruned
work (nprobe lists, matched postings, banded buckets, bucket-pair
zips), not the corpus size.

Writes docs/SF100_ROUTED_r14.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/repo/.scratch/sf100"


def main() -> None:
    # one 48g JVM: the 600M-row bucketed-fact write OOMs the 8g default
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.router import ROUTES, Router
    from stream_processor_spark.session import get_spark

    spark = get_spark("sf100-routed-r14")
    spark.sparkContext.setLogLevel("ERROR")

    r = Router(spark, SF)
    t0 = time.perf_counter()
    manifest = r.ensure_all()
    build_sec = round(time.perf_counter() - t0, 1)
    print(f"ensure_all: {build_sec}s", flush=True)

    serves: dict[str, list[float]] = {}
    resolution: dict[str, str] = {}
    for name in sorted(ROUTES):
        entry, how = r.resolve(name)
        resolution[name] = f"{entry} ({how})"
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = REGISTRY[entry].fn(spark, SF)
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 2))
        serves[name] = runs
        print(name, "->", entry, runs, flush=True)

    rec = {
        "experiment": "r14_routed_serves_sf100",
        "sf_dir": SF,
        "date": "2026-08-16",
        "rows": {
            "lineitem": 600_000_000,
            "orders": 150_000_000,
            "documents": 5_000_000,
            "embeddings": 2_000_000,
        },
        "ensure_all_build_sec": build_sec,
        "build_manifest": manifest,
        "resolution": resolution,
        "routed_serve_sec": serves,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "docs", "SF100_ROUTED_r14.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "build_manifest"}))
    spark.stop()


if __name__ == "__main__":
    main()
