#!/usr/bin/env python
"""Round-7 sf100 record for the COMBINED IVF+PQ index.

At 2M vectors (.scratch/sf100): build-once cost (coarse Lloyd fit + PQ
codebook fit + one assign+encode pass) vs the compound-pruned serve
(nprobe=3 partition-pruned codes scan × 8-id ADC + pushed-down rerank),
plus the 3-query batched serve. The comparison twins are in
docs/SF100_TRAINED_r7.json: IVF-trained-only serve 0.69 s (scans floats
of 3/10 partitions), PQ-only serve 0.42 s (scans ALL 2M code rows) —
IVF+PQ scans codes of only the probed partitions.

Output: docs/SF100_IVFPQ_r7.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/repo/.scratch/sf100"


def noop_time(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    spark = get_spark("sf100-ivfpq", master="local[32]")
    spark.sparkContext.setLogLevel("WARN")

    out = {"sf_dir": SF_DIR, "embeddings": 2_000_000}

    name = "sim_ann_ivfpq_indexed"
    t0 = time.perf_counter()
    df = REGISTRY[name].fn(spark, SF_DIR)  # triggers the index build
    build = time.perf_counter() - t0
    first = noop_time(df)
    serve = min(noop_time(REGISTRY[name].fn(spark, SF_DIR)) for _ in range(2))
    out[name] = {
        "index_build_sec": round(build, 2),
        "first_serve_sec": round(first, 2),
        "steady_serve_sec": round(serve, 2),
    }
    print(name, out[name], flush=True)

    mname = "sim_ann_ivfpq_multiquery"
    multi = min(noop_time(REGISTRY[mname].fn(spark, SF_DIR)) for _ in range(2))
    out[f"{mname}_3q_sec"] = round(multi, 2)
    print(mname, multi, flush=True)

    with open("docs/SF100_IVFPQ_r7.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
