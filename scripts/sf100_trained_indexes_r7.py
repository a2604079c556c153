#!/usr/bin/env python
"""Round-7 sf100 record for the TRAINED persisted-ANN serving paths.

At 2M vectors (.scratch/sf100), measure build-once vs serve for the two
round-7 layouts, next to their fit-per-query twins:

- `sim_ann_pq_indexed`: PQ codebook training + 2M-vector code write vs
  the literal-map codes-scan shortlist + pushed-down rerank;
  `sim_ann_pq_trained` refits Lloyd and rescans floats per query.
- `sim_ann_ivf_trained_indexed`: Lloyd training + partitioned list
  write vs the partition-pruned serve; `sim_ann_ivf_trained` refits
  per query.
- `sim_ann_pq_multiquery` / `sim_ann_sq8_multiquery`: N=3 queries in
  one pass (amortization evidence for the batched serves).

Output: docs/SF100_TRAINED_r7.json.
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


def record(out, spark, REGISTRY, indexed_name, scratch_name):
    t0 = time.perf_counter()
    df = REGISTRY[indexed_name].fn(spark, SF_DIR)  # triggers build
    build = time.perf_counter() - t0
    first = noop_time(df)
    serve = min(
        noop_time(REGISTRY[indexed_name].fn(spark, SF_DIR)) for _ in range(2)
    )
    out[indexed_name] = {
        "index_build_sec": round(build, 2),
        "first_serve_sec": round(first, 2),
        "steady_serve_sec": round(serve, 2),
    }
    print(indexed_name, out[indexed_name], flush=True)
    if scratch_name:
        # ONE run: the twin refits the model per query, which is the
        # whole point of the record — repeating a multi-minute fit for
        # a best-of-2 buys nothing at this scale
        per_query = noop_time(REGISTRY[scratch_name].fn(spark, SF_DIR))
        out[f"{scratch_name}_per_query_sec"] = round(per_query, 2)
        print(f"{scratch_name} per-query:", per_query, flush=True)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    out: dict = {"sf_dir": SF_DIR, "embeddings": 2_000_000}
    spark = get_spark("sf100-trained-indexes")
    spark.sparkContext.setLogLevel("ERROR")

    record(out, spark, REGISTRY, "sim_ann_pq_indexed", "sim_ann_pq_trained")
    record(
        out, spark, REGISTRY,
        "sim_ann_ivf_trained_indexed", "sim_ann_ivf_trained",
    )
    # batched serves: 3 queries, one pass (index already built above)
    for name in ("sim_ann_pq_multiquery", "sim_ann_sq8_multiquery"):
        best = min(
            noop_time(REGISTRY[name].fn(spark, SF_DIR)) for _ in range(2)
        )
        out[f"{name}_3q_sec"] = round(best, 2)
        print(name, best, flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "SF100_TRAINED_r7.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
