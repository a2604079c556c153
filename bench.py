#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is fully materialized through the noop sink (no driver collect,
no disk cost) so the measured time is scan + compute + shuffle only —
the number that scales with the data.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative of every operator family: reference pipeline, scans,
# joins (broadcast + star), aggregation shapes, windows, top-k,
# streaming analogs, LLM-data ops (similarity + dedup + text).
HEADLINE = [
    "dlq_split",
    "transform_chain",
    "filter_compound",
    "agg_groupby_basic",
    "agg_rollup",
    "join_broadcast",
    "join_star_3way",
    "join_range",
    "window_rank",
    "window_running_sum",
    "topk_orders",
    "stream_tumbling_batch_analog",
    "stream_session_batch_analog",
    "dedup_exact",
    "sim_topk",
    "sim_ann_bucketed",
    "dedup_token_jaccard",
    "text_token_counts",
    "text_fingerprint",
    "udf_scalar",
]


def main() -> None:
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    spark = get_spark("stream_processor_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: spin executors/codegen on a trivial job, not counted
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY[name]
        df = spec.fn(spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(result))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
