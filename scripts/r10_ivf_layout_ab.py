#!/usr/bin/env python
"""Round-10 A/B: IVF list-partition file fragmentation vs serve latency.

VERDICT r9 ask #1: sim_ann_ivf_indexed regressed 0.184 -> 0.575 s
(r8 -> r9 headline) and retrieval_hybrid_rrf_indexed 0.673 -> 1.072 s.
Hypothesis (b): commit 58bc403's build-parallelism repartition made every
writer task hold rows of every list, fragmenting each list_id partition
into 32 files (measured: 319 files / 10 lists at sf0.1), so the pruned
nprobe read pays nprobe*32 scan tasks.

This script, in ONE session (machine drift is 1.5-2x/day; same-run pairs
only):
  1. builds the IVF index with the FIXED writer (repartition(list_id)
     before the partitioned write -> 1 file/list), measures the four
     affected serves best-of-4-drop-first;
  2. rewrites the lists table FRAGMENTED (repartition(32, vec_id) before
     the same partitioned write -> 32 files/list), measures again;
  3. prints a JSON record for docs/.
"""
from __future__ import annotations

import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from stream_processor_spark.operators.annindex import ivf_names
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    spark = get_spark("r10-ivf-layout-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # warm python worker pool + json path like bench.py
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _warm(v):
        return v

    spark.range(1000).select(_warm(F.col("id"))).write.mode(
        "overwrite"
    ).format("noop").save()

    names = [
        "sim_ann_ivf_indexed",
        "retrieval_hybrid_rrf_indexed",
        "tpch_q9_bucketed",
        "tpch_q21_bucketed",
        # drift controls: untouched by the layout change
        "tpch_q6_shape",
        "sim_ann_bucketed",
    ]

    def measure_all() -> dict[str, float]:
        out = {}
        for name in names:
            spec = REGISTRY[name]
            runs = []
            for _ in range(4):
                df = spec.fn(spark, SF_DIR)
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            out[name] = round(min(runs[1:]), 3)
        return out

    lists_name, _cent = ivf_names(SF_DIR)

    def file_count() -> int:
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        base = warehouse.replace("file:", "") + "/" + lists_name
        n = 0
        for root, _dirs, files in os.walk(base):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    # Phase 1: fixed writer (first query fn triggers ensure_ivf_index,
    # which drops any stale dir and rebuilds with the current code).
    fixed = measure_all()
    fixed_files = file_count()

    # Phase 2: rewrite the lists table FRAGMENTED, same rows, same
    # session — replays the pre-fix layout exactly (32 writer tasks
    # each holding every list).
    import tempfile

    stage_dir = tempfile.mkdtemp(prefix="r10_ivf_ab_") + "/lists"
    spark.table(lists_name).write.mode("overwrite").parquet(stage_dir)
    spark.sql(f"DROP TABLE IF EXISTS {lists_name}")
    from stream_processor_spark.operators.storage import drop_warehouse_dir

    drop_warehouse_dir(spark, lists_name)
    (
        spark.read.parquet(stage_dir)
        .repartition(32, "vec_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .format("parquet")
        .saveAsTable(lists_name)
    )
    fragmented = measure_all()
    frag_files = file_count()

    rec = {
        "experiment": "r10_ivf_layout_ab",
        "sf_dir": SF_DIR,
        "fixed_writer": {"files": fixed_files, "serve_sec": fixed},
        "fragmented_writer": {"files": frag_files, "serve_sec": fragmented},
        "ratio_frag_over_fixed": {
            k: round(fragmented[k] / max(fixed[k], 1e-9), 2) for k in fixed
        },
    }
    print(json.dumps(rec, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
