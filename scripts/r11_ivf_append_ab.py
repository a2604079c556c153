#!/usr/bin/env python
"""Round-11 A/B: IVF serve latency across 10 appends + compaction.

VERDICT r10 ask #2: the append path used to insertInto without
clustering on list_id, so every append batch added up-to-`tasks` files
per touched list — regrowing exactly the fragmentation the round-10
build fix removed. This record proves the repaired lifecycle in ONE
session (same-run pairs only; machine drifts 1.5-2x/day):

  1. fresh build (1 file/list) — baseline serve;
  2. 10 appends of 10k new vectors each (clustered append: +1 file per
     touched list per append => <= 11 files/list) — serve re-measured;
  3. compact_ivf_lists (back to exactly 1 file/list) — serve again.

"Does not degrade" = post-append serve within noise of baseline and
post-compact serve == baseline shape; the pre-fix failure mode was
nprobe*32 scan tasks (docs/IVF_LAYOUT_AB_r10.json: 1.6-3.1x).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_APPENDS = int(os.environ.get("SPARK_GRAFT_N_APPENDS", "10"))
BATCH = int(os.environ.get("SPARK_GRAFT_APPEND_BATCH", "10000"))


def main() -> None:
    from pyspark.sql import functions as F

    from stream_processor_spark.operators.annindex import (
        _partition_file_counts,
        append_ivf_index,
        compact_ivf_lists,
        ensure_ivf_index,
        ivf_names,
    )
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    spark = get_spark("r11-ivf-append-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # warm python worker pool like bench.py
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
        # drift controls: untouched by appends
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

    lists_name, cent_name = ivf_names(SF_DIR)
    # force a FRESH build so the baseline is the current writer's layout
    spark.sql(f"DROP TABLE IF EXISTS {lists_name}")
    spark.sql(f"DROP TABLE IF EXISTS {cent_name}")
    from stream_processor_spark.operators.storage import drop_warehouse_dir

    drop_warehouse_dir(spark, lists_name)
    drop_warehouse_dir(spark, cent_name)
    ensure_ivf_index(spark, SF_DIR)

    def files_stat() -> dict:
        counts = _partition_file_counts(spark, lists_name)
        return {
            "lists": len(counts),
            "files_total": sum(counts.values()),
            "files_per_list_max": max(counts.values()) if counts else 0,
        }

    baseline_files = files_stat()
    baseline = measure_all()

    # 10 appends of NEW vectors (fresh ids, corpus embeddings reused —
    # assignment runs against the frozen model either way)
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n = emb.count()
    for i in range(N_APPENDS):
        batch = (
            emb.filter(F.col("vec_id") % N_APPENDS == i)
            .limit(BATCH)
            .select(
                (F.col("vec_id") + (1_000_000_000 + i * 10_000_000)).alias(
                    "vec_id"
                ),
                "embedding",
            )
        )
        append_ivf_index(spark, lists_name, cent_name, batch)

    appended_files = files_stat()
    appended = measure_all()

    n_lists = compact_ivf_lists(spark, lists_name)
    compacted_files = files_stat()
    compacted = measure_all()

    rec = {
        "experiment": "r11_ivf_append_ab",
        "sf_dir": SF_DIR,
        "corpus_vectors": n,
        "n_appends": N_APPENDS,
        "append_batch": BATCH,
        "baseline": {"files": baseline_files, "serve_sec": baseline},
        "after_appends": {"files": appended_files, "serve_sec": appended},
        "after_compact": {
            "files": compacted_files,
            "serve_sec": compacted,
            "lists": n_lists,
        },
        "ratio_appended_over_baseline": {
            k: round(appended[k] / max(baseline[k], 1e-9), 2)
            for k in baseline
        },
        "ratio_compacted_over_baseline": {
            k: round(compacted[k] / max(baseline[k], 1e-9), 2)
            for k in baseline
        },
    }
    print(json.dumps(rec, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
