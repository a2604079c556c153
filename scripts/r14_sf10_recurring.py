#!/usr/bin/env python
"""Round-14: current-tree sf10 records for every recurring sf0.1
over-2x member.

The round-13 verdict flagged agg_rollup for having only STALE
large-scale evidence while it recurred in the sf0.1 over-2x list; this
script refreshes the whole recurring set on TODAY's tree so no member
is ever in that position: each query that appeared in any of
docs/DUCKDB_COMPARE_r14_run{A,B,C}.json's `queries_over_2x_adj` lists
is measured at sf10 (60M lineitem / 500k docs / 200k vectors), Spark
registered plan vs the entry's own DuckDB oracle on the same files,
best-of-N, floor-adjusted like every prior record.

Text-family numbers are on the ROUND-14 Zipf corpus (the old sf10
text records measured the degenerate 31-token corpus — see
docs/BM25_ZIPF_r14.json), so this is also their first
post-corpus-change large-scale record.

Usage: python scripts/r14_sf10_recurring.py > docs/SF10_RECURRING_r14.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.path.join(ROOT, ".scratch", "sf10")
N_RUNS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

# union of queries_over_2x_adj across the three r14 sf0.1 compare runs
QUERIES = [
    "dlq_split",
    "agg_rollup",
    "sim_topk",
    "tpch_q9_bucketed",
    "tpch_q21_bucketed",
    "text_bm25_postings",
    "join_star_5way_bucketed",
    "sim_ann_sq8_multiquery",
    "retrieval_hybrid_rrf_indexed",
    "text_dup_spans_merged_fast",
    "multimodal_wav_stats",
]


def main() -> None:
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    from scripts.sf1_duckdb_compare import duck_con_dir

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    out: dict = {"sf_dir": SF_DIR, "n_runs": N_RUNS, "queries": {}}

    # DuckDB first (no JVM competing for memory); FULL fetchall
    # materialization like every prior record — a COUNT(*) wrapper lets
    # DuckDB prune the output columns and under-measures scan-shaped
    # queries (the same reason the Spark side uses the noop sink, not
    # count())
    con = duck_con_dir(SF_DIR)
    for name in QUERIES:
        sql = REGISTRY[name].oracle
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        out["queries"][name] = {"duckdb_sec": round(best, 3)}
        print(f"duckdb {name}: {best:.3f}s", file=sys.stderr)
    con.close()

    spark = get_spark("r14-sf10-recurring")
    spark.sparkContext.setLogLevel("ERROR")
    floor_df = spark.range(32).repartition(32)
    floor_df.write.mode("overwrite").format("noop").save()
    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        floor_df.write.mode("overwrite").format("noop").save()
        floor = min(floor, time.perf_counter() - t0)
    out["floor_sec"] = round(floor, 3)

    for name in QUERIES:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(N_RUNS + 1):  # first run pays codegen+layout, kept
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        rec = out["queries"][name]
        rec["spark_sec"] = round(max(0.0, min(runs[1:]) - floor), 3)
        rec["spark_first_run_sec"] = round(runs[0], 3)
        rec["ratio_adj"] = round(
            rec["spark_sec"] / max(rec["duckdb_sec"], 1e-9), 2
        )
        print(f"spark {name}: {rec['spark_sec']}s adj "
              f"(ratio {rec['ratio_adj']})", file=sys.stderr)

    out["note"] = (
        "Current-tree sf10 refresh of every recurring sf0.1 over-2x "
        "member (union across DUCKDB_COMPARE_r14 runs A/B/C). "
        "Text-family rows are the first records on the round-14 Zipf "
        "corpus. first_run includes any layout ensure cost; spark_sec "
        "is the warm floor-adjusted best."
    )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
