#!/usr/bin/env python
"""sf10 (60M-row-scale fixtures: 500k documents, 15M orders) rehearsal
for the round-7 session-B analytics additions — the scale-decade
evidence behind their "would this hold at 100×" docstrings.

Protocol identical to scripts/sf10_round6.py: DuckDB best-of-N on each
query's own oracle SQL, Spark best-of-N post-warmup noop writes,
floor-adjusted. Writes docs/SF10_R7B.json.

Usage: python scripts/sf10_r7b.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf10")
N_RUNS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

QUERIES = [
    "retrieval_hybrid_rrf",
    "retrieval_hybrid_rrf_indexed",
    "text_collocations_lift",
    "corpus_vocab_growth",
    "dq_anomaly_mad",
    "dq_drift_chi2",
    "dq_referential_integrity",
    "dq_referential_integrity_bucketed",
    "feature_hashing_vectorizer",
    "feature_minmax_scale",
    "corpus_train_val_test_split",
    "join_incremental_mv",
    "mv_join_agg_incremental",
    "join_incremental_mv_retract",
    "window_rank_variants",
    "multimodal_ahash_dedup",
    # dedup_semantic is EXCLUDED: its oracle replays the Lloyd training
    # and at sf10's vector count the per-label scaled sums exceed int64
    # in DuckDB's CAST (the same documented boundary that excludes
    # sim_ann_ivf from scripts/sf100_decades.py). The ENGINE side is
    # fine — its sf0.1/sf1 records live in DUCKDB_COMPARE_r7b_run* and
    # SF1_SWEEP_r7b.txt.
]


def main() -> None:
    from scripts.bench_harness import duck_times, spark_floor, spark_rows
    from stream_processor_spark.session import get_spark
    from tests.oracle_harness import duck_con

    con = duck_con(SF_DIR)
    duck = duck_times(con, QUERIES, N_RUNS)
    con.close()

    spark = get_spark("sf10-r7b")
    spark.sparkContext.setLogLevel("ERROR")
    floor = spark_floor(spark)
    rows = spark_rows(spark, QUERIES, SF_DIR, duck, N_RUNS, floor)

    out = {
        "sf_dir": SF_DIR,
        "n_runs": N_RUNS,
        "floor_sec": round(floor, 4),
        "rows": rows,
    }
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "SF10_R7B.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
