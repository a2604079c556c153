#!/usr/bin/env python
"""The decade sweep, one more decade: sf100 (1000x sf0.1 — 600M
lineitem, 150M orders, 5M documents, 5M embedding vectors, ~14 GB
parquet) for five flagship queries, Spark vs DuckDB on the same files.

This is the round's deepest direct evidence for the 100 TB posture: the
sf1 -> sf10 records showed the fixed-cost gap closing; sf100 shows
which side's marginal cost wins a real decade later, on corpora the
size of the whole local-memory budget. Protocol identical to the other
rehearsals (scripts/bench_harness.py).

Usage: python scripts/sf100_decades.py   [~10 min generation first run]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.sf1_duckdb_compare import duck_con_dir  # noqa: E402
from scripts.sf1_rehearsal import generate  # noqa: E402

DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch", "sf100",
)
OPS = [
    "agg_groupby_decimal", # TPC-H Q1, DECIMAL accumulators — the int64
                       # fixed-point path OVERFLOWS at this magnitude
                       # (found by this script; see dsum_dec)
    "tpch_q9_shape",       # star join with one fact-fact shuffle edge
    "tpch_q21_shape",      # bounded-state decorrelation
    # sim_ann_ivf is EXCLUDED here: at 5M vectors the oracle's
    # per-dimension centroid sums exceed int64 (~3.5e19) and DuckDB's
    # HUGEINT->DOUBLE conversion is not correctly rounded, so no
    # bit-exact SQL mirror exists at this magnitude. The ENGINE stays
    # correct (DECIMAL(38,0) accumulators, correctly-rounded final
    # double) — verified through sf10; see docs/LIMITS.md.
    "text_tfidf_topk",     # token explode + top-k, 5M docs
]
N_RUNS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))


def main() -> None:
    from stream_processor_spark.session import get_spark

    spark = get_spark("sf100-decades")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(DST, "lineitem.parquet")):
        print("generating sf100 (1000x sf0.1) ...", file=sys.stderr)
        generate(spark, dst=DST, replicas=1000)

    from scripts.bench_harness import duck_times, spark_floor, spark_rows

    con = duck_con_dir(DST)
    duck = duck_times(con, OPS, N_RUNS)
    con.close()

    floor = spark_floor(spark)
    rows = spark_rows(spark, OPS, DST, duck, N_RUNS, floor)

    print(json.dumps({
        "sf_dir": DST,
        "lineitem_rows": 600_000_000,
        "floor_sec": round(floor, 4),
        "n_runs": N_RUNS,
        "queries": rows,
    }))


if __name__ == "__main__":
    main()
