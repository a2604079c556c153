#!/usr/bin/env python
"""Scale rehearsal for the round-5 continuation operators at sf10.

Same protocol as scripts/sf10_crossover.py (idle machine, best-of-N,
noop-materialized Spark vs fetchall DuckDB on the SAME parquet), applied
to the operators added in the continuation session that touch the
SCALED tables (documents / lineitem / orders — events stays fixed in
the generator, so the events-based series ops are covered by the sf0.1
sweep instead):

    text_tfidf_topk, corpus_shard_by_tokens, sample_temperature,
    profile_correlations, dq_checks, tpch_q9_shape, tpch_q21_shape.

Usage: python scripts/sf10_new_ops.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.sf1_duckdb_compare import duck_con_dir  # noqa: E402
from scripts.sf1_rehearsal import generate  # noqa: E402

DST10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch", "sf10",
)
NEW_OPS = [
    "text_tfidf_topk",
    "corpus_shard_by_tokens",
    "sample_temperature",
    "profile_correlations",
    "dq_checks",
    "tpch_q9_shape",
    "tpch_q21_shape",
]
N_RUNS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))


def main() -> None:
    from stream_processor_spark.session import get_spark

    spark = get_spark("sf10-new-ops")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(DST10, "lineitem.parquet")):
        print("generating sf10 (100x sf0.1) ...", file=sys.stderr)
        generate(spark, dst=DST10, replicas=100)

    from scripts.bench_harness import duck_times, spark_floor, spark_rows

    con = duck_con_dir(DST10)
    duck = duck_times(con, NEW_OPS, N_RUNS)
    con.close()

    floor = spark_floor(spark)

    rows = spark_rows(spark, NEW_OPS, DST10, duck, N_RUNS, floor)

    print(json.dumps({
        "sf_dir": DST10,
        "floor_sec": round(floor, 4),
        "n_runs": N_RUNS,
        "queries": rows,
    }))


if __name__ == "__main__":
    main()
