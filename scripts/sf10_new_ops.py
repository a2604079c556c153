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
import time

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
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    spark = get_spark("sf10-new-ops")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(DST10, "lineitem.parquet")):
        print("generating sf10 (100x sf0.1) ...", file=sys.stderr)
        generate(spark, dst=DST10, replicas=100)

    duck: dict[str, float] = {}
    con = duck_con_dir(DST10)
    for name in NEW_OPS:
        sql = REGISTRY[name].oracle
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck[name] = round(best, 3)
        print(f"duckdb {name}: {duck[name]} s", file=sys.stderr)
    con.close()

    floor_df = spark.range(32).repartition(32)
    floor_df.write.mode("overwrite").format("noop").save()
    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        floor_df.write.mode("overwrite").format("noop").save()
        floor = min(floor, time.perf_counter() - t0)

    rows = []
    for name in NEW_OPS:
        runs = []
        for _ in range(N_RUNS + 1):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, DST10)
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        steady = min(runs[1:])
        adj = max(0.0, steady - floor)
        ratio = round(adj / duck[name], 3) if duck[name] else None
        rows.append(
            {
                "query": name,
                "spark_raw_sec": steady,
                "spark_adj_sec": round(adj, 3),
                "duckdb_sec": duck[name],
                "ratio_adj": ratio,
                "runs": runs,
            }
        )
        print(
            f"spark {name}: adj {adj:.3f} s  ratio {ratio}x",
            file=sys.stderr,
        )

    print(json.dumps({
        "sf_dir": DST10,
        "floor_sec": round(floor, 4),
        "n_runs": N_RUNS,
        "queries": rows,
    }))


if __name__ == "__main__":
    main()
