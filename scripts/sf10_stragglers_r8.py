#!/usr/bin/env python
"""Round-8 sf10 straggler record (VERDICT r7 item 1).

Re-measures the three layout-free stragglers after the round-8 plan
rework — narrowed shuffle payloads + shuffled-hash hints on the
unique-key fact edges (tpch_q9_shape, tpch_q21_shape), and the hinted
SHJ that sidesteps the AQE broadcast trap on the FK audit's fact edge
(dq_referential_integrity) — against SAME-DAY DuckDB on the same
parquet (machine speed drifts between sessions; only same-session
ratios are comparable). The bucketed twins are recorded alongside as
the layout answers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf10")
N_RUNS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

QUERIES = [
    "tpch_q9_shape",
    "tpch_q21_shape",
    "dq_referential_integrity",
    "tpch_q9_bucketed",
    "tpch_q21_bucketed",
    "dq_referential_integrity_bucketed",
]


def main() -> None:
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark
    from tests.oracle_harness import duck_con

    out: dict = {"sf_dir": SF_DIR, "n_runs": N_RUNS, "queries": {}}

    con = duck_con(SF_DIR)
    for name in QUERIES:
        sql = REGISTRY[name].oracle
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        out["queries"][name] = {"duckdb_sec": round(best, 3)}
        print(f"duckdb {name}: {best:.3f}s", flush=True)
    con.close()

    spark = get_spark("sf10-stragglers-r8")
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
        rec = out["queries"][name]
        spec = REGISTRY[name]
        runs = []
        for _ in range(N_RUNS + 1):  # first run pays codegen, dropped
            df = spec.fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t1)
        rec["spark_sec"] = round(min(runs[1:]), 3)
        rec["ratio_floor_adj"] = round(
            max(0.0, rec["spark_sec"] - floor) / max(rec["duckdb_sec"], 1e-9), 2
        )
        print(
            f"spark {name}: {rec['spark_sec']:.3f}s "
            f"(ratio {rec['ratio_floor_adj']})",
            flush=True,
        )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "SF10_STRAGGLERS_r8.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
