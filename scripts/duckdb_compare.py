#!/usr/bin/env python
"""Per-query Spark-vs-DuckDB comparison at a given SF dir.

The reference publishes no benchmark numbers (BASELINE.md), so the
working single-node baseline is DuckDB executing each query's own oracle
SQL on the same parquet files. This script times every HEADLINE query in
both engines (best-of-N) and prints a JSON report with floor-adjusted
ratios — the measurement the round verdicts grade against.

Floor adjustment: Spark pays a fixed per-query job-scheduling +
noop-materialization cost on local[N] that amortizes to ~zero at
cluster scale; the measured no-op floor is subtracted once per query
(same method as bench.py / the round verdicts).

Usage:
  python scripts/duckdb_compare.py            # sf0.1, 3 runs
  SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_BENCH_RUNS=5 python scripts/duckdb_compare.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def main() -> None:
    import duckdb  # noqa: F401 (import check before Spark spin-up)

    from bench import HEADLINE, TEACHING
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark
    from tests.oracle_harness import duck_con

    ALL = list(HEADLINE) + list(TEACHING)
    # targeted adjudication runs (round 11): SPARK_GRAFT_COMPARE_NAMES
    # restricts the sweep to a comma-separated subset — used for the
    # sf10 >2x-set adjudication where the full 51-oracle DuckDB pass
    # would burn hours on text-family oracles irrelevant to the question
    only = os.environ.get("SPARK_GRAFT_COMPARE_NAMES")
    if only:
        keep = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in keep if n not in REGISTRY]
        if unknown:
            raise SystemExit(f"unknown query names: {unknown}")
        ALL = keep

    # -- DuckDB side: best-of-N of each query's own oracle SQL
    duck: dict[str, float] = {}
    con = duck_con(SF_DIR)
    for name in ALL:
        sql = REGISTRY[name].oracle
        if not sql:
            continue
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck[name] = round(best, 4)
    con.close()

    # -- Spark side: best of the post-warmup runs through the noop sink
    spark = get_spark("duckdb-compare")
    spark.sparkContext.setLogLevel("ERROR")
    floor_df = spark.range(32).repartition(32)
    floor_df.write.mode("overwrite").format("noop").save()  # warm
    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        floor_df.write.mode("overwrite").format("noop").save()
        floor = min(floor, time.perf_counter() - t0)

    # BUILD (plan construction — driver py4j latency, plus real cluster
    # work for model-hydrating queries) and EXECUTE are timed separately,
    # mirroring bench.py. ratio_adj keeps the execute-only convention of
    # prior rounds; ratio_adj_with_build adds build time — the honest
    # end-to-end bound (conservative: DuckDB's side has no analogous
    # plan-construction charge).
    rows = []
    teaching_rows = []
    for name in ALL:
        if name not in duck:
            continue
        runs, bruns = [], []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            bruns.append(t1 - t0)
            runs.append(time.perf_counter() - t1)
        steady = min(runs[1:])
        build = min(bruns[1:])
        adj = max(0.0, steady - floor)
        adj_b = max(0.0, steady + build - floor)
        (teaching_rows if name in TEACHING else rows).append(
            {
                "query": name,
                "spark_sec": round(steady, 4),
                "spark_build_sec": round(build, 4),
                "spark_adj_sec": round(adj, 4),
                "duckdb_sec": duck[name],
                "ratio_adj": round(adj / duck[name], 2) if duck[name] > 0 else None,
                "ratio_adj_with_build": round(adj_b / duck[name], 2)
                if duck[name] > 0
                else None,
            }
        )
    spark.stop()

    over = [r for r in rows if r["ratio_adj"] and r["ratio_adj"] > 2.0]
    report = {
        "sf_dir": SF_DIR,
        "runs": N_RUNS,
        "floor_sec": round(floor, 4),
        "spark_adj_total": round(sum(r["spark_adj_sec"] for r in rows), 3),
        "spark_adj_total_with_build": round(
            sum(r["spark_adj_sec"] + r["spark_build_sec"] for r in rows), 3
        ),
        "duckdb_total": round(sum(r["duckdb_sec"] for r in rows), 3),
        "queries_over_2x_adj": [r["query"] for r in over],
        "per_query": rows,
        # teaching twins (round 9, VERDICT r8 #6): the from-scratch forms
        # of routed queries — oracle-checked and measured, recorded apart
        # from the headline the round grades on
        "teaching_per_query": teaching_rows,
        "teaching_adj_total": round(
            sum(r["spark_adj_sec"] for r in teaching_rows), 3
        ),
        "teaching_duckdb_total": round(
            sum(r["duckdb_sec"] for r in teaching_rows), 3
        ),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
