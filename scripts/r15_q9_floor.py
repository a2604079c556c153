#!/usr/bin/env python
"""Round-15 (r14 verdict item 5): refresh the `tpch_q9_bucketed` floor
decomposition on the current tree.

The 1.88x watch-band figure rests on an r9-era adjudication that the
Spark time is dominated by the irreducible scan of the bucketed pair;
AQE/conf defaults have moved since. Same-run, same-machine:

- DuckDB running the full q9 oracle on the raw parquet (the compare
  denominator);
- Spark bare noop scans of EXACTLY the bucketed-table columns any
  bucketed q9 plan must read (lineitem 6 slim cols, orders 2);
- Spark `tpch_q9_bucketed` itself (warm best-of-N, floor-adjusted);
- a plan audit asserting the fact edge still runs exchange-free.

The scan-floor claim holds when bare_scan_total / q9_adj >= 0.8; below
that the verdict asks for one plan experiment instead.

Usage: python scripts/r15_q9_floor.py > docs/SF10_Q9_FLOOR_r15.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(ROOT, ".scratch", "sf10")
N_RUNS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def main() -> None:
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    from scripts.sf1_duckdb_compare import duck_con_dir

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    out: dict = {"experiment": "r15_q9_bucketed_floor_refresh", "sf_dir": SF10}

    con = duck_con_dir(SF10)
    sql = REGISTRY["tpch_q9_bucketed"].oracle
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    con.close()
    out["duckdb_sec"] = round(best, 3)
    print(f"duckdb q9: {best:.3f}s", file=sys.stderr)

    spark = get_spark("r15-q9-floor")
    spark.sparkContext.setLogLevel("ERROR")
    from stream_processor_spark.operators.storage import bucketed_pair

    li, o = bucketed_pair(spark, SF10)
    floor_df = spark.range(32).repartition(32)
    floor_df.write.mode("overwrite").format("noop").save()
    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        floor_df.write.mode("overwrite").format("noop").save()
        floor = min(floor, time.perf_counter() - t0)
    out["floor_sec"] = round(floor, 3)

    def noop_best(df, n=N_RUNS):
        runs = []
        for _ in range(n + 1):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        return round(max(0.0, min(runs[1:]) - floor), 3), round(runs[0], 3)

    li_slim = li.select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    o_slim = o.select("o_orderkey", "o_orderdate")
    out["spark_scan_lineitem_slim_sec"], _ = noop_best(li_slim)
    out["spark_scan_orders_slim_sec"], _ = noop_best(o_slim)
    q9 = REGISTRY["tpch_q9_bucketed"].fn
    out["spark_q9_bucketed_sec"], out["spark_q9_first_run_sec"] = noop_best(
        q9(spark, SF10)
    )
    scan_total = (
        out["spark_scan_lineitem_slim_sec"] + out["spark_scan_orders_slim_sec"]
    )
    out["bare_scan_total_sec"] = round(scan_total, 3)
    out["scan_floor_fraction"] = round(
        scan_total / max(out["spark_q9_bucketed_sec"], 1e-9), 3
    )
    out["ratio_adj"] = round(
        out["spark_q9_bucketed_sec"] / max(out["duckdb_sec"], 1e-9), 2
    )

    plan = q9(spark, SF10)._jdf.queryExecution().executedPlan().toString()
    out["plan_audit"] = {
        "exchanges": plan.count("Exchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "cartesian": "CartesianProduct" in plan,
    }
    out["floor_claim_holds"] = out["scan_floor_fraction"] >= 0.8
    out["note"] = (
        "floor holds => the watch-band ratio is scan-bound on this "
        "machine and no plan change can cross it; floor broken => run "
        "the verdict's plan experiment (pre-aggregated join order)"
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
