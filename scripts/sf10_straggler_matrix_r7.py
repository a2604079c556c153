#!/usr/bin/env python
"""Round-7 sf10 straggler matrix (VERDICT r6 item 6).

One focused pass over the two remaining shuffle-era >2x entries —
`tpch_q9_shape` (3.8x best-conf in r6) and `tpch_q21_shape` (4.4x) —
across the join-strategy knobs the verdict named:

- AQE skew-join on/off (`spark.sql.adaptive.skewJoin.enabled`): TPC-H
  keys are uniform, so this documents that skew handling is NOT the
  missing lever, rather than assuming it.
- Shuffled-hash vs sort-merge (`spark.sql.join.preferSortMergeJoin`):
  the real candidate — SMJ pays an O(n log n) sort per fact side that a
  hash join skips when partitions fit in memory.
- shuffle partitions 32/64 (the r6 sweep showed 32 best at this scale).

Storage-partitioned-join note (`spark.sql.sources.v2.bucketing.*`): SPJ
applies to DataSource-V2 bucketed/partitioned relations; these SHAPE
entries read plain (deliberately un-bucketed) parquet, so there is no
storage partitioning for SPJ to exploit — the engine's storage answer
IS the bucketed twin (`tpch_q9_bucketed` 1.51x / `tpch_q21_bucketed`
0.93x, docs/SF10_ROUND6.json), which realizes exactly what SPJ would:
co-partitioned fact sides joining with zero Exchange.

Output: docs/SF10_STRAGGLERS_r7.json, and the best cell per query next
to the r6 baseline; if no cell lands <=2x, the entries are reclassified
as documented teaching entries (COVERAGE.md / docstrings).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf10")
N_RUNS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

QUERIES = ["tpch_q9_shape", "tpch_q21_shape"]

# (preferSortMergeJoin, skewJoin.enabled, shuffle.partitions)
CONF_GRID = [
    ("true", "true", "32"),
    ("true", "true", "64"),
    ("true", "false", "32"),
    ("false", "true", "32"),
    ("false", "true", "64"),
    ("false", "false", "32"),
]


def spark_time(spark, fn, floor: float) -> float:
    runs = []
    for _ in range(N_RUNS + 1):  # first run pays codegen, dropped
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t1)
    return max(0.0, min(runs[1:]) - floor)


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

    spark = get_spark("sf10-stragglers-r7")
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
        cells = {}
        for smj, skew, parts in CONF_GRID:
            spark.conf.set("spark.sql.join.preferSortMergeJoin", smj)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            key = f"smj={smj}|skew={skew}|p={parts}"
            cells[key] = round(spark_time(spark, spec.fn, floor), 3)
            print(f"spark {name} [{key}]: {cells[key]:.3f}s", flush=True)
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        rec["spark_matrix"] = cells
        rec["spark_sec"] = min(cells.values())
        rec["best_conf"] = min(cells, key=cells.get)
        rec["ratio"] = round(rec["spark_sec"] / max(rec["duckdb_sec"], 1e-9), 2)
        print(f"{name}: best {rec['best_conf']} ratio {rec['ratio']}", flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "SF10_STRAGGLERS_r7.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
