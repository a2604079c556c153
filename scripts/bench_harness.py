#!/usr/bin/env python
"""Shared Spark-vs-DuckDB measurement harness for the sf10 rehearsal
scripts (same protocol as scripts/sf10_crossover.py, factored so the
floor methodology lives in one place): DuckDB best-of-N fetchall on the
query's own oracle SQL; Spark best-of-N post-warmup noop writes,
floor-adjusted by a 32-partition no-op job."""

from __future__ import annotations

import sys
import time


def duck_times(con, names: list[str], n_runs: int) -> dict[str, float]:
    from stream_processor_spark.queries import REGISTRY

    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            con.execute(REGISTRY[name].oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"duckdb {name}: {out[name]} s", file=sys.stderr)
    return out


def spark_floor(spark) -> float:
    floor_df = spark.range(32).repartition(32)
    floor_df.write.mode("overwrite").format("noop").save()
    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        floor_df.write.mode("overwrite").format("noop").save()
        floor = min(floor, time.perf_counter() - t0)
    return floor


def spark_rows(spark, names: list[str], sf_dir: str, duck: dict[str, float],
               n_runs: int, floor: float) -> list[dict]:
    from stream_processor_spark.queries import REGISTRY

    rows = []
    for name in names:
        runs = []
        for _ in range(n_runs + 1):
            df = REGISTRY[name].fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        steady = min(runs[1:])
        adj = max(0.0, steady - floor)
        ratio = round(adj / duck[name], 3) if duck[name] else None
        rows.append({
            "query": name,
            "spark_raw_sec": steady,
            "spark_adj_sec": round(adj, 3),
            "duckdb_sec": duck[name],
            "ratio_adj": ratio,
            "runs": runs,
        })
        print(f"spark {name}: adj {adj:.3f} s  ratio {ratio}x",
              file=sys.stderr)
    return rows
