#!/usr/bin/env python
"""Scale rehearsal for the events/series operators: 100x events (10M
rows over the SAME 1.5k users — 6.6k events per user, a real window-
depth stress that the fact-table sf10 generator doesn't produce because
it keeps events fixed).

Replication shifts event_id (uniqueness; the engine's deterministic
tie-break) and keeps ts/user_id as-is — per-user event-time order stays
total via (ts, event_id). Everything else symlinks to sf0.1. Protocol
matches scripts/sf10_new_ops.py (best-of-N, noop writes, floor-adjusted
vs DuckDB fetchall on the same parquet).

Usage: python scripts/sf10_events_rehearsal.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.sf1_duckdb_compare import duck_con_dir  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch", "sf10ev",
)
REPLICAS = 100
SERIES_OPS = [
    "ts_ewma_truncated",
    "ts_ohlc",
    "scd2_intervals",
    "ts_transition_matrix",
    "ts_anomaly_zscore",
]
N_RUNS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    from stream_processor_spark.catalog import Tables

    ev = Tables(spark, SRC).events
    off = ev.agg(F.max("event_id")).collect()[0][0] + 1
    rep = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("__rep")
    (
        ev.select("*", rep)
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * F.lit(off))
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(DST, "events.parquet"))
    )
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "documents", "embeddings"):
        link = os.path.join(DST, f"{name}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), link)


def main() -> None:
    from stream_processor_spark.session import get_spark

    spark = get_spark("sf10-events-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(DST, "events.parquet")):
        print("generating 100x events ...", file=sys.stderr)
        generate(spark)

    from scripts.bench_harness import duck_times, spark_floor, spark_rows

    import pyarrow.dataset as _ds
    n_events = _ds.dataset(os.path.join(DST, "events.parquet")).count_rows()
    con = duck_con_dir(DST)
    duck = duck_times(con, SERIES_OPS, N_RUNS)
    con.close()

    floor = spark_floor(spark)

    rows = spark_rows(spark, SERIES_OPS, DST, duck, N_RUNS, floor)

    print(json.dumps({
        "sf_dir": DST,
        "events_rows": n_events,
        "floor_sec": round(floor, 4),
        "n_runs": N_RUNS,
        "queries": rows,
    }))


if __name__ == "__main__":
    main()
