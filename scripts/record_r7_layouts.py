#!/usr/bin/env python
"""Scale evidence for the round-7 session-B layouts: the zone-map
skipping index at sf100 (5M documents) and incremental join-view
maintenance at sf10 (15M orders).

What the numbers must show:
- zonemap: a 5-key point lookup reads a HANDFUL of files out of the
  clustered table's 64, and the pruned serve beats the full-scan twin
  (the planning-time skipping story — at a million files the gap is
  the difference between a lookup and a job).
- joinmv: per-append maintenance cost stays FLAT as the accumulated
  view grows (the O(|Δ| + matched buckets) claim), vs the from-scratch
  join recompute it replaces.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python scripts/record_r7_layouts.py
Writes docs/R7_LAYOUTS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF100 = os.path.join(ROOT, ".scratch", "sf100")
SF10 = os.path.join(ROOT, ".scratch", "sf10")


def main() -> int:
    from pyspark.sql import functions as F

    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.operators import joinmv
    from stream_processor_spark.operators import zonemap as zm
    from stream_processor_spark.session import get_spark

    spark = get_spark("record-r7-layouts")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # ------------------------------------------------ zonemap @ sf100
    # probe keys spread across the full id range: each hits a different
    # zone, so the lookup reads ~5 of the 64 files (the registered
    # query's fixed low keys all land in zone 0 — 1 file of 64)
    keys = [1, 1_000_003, 2_000_003, 3_500_003, 4_999_999]
    docs = Tables(spark, SF100).documents

    def project(df):
        return df.select(
            "doc_id", "lang", "source", "n_chars",
            F.md5(F.col("text").cast("binary")).alias("text_md5"),
        )

    t0 = time.perf_counter()
    data_name, map_name = zm.ensure_zonemap(spark, SF100, nfiles=64)
    build_s = time.perf_counter() - t0
    nfiles_total = len(zm.manifest_rows(spark, map_name))

    def best_of(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    pruned = zm.lookup_by_keys(spark, SF100, keys)
    nfiles_read = len(pruned.inputFiles())
    t_pruned = best_of(
        lambda: project(zm.lookup_by_keys(spark, SF100, keys))
        .write.mode("overwrite").format("noop").save()
    )
    t_full = best_of(
        lambda: project(docs.filter(F.col("doc_id").isin(keys)))
        .write.mode("overwrite").format("noop").save()
    )

    import duckdb

    con = duckdb.connect()
    path = os.path.join(SF100, "documents.parquet")
    glob = os.path.join(path, "*.parquet") if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{glob}'")
    t_duck = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(
            "SELECT doc_id, lang, source, n_chars, md5(text) FROM documents "
            f"WHERE doc_id IN ({', '.join(map(str, keys))})"
        ).fetchall()
        t_duck = min(t_duck, time.perf_counter() - t0)
    con.close()

    out["zonemap_sf100"] = {
        "docs": docs.count(),
        "build_sec": round(build_s, 1),
        "files_total": nfiles_total,
        "files_read_5key_lookup": nfiles_read,
        "pruned_lookup_sec": t_pruned,
        "full_scan_lookup_sec": t_full,
        "duckdb_sec": round(t_duck, 3),
    }
    print("zonemap:", json.dumps(out["zonemap_sf100"]), file=sys.stderr)

    # ------------------------------------------------- joinmv @ sf10
    t = Tables(spark, SF10)
    for name in joinmv.joinmv_names(SF10):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    names = joinmv.init_join_mv(spark, SF10)
    t0 = time.perf_counter()
    joinmv.append_right(spark, names, t.customer)
    right_s = round(time.perf_counter() - t0, 2)

    append_secs = []
    for i in range(3):
        batch = t.orders.filter(F.col("o_orderkey") % 100 == i)
        t0 = time.perf_counter()
        joinmv.append_left(spark, names, batch)
        append_secs.append(round(time.perf_counter() - t0, 2))

    t0 = time.perf_counter()
    served = joinmv.serve_join_mv(spark, names)
    served.write.mode("overwrite").format("noop").save()
    serve_s = round(time.perf_counter() - t0, 2)

    full = (
        t.orders.select(*joinmv.LEFT_COLS)
        .join(
            t.customer.select(*joinmv.RIGHT_COLS),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(*joinmv.VIEW_COLS)
    )
    t_recompute = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        full.write.mode("overwrite").format("noop").save()
        t_recompute = min(t_recompute, time.perf_counter() - t0)

    out["joinmv_sf10"] = {
        "orders": t.orders.count(),
        "batch_rows": int(t.orders.count() / 100),
        "append_right_sec": right_s,
        "append_left_secs": append_secs,
        "serve_view_sec": serve_s,
        "full_join_recompute_sec": round(t_recompute, 2),
    }
    print("joinmv:", json.dumps(out["joinmv_sf10"]), file=sys.stderr)

    dst = os.path.join(ROOT, "docs", "R7_LAYOUTS.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
