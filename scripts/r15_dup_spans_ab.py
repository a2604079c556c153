#!/usr/bin/env python
"""Round-15 (r14 verdict item 3): A/B the dup-spans member-recovery
shape ON THE ZIPF CORPUS.

`text_dup_spans_merged_fast` at 1.85x DuckDB (sf10, floor-adjusted) is
the watch band's biggest member and its only Zipf-corpus sample; the
old 0.98x record measured the degenerate 31-token corpus where
duplicated-gram groups were huge. On the Zipf corpus groups are small
(~keep_n verbatim replicas per base gram), so the trade between the
three member-recovery shapes must be re-measured:

  A fused     — ONE aggregate: collect_list((doc_id,pos)) per gh,
                keep size>1 groups (the current default)
  B window    — COUNT(*) OVER (PARTITION BY gh): spill-safe, second
                shuffle-free pass over the same exchange
  C two-pass  — dup-gram aggregate then join members back (the md5
                twin's CTE shape, with the fast xxhash64 hashing; no
                exchange reuse — scan+split+explode runs twice)

All three feed the same gaps-and-islands merge and must emit identical
span counts (asserted). DuckDB denominator: the entry's own oracle on
the same parquet. Winner keeps the default (_DUP_SPANS_FUSED /
documented fallback), loser goes on record like
docs/TOKEN_COUNTS_AB_r13_sf10.json.

Usage: python scripts/r15_dup_spans_ab.py > docs/DUP_SPANS_AB_r15.json
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
    from pyspark.sql import functions as F

    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.queries import curation_extra as ce
    from stream_processor_spark.session import get_spark

    from scripts.sf1_duckdb_compare import duck_con_dir

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    out: dict = {"experiment": "r15_dup_spans_member_recovery_ab", "sf_dir": SF10}

    con = duck_con_dir(SF10)
    sql = REGISTRY["text_dup_spans_merged_fast"].oracle
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rows = con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    con.close()
    out["duckdb_sec"] = round(best, 3)
    out["oracle_spans"] = len(rows)
    print(f"duckdb: {best:.3f}s ({len(rows)} spans)", file=sys.stderr)

    spark = get_spark("r15-dup-spans-ab")
    spark.sparkContext.setLogLevel("ERROR")
    t = Tables(spark, SF10)
    floor_df = spark.range(32).repartition(32)
    floor_df.write.mode("overwrite").format("noop").save()
    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        floor_df.write.mode("overwrite").format("noop").save()
        floor = min(floor, time.perf_counter() - t0)
    out["floor_sec"] = round(floor, 3)

    def two_pass_windows():
        g = ce._window_hashes(t)
        dupg = (
            g.groupBy("gh")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .select("gh")
        )
        return g.join(dupg, "gh").select("doc_id", "pos")

    variants = {
        "A_fused_collect_list": lambda: ce._spans_from_dup_windows(
            ce._dup_windows_fast(t, fused=True)
        ),
        "B_window_count": lambda: ce._spans_from_dup_windows(
            ce._dup_windows_fast(t, fused=False)
        ),
        "C_two_pass_join": lambda: ce._spans_from_dup_windows(
            two_pass_windows()
        ),
    }

    counts = {}
    out["variants"] = {}
    for name, build in variants.items():
        runs = []
        for _ in range(N_RUNS + 1):
            t0 = time.perf_counter()
            build().write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        counts[name] = build().count()
        sec = round(max(0.0, min(runs[1:]) - floor), 3)
        out["variants"][name] = {
            "spark_sec_adj": sec,
            "first_run_sec": round(runs[0], 3),
            "ratio_adj": round(sec / max(out["duckdb_sec"], 1e-9), 2),
            "spans": int(counts[name]),
        }
        print(f"{name}: {sec}s ({counts[name]} spans)", file=sys.stderr)

    assert len(set(counts.values())) == 1, f"span counts diverge: {counts}"
    winner = min(out["variants"], key=lambda k: out["variants"][k]["spark_sec_adj"])
    out["winner"] = winner
    out["note"] = (
        "identical span counts asserted across shapes; winner keeps the "
        "registered default, losers stand falsified on this record "
        "(r14 verdict item 3 — first controlled A/B on the Zipf corpus)"
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
