#!/usr/bin/env python
"""Round-15 (r14 verdict item 2): re-baseline the text/dedup family at
sf10 on the Zipf corpus WITH cross-engine denominators, and give the
sf100 `near_dedup` serve the scaling adjudication SF100_ROUTED_r14's
note lacked.

Pre-r14 text-family records measured the degenerate 31-token corpus;
only bm25 (0.44x), token_counts (0.58x) and dup-spans (1.85x) had Zipf
records. This measures the remaining members — each Spark registered
plan vs the entry's own DuckDB oracle on the same sf10 parquet
(60M lineitem / 500k docs / 200k vectors), best-of-N, floor-adjusted
like docs/SF10_RECURRING_r14.json.

near_dedup scaling: the r14 note attributed the 9.3 s sf100 serve to
~6.1M REAL candidate pairs from the 50-verbatim-replica corpus but had
no denominator. Here the serve is measured at sf10 AND sf100 together
with its result cardinality; cost ∝ pairs means sec/Mpair stays
roughly flat across the 10x corpus step (the missing evidence), and
the sf10 DuckDB oracle supplies the cross-engine anchor.

Usage: python scripts/r15_text_dedup_zipf.py > docs/TEXT_DEDUP_ZIPF_r15.json
(run AFTER scripts/r15_ann_dispersed_record.py — dedup_semantic_indexed
rebuilds its layout on the dispersed embeddings corpus.)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(ROOT, ".scratch", "sf10")
SF100 = os.path.join(ROOT, ".scratch", "sf100")
N_RUNS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

QUERIES = [
    "dedup_near_indexed",
    "dedup_semantic_indexed",
    "text_bpe_train_batched",
    "text_boilerplate_ngrams",
    "text_collocations_lift",
    "text_rarity_score",
]


def main() -> None:
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    from scripts.sf1_duckdb_compare import duck_con_dir

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    out: dict = {
        "experiment": "r15_text_dedup_zipf_sf10",
        "sf_dir": SF10,
        "n_runs": N_RUNS,
        "queries": {},
    }

    # DuckDB first (no JVM competing for memory); full fetchall like
    # every prior compare record.
    # dedup_semantic_indexed's bit-exact oracle hits the documented
    # int64 boundary at sf10 (LIMITS.md: the Lloyd centroid sums
    # overflow BIGINT at 200k vectors and the oracle fails LOUDLY by
    # design). A throughput denominator does not need bit-exactness,
    # so for that entry ONLY the BIGINT casts are relaxed to DuckDB's
    # native HUGEINT accumulation (same scan/join/aggregate shape,
    # same cardinalities) and the record flags it timing-only.
    import re

    def timing_sql(name: str, sql: str) -> tuple[str, bool]:
        if name != "dedup_semantic_indexed":
            return sql, False
        relaxed = re.sub(
            r"CAST\(CAST\(SUM\((\w+)\) AS BIGINT\) AS DOUBLE\)",
            r"CAST(SUM(\1) AS DOUBLE)",
            sql,
        )
        relaxed = re.sub(
            r"CAST\(SUM\((\w+)\) AS BIGINT\)", r"SUM(\1)", relaxed
        )
        # the Lloyd centroid mean spans lines:
        #   CAST(CAST(SUM(CAST(round(...)
        #        AS BIGINT)) AS BIGINT) AS DOUBLE) / (1e16 * COUNT(*))
        # drop its outer BIGINT narrowing (paired replaces keep parens
        # balanced)
        relaxed = relaxed.replace("CAST(CAST(SUM(", "CAST(SUM(")
        relaxed = relaxed.replace(
            ") AS BIGINT) AS DOUBLE) / (1e16", ") AS DOUBLE) / (1e16"
        )
        return relaxed, True

    con = duck_con_dir(SF10)
    for name in QUERIES:
        sql, relaxed = timing_sql(name, REGISTRY[name].oracle)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            rows = con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        out["queries"][name] = {
            "duckdb_sec": round(best, 3),
            "oracle_rows": len(rows),
        }
        if relaxed:
            out["queries"][name]["duckdb_timing_only"] = (
                "bit-exact oracle overflows BIGINT at this scale "
                "(LIMITS.md int64-boundary row); HUGEINT-relaxed SQL "
                "with identical plan shape used as the denominator"
            )
        print(f"duckdb {name}: {best:.3f}s ({len(rows)} rows)", file=sys.stderr)
    con.close()

    spark = get_spark("r15-text-dedup-zipf")
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
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(N_RUNS + 1):  # first run pays ensure/codegen, kept
            t0 = time.perf_counter()
            fn(spark, SF10).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        rec = out["queries"][name]
        rec["spark_sec"] = round(max(0.0, min(runs[1:]) - floor), 3)
        rec["spark_first_run_sec"] = round(runs[0], 3)
        rec["ratio_adj"] = round(rec["spark_sec"] / max(rec["duckdb_sec"], 1e-9), 2)
        print(
            f"spark {name}: {rec['spark_sec']}s adj (ratio {rec['ratio_adj']})",
            file=sys.stderr,
        )

    # ---- near_dedup scaling adjudication: cost vs candidate pairs
    scaling = {}
    for tag, sf in (("sf10", SF10), ("sf100", SF100)):
        fn = REGISTRY["dedup_near_indexed"].fn
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        pairs = fn(spark, sf).count()
        sec = round(max(0.0, min(runs[1:]) - floor), 3)
        scaling[tag] = {
            "serve_sec_adj": sec,
            "first_run_sec": round(runs[0], 3),
            "result_pairs": int(pairs),
            "sec_per_mpair": round(sec / max(pairs / 1e6, 1e-9), 3),
        }
        print(f"near_dedup {tag}: {sec}s, {pairs} pairs", file=sys.stderr)
    s10, s100 = scaling["sf10"], scaling["sf100"]
    scaling["pairs_ratio"] = round(
        s100["result_pairs"] / max(s10["result_pairs"], 1), 2
    )
    scaling["time_ratio"] = round(
        s100["serve_sec_adj"] / max(s10["serve_sec_adj"], 1e-9), 2
    )
    scaling["note"] = (
        "cost ∝ verified pairs iff time_ratio tracks pairs_ratio rather "
        "than the 10x corpus-size ratio; sec_per_mpair flat across the "
        "decade is the adjudication SF100_ROUTED_r14 lacked"
    )
    out["near_dedup_scaling"] = scaling

    out["note"] = (
        "First cross-engine sf10 records for the remaining Zipf-corpus "
        "text/dedup members (r14 verdict item 2). spark_sec is the warm "
        "floor-adjusted best; first_run includes layout ensure cost "
        "(semantic/minhash layouts rebuilt on the current corpus)."
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
