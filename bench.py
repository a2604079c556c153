#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is fully materialized through the noop sink (no driver collect,
no disk cost) so the measured time is scan + compute + shuffle only —
the number that scales with the data.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative of every operator family: reference pipeline, scans,
# joins (broadcast + star), aggregation shapes, windows, top-k,
# streaming analogs, LLM-data ops (similarity + dedup + text).
# Ordering note: JSON-path queries (dlq_split) run before any pandas_udf
# query — a pandas_udf stage measurably slows the first subsequent
# get_json_object stage on this Spark build (~6x), so Python-worker
# queries go last.
HEADLINE = [
    "dlq_split",
    "transform_chain",
    "filter_compound",
    "agg_groupby_basic",
    "agg_rollup",
    "join_broadcast",
    "join_range",
    "window_rank",
    "window_running_sum",
    "topk_orders",
    "stream_tumbling_batch_analog",
    "stream_session_batch_analog",
    "dedup_exact",
    "agg_salted_skew",
    "sim_topk",
    "sim_ann_bucketed",
    "dedup_token_jaccard",
    "dedup_shingle_jaccard",
    "sample_weighted",
    "text_token_counts",
    "text_fingerprint",
    "join_asof",
    "agg_pivot",
    "join_star_3way_bucketed",
    "tpch_q6_shape",
    "udf_scalar",
    # round 6: the measured at-parity scale answers, promoted to the
    # headline record (VERDICT r5 item 1) — write-time layouts and the
    # wide-accumulator Q1
    "tpch_q9_bucketed",
    "tpch_q21_bucketed",
    "agg_groupby_wide",
    "text_bm25_postings",
    "join_star_5way_bucketed",
    "sim_ann_ivf_indexed",
    # round 7: the trained-family persisted serves and a batched serve
    "sim_ann_pq_indexed",
    "sim_ann_sq8_multiquery",
    # round 7b: the combined IVF+PQ layout and the pipeline-composition
    # operators (packing, semantic dedup, end-to-end curation)
    "sim_ann_ivfpq_indexed",
    "corpus_pack_sequences",
    "corpus_curate_e2e",
    # round 7c: hybrid retrieval over both persisted layouts, the
    # zone-map point lookup, and the incremental-view folds
    "retrieval_hybrid_rrf_indexed",
    "point_lookup_indexed",
    "join_incremental_mv",
    # round 8: the persisted SemDeDup and MinHash layouts' serve paths
    "dedup_semantic_indexed",
    "dedup_near_indexed",
    # round 9: the single-pass xxhash64 dup-spans production twin
    "text_dup_spans_merged_fast",
    # round 10: a real multimodal decode (PCM16 WAV chunk walk +
    # integer-exact audio stats); round 11 swapped the binary-
    # quantization member to the ROUTED serve (hamming_rerank is the
    # route's scratch twin — see TEACHING)
    "sim_ann_hamming_indexed",
    "multimodal_wav_stats",
    # round 11: the ingest-extracted dlq_split layout (the scale answer
    # to the per-query JSON parse, docs/DLQ_PARSE_AB_r11_sf10ev.json)
    "dlq_split_extracted",
]

# Teaching twins (round 9, VERDICT r8 #6): the from-scratch forms of
# routed queries. They stay hash-oracled registry entries and are still
# MEASURED here every run — but in their own record (`teaching_queries`
# in the full tee / `teaching_value` on the compact line), not in the
# headline aggregate, which now measures only the plans the Router
# actually serves. A user who never calls `ensure_*` gets these plans;
# docs/COVERAGE.md carries each one's documented sf10 ratio.
TEACHING = [
    "text_bm25",
    "join_star_3way",
    "join_star_5way",
    "sim_ann_ivf",
    "dedup_semantic",
    # round 11 reclassifications (same framework, measured at
    # sf0.1/sf1/sf10 — docs/DUCKDB_COMPARE_r11_*.json):
    # - sim_ann_hamming_rerank is route ann_binary's scratch twin
    #   (recomputes every signature per query; the routed
    #   sim_ann_hamming_indexed serves the persisted sign layout and
    #   takes its headline slot);
    # - sim_centroids is the IVF quantizer's fit-per-query form — the
    #   routed serves amortize exactly this computation into
    #   ensure_ivf_index's build (the sim_ann_ivf precedent). Its
    #   plan is clean (single scan, map-side partial agg, no shuffle
    #   beyond k*64 rows); the residual 10x is DuckDB's vectorized
    #   unnest-sum kernel advantage at 0.5 s absolute, constant across
    #   fixture scales (14.9x sf1, 10.6x sf10).
    "sim_ann_hamming_rerank",
    "sim_centroids",
]


def main() -> None:
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    spark = get_spark("stream_processor_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up engine infrastructure (not the benchmarked queries):
    # 1) Python/Arrow worker pool (first pandas_udf fork is ~1.5 s);
    # 2) THEN the JSON expression path — ordering matters: a pandas stage
    #    slows the first subsequent get_json_object stage ~6x on this
    #    build, so the json warmup runs after pandas and absorbs that hit
    #    outside the measured window (json built from a column so constant
    #    folding can't elide the parse);
    # 3) executor threads + codegen ride along.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _warm(v):
        return v

    spark.range(1000).select(_warm(F.col("id"))).write.mode("overwrite").format(
        "noop"
    ).save()
    warm_df = spark.range(1_000_000).select(
        F.get_json_object(
            F.concat(F.lit('{"k": '), (F.col("id") % 100).cast("string"), F.lit("}")),
            "$.k",
        ).alias("j")
    )
    warm_df.write.mode("overwrite").format("noop").save()

    # Measured no-op floor: the fixed per-query cost of job scheduling +
    # noop materialization on this machine (best of 3 on a 32-partition
    # 1-row-per-partition frame). Reported as floor_sec so real
    # regressions aren't hidden under the JVM constant; at 100 TB this
    # floor is amortized to ~zero.
    floor = float("inf")
    floor_df = spark.range(32).repartition(32)
    for _ in range(3):
        t0 = time.perf_counter()
        floor_df.write.mode("overwrite").format("noop").save()
        floor = min(floor, time.perf_counter() - t0)

    # Best of N runs per query (N = $SPARK_GRAFT_BENCH_RUNS, default 2):
    # the first run pays one-time costs (janino compile of this query's
    # generated code, file-footer reads) that are amortized to ~zero at
    # 100 TB; later runs are the steady-state number the scale comparison
    # cares about. All runs fully materialize via noop. Per-query spread
    # (max/min of the post-warmup runs) is reported so a noisy machine
    # shows up as variance, not as a phantom regression.
    n_runs = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    # BUILD and EXECUTE are timed separately. `queries` (and `value`)
    # carry the execute-only times — comparable with every prior round's
    # record. `queries_build` carries the plan-construction time, which
    # is driver-side milliseconds for declarative queries but REAL
    # CLUSTER WORK for queries with an eager model-hydration step (the
    # IVF family runs its fit + k·dim model collect at build time);
    # `value_build_inclusive` is the honest end-to-end total. Neither
    # number hides the other.
    builds: dict[str, float] = {}

    def measure(name: str) -> tuple[float, float, float]:
        spec = REGISTRY[name]
        runs: list[float] = []
        bruns: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            bruns.append(t1 - t0)
            runs.append(time.perf_counter() - t1)
        steady = runs[1:]  # drop the compile-paying first run
        return (
            round(min(steady), 3),
            round(min(bruns[1:]), 3),
            round(max(steady) / max(min(steady), 1e-9), 2),
        )

    for name in HEADLINE:
        timings[name], builds[name], spreads[name] = measure(name)

    # teaching twins: measured, recorded apart from the headline
    teaching: dict[str, float] = {}
    for name in TEACHING:
        teaching[name], _, _ = measure(name)

    # Reference-pipeline throughput envelope (BASELINE.md): full wire
    # path — JSON wire frame → decode(incoming) → 3-step chain with DLQ
    # routing → route split — over the events table, reported as msg/s.
    # Same micro-batch data path the streaming runner executes per
    # trigger (the Kafka hop itself is Spark's source, not engine code).
    from stream_processor_spark.pipeline.processors import BUILTIN_PROCESSORS

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    wire = ev.select(
        F.col("event_id").cast("string").alias("key"),
        F.to_json(
            F.struct(
                F.col("event_id").cast("string").alias("key"),
                F.col("event_type").alias("value"),
                F.col("user_id").cast("int").alias("num"),
            )
        ).alias("value"),
    )
    n_msgs = wire.count()
    rec_schema = "key string, value string, num int"
    decoded = wire.select(
        F.col("key").alias("_key"), F.from_json("value", rec_schema).alias("r")
    ).select("_key", "r.*")
    routed = BUILTIN_PROCESSORS.apply_expression_chain(
        decoded,
        ["add10", "capitalize", "appendString", "isEven"],
        [None, "dlq-capitalize", None, None],
    ).select(
        "_key",
        "route",
        F.to_json(F.struct("out_key", "out_value", "out_num")).alias("value"),
    )
    # best-of-3 with a discarded warm run: the first materialization of
    # this path pays json-codegen warmup (measured ~5x), and round 6
    # found best-of-2 still under-samples it (154-168k vs the 206k
    # steady state a best-of-5 probe shows)
    routed.write.mode("overwrite").format("noop").save()
    pipe_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        routed.write.mode("overwrite").format("noop").save()
        pipe_best = min(pipe_best, time.perf_counter() - t0)
    pipeline_msgs_per_sec = int(n_msgs / pipe_best)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "floor_sec": round(floor, 3),
        "value_minus_floor": round(
            max(0.0, sum(timings.values()) - floor * len(timings)), 3
        ),
        "queries_minus_floor": {
            k: round(max(0.0, v - floor), 3) for k, v in timings.items()
        },
        "queries_build": builds,
        "value_build_inclusive": round(
            sum(timings.values()) + sum(builds.values()), 3
        ),
        "run_spread": spreads,
        "bench_runs": n_runs,
        "pipeline_msgs_per_sec": pipeline_msgs_per_sec,
        "teaching_queries": teaching,
        "teaching_value": round(sum(teaching.values()), 3),
    }
    # The driver's BENCH_r{N}.json preserves only a ~2000-char TAIL of
    # stdout. Rounds 4-7 printed the full record (~4 KB) as one line, so
    # the tail began mid-line and the driver recorded "parsed": null.
    # Contract now: tee the FULL record to docs/, and print a MINIMAL
    # compact line (metric/value/unit/queries/sf + scalar extras) as the
    # very last stdout output, sized to fit inside the tail window.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        rnd = os.environ.get("SPARK_GRAFT_ROUND", "")
        if rnd:
            full_path = os.path.join(here, "docs", f"BENCH_r{rnd}_full.json")
        else:
            # ad-hoc runs tee to an untracked scratch path so they never
            # clobber the committed per-round records under docs/
            full_path = os.path.join(here, "BENCH_full.json")
        with open(full_path, "w") as fh:
            json.dump(result, fh, indent=1)
    except OSError:
        pass  # bench output on stdout is the contract; the tee is best-effort
    spark.stop()

    minimal = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "queries": timings,
        "sf": sf_val,
        "floor_sec": result["floor_sec"],
        "value_minus_floor": result["value_minus_floor"],
        "pipeline_msgs_per_sec": pipeline_msgs_per_sec,
        "teaching_value": result["teaching_value"],
    }
    line = json.dumps(minimal, separators=(",", ":"))
    if len(line) > 1800:
        # Stay inside the driver's tail window: drop per-query detail
        # before dropping the headline total (full map lives in the tee).
        minimal["queries"] = {
            k: timings[k] for k in sorted(timings, key=timings.get, reverse=True)[:24]
        }
        line = json.dumps(minimal, separators=(",", ":"))
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
