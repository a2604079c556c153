#!/usr/bin/env python
"""Round-11 multi-pipeline ramp-to-peak record (VERDICT r10 ask #4).

The reference's load-test envelope is ~500k msg/s offered across 4
staggered producers (performance-testing/loadTest.js:10-16,73 — ramp
stagger between producer starts) against MULTIPLE concurrent pipelines
(insertTestPipelines.js catalog). The round-10 record proved 150k
offered / 188k drained on ONE pipeline; this harness runs N_PIPELINES
(default 3) CONCURRENT StreamingQueries — separate source topics,
separate checkpoints, separate exactly-once txn_table sinks, one
SparkSession (FAIR scheduler) — with producers started on a ramp
stagger, aggregate offered rate AGG_RATE (default 330k msg/s).

Recorded per pipeline and aggregate: offered/processed timelines, lag,
drain time, sustained throughput, and the exactly-once check (txn_table
row count == offered rows for every pipeline). If the box cannot drain
the offered aggregate inside the offer window, the record IS the
measured single-box ceiling analysis the verdict asked for — the lag
timeline shows where intake saturates.

Writes docs/STREAMING_MULTI_r11.json (via stdout redirection).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PIPELINES = int(os.environ.get("STREAM_MULTI_N", "3"))
AGG_RATE = int(os.environ.get("STREAM_MULTI_RATE", "330000"))
DURATION_S = float(os.environ.get("STREAM_MULTI_SECONDS", "20"))
RAMP_STAGGER_S = float(os.environ.get("STREAM_MULTI_STAGGER", "2.0"))
QUANTUM = 5000  # reference consumer batch quantum (consumer.js:221)
FILES_PER_TRIGGER = int(os.environ.get("STREAM_MULTI_FPT", "60"))


def main() -> None:
    from stream_processor_spark.operators.txn_table import TxnTable
    from stream_processor_spark.pipeline.catalog import PipelineCatalog
    from stream_processor_spark.pipeline.codecs import demo_message_schema
    from stream_processor_spark.pipeline.processors import BUILTIN_PROCESSORS
    from stream_processor_spark.pipeline.runner import PipelineRunner, Sink
    from stream_processor_spark.session import get_spark
    from stream_processor_spark.streaming.file_stream import FileBroker

    spark = get_spark(
        "streaming-multi-r11",
        extra_confs={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    per_rate = AGG_RATE // N_PIPELINES
    n_files = int(per_rate * DURATION_S / QUANTUM)
    per_total = n_files * QUANTUM
    interval = QUANTUM / per_rate

    root = tempfile.mkdtemp(prefix="stream_multi_")
    broker = FileBroker(os.path.join(root, "broker"))
    schema = demo_message_schema()

    # catalog: N pipelines, each its own source/target/dlq topics, the
    # reference's 4-step chain (insertTestPipelines.js shape)
    doc = {"topics": [], "schemas": [{"id": 1, "schema_name": "s"}],
           "processors": [
               {"id": 10, "processor_name": "add10", "is_filter": False},
               {"id": 11, "processor_name": "capitalize", "is_filter": False},
               {"id": 12, "processor_name": "appendString", "is_filter": False},
               {"id": 13, "processor_name": "isEven", "is_filter": True},
           ],
           "pipelines": []}
    for p in range(1, N_PIPELINES + 1):
        doc["topics"] += [
            {"id": 100 + p, "topic_name": f"in-{p}"},
            {"id": 200 + p, "topic_name": f"out-{p}"},
            {"id": 300 + p, "topic_name": f"dlq-{p}"},
        ]
        doc["pipelines"].append(
            {
                "id": p,
                "name": f"load-{p}",
                "source_topic_id": 100 + p,
                "target_topic_id": 200 + p,
                "incoming_schema_id": 1,
                "outgoing_schema_id": 1,
                "steps": {
                    "processors": [10, 11, 12, 13],
                    "dlq": [None, 300 + p, None, None],
                },
            }
        )
    catalog = PipelineCatalog.from_dict(doc)
    runner = PipelineRunner(catalog, BUILTIN_PROCESSORS)

    # one staged 5,000-row unit, hard-linked on schedule per producer
    stage = os.path.join(root, "stage")
    unit = spark.createDataFrame(
        [(f"k{i}", "hello", 2) for i in range(QUANTUM)], schema=schema
    ).coalesce(1)
    unit.write.mode("overwrite").parquet(stage)
    unit_path = os.path.join(
        stage, next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    )

    topics, queries, produced = {}, {}, {}
    for p in range(1, N_PIPELINES + 1):
        topics[p] = broker.topic(f"in-{p}", schema)
        produced[p] = {"files": 0, "t0": None, "done_at": None}

    def producer(p: int, start_at: float) -> None:
        st = produced[p]
        now = time.perf_counter()
        if start_at > now:
            time.sleep(start_at - now)
        st["t0"] = time.perf_counter()
        for i in range(n_files):
            due = st["t0"] + i * interval
            now = time.perf_counter()
            if due > now:
                time.sleep(due - now)
            os.link(
                unit_path, os.path.join(topics[p].dir, f"u-{i:06d}.parquet")
            )
            st["files"] = i + 1
        st["done_at"] = time.perf_counter()

    sinks = {}
    for p in range(1, N_PIPELINES + 1):
        target = Sink("txn_table", os.path.join(root, f"target-{p}"))
        dlq = Sink("txn_table", os.path.join(root, f"dlq-{p}"))
        sinks[p] = target
        queries[p] = runner.run_streaming(
            p,
            topics[p].read_stream(spark, max_files_per_trigger=FILES_PER_TRIGGER),
            target,
            {f"dlq-{p}": dlq},
            checkpoint_dir=os.path.join(root, f"ckpt-{p}"),
            trigger={"processingTime": "0 seconds"},
        )

    t_base = time.perf_counter() + 0.5
    threads = [
        threading.Thread(
            target=producer, args=(p, t_base + (p - 1) * RAMP_STAGGER_S),
            daemon=True,
        )
        for p in range(1, N_PIPELINES + 1)
    ]
    for th in threads:
        th.start()

    total_msgs = per_total * N_PIPELINES
    samples = []
    deadline = time.perf_counter() + DURATION_S + 240
    agg_processed = 0
    while time.perf_counter() < deadline:
        time.sleep(1.0)
        snap = {"t_sec": round(time.perf_counter() - t_base, 1)}
        agg_off, agg_proc = 0, 0
        for p in range(1, N_PIPELINES + 1):
            proc = sum(
                int(x["numInputRows"]) for x in queries[p].recentProgress
            )
            off = produced[p]["files"] * QUANTUM
            snap[f"p{p}_lag"] = max(0, off - proc)
            agg_off += off
            agg_proc += proc
        snap["offered"] = agg_off
        snap["processed"] = agg_proc
        samples.append(snap)
        agg_processed = agg_proc
        if (
            all(produced[p]["done_at"] is not None for p in produced)
            and agg_proc >= total_msgs
        ):
            break
    drain_done = time.perf_counter()
    for p in queries:
        queries[p].stop()

    first_t0 = min(produced[p]["t0"] for p in produced)
    last_done = max(produced[p]["done_at"] or drain_done for p in produced)
    wall = drain_done - first_t0

    eo = {}
    for p in range(1, N_PIPELINES + 1):
        got = TxnTable(spark, sinks[p].path_or_topic).read()
        n = got.count()
        eo[f"pipeline_{p}"] = {
            "target_rows": n,
            "expected_rows": per_total,
            "pass": n == per_total,
        }

    rec = {
        "experiment": "r11_multi_pipeline_ramp",
        "n_pipelines": N_PIPELINES,
        "aggregate_offered_msg_per_sec": AGG_RATE,
        "per_pipeline_offered_msg_per_sec": per_rate,
        "ramp_stagger_sec": RAMP_STAGGER_S,
        "offer_duration_sec": DURATION_S,
        "total_offered_msgs": total_msgs,
        "processed_msgs": agg_processed,
        "aggregate_sustained_msg_per_sec": int(total_msgs / wall),
        "drain_after_offer_sec": round(drain_done - last_done, 1),
        "max_aggregate_lag": max(
            s["offered"] - s["processed"] for s in samples
        ),
        "lag_timeline": samples,
        "exactly_once": eo,
        "sink": "txn_table per pipeline (manifest-commit exactly-once)",
        "reference_envelope": "loadTest.js:10-16,73 — 4 staggered "
        "producers, ~500k msg/s offered; this record: "
        f"{N_PIPELINES} pipelines, {AGG_RATE} msg/s aggregate offered",
    }
    print(json.dumps(rec, indent=1))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
