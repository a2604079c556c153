#!/usr/bin/env python
"""Sustained streaming throughput record (VERDICT r9 ask #6).

BENCH's `pipeline_msgs_per_sec` measures the wire data path as one batch
job; this harness publishes the STREAMING claim properly: a paced
producer offers the reference's steady load (150k msg/s, BASELINE.md —
producer_b/c.js: 15,000 msgs / 0.1 s) into a file-topic in 5,000-msg
units (the reference's consumer batch quantum, consumer.js:221 —
maxOffsetsPerTrigger=5000 parity: each produced unit is one source
offset), while the pipeline runs as a real StreamingQuery
(foreachBatch -> 3-step chain with DLQ routing -> Sink('txn_table'),
the EXACTLY-ONCE manifest-commit sink, vs the reference's
at-least-once) with a checkpoint. Recorded: per-micro-batch rows +
duration from query progress, consumer lag over time (produced minus
processed — non-growing is the pass bar), drain time after the producer
stops, and the exactly-once check (TxnTable row count == offered OK
rows, no dupes, no loss).

Producer pacing uses pre-staged 5,000-row parquet files hard-linked
into the topic directory on schedule, so production cost is O(link) and
the offered rate is exact.

Writes docs/STREAMING_THROUGHPUT_r10.json.
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

OFFERED_MSG_S = int(os.environ.get("STREAM_TPUT_RATE", "150000"))
DURATION_S = float(os.environ.get("STREAM_TPUT_SECONDS", "20"))
QUANTUM = 5000  # reference consumer batch quantum
FILES_PER_TRIGGER = int(os.environ.get("STREAM_TPUT_FPT", "60"))


def main() -> None:
    from pyspark.sql import functions as F

    from stream_processor_spark.operators.txn_table import TxnTable
    from stream_processor_spark.pipeline.catalog import PipelineCatalog
    from stream_processor_spark.pipeline.codecs import demo_message_schema
    from stream_processor_spark.pipeline.processors import BUILTIN_PROCESSORS
    from stream_processor_spark.pipeline.runner import PipelineRunner, Sink
    from stream_processor_spark.session import get_spark
    from stream_processor_spark.streaming.file_stream import FileBroker
    from tests.test_pipeline import CATALOG_DOC

    spark = get_spark("streaming-throughput-r10")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="stream_tput_")
    broker = FileBroker(os.path.join(root, "broker"))
    schema = demo_message_schema()
    topic = broker.topic("topic-in", schema)

    n_files = int(OFFERED_MSG_S * DURATION_S / QUANTUM)
    total_msgs = n_files * QUANTUM
    interval = QUANTUM / OFFERED_MSG_S  # seconds between 5k-msg units

    # stage ONE 5,000-row unit (all rows flow to target: value non-null,
    # num becomes even after add10), link it n_files times on schedule
    stage = os.path.join(root, "stage")
    unit = spark.createDataFrame(
        [(f"k{i}", "hello", 2) for i in range(QUANTUM)], schema=schema
    ).coalesce(1)
    unit.write.mode("overwrite").parquet(stage)
    unit_file = next(
        f for f in os.listdir(stage) if f.endswith(".parquet")
    )
    unit_path = os.path.join(stage, unit_file)

    catalog = PipelineCatalog.from_dict(CATALOG_DOC)
    runner = PipelineRunner(catalog, BUILTIN_PROCESSORS)
    target = Sink("txn_table", os.path.join(root, "target"))
    dlq = Sink("txn_table", os.path.join(root, "dlq"))

    produced = {"files": 0, "t0": None, "done_at": None}
    samples: list[dict] = []

    def producer() -> None:
        produced["t0"] = time.perf_counter()
        for i in range(n_files):
            # pace: unit i goes out at t0 + i*interval
            due = produced["t0"] + i * interval
            now = time.perf_counter()
            if due > now:
                time.sleep(due - now)
            os.link(unit_path, os.path.join(topic.dir, f"unit-{i:06d}.parquet"))
            produced["files"] = i + 1
        produced["done_at"] = time.perf_counter()

    stream_df = topic.read_stream(spark, max_files_per_trigger=FILES_PER_TRIGGER)
    query = runner.run_streaming(
        1,
        stream_df,
        target,
        {"dlq-capitalize": dlq},
        checkpoint_dir=os.path.join(root, "ckpt"),
        trigger={"processingTime": "0 seconds"},
    )

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    while produced["t0"] is None:
        time.sleep(0.01)

    # sample lag (offered-so-far minus processed-so-far) once per second
    deadline = time.perf_counter() + DURATION_S + 120
    processed_rows = 0
    while time.perf_counter() < deadline:
        time.sleep(1.0)
        progress = query.recentProgress
        processed_rows = sum(int(p["numInputRows"]) for p in progress)
        offered_rows = produced["files"] * QUANTUM
        lag = max(0, offered_rows - processed_rows)
        samples.append(
            {
                "t_sec": round(time.perf_counter() - produced["t0"], 1),
                "offered_rows": offered_rows,
                "processed_rows": processed_rows,
                "lag_rows": lag,
            }
        )
        if produced["done_at"] is not None and processed_rows >= total_msgs:
            break
    drain_done = time.perf_counter()
    query.stop()

    progress = query.recentProgress
    batches = [
        {
            "rows": int(p["numInputRows"]),
            "sec": round(
                sum(
                    p["durationMs"].get(k, 0)
                    for k in ("addBatch", "triggerExecution")
                    if k == "triggerExecution"
                )
                / 1000.0,
                3,
            ),
        }
        for p in progress
        if int(p["numInputRows"]) > 0
    ]
    wall = drain_done - produced["t0"]
    drain_after_offer = (
        drain_done - produced["done_at"] if produced["done_at"] else None
    )

    # exactly-once: every offered row lands in the target exactly once
    got = TxnTable(spark, target.path_or_topic).read()
    n_target = got.count()
    n_distinct = got.select("out_key").distinct().count()

    max_lag = max(s["lag_rows"] for s in samples)
    # lag non-growing = lag at the END of the offer window is not the max
    # (the query keeps up), and it drains to zero afterwards
    rec = {
        "experiment": "r10_streaming_throughput",
        "date": "2026-08-15",
        "offered_msg_per_sec": OFFERED_MSG_S,
        "offer_duration_sec": DURATION_S,
        "quantum_msgs": QUANTUM,
        "max_files_per_trigger": FILES_PER_TRIGGER,
        "total_offered_msgs": total_msgs,
        "processed_msgs": processed_rows,
        "sustained_msg_per_sec": int(total_msgs / wall),
        "drain_after_offer_sec": round(drain_after_offer, 1)
        if drain_after_offer is not None
        else None,
        "max_lag_rows": max_lag,
        "final_lag_rows": samples[-1]["lag_rows"] if samples else None,
        "n_micro_batches": len(batches),
        "per_batch": batches,
        "lag_timeline": samples,
        "exactly_once": {
            "target_rows": n_target,
            "distinct_keys_x_units": n_distinct,
            "expected_rows": total_msgs,
            "pass": n_target == total_msgs,
        },
        "sink": "txn_table (manifest-commit exactly-once; reference is at-least-once)",
        "baseline_envelope": "BASELINE.md steady offered load 150k msg/s (producer_b/c), consumer quantum 5000 (consumer.js:221)",
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(
        os.path.join(here, "docs", "STREAMING_THROUGHPUT_r10.json"), "w"
    ) as f:
        json.dump(rec, f, indent=1)
    print(
        json.dumps(
            {k: v for k, v in rec.items() if k not in ("per_batch", "lag_timeline")},
            indent=1,
        )
    )
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
