"""SIGTERM graceful-drain parity (src/listen.js:88-108): a k8s rolling
restart sends SIGTERM; the reference disconnects the consumer so the
in-flight batch finishes and commits. The engine equivalent: the
run-pipelines CLI stops each StreamingQuery (current micro-batch commits
its checkpoint), snapshots metrics, and exits 0 — and a restart from the
same checkpoint neither loses nor duplicates records.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# 240 s matches the runner's --timeout: the subprocess pipeline's first
# micro-batch can take >90 s on a loaded/shared host (round-16: the 90 s
# wait flaked once with three Spark JVMs running; solo the whole test
# passes in ~84 s).
def _wait_for(predicate, timeout=240.0, interval=0.5, what="condition"):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if predicate():
            return
        time.sleep(interval)
    raise AssertionError(f"timed out waiting for {what}")


def test_sigterm_drains_cleanly_and_resume_has_no_duplicates(spark, tmp_path):
    from stream_processor_spark.pipeline.codecs import demo_message_schema
    from stream_processor_spark.streaming.file_stream import FileBroker
    from tests.test_pipeline import CATALOG_DOC, RECORDS

    catalog_path = tmp_path / "catalog.json"
    catalog_path.write_text(json.dumps(CATALOG_DOC))
    broker_dir = str(tmp_path / "broker")
    schema = demo_message_schema()
    broker = FileBroker(broker_dir)
    topic = broker.topic("topic-in", schema)
    topic.produce(spark.createDataFrame(RECORDS, schema=schema))

    out_dir = os.path.join(broker_dir, "_out", "topic-out")
    cmd = [
        sys.executable, "-m", "stream_processor_spark", "run-pipelines",
        "--catalog", str(catalog_path), "--broker", broker_dir,
        "--follow-interval", "1", "--timeout", "240",
    ]
    proc = subprocess.Popen(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        def n_out_rows():
            try:
                return spark.read.parquet(out_dir).count()
            except Exception:
                return 0

        # batch 1 processed (2 ok records) → the stream is live
        _wait_for(lambda: n_out_rows() >= 2, what="first batch in sink")

        # feed more records MID-STREAM, prove they flow, then SIGTERM
        more = [
            {"key": "k5", "value": "drain", "num": 6},   # ok: DRAIN_appended
            {"key": "k6", "value": "gone", "num": 7},    # dropped: 17 odd
        ]
        topic.produce(spark.createDataFrame(more, schema=schema))
        _wait_for(lambda: n_out_rows() >= 3, what="mid-stream batch in sink")

        proc.send_signal(signal.SIGTERM)
        stdout, _ = proc.communicate(timeout=120)
        assert proc.returncode == 0, stdout
        tail = json.loads(stdout.strip().splitlines()[-1])
        assert tail["drained"] is True
        # every ok record delivered exactly once, none partial
        rows = sorted(
            r.out_value for r in spark.read.parquet(out_dir).collect()
        )
        assert rows == ["DRAIN_appended", "HELLO_appended", "SPARK_appended"]
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate(timeout=60)

    # restart from the same checkpoint with no new input: the committed
    # offsets must hold — the drained batches are NOT reprocessed
    rc = subprocess.run(
        [
            sys.executable, "-m", "stream_processor_spark", "run-pipelines",
            "--catalog", str(catalog_path), "--broker", broker_dir,
            "--timeout", "240",
        ],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        timeout=240,
    )
    assert rc.returncode == 0, rc.stdout
    rows = sorted(r.out_value for r in spark.read.parquet(out_dir).collect())
    assert rows == ["DRAIN_appended", "HELLO_appended", "SPARK_appended"]
