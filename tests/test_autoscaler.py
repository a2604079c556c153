"""Round 11 (VERDICT r10 ask #5): lag-triggered scaling demonstration.

Drives the ``consumer_lag`` gauge through a real backlog spike in the
file harness and asserts the KEDA-envelope decision loop
(`pipeline.autoscaler`) crosses the lagThreshold, scales 1 -> max,
drains, and recovers to min after the cooldown — the
scaledobject-template.yaml:9-21 envelope end to end."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processor_spark.pipeline.autoscaler import (
    LagAutoscaler,
    ScaledObjectSpec,
)
from stream_processor_spark.pipeline.catalog import PipelineCatalog
from stream_processor_spark.pipeline.codecs import demo_message_schema
from stream_processor_spark.pipeline.metrics import PipelineMetrics
from stream_processor_spark.pipeline.processors import BUILTIN_PROCESSORS
from stream_processor_spark.pipeline.runner import PipelineRunner, Sink
from stream_processor_spark.streaming.file_stream import (
    FileBroker,
    file_topic_lag,
)
from tests.test_pipeline import CATALOG_DOC


def test_decision_loop_matches_keda_arithmetic():
    spec = ScaledObjectSpec()  # the reference's exact envelope
    a = LagAutoscaler(spec)
    assert a.desired(0) == 1          # floor at minReplicaCount
    assert a.desired(10) == 1         # lag == threshold -> 1 replica
    assert a.desired(11) == 2
    assert a.desired(95) == 10
    assert a.desired(10_000) == 10    # ceiling at maxReplicaCount

    # scale-up is immediate; scale-down waits out cooldownPeriod
    t = 0.0
    assert a.poll(100, now=t) == 10
    assert a.poll(0, now=t + 15) == 10            # below, cooldown running
    assert a.poll(0, now=t + 30) == 10            # 15 s below — not yet
    assert a.poll(0, now=t + 15 + 30) == 1        # full 30 s below -> down
    # a full-strength lag blip resets the cooldown window
    assert a.poll(100, now=t + 50) == 10
    assert a.poll(0, now=t + 60) == 10
    assert a.poll(200, now=t + 75) == 10          # blip: below-since resets
    assert a.poll(0, now=t + 90) == 10
    assert a.poll(0, now=t + 90 + 30) == 1  # full cooldown below -> min
    assert a.replicas == 1


def test_backlog_spike_scales_up_drains_and_recovers(spark, tmp_path):
    catalog = PipelineCatalog.from_dict(CATALOG_DOC)
    runner = PipelineRunner(catalog, BUILTIN_PROCESSORS)
    broker = FileBroker(str(tmp_path / "broker"))
    topic = broker.topic("topic-in", demo_message_schema())
    target = Sink("parquet", str(tmp_path / "target"))
    dlq = Sink("parquet", str(tmp_path / "dlq"))
    metrics = PipelineMetrics("1")
    spec = ScaledObjectSpec()
    scaler = LagAutoscaler(spec)

    # backlog spike: 200 records land before the pipeline runs
    rows = [
        {"key": f"k{i}", "value": f"v{i}", "num": 2 * i} for i in range(200)
    ]
    topic.produce(spark.createDataFrame(rows, schema=demo_message_schema()))

    lag0 = file_topic_lag(topic, metrics, spark)
    assert lag0 == 200
    assert metrics.snapshot()["consumer_lag"] == 200.0  # gauge published
    assert lag0 > spec.lag_threshold                    # KEDA would fire

    r1 = scaler.poll(lag0, now=0.0)
    assert r1 == spec.max_replicas  # 200/10 = 20 -> clamped to 10
    applied = scaler.apply_partitions(spark, base_partitions=2)
    assert applied == 2 * spec.max_replicas
    assert spark.conf.get("spark.sql.shuffle.partitions") == str(applied)

    # drain the backlog with the scaled-up session
    q = runner.run_streaming(
        1,
        topic.read_stream(spark),
        target,
        {"dlq-capitalize": dlq},
        checkpoint_dir=broker.checkpoint_dir(),
        metrics=metrics,
    )
    q.awaitTermination(120)
    assert metrics.snapshot()["messages_received_total"] == 200

    lag1 = file_topic_lag(topic, metrics, spark)
    assert lag1 == 0                                    # drained
    assert metrics.snapshot()["consumer_lag"] == 0.0    # gauge recovered

    # cooldown-gated recovery to minReplicaCount
    assert scaler.poll(lag1, now=15.0) == spec.max_replicas
    assert scaler.poll(lag1, now=15.0 + spec.cooldown_period_s) == spec.min_replicas
    n = scaler.apply_partitions(spark, base_partitions=2)
    assert n == 2 * spec.min_replicas
    # restore the session default for other tests
    spark.conf.set("spark.sql.shuffle.partitions", "32")
