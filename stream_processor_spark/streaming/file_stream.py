"""Broker-free streaming harness: parquet drop-directories as topics.

``readStream.format("parquet")`` over a drop directory has the same
micro-batch semantics as the Kafka source (new files ≙ new offsets), so the
entire pipeline plan — decode → chain → route → foreachBatch multi-sink —
is exercised without a broker. Tests and local development use this;
production swaps in ``runner.kafka_source`` with zero plan changes.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class FileTopic:
    """One 'topic': a directory of parquet part files."""

    def __init__(self, root: str, name: str, schema: StructType):
        self.name = name
        self.dir = os.path.join(root, name)
        self.schema = schema
        os.makedirs(self.dir, exist_ok=True)

    def produce(self, df: DataFrame) -> None:
        """Append a batch of records (one new file ≙ one offset range)."""
        df.write.mode("append").parquet(self.dir)

    def produce_rows(self, spark: SparkSession, rows: list[dict]) -> None:
        self.produce(spark.createDataFrame(rows, schema=self.schema))

    def read_stream(self, spark: SparkSession, max_files_per_trigger: int = 10) -> DataFrame:
        return (
            spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(self.dir)
        )

    def read_batch(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(self.schema).parquet(self.dir)

    def is_empty(self) -> bool:
        return not any(f.endswith(".parquet") for f in os.listdir(self.dir))


def file_topic_lag(topic: FileTopic, metrics, spark: SparkSession) -> int:
    """Harness consumer-lag probe for file topics.

    File-stream sources report ``latestOffset: null`` in query progress,
    so the generic :func:`pipeline.metrics.lag_from_progress` path has no
    signal; this probe computes the same quantity directly — records
    present in the topic minus records the pipeline has received — and
    publishes it as the ``consumer_lag`` gauge (the KEDA lagThreshold
    signal, scaledobject-template.yaml:14-21). One tiny count job per
    probe; harness/ops cadence, never per record.
    """
    total = topic.read_batch(spark).count()
    received = metrics.snapshot().get("messages_received_total", 0)
    lag = max(0, int(total - received))
    metrics.set_gauge("consumer_lag", float(lag))
    return lag


class FileBroker:
    """A set of FileTopics under one root (≙ a Kafka cluster for tests)."""

    def __init__(self, root: str):
        self.root = root
        self.topics: dict[str, FileTopic] = {}
        os.makedirs(root, exist_ok=True)

    def topic(self, name: str, schema: StructType) -> FileTopic:
        if name not in self.topics:
            self.topics[name] = FileTopic(self.root, name, schema)
        return self.topics[name]

    def checkpoint_dir(self) -> str:
        return os.path.join(self.root, f"_checkpoints-{uuid.uuid4().hex[:8]}")
