"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no event-time or cross-batch state at all (SURVEY.md
§2.11) — this is declared engine surface. ``running_counts`` is the
canonical shape: per-key state that survives micro-batches (and restarts,
via the checkpoint), Arrow-batched per group.

At scale: state is partitioned by the grouping key across executors and
stored in the state store (RocksDB in production configs); the operator
shuffles once on the key, same as any streaming aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

RUNNING_COUNT_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("running_count", LongType()),
    ]
)
RUNNING_COUNT_STATE = StructType([StructField("count", LongType())])


def _update_running_count(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    prev = state.get[0] if state.exists else 0
    seen = sum(len(b) for b in batches)
    total = prev + seen
    state.update((total,))
    yield pd.DataFrame({"key": [key[0]], "running_count": [total]})


def running_counts(grouped_stream: DataFrame, key_col: str) -> DataFrame:
    """Per-key running record count with cross-batch state.

    ``grouped_stream`` is a streaming DataFrame; emits one row per key per
    micro-batch with the cumulative count (update semantics).
    """
    return (
        grouped_stream.groupBy(key_col)
        .applyInPandasWithState(
            _update_running_count,
            outputStructType=RUNNING_COUNT_OUTPUT,
            stateStructType=RUNNING_COUNT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
