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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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


# -- transformWithStateInPandas (Spark 4 StatefulProcessor API) -------------

RUNNING_STATS_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("total_cents", LongType()),
    ]
)


def _make_running_stats_processor():
    """Spark 4's typed StatefulProcessor: named ValueState handles with
    schema, optional TTL, and timer support — the successor API to
    applyInPandasWithState's single opaque state tuple. The sum is
    accumulated in int64 cents (the engine-wide fixed-point discipline),
    so state merges are exact and order-independent."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "agg", StructType([StructField("n", LongType()),
                                   StructField("cents", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, cents = 0, 0
            if self._state.exists():
                prev = self._state.get()
                n, cents = int(prev[0]), int(prev[1])
            for pdf in rows:
                n += len(pdf)
                # half-up-via-floor to cents (engine-wide fixed-point
                # convention: floor(v*100+0.5), correct for negatives where
                # astype(int64) would truncate toward zero), summed as int64
                cents += int(
                    np.floor(pdf["value"].to_numpy() * 100.0 + 0.5)
                    .astype("int64")
                    .sum()
                )
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"key": [key[0]], "n": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return RunningStats()


def running_stats(grouped_stream: DataFrame, key_col: str) -> DataFrame:
    """Per-key running (count, exact fixed-point sum) via
    ``transformWithStateInPandas`` — the Spark 4 arbitrary-state API with
    typed state handles. Emits the cumulative pair per key per
    micro-batch (update semantics); state lives in the state store
    partitioned by key, exactly like the applyInPandasWithState path it
    supersedes."""
    return grouped_stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_make_running_stats_processor(),
        outputStructType=RUNNING_STATS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


ZSCORE_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("seq", LongType()),
        StructField("v", LongType()),
        StructField("mean_prev", DoubleType()),
        StructField("var_prev", DoubleType()),
    ]
)
ZSCORE_STATE = StructType([StructField("window", ArrayType(LongType()))])


def _make_zscore_update(window: int, min_n: int, z2: float):
    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        win: list[int] = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows.sort_values("seq")  # deterministic intra-batch order
        alerts: list[tuple] = []
        for seq, v in zip(rows["seq"].tolist(), rows["v_scaled"].tolist()):
            n = len(win)
            if n >= min_n:
                s = sum(win)
                sq = sum(x * x for x in win)
                # identical scalar double arithmetic to the batch
                # ts_anomaly_zscore operator: exact int operands, then
                # single IEEE ops
                mean = float(s) / n
                var = (float(sq) - float(s) * float(s) / n) / n
                dev = float(v) - mean
                if dev * dev > z2 * var:
                    alerts.append((key[0], seq, v, mean, var))
            win.append(int(v))
            win = win[-window:]
        state.update((win,))
        yield pd.DataFrame(
            alerts, columns=["key", "seq", "v", "mean_prev", "var_prev"]
        )

    return update


def zscore_alerts(grouped_stream: DataFrame, key_col: str,
                  window: int = 7, min_n: int = 4, z2: float = 4.0) -> DataFrame:
    """Streaming anomaly alerts: per key, flag values deviating from the
    trailing ≤``window`` values' mean by more than √``z2`` standard
    deviations — the streaming twin of the batch `ts_anomaly_zscore`
    query (same exact-int sums, same squared-form threshold, same scalar
    double arithmetic).

    Input needs ``(key_col, seq long, v_scaled long)`` — values already
    fixed-point-scaled (`floor(v*100+0.5)`), seq giving the
    deterministic per-key order. State per key is the bounded trailing
    window (≤ ``window`` int64s — O(1), no watermark needed to bound
    it); it survives micro-batches and restarts via the checkpoint.

    Scale: one shuffle on the key into the state store, same profile as
    any streaming aggregation; alerts stream out in update mode.
    """
    return grouped_stream.groupBy(key_col).applyInPandasWithState(
        _make_zscore_update(window, min_n, z2),
        outputStructType=ZSCORE_OUTPUT,
        stateStructType=ZSCORE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
