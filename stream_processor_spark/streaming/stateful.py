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
#
# The state-server protocol serializes google.protobuf messages inside
# the Python WORKER; environments without the protobuf wheel get the
# vendored pure-Python shim. Activated at import (before the session
# exists in any sane program order) so workers inherit $PYTHONPATH;
# requires the RocksDB state store provider
# (spark.sql.streaming.stateStore.providerClass) — multiple column
# families are unsupported by the HDFS-backed default.
from stream_processor_spark.vendor import ensure_protobuf as _ensure_protobuf

_ensure_protobuf()

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


# ------------------------------------------------------- streaming dedup ----

BAND_DEDUP_OUTPUT = StructType(
    [
        StructField("doc_a", LongType()),
        StructField("doc_b", LongType()),
        StructField("jaccard", DoubleType()),
    ]
)
BAND_DEDUP_STATE = StructType(
    [
        StructField("doc_ids", ArrayType(LongType())),
        StructField("hsets", ArrayType(ArrayType(LongType()))),
    ]
)


def _make_band_dedup_update(threshold: float, cap: int,
                            ttl_ms: int | None = None):
    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # idle bucket past its TTL: evict wholesale (bounds total
            # state to active buckets; an evicted member's re-arrival
            # re-admits it like a new doc)
            state.remove()
            yield pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
            return
        if state.exists:
            doc_ids = list(state.get[0])
            hsets = [set(h) for h in state.get[1]]
        else:
            doc_ids, hsets = [], []
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows.sort_values("doc_id")  # deterministic arrival order
        seen = set(doc_ids)
        pairs: list[tuple] = []
        # Batch-local overflow: docs arriving after the bucket capped are
        # not persisted, but they ARE comparable to each other within
        # this micro-batch — without this, two over-cap near-duplicates
        # in one batch would never pair (round-5 ADVICE pair-loss gap).
        # Cross-BATCH over-cap pairs remain dropped by design; see the
        # band_dedup docstring for the cap-strategy contract.
        extra_ids: list[int] = []
        extra_hsets: list[set] = []
        for doc_id, hset in zip(rows["doc_id"].tolist(), rows["hset"]):
            if doc_id in seen:  # at-least-once replay guard
                continue
            hs = set(int(x) for x in hset)
            for did, stored in zip(doc_ids, hsets):
                inter = len(hs & stored)
                union = len(hs) + len(stored) - inter
                if union and inter / union >= threshold:
                    a, b = (did, doc_id) if did < doc_id else (doc_id, did)
                    # same exact-int division as the batch operator
                    pairs.append((a, b, inter / union))
            if len(doc_ids) < cap:
                doc_ids.append(int(doc_id))
                hsets.append(hs)
                seen.add(doc_id)
            else:
                for did, stored in zip(extra_ids, extra_hsets):
                    inter = len(hs & stored)
                    union = len(hs) + len(stored) - inter
                    if union and inter / union >= threshold:
                        a, b = (did, doc_id) if did < doc_id else (doc_id, did)
                        pairs.append((a, b, inter / union))
                extra_ids.append(int(doc_id))
                extra_hsets.append(hs)
                # over-cap docs aren't persisted in state, but within
                # this batch they must still dedup replays: without
                # this, a doc_id delivered twice to a capped bucket
                # self-pairs (round-6 ADVICE)
                seen.add(int(doc_id))
        state.update((doc_ids, [sorted(h) for h in hsets]))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)  # idle clock resets per batch
        yield pd.DataFrame(pairs, columns=["doc_a", "doc_b", "jaccard"])

    return update


def band_dedup(
    doc_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    min_tokens: int = 3,
    max_bucket_size: int = 64,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate detection — the incremental
    twin of ``operators.dedup.minhash_det_near_dup_pairs``: documents
    arrive on a stream, and each one is checked against everything
    previously seen in any of its LSH band buckets, emitting
    ``(doc_a, doc_b, jaccard)`` pairs (union over bands; consumers
    dedup by pair — jaccard is identical from every band).

    The shingle→minhash→band pipeline is the SAME pinned-coefficient
    column-expression pass the batch operator uses (runs unchanged on a
    streaming DataFrame — no Python until the state step), so streaming
    and batch agree bit-for-bit on signatures and on the exact int-ratio
    jaccard. Per-bucket state holds (doc_id, shingle-hash set) for up to
    ``max_bucket_size`` docs; past the cap new docs are still CHECKED
    against the stored members but no longer stored (the streaming
    analog of the batch hot-bucket guard — batch drops oversized buckets
    wholesale since it sees final sizes; a stream cannot, so it caps
    admission instead — boilerplate buckets stop growing either way).
    Over-cap docs arriving in the SAME micro-batch are additionally
    compared among themselves before being discarded, so an
    intra-batch near-duplicate pair is never lost to the cap; two
    over-cap near-duplicates arriving in DIFFERENT batches still never
    pair — that is the deliberate residual asymmetry vs the batch twin
    (which sees final bucket sizes and drops the whole bucket).

    Scale: one shuffle on (band_idx, band_key) into the state store;
    state per bucket is O(cap x shingles/doc) in the RocksDB store,
    Arrow-batched per bucket. Replayed micro-batches are idempotent for
    STORED docs (doc_id admission guard); docs that arrived after the
    bucket capped are not remembered, so their pairs re-emit on replay —
    at-least-once, like every emission from this operator (dedup pairs
    downstream).

    ``state_ttl_ms`` bounds state LIFETIME as the cap bounds its width:
    buckets idle longer than the TTL (processing time, reset whenever
    the bucket sees traffic) are evicted wholesale, so total state is
    O(active buckets) on an unbounded stream — the standard dedup-
    window trade (an evicted member's re-arrival is treated as new)."""
    from pyspark.sql import functions as F

    from stream_processor_spark.operators.dedup import lsh_band_frame

    # the state schema carries long doc ids; cast HERE (the shared band
    # frame deliberately preserves the caller's id type)
    typed = doc_stream.withColumn(id_col, F.col(id_col).cast("long"))
    _hs, bands = lsh_band_frame(typed, id_col, text_col, min_tokens)
    return bands.groupBy("band_idx", "band_key").applyInPandasWithState(
        _make_band_dedup_update(jaccard_threshold, max_bucket_size,
                                state_ttl_ms),
        outputStructType=BAND_DEDUP_OUTPUT,
        stateStructType=BAND_DEDUP_STATE,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
