"""Lag-driven autoscaling analog of the reference's KEDA ScaledObject.

The reference scales each pipeline deployment 1-10 replicas on Kafka
consumer lag (configs/templates/scaledobject-template.yaml:9-21:
lagThreshold 10, pollingInterval 15 s, cooldownPeriod 30 s) and a
partition-scaler sidecar then grows the topic's partition count up to
the replica count (partition-scaler/src/partition-scaler.js:57-79 —
scale partitions UP to replicas, warn when partitions exceed replicas).

On Spark the replica axis maps to executors (dynamic allocation) and
the partition axis to source/shuffle parallelism. This module replays
KEDA's DECISION LOOP exactly — same threshold arithmetic, immediate
scale-up, cooldown-gated scale-down — against the engine's
``consumer_lag`` gauge (published by `streaming.file_stream.
file_topic_lag` in the harness and `metrics.MetricsListener` on real
sources), and applies the decision to the two knobs a running local
session actually has:

- ``spark.sql.shuffle.partitions`` = base x replicas (the partition-
  scaler analog: parallelism follows replicas, never ahead of them);
- the per-trigger intake budget ``maxOffsetsPerTrigger``-style value
  returned from :meth:`LagAutoscaler.poll` for callers that rebuild
  their reader (Structured Streaming reads this option at stream start).

On a real cluster the same decision drives dynamic allocation
(``spark.dynamicAllocation.{min,max}Executors`` mirror
minReplicaCount/maxReplicaCount — submit-time config, SURVEY §2.5);
the loop here is the engine-side brain KEDA would otherwise be.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ScaledObjectSpec:
    """The reference envelope, field-for-field
    (scaledobject-template.yaml:9-21)."""

    lag_threshold: float = 10.0     # triggers[0].metadata.lagThreshold
    min_replicas: int = 1           # minReplicaCount
    max_replicas: int = 10          # maxReplicaCount
    polling_interval_s: float = 15  # pollingInterval
    cooldown_period_s: float = 30   # cooldownPeriod


@dataclass
class LagAutoscaler:
    """KEDA's scaling decision replayed on the consumer_lag gauge.

    Semantics mirrored from KEDA's kafka scaler + HPA behavior:
    desired = ceil(lag / lagThreshold) clamped to [min, max]; scale-UP
    applies immediately at the next poll; scale-DOWN only after the
    signal has been at-or-below the current level for a full
    cooldownPeriod (KEDA's cooldown gates deactivation; HPA's
    stabilization gates shrink — one conservative gate here)."""

    spec: ScaledObjectSpec = field(default_factory=ScaledObjectSpec)
    clock: object = time.monotonic

    def __post_init__(self) -> None:
        self.replicas = self.spec.min_replicas
        self._below_since: float | None = None
        self.history: list[dict] = []

    def desired(self, lag: float) -> int:
        raw = math.ceil(max(0.0, float(lag)) / self.spec.lag_threshold)
        return max(self.spec.min_replicas, min(self.spec.max_replicas, raw))

    def poll(self, lag: float, now: float | None = None) -> int:
        """One polling-interval tick: observe the gauge, return the new
        replica count (and record the step in `history`)."""
        now = self.clock() if now is None else now
        want = self.desired(lag)
        if want > self.replicas:
            self.replicas = want          # scale up: immediate
            self._below_since = None
        elif want < self.replicas:
            if self._below_since is None:
                self._below_since = now
            elif now - self._below_since >= self.spec.cooldown_period_s:
                self.replicas = want      # scale down: after cooldown
                self._below_since = None
        else:
            self._below_since = None
        self.history.append(
            {"t": now, "lag": float(lag), "desired": want, "replicas": self.replicas}
        )
        return self.replicas

    def apply_partitions(self, spark, base_partitions: int | None = None) -> int:
        """Partition-scaler analog (partition-scaler.js:57-79):
        parallelism follows the replica count — shuffle partitions are
        set to base x replicas, never reduced below base. Returns the
        value applied."""
        if base_partitions is None:
            base_partitions = max(
                1, spark.sparkContext.defaultParallelism // self.spec.max_replicas
            )
        n = base_partitions * self.replicas
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        return n
