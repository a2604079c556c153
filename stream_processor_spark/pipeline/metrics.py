"""Metric parity with the reference's Prometheus surface.

The reference exports seven metrics (src/metrics.js:5-52), incremented at
src/consumer.js:95,107,129,135,140,143,149:

    messages_received_total{pipeline_id, pod_name}
    processors_applied_total{pipeline_id, pod_name, processor_name}
    messages_completed_total{pipeline_id, pod_name}
    messages_error_total{pipeline_id, pod_name}
    messages_dlq_total{pipeline_id, pod_name}
    messages_dropped_total{pipeline_id, pod_name}
    message_processing_duration_seconds{pipeline_id, pod_name, step}

Engine mapping: per-record counters become per-micro-batch route counts
(one aggregation over the routed batch — counts, not per-row Python), and
the duration histogram maps to micro-batch durations from
StreamingQueryListener progress events. Dashboards/SLOs keyed on these
names port over unchanged; export to Prometheus by scraping
``PipelineMetrics.snapshot()``.
"""

from __future__ import annotations

import threading
from collections import defaultdict

from pyspark.sql import functions as F

try:  # StreamingQueryListener import location is stable in pyspark>=3.4
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object


class PipelineMetrics:
    """Thread-safe counters using the reference metric names."""

    COUNTERS = (
        "messages_received_total",
        "processors_applied_total",
        "messages_completed_total",
        "messages_error_total",
        "messages_dlq_total",
        "messages_dropped_total",
    )

    def __init__(self, pipeline_id: str, pod_name: str = "spark"):
        self.labels = {"pipeline_id": str(pipeline_id), "pod_name": pod_name}
        self._lock = threading.Lock()
        self._counts: dict[str, float] = defaultdict(float)
        self._durations: list[float] = []

    def inc(self, name: str, n: float = 1.0) -> None:
        with self._lock:
            self._counts[name] += n

    def observe_duration(self, seconds: float) -> None:
        with self._lock:
            self._durations.append(seconds)

    def record_batch(self, route_counts: dict[str, int], n_steps: int) -> None:
        """Update all counters from one routed micro-batch's route counts."""
        received = sum(route_counts.values())
        ok = route_counts.get("ok", 0)
        dropped = route_counts.get("dropped", 0)
        dlq = sum(v for k, v in route_counts.items() if k.startswith("dlq_"))
        errors = sum(v for k, v in route_counts.items() if k.startswith("error_"))
        self.inc("messages_received_total", received)
        self.inc("messages_completed_total", ok)
        self.inc("messages_dropped_total", dropped)
        self.inc("messages_dlq_total", dlq)
        self.inc("messages_error_total", errors)
        # each surviving record passed every step; routed records passed a
        # prefix — approximation: ok rows × n_steps (reference increments
        # per successful application, consumer.js:95)
        self.inc("processors_applied_total", ok * n_steps)

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            return dict(self._counts)


def route_counts(routed_df) -> dict[str, int]:
    """One tiny aggregation over a (cached) routed micro-batch."""
    rows = routed_df.groupBy("route").agg(F.count(F.lit(1)).alias("n")).collect()
    return {r["route"]: r["n"] for r in rows}


class MetricsListener(StreamingQueryListener):
    """Maps StreamingQuery progress onto message_processing_duration_seconds."""

    def __init__(self, metrics: PipelineMetrics):
        self.metrics = metrics

    def onQueryStarted(self, event):  # pragma: no cover - trivial
        pass

    def onQueryProgress(self, event):
        p = event.progress
        try:
            duration_ms = p.durationMs.get("triggerExecution", 0)
        except AttributeError:
            duration_ms = 0
        self.metrics.observe_duration(duration_ms / 1000.0)

    def onQueryIdle(self, event):  # pragma: no cover - trivial
        pass

    def onQueryTerminated(self, event):  # pragma: no cover - trivial
        pass
