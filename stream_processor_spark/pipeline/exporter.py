"""Prometheus HTTP exporter — the reference's metrics server.

The reference serves ``/metrics`` (Prometheus text exposition, scraped by
a ServiceMonitor every 15 s) and ``/health`` from a tiny HTTP server next
to the consumer (src/listen.js:9-29; configs/templates/
servicemonitor-template.yaml:13-15, port env ``PORT`` default 3000).

:class:`MetricsServer` is that server for the engine: stdlib
``ThreadingHTTPServer`` on a daemon thread, rendering every registered
:class:`~stream_processor_spark.pipeline.metrics.PipelineMetrics` (one
per running pipeline, like the reference's one registry per pod) in text
exposition format 0.0.4 with the reference's exact metric names, help
strings, and label sets.

Scale note: the exporter reads in-memory counters only — no Spark calls
on the scrape path; a scrape never touches the streaming query.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from stream_processor_spark.pipeline.metrics import GAUGES, HELP, PipelineMetrics

CONTENT_TYPE = "text/plain; version=0.0.4; charset=utf-8"


def _escape(v: str) -> str:
    return str(v).replace("\\", r"\\").replace('"', r"\"").replace("\n", r"\n")


def render(metrics_list: list[PipelineMetrics]) -> str:
    """All registries → one Prometheus text-format page."""
    by_family: dict[str, list[tuple[str, dict, float]]] = {}
    for m in metrics_list:
        for name, labels, value in m.samples():
            family = name
            for suffix in ("_bucket", "_sum", "_count"):
                if family.endswith(suffix) and family[: -len(suffix)] in HELP:
                    family = family[: -len(suffix)]
            by_family.setdefault(family, []).append((name, labels, value))

    lines: list[str] = []
    for family in sorted(by_family):
        if family in GAUGES:
            kind = "gauge"
        elif family.endswith("_seconds"):
            kind = "histogram"
        else:
            kind = "counter"
        lines.append(f"# HELP {family} {HELP.get(family, family)}")
        lines.append(f"# TYPE {family} {kind}")
        for name, labels, value in by_family[family]:
            label_s = ",".join(
                f'{k}="{_escape(v)}"' for k, v in sorted(labels.items())
            )
            num = repr(value) if value != int(value) else str(int(value))
            lines.append(f"{name}{{{label_s}}} {num}")
    return "\n".join(lines) + "\n"


class MetricsServer:
    """Serve /metrics and /health for a set of PipelineMetrics.

    ``port=0`` binds an ephemeral port (tests); production passes the
    reference's ``PORT`` (default 3000, src/listen.js:7).
    """

    def __init__(
        self,
        metrics: PipelineMetrics | list[PipelineMetrics],
        port: int = 0,
        host: str = "0.0.0.0",
    ):
        # 0.0.0.0 by default: the ServiceMonitor scrapes pod_ip:port from
        # outside the pod (servicemonitor-template.yaml:13-15) — a
        # loopback-only bind would be unreachable for Prometheus
        self._metrics = [metrics] if isinstance(metrics, PipelineMetrics) else list(metrics)
        self._requested_port = port
        self._host = host
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def register(self, m: PipelineMetrics) -> None:
        self._metrics.append(m)

    @property
    def port(self) -> int:
        if self._httpd is None:
            raise RuntimeError("server not started")
        return self._httpd.server_address[1]

    def start(self) -> "MetricsServer":
        metrics_list = self._metrics

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API)
                if self.path == "/metrics":
                    try:
                        body = render(metrics_list).encode()
                    except Exception:  # parity: 500 path, listen.js:14-18
                        self.send_response(500)
                        self.end_headers()
                        self.wfile.write(b"Internal Server Error")
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", CONTENT_TYPE)
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/health":
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(b"OK")
                else:
                    self.send_response(404)
                    self.end_headers()
                    self.wfile.write(b"Not Found")

            def log_message(self, *args):  # quiet scrapes
                pass

        self._httpd = ThreadingHTTPServer((self._host, self._requested_port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
