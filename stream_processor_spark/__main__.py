"""CLI front door: ``python -m stream_processor_spark <command>``.

The reference deploys with ``make deploy`` + per-pipeline pods; the engine
equivalent is a single process running one StreamingQuery per active
pipeline from a JSON catalog. Commands:

- ``list-queries``            — print the registered analytics inventory
- ``run-query NAME [--sf-dir DIR]``   — run one query, print rows (capped)
- ``run-pipelines --catalog FILE --broker DIR [--checkpoint DIR]``
                              — start every active pipeline against a
                                file-topic broker (parquet drop dirs)
- ``bench``                   — run the headline benchmark
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def cmd_list_queries(_args) -> int:
    from stream_processor_spark.queries import REGISTRY

    for name, spec in sorted(REGISTRY.items()):
        kind = "hash-checked" if spec.oracle else "rows-only"
        doc = (spec.doc or "").strip().splitlines()
        head = doc[0] if doc else ""
        print(f"{name:32s} [{kind}] {head}")
    return 0


def cmd_run_query(args) -> int:
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
        return 2
    spark = get_spark(f"query-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[args.name].fn(spark, args.sf_dir)
    if args.save:
        df.write.mode("overwrite").parquet(args.save)
        print(f"wrote {args.save}")
    else:
        df.show(args.limit, truncate=False)
    return 0


def cmd_run_pipelines(args) -> int:
    from stream_processor_spark.pipeline import (
        BUILTIN_PROCESSORS,
        PipelineCatalog,
        PipelineRunner,
    )
    from stream_processor_spark.pipeline.codecs import demo_message_schema
    from stream_processor_spark.pipeline.runner import Sink
    from stream_processor_spark.session import get_spark
    from stream_processor_spark.streaming.file_stream import FileBroker

    if not args.catalog and not args.jdbc:
        raise SystemExit("run-pipelines needs --catalog or --jdbc")
    spark = get_spark("pipelines")
    spark.sparkContext.setLogLevel("ERROR")
    if args.jdbc:
        catalog = PipelineCatalog.from_jdbc(spark, args.jdbc)
    else:
        catalog = PipelineCatalog.from_json(args.catalog)
    runner = PipelineRunner(catalog, BUILTIN_PROCESSORS)
    broker = FileBroker(args.broker)
    schema = demo_message_schema()
    out_root = args.output or os.path.join(args.broker, "_out")

    metrics: dict = {}
    queries = runner.deploy_all(
        spark,
        source_for=lambda r: broker.topic(r.source_topic, schema).read_stream(spark),
        sinks_for=lambda r: (
            Sink("parquet", os.path.join(out_root, r.target_topic)),
            {
                d: Sink("parquet", os.path.join(out_root, d))
                for d in r.dlq_topics
                if d
            },
        ),
        checkpoint_root=args.checkpoint or os.path.join(args.broker, "_checkpoints"),
        metrics_out=metrics,
        trigger=(
            {"processingTime": f"{args.follow_interval} seconds"}
            if args.follow_interval
            else None  # default: availableNow (drain the backlog, stop)
        ),
    )
    server = None
    if args.metrics_port is not None:
        # the reference pod serves /metrics next to the consumer
        # (src/listen.js:9-29, PORT default 3000)
        from stream_processor_spark.pipeline.exporter import MetricsServer

        server = MetricsServer(list(metrics.values()), port=args.metrics_port).start()
        print(f"metrics on http://127.0.0.1:{server.port}/metrics")
    print(f"started {len(queries)} pipeline(s): {sorted(queries)}", flush=True)

    # Graceful drain on SIGTERM/SIGINT (reference parity: src/listen.js
    # 88-108 wires SIGTERM → consumer.disconnect() so k8s rolling
    # restarts finish the in-flight batch instead of killing it).
    # StreamingQuery.stop() lets the current micro-batch commit its
    # checkpoint (spark.sql.streaming.stopTimeout), so a drained pod
    # resumes exactly after its last committed batch — no partial batch
    # in an idempotent sink, at-least-once in an append sink.
    import signal
    import threading
    import time

    drain = threading.Event()

    def _on_signal(signum, _frame):
        print(f"signal {signum}: draining {len(queries)} pipeline(s)", flush=True)
        drain.set()

    installed = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            installed[sig] = signal.signal(sig, _on_signal)
        except ValueError:  # non-main thread (embedded/test use) — skip
            pass

    deadline = time.monotonic() + args.timeout if args.timeout else None
    try:
        while not drain.is_set():
            if all(not q.isActive for q in queries.values()):
                break
            if deadline is not None and time.monotonic() >= deadline:
                break
            time.sleep(0.2)
        for q in queries.values():
            if q.isActive:
                q.stop()  # graceful: in-flight batch finishes + commits
        for q in queries.values():
            q.awaitTermination(30)
    finally:
        for sig, prev in installed.items():
            signal.signal(sig, prev)
    snapshot = {pid: m.snapshot() for pid, m in metrics.items()}
    if server is not None:
        server.stop()
    print(json.dumps({"pipelines": sorted(queries), "output_root": out_root,
                      "metrics": snapshot, "drained": drain.is_set()}))
    return 0


def cmd_route(args) -> int:
    """The router as a CLI surface: with no NAME, print every semantic
    route's current resolution; with NAME, resolve (optionally
    ``--ensure`` the layout first) and optionally ``--run`` it."""
    from stream_processor_spark.router import ROUTES, Router
    from stream_processor_spark.session import get_spark

    spark = get_spark("route")
    spark.sparkContext.setLogLevel("ERROR")
    r = Router(spark, args.sf_dir)
    if not args.name:
        report = {
            name: {"entry": entry, "plan": how}
            for name, (entry, how) in sorted(r.plan_report().items())
        }
        print(json.dumps(report, indent=1))
        return 0
    if args.name not in ROUTES:
        print(f"unknown route {args.name!r}; routes: {sorted(ROUTES)}", file=sys.stderr)
        return 2
    if args.ensure:
        r.ensure(args.name)
    entry, how = r.resolve(args.name)
    print(json.dumps({"route": args.name, "entry": entry, "plan": how}))
    if args.run:
        r.query(args.name).show(args.limit, truncate=False)
    return 0


def cmd_bench(_args) -> int:
    import bench

    bench.main()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="stream_processor_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list-queries")

    q = sub.add_parser("run-query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--save", default=None, help="write result parquet here instead of showing")

    r = sub.add_parser("run-pipelines")
    r.add_argument("--catalog", default=None, help="pipeline catalog JSON")
    r.add_argument("--jdbc", default=None,
                   help="load the catalog over JDBC (the reference's Postgres "
                        "control plane) instead of --catalog")
    r.add_argument("--broker", required=True, help="file-topic broker root dir")
    r.add_argument("--checkpoint", default=None)
    r.add_argument("--output", default=None)
    r.add_argument("--timeout", type=int, default=300, help="seconds per pipeline")
    r.add_argument("--metrics-port", type=int, default=None,
                   help="serve /metrics + /health on this port (0 = ephemeral)")
    r.add_argument("--follow-interval", type=float, default=None,
                   help="run continuously with this micro-batch interval "
                        "(seconds) instead of draining the backlog and "
                        "stopping; terminate with SIGTERM (graceful drain)")

    sub.add_parser("bench")

    rt = sub.add_parser("route")
    rt.add_argument("name", nargs="?", default=None)
    rt.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    rt.add_argument("--ensure", action="store_true",
                    help="build the route's layout(s) before resolving")
    rt.add_argument("--run", action="store_true", help="run the routed query")
    rt.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)
    return {
        "list-queries": cmd_list_queries,
        "run-query": cmd_run_query,
        "run-pipelines": cmd_run_pipelines,
        "bench": cmd_bench,
        "route": cmd_route,
    }[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
