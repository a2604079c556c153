"""Confluent Schema Registry HTTP client + per-message schema-id dispatch.

Covers the two reference behaviors the engine lacked through round 3:
- startup subject resolution over HTTP with resolve-once caching
  (consumer.js:212-219) and /subjects enumeration
  (getTopicsAndSchemas.js:63), with catalog fallback;
- per-message decode through the id each record carries in its wire
  frame (consumer.js:46,117-124): one topic interleaving two schema
  versions round-trips both; unknown ids route as errors.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from pyspark.sql import functions as F

from stream_processor_spark.pipeline.codecs import (
    JSON,
    SchemaRegistry,
    SubjectSchema,
    wire_header,
)
from stream_processor_spark.pipeline.registry_http import (
    ConfluentRegistryClient,
    avro_to_spark_schema,
    json_schema_to_spark_schema,
    resolve_subjects,
)

DEMO_AVRO = json.dumps(
    {
        "type": "record",
        "name": "demo",
        "fields": [
            {"name": "key", "type": ["null", "string"]},
            {"name": "value", "type": ["null", "string"]},
            {"name": "num", "type": "long"},
        ],
    }
)

DEMO_JSONSCHEMA = json.dumps(
    {
        "type": "object",
        "properties": {
            "key": {"type": "string"},
            "value": {"type": "string"},
            "num": {"type": "integer"},
        },
    }
)


class _StubRegistry(BaseHTTPRequestHandler):
    """Minimal Confluent REST API stub; counts requests per path."""

    subjects = {
        "demo-avro": {"id": 31, "version": 2, "schema": DEMO_AVRO},
        "demo-json": {
            "id": 32,
            "version": 1,
            "schemaType": "JSON",
            "schema": DEMO_JSONSCHEMA,
        },
    }
    hits: dict[str, int] = {}

    def do_GET(self):  # noqa: N802 (stdlib naming)
        type(self).hits[self.path] = type(self).hits.get(self.path, 0) + 1
        if self.path == "/subjects":
            body = json.dumps(sorted(self.subjects))
        else:
            parts = self.path.strip("/").split("/")
            if (
                len(parts) == 4
                and parts[0] == "subjects"
                and parts[2] == "versions"
                and parts[3] == "latest"
                and parts[1] in self.subjects
            ):
                body = json.dumps(self.subjects[parts[1]])
            else:
                self.send_response(404)
                self.end_headers()
                return
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def stub_registry_url():
    _StubRegistry.hits = {}
    server = HTTPServer(("127.0.0.1", 0), _StubRegistry)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_client_subjects_and_resolve_once(stub_registry_url):
    client = ConfluentRegistryClient(stub_registry_url)
    assert client.subjects() == ["demo-avro", "demo-json"]
    v = client.get_latest("demo-avro")
    assert (v.schema_id, v.version, v.schema_type) == (31, 2, "AVRO")
    # resolve-once: repeated lookups are cache hits, no extra HTTP
    for _ in range(3):
        assert client.get_latest_schema_id("demo-avro") == 31
    assert _StubRegistry.hits["/subjects/demo-avro/versions/latest"] == 1
    # id-keyed cache was filled by the subject resolution
    assert client.get_schema(31).schema_str == DEMO_AVRO


def test_resolve_subjects_builds_framed_registry(stub_registry_url):
    client = ConfluentRegistryClient(stub_registry_url)
    reg = resolve_subjects(client, ["demo-avro", "demo-json"])
    a, j = reg.get("demo-avro"), reg.get("demo-json")
    assert a.fmt == "avro" and a.schema_id == 31 and a.avro_json == DEMO_AVRO
    assert [f.name for f in a.spark_schema.fields] == ["key", "value", "num"]
    assert j.fmt == "json" and j.schema_id == 32
    assert reg.is_framed("demo-avro") and reg.is_framed("demo-json")


def test_resolve_subjects_fallback_when_unreachable():
    dead = ConfluentRegistryClient("http://127.0.0.1:1", timeout=0.2)
    local = SchemaRegistry()
    local.register(
        SubjectSchema(
            subject="demo-json",
            fmt=JSON,
            spark_schema=json_schema_to_spark_schema(DEMO_JSONSCHEMA),
            schema_id=99,
        )
    )
    reg = resolve_subjects(dead, ["demo-json"], fallback=local)
    assert reg.get("demo-json").schema_id == 99
    with pytest.raises(KeyError):
        resolve_subjects(dead, ["absent"], fallback=local)


def test_resolve_subjects_protobuf_falls_through_to_fallback(stub_registry_url):
    """A live registry carrying a PROTOBUF subject must not abort subject
    resolution: the wire document has no compiled descriptor, so the
    resolver falls through to the fallback registry that does carry one
    (the exact setup the NotImplementedError message tells users to make)."""
    _StubRegistry.subjects = dict(
        _StubRegistry.subjects,
        **{
            "demo-proto": {
                "id": 33,
                "version": 1,
                "schemaType": "PROTOBUF",
                "schema": 'syntax = "proto3"; message Demo { string key = 1; }',
            }
        },
    )
    try:
        client = ConfluentRegistryClient(stub_registry_url)
        local = SchemaRegistry()
        local.register(
            SubjectSchema(
                subject="demo-proto",
                fmt="protobuf",
                spark_schema=json_schema_to_spark_schema(DEMO_JSONSCHEMA),
                schema_id=33,
                proto_descriptor="/fixtures/demo.desc",
                proto_message="Demo",
            )
        )
        reg = resolve_subjects(client, ["demo-proto", "demo-avro"], fallback=local)
        assert reg.get("demo-proto").proto_message == "Demo"
        # non-proto subjects still resolve over HTTP, not the fallback
        assert reg.get("demo-avro").schema_id == 31
    finally:
        _StubRegistry.subjects = {
            k: v for k, v in _StubRegistry.subjects.items() if k != "demo-proto"
        }


def test_schema_document_conversions():
    st = avro_to_spark_schema(DEMO_AVRO)
    assert [(f.name, f.dataType.simpleString(), f.nullable) for f in st.fields] == [
        ("key", "string", True),
        ("value", "string", True),
        ("num", "bigint", False),
    ]
    js = json_schema_to_spark_schema(DEMO_JSONSCHEMA)
    assert [f.dataType.simpleString() for f in js.fields] == [
        "string",
        "string",
        "bigint",
    ]


V1_SCHEMA = json_schema_to_spark_schema(
    json.dumps(
        {
            "type": "object",
            "properties": {"key": {"type": "string"}, "num": {"type": "integer"}},
        }
    )
)
V2_SCHEMA = json_schema_to_spark_schema(DEMO_JSONSCHEMA)


def _two_version_registry() -> SchemaRegistry:
    reg = SchemaRegistry()
    reg.register(
        SubjectSchema(subject="demo", fmt=JSON, spark_schema=V2_SCHEMA, schema_id=8)
    )
    reg.register_version(
        SubjectSchema(subject="demo", fmt=JSON, spark_schema=V1_SCHEMA, schema_id=7)
    )
    return reg


def test_per_message_schema_id_dispatch(spark):
    """One topic, two registered versions: each record decodes with the
    version its OWN frame names; old-version records project into the
    latest field set (missing → NULL); unknown id and bad magic → NULL
    record (routed error), not a crash."""
    reg = _two_version_registry()
    frames = [
        ("a", wire_header(7) + json.dumps({"key": "a", "num": 1}).encode()),
        (
            "b",
            wire_header(8)
            + json.dumps({"key": "b", "value": "vb", "num": 2}).encode(),
        ),
        ("c", wire_header(9) + json.dumps({"key": "c", "num": 3}).encode()),
        ("d", b"\x01junkjunk"),  # bad magic
    ]
    df = spark.createDataFrame(frames, "key string, value binary")
    out = (
        df.select("key", reg.decode("demo", F.col("value")).alias("r"))
        .orderBy("key")
        .collect()
    )
    assert [(r.key, None if r.r is None else (r.r.key, r.r.value, r.r.num)) for r in out] == [
        ("a", ("a", None, 1)),   # v1 frame: value projected to NULL
        ("b", ("b", "vb", 2)),   # v2 frame: full record
        ("c", None),             # unregistered id → routed error row
        ("d", None),             # bad magic → routed error row
    ]


def test_dispatch_round_trips_through_runner(spark, tmp_path):
    """Runner end-to-end with a mixed-version topic: both versions'
    records flow through the chain; the v1 record (null value) routes to
    the step DLQ exactly like any null-value record."""
    from stream_processor_spark.pipeline.catalog import PipelineCatalog
    from stream_processor_spark.pipeline.processors import BUILTIN_PROCESSORS
    from stream_processor_spark.pipeline.runner import PipelineRunner, Sink

    doc = {
        "topics": [
            {"id": 1, "topic_name": "t-in"},
            {"id": 2, "topic_name": "t-out"},
            {"id": 3, "topic_name": "dlq-cap"},
        ],
        "schemas": [{"id": 1, "schema_name": "demo"}],
        "processors": [{"id": 11, "processor_name": "capitalize", "is_filter": False}],
        "pipelines": [
            {
                "id": 1,
                "name": "mixed",
                "source_topic_id": 1,
                "target_topic_id": 2,
                "incoming_schema_id": 1,
                "outgoing_schema_id": 1,
                "steps": {"processors": [11], "dlq": [3]},
            }
        ],
    }
    runner = PipelineRunner(
        PipelineCatalog.from_dict(doc), BUILTIN_PROCESSORS, _two_version_registry()
    )
    frames = [
        ("a", wire_header(7) + json.dumps({"key": "a", "num": 1}).encode()),
        (
            "b",
            wire_header(8)
            + json.dumps({"key": "b", "value": "vb", "num": 2}).encode(),
        ),
    ]
    source = spark.createDataFrame(frames, "key string, value binary")
    target = Sink("parquet", str(tmp_path / "target"))
    dlq = Sink("parquet", str(tmp_path / "dlq"))
    counts = runner.run_batch(1, source, target, {"dlq-cap": dlq})
    assert counts == {"ok": 1, "dlq_capitalize": 1}
    ok = spark.read.parquet(target.path_or_topic).collect()
    assert len(ok) == 1 and ok[0].key == "b"
    # the framed ok payload decodes back to the transformed v2 record
    back = json.loads(bytes(ok[0].value)[5:].decode())
    assert back == {"key": "b", "value": "VB", "num": 2}


def test_runner_from_registry_resolves_once_at_startup(stub_registry_url):
    """PipelineRunner.from_registry hits the registry once per distinct
    subject at construction (consumer.js:212-219) — two pipelines sharing
    a subject produce ONE HTTP resolution, and none at run time."""
    from stream_processor_spark.pipeline.catalog import PipelineCatalog
    from stream_processor_spark.pipeline.processors import BUILTIN_PROCESSORS
    from stream_processor_spark.pipeline.runner import PipelineRunner

    doc = {
        "topics": [
            {"id": 1, "topic_name": "t-in"},
            {"id": 2, "topic_name": "t-out"},
        ],
        "schemas": [{"id": 1, "schema_name": "demo-json"}],
        "processors": [{"id": 10, "processor_name": "add10", "is_filter": False}],
        "pipelines": [
            {
                "id": pid,
                "name": f"p{pid}",
                "source_topic_id": 1,
                "target_topic_id": 2,
                "incoming_schema_id": 1,
                "outgoing_schema_id": 1,
                "steps": {"processors": [10]},
            }
            for pid in (1, 2)
        ],
    }
    client = ConfluentRegistryClient(stub_registry_url)
    runner = PipelineRunner.from_registry(
        PipelineCatalog.from_dict(doc), BUILTIN_PROCESSORS, client
    )
    assert runner.schemas.get("demo-json").schema_id == 32
    assert _StubRegistry.hits["/subjects/demo-json/versions/latest"] == 1


@pytest.mark.skipif(
    "SPARK_GRAFT_REGISTRY_URL" not in os.environ,
    reason="no live schema registry in this environment",
)
def test_live_registry_smoke():
    url = os.environ["SPARK_GRAFT_REGISTRY_URL"]
    auth = None
    if "SPARK_GRAFT_REGISTRY_KEY" in os.environ:
        auth = (
            os.environ["SPARK_GRAFT_REGISTRY_KEY"],
            os.environ.get("SPARK_GRAFT_REGISTRY_SECRET", ""),
        )
    client = ConfluentRegistryClient(url, auth=auth)
    assert isinstance(client.subjects(), list)
