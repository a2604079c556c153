"""Confluent Schema Registry HTTP client + subject resolution.

Reference behavior being re-expressed (not copied):
- at startup the consumer resolves each pipeline's subjects to schema ids
  over HTTP (src/consumer.js:212-219 ``registry.getLatestSchemaId``) and
  keeps an id-keyed schema cache for decode (consumer.js:46,117-124);
- ops tooling enumerates ``GET /subjects`` to mirror the registry into
  the catalog store (scripts/pipelines/getTopicsAndSchemas.js:63).

Engine model: :class:`ConfluentRegistryClient` is a tiny stdlib-urllib
client for the public Confluent Schema Registry REST API (GET /subjects,
GET /subjects/{s}/versions/latest, GET /schemas/ids/{id}) with
resolve-once caches — registry round-trips happen at PLAN TIME only;
the per-message "cache hit" of the reference is a Column expression in
the streaming plan, so executors never talk to the registry.

:func:`resolve_subjects` turns live registry subjects into the engine's
:class:`~stream_processor_spark.pipeline.codecs.SubjectSchema` entries
(Confluent-framed, id attached), with a catalog/dict fallback when the
registry is unreachable — mirroring the reference's catalog mirror of
``/subjects``.
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request
from dataclasses import dataclass

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from stream_processor_spark.pipeline.codecs import AVRO, JSON, SchemaRegistry, SubjectSchema


@dataclass(frozen=True)
class RegistrySubjectVersion:
    """One resolved subject version from the registry REST API."""

    subject: str
    schema_id: int
    version: int
    schema_type: str  # AVRO (registry default) | JSON | PROTOBUF
    schema_str: str


class ConfluentRegistryClient:
    """Minimal Confluent Schema Registry REST client (stdlib only).

    Auth is HTTP basic (the hosted-registry API-key scheme the reference
    uses via its client library). All lookups are cached so a subject or
    id is resolved over HTTP exactly once per client instance —
    "resolve once at startup" is a property of the object, testable by
    counting requests against a stub server.
    """

    def __init__(self, base_url: str, auth: tuple[str, str] | None = None,
                 timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._headers = {"Accept": "application/vnd.schemaregistry.v1+json"}
        if auth is not None:
            token = base64.b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
            self._headers["Authorization"] = f"Basic {token}"
        self._latest: dict[str, RegistrySubjectVersion] = {}
        self._by_id: dict[int, RegistrySubjectVersion] = {}

    # -- raw HTTP ----------------------------------------------------------

    def _get(self, path: str):
        req = urllib.request.Request(self.base_url + path, headers=self._headers)
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode())

    # -- API ---------------------------------------------------------------

    def subjects(self) -> list[str]:
        """GET /subjects — the registry's subject enumeration
        (getTopicsAndSchemas.js:63)."""
        return list(self._get("/subjects"))

    def get_latest(self, subject: str) -> RegistrySubjectVersion:
        """GET /subjects/{subject}/versions/latest — the startup
        resolution (consumer.js:214-215), cached per subject."""
        if subject not in self._latest:
            doc = self._get(f"/subjects/{subject}/versions/latest")
            v = RegistrySubjectVersion(
                subject=subject,
                schema_id=int(doc["id"]),
                version=int(doc.get("version", 1)),
                schema_type=doc.get("schemaType", "AVRO"),
                schema_str=doc["schema"],
            )
            self._latest[subject] = v
            self._by_id[v.schema_id] = v
        return self._latest[subject]

    def get_latest_schema_id(self, subject: str) -> int:
        return self.get_latest(subject).schema_id

    def get_schema(self, schema_id: int,
                   subject: str | None = None) -> RegistrySubjectVersion:
        """GET /schemas/ids/{id} — the id-keyed fetch behind the
        reference's schemaCache (consumer.js:121-123), cached per id."""
        if schema_id not in self._by_id:
            doc = self._get(f"/schemas/ids/{schema_id}")
            self._by_id[schema_id] = RegistrySubjectVersion(
                subject=subject or doc.get("subject", ""),
                schema_id=schema_id,
                version=int(doc.get("version", 0)),
                schema_type=doc.get("schemaType", "AVRO"),
                schema_str=doc["schema"],
            )
        return self._by_id[schema_id]


# -- schema-document → Spark schema conversion -----------------------------

_AVRO_PRIMITIVES: dict[str, DataType] = {
    "string": StringType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "boolean": BooleanType(),
    "bytes": BinaryType(),
}


def _avro_type(node) -> tuple[DataType, bool]:
    """(spark type, nullable) for an avro type node (the subset the
    vendored wire codec supports: primitives, nullable unions, arrays,
    nested records)."""
    if isinstance(node, str):
        if node == "null":
            return StringType(), True
        if node in _AVRO_PRIMITIVES:
            return _AVRO_PRIMITIVES[node], False
        raise ValueError(f"unsupported avro type {node!r}")
    if isinstance(node, list):  # union — nullable iff 'null' is a branch
        branches = [b for b in node if b != "null"]
        nullable = len(branches) != len(node)
        if len(branches) != 1:
            raise ValueError(f"unsupported non-simple union {node!r}")
        t, _ = _avro_type(branches[0])
        return t, nullable
    if isinstance(node, dict):
        if node.get("type") == "array":
            t, _ = _avro_type(node["items"])
            return ArrayType(t), False
        if node.get("type") == "record":
            return avro_to_spark_schema(node), False
        return _avro_type(node["type"])
    raise ValueError(f"unsupported avro node {node!r}")


def avro_to_spark_schema(avro_schema: str | dict) -> StructType:
    """Avro record schema (JSON text or parsed) → Spark StructType."""
    doc = json.loads(avro_schema) if isinstance(avro_schema, str) else avro_schema
    if doc.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    fields = []
    for f in doc["fields"]:
        t, nullable = _avro_type(f["type"])
        fields.append(StructField(f["name"], t, nullable))
    return StructType(fields)


_JSONSCHEMA_TYPES: dict[str, DataType] = {
    "string": StringType(),
    "integer": LongType(),
    "number": DoubleType(),
    "boolean": BooleanType(),
}


def json_schema_to_spark_schema(schema_str: str | dict) -> StructType:
    """JSON-Schema document (the registry's JSON schemaType) → StructType
    (flat object subset, matching the reference's demo record shapes)."""
    doc = json.loads(schema_str) if isinstance(schema_str, str) else schema_str
    if doc.get("type") != "object":
        raise ValueError("top-level JSON schema must be an object")
    required = set(doc.get("required", []))
    fields = []
    for name, prop in doc.get("properties", {}).items():
        t = _JSONSCHEMA_TYPES.get(prop.get("type"))
        if t is None:
            raise ValueError(f"unsupported JSON-schema property type {prop!r}")
        fields.append(StructField(name, t, name not in required))
    return StructType(fields)


def subject_schema_from_version(v: RegistrySubjectVersion) -> SubjectSchema:
    """Registry version → engine SubjectSchema (Confluent-framed)."""
    if v.schema_type == "AVRO":
        return SubjectSchema(
            subject=v.subject,
            fmt=AVRO,
            spark_schema=avro_to_spark_schema(v.schema_str),
            avro_json=v.schema_str,
            schema_id=v.schema_id,
        )
    if v.schema_type == "JSON":
        return SubjectSchema(
            subject=v.subject,
            fmt=JSON,
            spark_schema=json_schema_to_spark_schema(v.schema_str),
            schema_id=v.schema_id,
        )
    # PROTOBUF registry schemas need a compiled descriptor to execute;
    # surfacing the gap beats silently mis-decoding
    raise NotImplementedError(
        f"registry schemaType {v.schema_type!r} needs a compiled descriptor; "
        "register a SubjectSchema with proto_descriptor/proto_spec directly"
    )


def resolve_subjects(
    client: ConfluentRegistryClient | None,
    subjects: list[str],
    fallback: SchemaRegistry | None = None,
) -> SchemaRegistry:
    """Resolve each subject to its latest registry version (one HTTP hit
    per subject — startup-time, consumer.js:212-219), falling back to a
    local/catalog-backed :class:`SchemaRegistry` entry when the registry
    is unreachable or lacks the subject.

    Raises if a subject resolves nowhere — a pipeline cannot run without
    its schema contract (the reference aborts startup the same way,
    consumer.js:216-218).
    """
    out = SchemaRegistry()
    for subject in subjects:
        resolved = None
        if client is not None:
            try:
                resolved = subject_schema_from_version(client.get_latest(subject))
            except (
                urllib.error.URLError,
                urllib.error.HTTPError,
                OSError,
                NotImplementedError,
            ):
                # NotImplementedError: a PROTOBUF subject whose descriptor
                # the wire format can't carry — the fallback registry may
                # hold the proto_descriptor entry, so fall through to it.
                resolved = None
        if resolved is None and fallback is not None:
            try:
                resolved = fallback.get(subject)
            except KeyError:
                resolved = None
        if resolved is None:
            raise KeyError(
                f"subject {subject!r} not resolvable from registry or fallback"
            )
        out.register(resolved)
    return out
