"""Pipeline catalog: the reference's Postgres control plane as dataclasses.

Reference schema (SURVEY.md §1.3, inferred from src/listen.js:46-87 and
scripts/pipelines/insertTestPipelines.js:52-58):

    pipelines(id, name UNIQUE, source_topic_id, target_topic_id,
              incoming_schema_id, outgoing_schema_id, steps JSONB, is_active)
    topics(id, topic_name UNIQUE)
    schemas(id, schema_name UNIQUE)
    processors(id, processor_name UNIQUE, is_filter)
    -- steps: {"processors": [id, ...], "dlq": [topic_id | null, ...]}
    --        parallel arrays; dlq[i] is step i's DLQ topic (may be null)

The engine stores the same relations as a JSON document (or any mapping) —
at plan-build time everything resolves to names once (the reference's
per-message Postgres cache hits, consumer.js:53-84, disappear: catalog
constants are baked into the Catalyst plan).

Deviation from the reference, by design: the reference decodes with the
OUTGOING schema id (consumer.js:241 passes outgoingSchemaId; the
incomingSchemaId resolved at :214 is never used) and only works because the
demo pipelines use identical subjects. We implement the intended semantics
— decode with incoming, encode with outgoing (SURVEY.md §1.2).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Steps:
    """Ordered processor chain with positional DLQ topics (parallel arrays)."""

    processors: list[int]
    dlq: list[int | None] = field(default_factory=list)

    def __post_init__(self):
        if self.dlq and len(self.dlq) != len(self.processors):
            raise ValueError("steps.dlq must parallel steps.processors (insertTestPipelines.js:23)")


@dataclass(frozen=True)
class ProcessorDef:
    id: int
    processor_name: str
    is_filter: bool = False


@dataclass(frozen=True)
class PipelineDef:
    id: int
    name: str
    source_topic_id: int
    target_topic_id: int
    incoming_schema_id: int
    outgoing_schema_id: int
    steps: Steps
    is_active: bool = True


@dataclass
class ResolvedPipeline:
    """A pipeline with every id resolved to its name (listen.js:58-87)."""

    id: int
    name: str
    source_topic: str
    target_topic: str
    incoming_schema: str
    outgoing_schema: str
    processor_names: list[str]
    processor_is_filter: list[bool]
    dlq_topics: list[str | None]


class PipelineCatalog:
    """In-memory catalog over the four reference relations."""

    def __init__(self):
        self.pipelines: dict[int, PipelineDef] = {}
        self.topics: dict[int, str] = {}
        self.schemas: dict[int, str] = {}
        self.processors: dict[int, ProcessorDef] = {}

    # -- population -------------------------------------------------------

    @classmethod
    def from_dict(cls, doc: dict) -> "PipelineCatalog":
        cat = cls()
        for t in doc.get("topics", []):
            cat.topics[int(t["id"])] = t["topic_name"]
        for s in doc.get("schemas", []):
            cat.schemas[int(s["id"])] = s["schema_name"]
        for p in doc.get("processors", []):
            cat.processors[int(p["id"])] = ProcessorDef(
                id=int(p["id"]),
                processor_name=p["processor_name"],
                is_filter=bool(p.get("is_filter", False)),
            )
        for pl in doc.get("pipelines", []):
            steps_raw = pl["steps"]
            if isinstance(steps_raw, str):
                steps_raw = json.loads(steps_raw)
            steps = Steps(
                processors=[int(x) for x in steps_raw["processors"]],
                dlq=[None if x is None else int(x) for x in steps_raw.get("dlq", [])],
            )
            d = PipelineDef(
                id=int(pl["id"]),
                name=pl["name"],
                source_topic_id=int(pl["source_topic_id"]),
                target_topic_id=int(pl["target_topic_id"]),
                incoming_schema_id=int(pl["incoming_schema_id"]),
                outgoing_schema_id=int(pl["outgoing_schema_id"]),
                steps=steps,
                is_active=bool(pl.get("is_active", True)),
            )
            cat.pipelines[d.id] = d
        return cat

    @classmethod
    def from_json(cls, path: str) -> "PipelineCatalog":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    @classmethod
    def from_jdbc(
        cls,
        spark,
        url: str,
        properties: dict[str, str] | None = None,
        table_prefix: str = "",
    ) -> "PipelineCatalog":
        """Load the control plane from the reference's Postgres relations
        over JDBC — the engine's ``listen.js`` resolution path
        (listen.js:46-87 SELECTs pipelines → topics/schemas by id).

        Works against any JDBC database exposing the four tables
        (``pipelines topics schemas processors``); production is Postgres
        (the reference's db.js pool), tests use Spark's bundled embedded
        Derby. Control-plane tables are tiny (dozens of rows) — they are
        collected to the driver ONCE at catalog-build time, exactly like
        the reference resolves names once at startup; nothing JDBC
        remains in the per-batch path.
        """
        props = dict(properties or {})

        def rows(table: str) -> list[dict]:
            df = spark.read.jdbc(url, table_prefix + table, properties=props)
            # Derby/Oracle uppercase unquoted identifiers; normalize
            return [
                {k.lower(): v for k, v in r.asDict().items()} for r in df.collect()
            ]

        return cls.from_dict(
            {
                "topics": rows("topics"),
                "schemas": rows("schemas"),
                "processors": rows("processors"),
                "pipelines": rows("pipelines"),
            }
        )

    # -- resolution (listen.js:46-87) -------------------------------------

    def active_pipeline_ids(self) -> list[int]:
        """deploy-pipelines.sh:365 — SELECT id FROM pipelines WHERE is_active."""
        return sorted(pid for pid, p in self.pipelines.items() if p.is_active)

    def resolve(self, pipeline_id: int) -> ResolvedPipeline:
        """Resolve one pipeline's ids to names; raises if inactive/missing
        (listen.js:47 filters ``is_active = true``)."""
        p = self.pipelines.get(pipeline_id)
        if p is None or not p.is_active:
            raise KeyError(f"no active pipeline with id {pipeline_id}")
        dlq = p.steps.dlq or [None] * len(p.steps.processors)
        procs = [self.processors[i] for i in p.steps.processors]
        return ResolvedPipeline(
            id=p.id,
            name=p.name,
            source_topic=self.topics[p.source_topic_id],
            target_topic=self.topics[p.target_topic_id],
            incoming_schema=self.schemas[p.incoming_schema_id],
            outgoing_schema=self.schemas[p.outgoing_schema_id],
            processor_names=[pr.processor_name for pr in procs],
            processor_is_filter=[pr.is_filter for pr in procs],
            dlq_topics=[None if d is None else self.topics[d] for d in dlq],
        )
