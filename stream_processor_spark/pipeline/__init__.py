"""Streaming-pipeline engine: reference-parity control plane on Spark.

The reference runs one Kubernetes pod per catalog-defined pipeline
(Postgres rows → consumer loop); this engine runs one Structured Streaming
query per pipeline definition inside a single Spark application. See
``catalog`` (definitions + JDBC loader), ``processors`` (registry +
chains), ``codecs`` (wire formats incl. Confluent framing, with vendored
``avro_py``/``proto_py`` fallbacks), ``runner`` (plan builder + sinks),
``metrics`` (reference-name metric parity), ``exporter`` (/metrics +
/health HTTP server).
"""

from stream_processor_spark.pipeline.catalog import (  # noqa: F401
    PipelineCatalog,
    PipelineDef,
    ProcessorDef,
    Steps,
)
from stream_processor_spark.pipeline.codecs import (  # noqa: F401
    SchemaRegistry,
    SubjectSchema,
)
from stream_processor_spark.pipeline.exporter import MetricsServer  # noqa: F401
from stream_processor_spark.pipeline.metrics import PipelineMetrics  # noqa: F401
from stream_processor_spark.pipeline.processors import (  # noqa: F401
    BUILTIN_PROCESSORS,
    ProcessorRegistry,
)
from stream_processor_spark.pipeline.runner import PipelineRunner, Sink  # noqa: F401
