"""Streaming-pipeline engine: reference-parity control plane on Spark.

The reference runs one Kubernetes pod per catalog-defined pipeline
(Postgres rows → consumer loop); this engine runs one Structured Streaming
query per pipeline definition inside a single Spark application. See
``catalog`` (definitions), ``processors`` (registry + chains), ``codecs``
(wire formats), ``runner`` (plan builder + sinks), ``metrics``
(reference-name metric parity).
"""

from stream_processor_spark.pipeline.catalog import (  # noqa: F401
    PipelineCatalog,
    PipelineDef,
    ProcessorDef,
    Steps,
)
from stream_processor_spark.pipeline.processors import (  # noqa: F401
    BUILTIN_PROCESSORS,
    ProcessorRegistry,
)
from stream_processor_spark.pipeline.runner import PipelineRunner  # noqa: F401
