"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

The reference's processors ARE user-defined functions (arbitrary JS modules
loaded by name, src/consumer.js:90-91); the engine equivalent is the
processor registry (pipeline/processors.py) backed by Arrow-vectorized
pandas_udfs — never row-at-a-time Python. These queries prove the three UDF
shapes end-to-end against the oracle where determinism allows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

from stream_processor_spark.queries.base import register


@pandas_udf(LongType())
def _add10(nums: pd.Series) -> pd.Series:
    """Vectorized reimplementation of src/transformations/add10.js:5."""
    return nums + 10


@register(
    "udf_scalar",
    oracle="SELECT event_id, user_id + 10 AS num FROM events",
)
def udf_scalar(t):
    """Scalar pandas_udf (Arrow-batched) — add10 parity vs pure SQL oracle."""
    return t.events.select("event_id", _add10(F.col("user_id")).alias("num"))


@pandas_udf(DoubleType())
def _median_value(v: pd.Series) -> float:
    """GROUPED_AGG median — not expressible as a built-in exact aggregate.

    Median is order-insensitive → deterministic, so it hash-checks against
    DuckDB's exact median().
    """
    return float(v.median())


@pandas_udf(LongType())
def _count_values(v: pd.Series) -> int:
    return int(len(v))


@register(
    "udaf_grouped",
    oracle="""
    SELECT event_type,
           median(value) AS median_value,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def udaf_grouped(t):
    """Grouped-agg pandas_udfs (UDAF): exact median + count per event_type.

    (Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
    aggregates in one agg, so the count is a pandas aggregate too.)
    """
    return t.events.groupBy("event_type").agg(
        _median_value(F.col("value")).alias("median_value"),
        _count_values(F.col("value")).alias("n"),
    )


@register(
    "udtf_flatmap",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    """,
)
def udtf_flatmap(t):
    """UDTF shape: mapInPandas emitting N output rows per input row."""

    def explode_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            out = pdf[["doc_id"]].copy()
            out["token"] = toks
            yield out.explode("token", ignore_index=True)

    return t.documents.select("doc_id", "text").mapInPandas(
        explode_tokens, schema="doc_id long, token string"
    )


@register(
    "udf_grouped_map_normalize",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN MAX(value) OVER w = MIN(value) OVER w THEN 0.0
                ELSE (value - MIN(value) OVER w)
                     / (MAX(value) OVER w - MIN(value) OVER w) END AS value_norm
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def udf_grouped_map_normalize(t):
    """Grouped-map applyInPandas: per-group min-max normalization.

    The fourth UDF shape (after scalar / grouped-agg / mapInPandas):
    a whole pandas frame per group in, a frame out. Min/max are exact, so
    the normalization is deterministic and hash-checks against the window
    formulation in SQL — also demonstrating that a grouped-map UDF and a
    window expression are interchangeable plans for this class of feature
    engineering (the window form is preferred at scale: no Python).
    """

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["value"].min(), pdf["value"].max()
        out = pdf[["event_id", "event_type"]].copy()
        out["value_norm"] = 0.0 if hi == lo else (pdf["value"] - lo) / (hi - lo)
        return out

    return (
        t.events.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(normalize, schema="event_id long, event_type string, value_norm double")
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) * 2
             + l_linenumber AS derived
    FROM lineitem
    """,
)
def udf_map_in_arrow(t):
    """mapInArrow: the fifth UDF shape — raw pyarrow RecordBatch in/out,
    no pandas materialization at all (zero-copy columnar, the fastest
    Python surface Spark offers; the right one for batch-level work on
    Arrow-native data like tensors or large binary columns).

    The kernel derives ``quantity_cents * 2 + linenumber`` with pyarrow
    compute (integer-exact, so it hash-checks). Scale notes: narrow
    map-only stage, no shuffle; Arrow batches stream through without a
    pandas copy — for multimodal binary columns this halves peak Python
    memory vs mapInPandas.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def derive(batches):
        for batch in batches:
            q = batch.column("l_quantity")
            cents = pc.cast(
                pc.floor(pc.add(pc.multiply(q, pa.scalar(100.0)),
                                pa.scalar(0.5))),
                pa.int64(),
            )
            derived = pc.add(
                pc.multiply(cents, pa.scalar(2, pa.int64())),
                pc.cast(batch.column("l_linenumber"), pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_orderkey"), batch.column("l_linenumber"),
                 derived],
                names=["l_orderkey", "l_linenumber", "derived"],
            )

    return t.lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).mapInArrow(
        derive, schema="l_orderkey long, l_linenumber int, derived long"
    )
