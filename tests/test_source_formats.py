"""Source-format breadth: the engine's tables round-trip through JSONL
and CSV (the interchange formats corpus pipelines actually ingest)
without loss — including the documents table's free text, which
exercises quoting/escaping in both writers/readers."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processor_spark.catalog import Tables


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_documents_roundtrip_jsonl(spark, sf_dir, tmp_path):
    d = Tables(spark, sf_dir).documents
    path = str(tmp_path / "docs_jsonl")
    d.write.json(path)
    back = spark.read.schema(d.schema).json(path)
    assert _rows(back) == _rows(d)


def test_documents_roundtrip_csv(spark, sf_dir, tmp_path):
    d = Tables(spark, sf_dir).documents
    path = str(tmp_path / "docs_csv")
    # quote-all + escaping so embedded commas/quotes in text survive
    d.write.option("header", True).option("quoteAll", True).option(
        "escape", '"'
    ).csv(path)
    back = spark.read.schema(d.schema).option("header", True).option(
        "escape", '"'
    ).csv(path)
    assert _rows(back) == _rows(d)


def test_lineitem_roundtrip_jsonl_preserves_aggregates(spark, sf_dir, tmp_path):
    """Format change must not move a single cent: the fixed-point Q1
    sums over the JSONL copy equal the parquet originals exactly."""
    from stream_processor_spark.queries.relational import dsum

    l = Tables(spark, sf_dir).lineitem
    path = str(tmp_path / "li_jsonl")
    l.write.json(path)
    back = spark.read.schema(l.schema).json(path)

    def q1(df):
        return sorted(
            tuple(r)
            for r in df.groupBy("l_returnflag")
            .agg(dsum(F.col("l_extendedprice")).alias("s"))
            .collect()
        )

    assert q1(back) == q1(l)


def test_documents_roundtrip_orc(spark, sf_dir, tmp_path):
    """ORC — the other columnar format Spark ships natively — preserves
    the documents table bit-for-bit, free text included."""
    d = Tables(spark, sf_dir).documents
    path = str(tmp_path / "docs_orc")
    d.write.orc(path)
    back = spark.read.orc(path)
    assert _rows(back) == _rows(d)


def test_lineitem_roundtrip_orc_preserves_aggregates(spark, sf_dir, tmp_path):
    l = Tables(spark, sf_dir).lineitem
    path = str(tmp_path / "li_orc")
    l.write.orc(path)
    back = spark.read.orc(path)
    agg = lambda df: df.agg(  # noqa: E731
        F.count(F.lit(1)),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")),
        F.min("l_shipdate"),
        F.max("l_shipdate"),
    ).collect()[0]
    assert agg(back) == agg(l)
