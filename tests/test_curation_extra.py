"""Semantic invariants for the round-7c curation operators (oracle
parity itself is covered registry-wide by test_oracle_parity)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stream_processor_spark.catalog import Tables
from stream_processor_spark.queries import REGISTRY
from stream_processor_spark.queries.curation_extra import _SURP_SCALE, _WIN


@pytest.fixture(scope="module")
def dup_spans(spark, sf_dir):
    return REGISTRY["text_substring_dup_spans"].fn(spark, sf_dir).collect()


def test_dup_spans_coverage_bounds(dup_spans):
    """Coverage is an interval union inside the doc: 0 <= dup_tokens <=
    n_tokens, basis points in [0, 10000], and a doc too short to hold a
    single window can have no duplicated span."""
    assert dup_spans
    for r in dup_spans:
        assert 0 <= r.dup_tokens <= r.n_tokens
        assert 0 <= r.dup_bp <= 10000
        if r.n_tokens < _WIN:
            assert r.dup_tokens == 0


def test_dup_spans_covers_all_docs(spark, sf_dir, dup_spans):
    n_docs = (
        Tables(spark, sf_dir).documents.filter(F.col("text").isNotNull()).count()
    )
    assert len(dup_spans) == n_docs


def test_dup_spans_min_run_length(dup_spans):
    """A duplicated window marks >= _WIN tokens, so any doc with a dup
    has at least a full window's worth of covered tokens."""
    for r in dup_spans:
        if r.dup_tokens:
            assert r.dup_tokens >= _WIN


def test_fuzzy_survivors_consistent_with_pairs(spark, sf_dir):
    """n_kept == n_docs - |distinct doc_b| per source, straight from the
    same pair detector the summary runs on."""
    from stream_processor_spark.operators import dedup as dd

    t = Tables(spark, sf_dir)
    out = {r.source: r for r in REGISTRY["dedup_fuzzy_survivors"].fn(spark, sf_dir).collect()}
    pairs = dd.minhash_det_near_dup_pairs(t.documents)
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    by_src = {
        r.source: r.n
        for r in t.documents.join(dropped, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    totals = {
        r.source: r.n
        for r in t.documents.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(out) == set(totals)
    for src, r in out.items():
        assert r.n_docs == totals[src]
        assert r.n_kept == totals[src] - by_src.get(src, 0)
        assert 0 <= r.kept_tokens


def test_surprisal_floor_and_coverage(spark, sf_dir):
    """Per-token surprisal is (N*scale) div cnt >= scale (cnt <= N), so
    the floored mean is >= scale - 1; every non-null-text doc scores."""
    rows = REGISTRY["text_unigram_surprisal"].fn(spark, sf_dir).collect()
    n_docs = (
        Tables(spark, sf_dir).documents.filter(F.col("text").isNotNull()).count()
    )
    assert len(rows) == n_docs
    for r in rows:
        assert r.mean_surprisal >= _SURP_SCALE - 1
        assert r.n_tokens >= 1


def test_dup_spans_merged_equals_coverage_and_is_maximal(spark, sf_dir):
    """Round-8 maximal spans: per-doc span token sums must equal the
    coverage audit's dup_tokens (interval union), and consecutive spans
    must be separated by a real gap (maximality)."""
    from pyspark.sql import functions as F

    spans = REGISTRY["text_dup_spans_merged"].fn(spark, sf_dir)
    cov = REGISTRY["text_substring_dup_spans"].fn(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").alias("tok_sum")
    )
    joined = per_doc.join(cov, "doc_id")
    assert joined.filter(F.col("tok_sum") != F.col("dup_tokens")).count() == 0
    # no doc with dup_tokens > 0 is missing from the span list
    assert (
        cov.filter(F.col("dup_tokens") > 0)
        .join(per_doc, "doc_id", "left_anti")
        .count()
        == 0
    )
    rows = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in spans.collect()
    )
    for (d1, s1, e1), (d2, s2, e2) in zip(rows, rows[1:]):
        if d1 == d2:
            assert s2 > e1 + 1  # a merge would have joined them


def test_bigram_surprisal_separates_repetition_from_soup(spark, sf_dir):
    """Conditional surprisal sanity: every score is >= 1e6 * 1 (a
    bigram can't be more frequent than its head), docs with < 2 tokens
    are absent, and perfectly repetitive docs (all bigrams identical)
    sit at their head's minimum."""
    from pyspark.sql import functions as F

    out = REGISTRY["text_bigram_surprisal"].fn(spark, sf_dir)
    assert out.filter(F.col("mean_surprisal") < 1_000_000).count() == 0
    assert out.filter(F.col("n_bigrams") < 1).count() == 0
