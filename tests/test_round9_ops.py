"""Semantic invariants of the round-9 operators (hash parity against
DuckDB is covered by the registry sweep; these pin the properties the
hashes alone don't explain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processor_spark.catalog import Tables
from stream_processor_spark.queries.base import REGISTRY
from tests.conftest import SF_SMALL


def _run(name, spark, sf=SF_SMALL):
    return REGISTRY[name].fn(spark, sf)


def test_dup_spans_removed_conserves_tokens(spark):
    """kept + removed == the document's token count, for every doc;
    and removed equals exactly the span coverage `text_dup_spans_merged`
    reports (the aggressive cut removes every covered token, nothing
    else)."""
    out = _run("text_dup_spans_removed", spark)
    toks = (
        Tables(spark, SF_SMALL)
        .documents.filter(F.col("text").isNotNull())
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
    )
    j = out.join(toks, "doc_id")
    assert (
        j.filter(
            F.col("kept_tokens") + F.col("removed_tokens") != F.col("n")
        ).count()
        == 0
    )
    spans = _run("text_dup_spans_merged", spark).groupBy("doc_id").agg(
        F.sum("span_tokens").alias("covered")
    )
    mismatch = (
        out.join(spans, "doc_id", "left")
        .withColumn("covered", F.coalesce("covered", F.lit(0)))
        .filter(F.col("removed_tokens") != F.col("covered"))
        .count()
    )
    assert mismatch == 0
    # the cut is real on this corpus (it contains duplicated spans)
    assert out.filter(F.col("removed_tokens") > 0).count() > 0


def test_dup_spans_fast_twin_matches_md5_twin(spark):
    a = sorted(tuple(r) for r in _run("text_dup_spans_merged", spark).collect())
    b = sorted(
        tuple(r) for r in _run("text_dup_spans_merged_fast", spark).collect()
    )
    assert a == b and len(a) > 0


def test_cluster_stats_accounts_every_vertex(spark):
    """sum(cluster_size * n_clusters) == corpus size — the histogram
    accounts for every vertex exactly once. (At sf0.001 the synthetic
    embeddings are dense enough that no singleton exists; the gauge's
    value is precisely that it SHOWS such structure instead of assuming
    it.)"""
    stats = _run("dedup_cluster_stats", spark)
    total = stats.select(
        F.sum(F.col("cluster_size") * F.col("n_clusters"))
    ).head()[0]
    n = Tables(spark, SF_SMALL).embeddings.count()
    assert total == n
    assert stats.count() >= 1
    # a multi-vertex cluster exists (there ARE near-dups to find)
    assert stats.filter(F.col("cluster_size") > 1).count() >= 1


def test_mmr_more_diverse_than_pure_relevance(spark):
    """The MMR selection's mean pairwise cosine must not exceed the
    top-10-by-relevance set's — the property the operator exists for.
    (Computed with the same exact-int kernels the operator uses.)"""
    import numpy as np

    from stream_processor_spark.operators import npkernel as npk

    sel = _run("retrieval_mmr", spark)
    ids = [r["vec_id"] for r in sel.orderBy("mmr_rank").collect()]
    assert len(ids) == 10 and len(set(ids)) == 10

    e = Tables(spark, SF_SMALL).embeddings
    top = _run("sim_topk", spark).limit(10)
    top_ids = [r["vec_id"] for r in top.collect()]

    def mean_pair_cos(vids):
        rows = e.filter(F.col("vec_id").isin(vids)).select("embedding").collect()
        E = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
        P = npk.dot_scaled(E, E).astype(np.float64)
        n = npk.self_norms_scaled(E).astype(np.float64)
        S = P / (np.sqrt(n)[:, None] * np.sqrt(n)[None, :])
        iu = np.triu_indices(len(E), 1)
        return float(S[iu].mean())

    assert mean_pair_cos(ids) <= mean_pair_cos(top_ids) + 1e-12


def test_balanced_classes_exactly_equal_counts(spark):
    out = _run("sample_balanced_classes", spark)
    counts = [r["n"] for r in out.groupBy("label").agg(
        F.count(F.lit(1)).alias("n")).collect()]
    e = Tables(spark, SF_SMALL).embeddings
    k = e.groupBy("label").count().agg(F.min("count")).head()[0]
    assert len(set(counts)) == 1 and counts[0] == k
    # every label survives
    assert len(counts) == e.select("label").distinct().count()


def test_rolling_median_matches_pandas(spark):
    import pandas as pd

    out = _run("window_rolling_median", spark).toPandas()
    ev = (
        Tables(spark, SF_SMALL)
        .events.select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["expect"] = (
        ev.groupby("user_id")["value"]
        .rolling(5, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
    )
    m = out.merge(ev[["event_id", "expect"]], on="event_id")
    got = m["roll_median"].round(6)
    want = m["expect"].round(6)
    both_nan = got.isna() & want.isna()
    assert ((got == want) | both_nan).all()


def test_bpe_vocab_roundtrip_both_trainers(spark):
    """Lossless-merge invariant for BOTH BPE trainers: a word's final
    symbol string, with piece separators and char markers stripped,
    reconstructs the word exactly — any over-merge or pattern-anchoring
    bug (the round-8 ADVICE '_t _h' prefix collision) breaks this for
    some vocab row before it would show in piece counts."""
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.queries.llm_pipeline import (
        _bpe_fit,
        _bpe_fit_batched,
    )

    class _T:
        pass

    t = _T()
    t._spark = spark
    t._dir = SF_SMALL
    t.documents = Tables(spark, SF_SMALL).documents
    for fit in (_bpe_fit, _bpe_fit_batched):
        _merges, vocab = fit(t)
        bad = vocab.filter(
            F.regexp_replace(F.regexp_replace(F.col("s"), " ", ""), "_", "")
            != F.col("tok")
        ).count()
        assert bad == 0, fit.__name__
