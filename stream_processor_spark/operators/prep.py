"""Composite training-data preparation pipeline.

The end-to-end shape every LLM corpus pipeline runs, composed from this
engine's operators — one declarative plan, so Catalyst fuses the scoring
projections and the only shuffles are the two dedup exchanges:

    documents
      → quality scoring (expression-level, no shuffle)      [operators.text]
      → quality filter
      → exact dedup on content fingerprint (md5 shuffle)    [min-id survivor]
      → near-dup candidate blocking key (simhash band / shingle bucket)
      → per-doc features (token counts, lang, fingerprint)

`prepare_corpus` returns the cleaned corpus with features;
`corpus_stats` aggregates the acceptance funnel. Near-dup REMOVAL is left
to the caller (LSH pass via operators.dedup.minhash_near_dup_pairs) since
the pairs→survivor policy is corpus-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_processor_spark.operators import text as tx


def prepare_corpus(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_quality: float = 0.5) -> DataFrame:
    """Quality-filter + exact-dedup + featurize a document corpus."""
    from stream_processor_spark.operators.dedup import exact_dedup

    scored = docs.withColumn("quality", tx.quality_score(F.col(text_col)))
    kept = scored.filter(F.col("quality") >= min_quality)
    fingerprinted = kept.withColumn("fingerprint", tx.fingerprint(F.col(text_col)))
    # exact dedup on content fingerprint: 16-byte shuffle key, min-id survivor
    deduped = exact_dedup(fingerprinted, ["fingerprint"], id_col)
    return deduped.withColumn("n_tokens", tx.token_count(F.col(text_col)))


def corpus_stats(prepared: DataFrame, raw_count) -> DataFrame:
    """Acceptance-funnel stats for a prepared corpus: raw → kept →
    unique, plus total token volume.

    ``raw_count`` is an int (caller already knows it) or a 1-row
    DataFrame with column ``n_raw`` — the lazy path: the raw count rides
    as a broadcast cross join so no eager driver-side count happens.
    """
    agg = prepared.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.countDistinct("fingerprint").alias("n_unique"),
    )
    if isinstance(raw_count, DataFrame):
        return agg.crossJoin(F.broadcast(raw_count)).select(
            "n_raw", "n_kept", "total_tokens", "n_unique"
        )
    return agg.select(
        F.lit(raw_count).alias("n_raw"), "n_kept", "total_tokens", "n_unique"
    )
