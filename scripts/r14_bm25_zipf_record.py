#!/usr/bin/env python
"""Round-14 (round-13 verdict item 3): de-degenerate the large-scale
text fixture and re-record the BM25-family routed serves.

The r13 diagnosis (docs/BM25_SF100_DIAG_r13.json) proved the 14.9 s
sf100 BM25 serve was the fixture's shape, not the engine's: plain
replication kept the 31-token vocabulary, so doc 0's full token set
matched 86.5% of the 116M-row postings index. The generator now gives
replicas a Zipf-tailed synthetic vocabulary
(scripts/sf1_rehearsal.generate_documents — verbatim replicas kept for
the dedup records; every other replica rewrites token t at position i
to t_<k>, k = floor(65536^u), u from xxhash64(doc_id, i, t) — P(k)∝1/k).

This script regenerates the sf10/sf100 documents tables with that
vocabulary, rebuilds the postings layout, and records:
- vocabulary size, postings rows, and the registered query's matched
  fraction of the index (done bar: < 10%);
- routed serve times for bm25 (doc-0 token set), bm25_multi (docs
  0/1/2) and hybrid (BM25 + IVF RRF), floor-adjusted vs DuckDB running
  the registered from-scratch oracle on the same files (bar: <= 2x).

Usage: python scripts/r14_bm25_zipf_record.py > docs/BM25_ZIPF_r14.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = [("sf10", 100), ("sf100", 1000)]


def best_of(n, fn):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    import duckdb
    from pyspark.sql import functions as F

    from scripts.sf1_rehearsal import generate_documents
    from stream_processor_spark.operators.postings import (
        bm25_from_postings,
        bm25_multi_query,
        ensure_postings,
    )
    from stream_processor_spark.queries.base import REGISTRY
    from stream_processor_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("r14-bm25-zipf")
    spark.sparkContext.setLogLevel("ERROR")

    per_scale = []
    for tag, replicas in SCALES:
        sf_dir = os.path.join(ROOT, ".scratch", tag)
        t0 = time.perf_counter()
        if "--no-regen" not in sys.argv:
            generate_documents(spark, sf_dir, replicas)
        regen_sec = round(time.perf_counter() - t0, 1)
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        n_docs = docs.count()
        print(f"{tag}: regenerated {n_docs} docs in {regen_sec}s",
              file=sys.stderr)

        t0 = time.perf_counter()
        post_name, stats_name = ensure_postings(spark, sf_dir)
        ensure_sec = round(time.perf_counter() - t0, 1)
        post = spark.table(post_name)
        total_postings = post.count()
        vocab = post.select("tok").distinct().count()

        def qtokens_of(doc_id):
            row = docs.filter(F.col("doc_id") == doc_id).select("text").head()
            return sorted({t for t in row[0].split(" ") if t != ""})

        qtokens = qtokens_of(0)
        matched = post.filter(F.col("tok").isin(qtokens)).count()
        frac = matched / total_postings
        print(f"{tag}: postings={total_postings} vocab={vocab} "
              f"matched={matched} ({frac:.4f})", file=sys.stderr)

        noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731
        floor = best_of(
            3, lambda: noop(docs.limit(1).select(F.lit(1).alias("x")))
        )
        t_bm25 = best_of(
            3,
            lambda: noop(
                bm25_from_postings(spark, post_name, stats_name, qtokens)
            ),
        )
        queries = {qid: qtokens_of(qid) for qid in (0, 1, 2)}
        t_multi = best_of(
            3,
            lambda: noop(
                bm25_multi_query(spark, post_name, stats_name, queries)
            ),
        )
        t_hybrid = best_of(
            2,
            lambda: noop(
                REGISTRY["retrieval_hybrid_rrf_indexed"].fn(spark, sf_dir)
            ),
        )

        # DuckDB from-scratch side: the registered oracle on the same
        # files (tokenize + score — no persisted index)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(sf_dir, 'documents.parquet', '*.parquet')}')"
        )
        d_bm25 = best_of(
            2,
            lambda: con.execute(
                "SELECT COUNT(*), SUM(bm25) FROM ("
                + REGISTRY["text_bm25_postings"].oracle
                + ")"
            ).fetchall(),
        )
        con.close()

        per_scale.append(
            {
                "scale": tag,
                "replicas": replicas,
                "corpus_docs": n_docs,
                "regen_sec": regen_sec,
                "postings_ensure_sec": ensure_sec,
                "total_postings_rows": total_postings,
                "vocabulary_size": vocab,
                "query_tokens": len(qtokens),
                "matched_postings": matched,
                "matched_fraction_of_index": round(frac, 4),
                "floor_sec": floor,
                "serve_sec": {
                    "bm25": t_bm25,
                    "bm25_multi_3q": t_multi,
                    "hybrid_rrf_indexed": t_hybrid,
                },
                "duckdb_from_scratch_bm25_sec": d_bm25,
                "bm25_vs_duckdb_floor_adj": round(
                    max(t_bm25 - floor, 0.0) / max(d_bm25, 1e-9), 3
                ),
            }
        )
        print(f"{tag}: bm25={t_bm25}s multi={t_multi}s hybrid={t_hybrid}s "
              f"duckdb={d_bm25}s", file=sys.stderr)

    out = {
        "experiment": "r14_bm25_zipf_vocabulary",
        "done_bar": "matched_fraction_of_index < 10%, bm25 serve <= 2x "
                    "DuckDB floor-adjusted (round-13 verdict item 3)",
        "note": "sf10/sf100 scratch documents carry the Zipf-tailed "
                "vocabulary from round 14 on; earlier sf10/sf100 text "
                "records measured the degenerate 31-token corpus.",
        "scales": per_scale,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
