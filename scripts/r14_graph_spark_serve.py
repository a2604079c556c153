#!/usr/bin/env python
"""Round-14 record: graph-ANN serve cost ON THE SPARK FALLBACK PATH.

Round-13 verdict item 2: the zero-job driver walk is gated on a local
`file:` warehouse; a cluster deployment (S3/HDFS) fell back to the
pruned-scan Spark path at ~6 sequential jobs/query. Round 14 reworks
that path around a bucket-granular adjacency cache with candidate-
bucket prefetch (`graphann._BucketCacheAdjacency`): each paid read
fetches the beam's bucket partitions plus the buckets of the top-scored
known candidates and the Hamming-1 closure of the best beam buckets —
so a query pays ~2 pruned scans, and a warm steady-state stream pays
~0. The entry point costs ZERO jobs (frozen in TBLPROPERTIES at build).

This records, at sf10 (200k vectors, bits=12, cap=128) and sf100 (2M):
- jobs/query with the Spark path FORCED (`_FORCE_SPARK_SERVE`), three
  regimes: cold (adjacency cache dropped before the query), stream
  (cache retained across the query sequence — the steady state), and
  warm (repeat of an already-served query);
- row-identity of every Spark-path result against the driver walk
  (stronger than a recall floor — the bar is "recall floor unchanged",
  we pin the exact rows) plus recall@10 vs brute force;
- bytes discipline: rows held by the bounded adjacency cache.

Usage: python scripts/r14_graph_spark_serve.py > docs/GRAPH_SPARK_SERVE_r14.json
(expects .scratch/sf{10,100} corpora).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = ["sf10", "sf100"]


def main() -> None:
    import numpy as np
    import pyarrow.parquet as pq

    from stream_processor_spark.operators import graphann as ga
    from stream_processor_spark.operators import npkernel as npk
    from stream_processor_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("r14-graph-spark-serve")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def jobs_in(group, fn):
        sc.setJobGroup(group, group)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        sc.setJobGroup("other", "other")
        return out, dt, len(sc.statusTracker().getJobIdsForGroup(group))

    per_scale = []
    for tag in SCALES:
        sf_dir = os.path.join(ROOT, ".scratch", tag)
        emb_path = os.path.join(sf_dir, "embeddings.parquet")
        t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy()
        n = len(ids)
        bits = ga.graph_bits_for(n)
        cap = ga.GRAPH_MAX_BUCKET
        t0 = time.perf_counter()
        (edges_name,) = ga.ensure_graph_index(
            spark, sf_dir, bits=bits, max_bucket=cap
        )
        ensure_sec = round(time.perf_counter() - t0, 2)
        print(f"{tag}: n={n} bits={bits} ensure={ensure_sec}s "
              f"({edges_name})", file=sys.stderr)
        # layouts built by earlier rounds predate the frozen-entry
        # property; backfill it once so the serve reads it job-free
        # (what a fresh r14 build does at write time)
        ga._graph_entry(spark, edges_name, spark.table(edges_name))

        flat = t.column("embedding").combine_chunks().flatten().to_numpy()
        E = flat.astype(np.float64).reshape(n, -1)
        order = np.argsort(ids)
        ids_s, E = np.asarray(ids)[order], E[order]
        sxx = npk.self_norms_scaled(E)

        def brute_top10(q):
            p = npk.dot_scaled(E, q)
            sq = npk.self_norms_scaled(q[None, :])[0]
            cos = p.astype(np.float64) / (
                np.sqrt(sxx.astype(np.float64)) * np.sqrt(float(sq))
            )
            return set(ids_s[np.lexsort((ids_s, -cos))][:10].tolist())

        qids = (0, 1, 2, 7, 23, 101, 555, 1234)
        qvecs = {qid: E[int(np.searchsorted(ids_s, qid))] for qid in qids}

        # reference rows: the driver walk (the judged zero-job path)
        driver_rows = {}
        for qid in qids:
            driver_rows[qid] = [
                tuple(r)
                for r in ga.graph_query_indexed(
                    spark, edges_name, qvecs[qid], bits=bits
                ).collect()
            ]

        ga._FORCE_SPARK_SERVE = True
        try:
            serves = []
            # regime 1: COLD — adjacency cache dropped before each query
            for qid in qids[:4]:
                ga._SPARK_ADJ_CACHE.pop(edges_name, None)
                def serve():
                    return ga.graph_query_indexed(
                        spark, edges_name, qvecs[qid], bits=bits
                    ).collect()
                got, dt, nj = jobs_in(f"{tag}-cold-{qid}", serve)
                rows = [tuple(r) for r in got]
                serves.append(
                    {
                        "query_vec_id": qid,
                        "regime": "cold",
                        "jobs_incl_result_collect": nj,
                        "serve_sec": round(dt, 4),
                        "rows_match_driver_walk": rows == driver_rows[qid],
                        "recall_at_10": len(
                            {v for v, _ in rows} & brute_top10(qvecs[qid])
                        ) / 10,
                    }
                )
            # regime 2: STREAM — cache retained across a query sequence
            ga._SPARK_ADJ_CACHE.pop(edges_name, None)
            for qid in qids:
                def serve():
                    return ga.graph_query_indexed(
                        spark, edges_name, qvecs[qid], bits=bits
                    ).collect()
                got, dt, nj = jobs_in(f"{tag}-stream-{qid}", serve)
                rows = [tuple(r) for r in got]
                serves.append(
                    {
                        "query_vec_id": qid,
                        "regime": "stream",
                        "jobs_incl_result_collect": nj,
                        "serve_sec": round(dt, 4),
                        "rows_match_driver_walk": rows == driver_rows[qid],
                        "recall_at_10": len(
                            {v for v, _ in rows} & brute_top10(qvecs[qid])
                        ) / 10,
                    }
                )
            # regime 3: WARM — repeat an already-served query
            for qid in qids[:2]:
                def serve():
                    return ga.graph_query_indexed(
                        spark, edges_name, qvecs[qid], bits=bits
                    ).collect()
                _got, dt, nj = jobs_in(f"{tag}-warm-{qid}", serve)
                serves.append(
                    {
                        "query_vec_id": qid,
                        "regime": "warm",
                        "jobs_incl_result_collect": nj,
                        "serve_sec": round(dt, 4),
                    }
                )
            # batched multiquery on a fresh cache
            ga._SPARK_ADJ_CACHE.pop(edges_name, None)
            def multi():
                return ga.graph_multi_query_indexed(
                    spark, edges_name, qvecs, bits=bits
                ).collect()
            mrows, m_dt, m_jobs = jobs_in(f"{tag}-multi", multi)
            by_q: dict[int, list] = {}
            for r in mrows:
                by_q.setdefault(int(r.query_id), []).append(
                    (int(r.vec_id), float(r.cosine))
                )
            multi_match = all(
                by_q.get(qid, []) == driver_rows[qid] for qid in qids
            )
            cache_hit = ga._SPARK_ADJ_CACHE.get(edges_name)
            cached_rows = cache_hit[1].total_rows if cache_hit else None
        finally:
            ga._FORCE_SPARK_SERVE = False

        def agg(regime):
            xs = [s for s in serves if s["regime"] == regime]
            return {
                "mean_jobs": round(
                    sum(s["jobs_incl_result_collect"] for s in xs) / len(xs), 2
                ),
                "max_jobs": max(s["jobs_incl_result_collect"] for s in xs),
                "mean_sec": round(
                    sum(s["serve_sec"] for s in xs) / len(xs), 4
                ),
            }

        per_scale.append(
            {
                "scale": tag,
                "n_vectors": int(n),
                "bits": bits,
                "max_bucket": cap,
                "edges_name": edges_name,
                "ensure_sec": ensure_sec,
                "summary": {r: agg(r) for r in ("cold", "stream", "warm")},
                "all_rows_match_driver_walk": all(
                    s.get("rows_match_driver_walk", True) for s in serves
                ),
                "min_recall_at_10": min(
                    s["recall_at_10"] for s in serves if "recall_at_10" in s
                ),
                "multiquery": {
                    "n_queries": len(qids),
                    "jobs_total_fresh_cache": m_jobs,
                    "sec": round(m_dt, 4),
                    "rows_match_driver_walk": multi_match,
                },
                "adj_cache_rows_after_multi": cached_rows,
                "adj_cache_row_budget": ga._SPARK_SERVE_MAX_ROWS,
                "serves": serves,
            }
        )
        print(f"{tag}: cold {agg('cold')} stream {agg('stream')} "
              f"warm {agg('warm')} multi_jobs={m_jobs}", file=sys.stderr)

    out = {
        "experiment": "r14_graph_serve_on_spark_fallback",
        "done_bar": "<= 2 jobs/query on the Spark fallback at sf10, "
                    "recall floor unchanged (round-13 verdict item 2)",
        "method": "FORCED Spark path (_FORCE_SPARK_SERVE); jobs counted "
                  "via job groups, including the result-collect job; "
                  "row-identity asserted against the driver walk",
        "scales": per_scale,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
