#!/usr/bin/env python
"""Round-13 record: graph-ANN serve jobs/latency + incremental append.

The round-12 verdict's items 1-2: (1) the graph layout was the only
persisted index with no incremental maintenance (every ingest batch
forced a full rebuild — 108 s at 2M vectors and growing); (2) the beam
serve paid ~6 sequential Spark jobs per query, a latency floor set by
job launch, not data. This records both fixes at sf10 (200k vectors)
and sf100 (2M vectors):

- serve: Spark JOBS per query (counted via job groups) and wall-clock
  for the driver-side pyarrow walk, plus recall@10 vs exact brute
  force — the "done" bar is ≤2 jobs/query under the existing recall
  floor (we land at ZERO engine jobs; the only job is the caller's
  collect of the 10-row result frame).
- append: 1000 new vectors into the existing layout — cold-pool and
  warm-pool (steady-state) append seconds vs the full-rebuild seconds
  from docs/GRAPH_SF100_r12.json, reachability of appended nodes, and
  post-append serve recall on the original queries.

Usage: python scripts/r13_graph_serve_append.py > docs/GRAPH_APPEND_SERVE_r13.json
(expects .scratch/sf{10,100} from scripts/r12_graph_sf100.py).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = ["sf10", "sf100"]
REBUILD_SEC_R12 = {"sf10": 25.4, "sf100": 108.0}  # docs/GRAPH_SF100_r12.json


def main() -> None:
    import numpy as np
    import pyarrow.parquet as pq

    from stream_processor_spark.operators import graphann as ga
    from stream_processor_spark.operators import npkernel as npk
    from stream_processor_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("r13-graph-serve-append")
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

        # ---- serve: jobs + latency per query (driver walk) ----
        qids = (0, 1, 2, 7, 23)
        serves = []
        ga._LOCAL_LAYOUT_CACHE.pop(edges_name, None)
        for i, qid in enumerate(qids):
            q = E[int(np.searchsorted(ids_s, qid))]
            runs, jobs, got = [], None, None
            for r in range(3):
                def serve():
                    return ga.graph_query_indexed(
                        spark, edges_name, q, bits=bits
                    ).collect()
                got, dt, nj = jobs_in(f"{tag}-serve-{qid}-{r}", serve)
                runs.append(dt)
                jobs = nj
            graph_ids = {x.vec_id for x in got}
            serves.append(
                {
                    "query_vec_id": qid,
                    "jobs_per_query_incl_result_collect": jobs,
                    "serve_sec_best": round(min(runs), 4),
                    "serve_sec_first": round(runs[0], 4),
                    "recall_at_10": len(graph_ids & brute_top10(q)) / 10,
                }
            )
        # batched multiquery: all 5 in one walk
        queries = {qid: E[int(np.searchsorted(ids_s, qid))] for qid in qids}
        def multi():
            return ga.graph_multi_query_indexed(
                spark, edges_name, queries, bits=bits
            ).collect()
        _m, m_dt, m_jobs = jobs_in(f"{tag}-multi", multi)
        _m2, m_dt2, _ = jobs_in(f"{tag}-multi2", multi)

        # ---- append: 1000 new vectors (deterministic perturbation) ----
        n_new = 1000
        base = E[:n_new].astype(np.float32)
        pert = (np.arange(base.shape[1]) % 7 - 3).astype(np.float32) * 1e-3
        new_embs = base + pert[None, :]
        new_ids = (int(ids_s.max()) + 1 + np.arange(n_new)).tolist()
        new_df = spark.createDataFrame(
            [(int(i), [float(x) for x in e]) for i, e in zip(new_ids, new_embs)],
            "vec_id long, embedding array<float>",
        )
        ga._POOL_CACHE.pop(edges_name, None)
        t0 = time.perf_counter()
        ga.append_graph_index(
            spark, edges_name, new_df, bits=bits, max_bucket=cap
        )
        append_cold_sec = round(time.perf_counter() - t0, 2)
        # steady-state: warm pool, second (disjoint) batch
        new_ids2 = [i + n_new for i in new_ids]
        new_df2 = spark.createDataFrame(
            [(int(i), [float(x) for x in e]) for i, e in zip(new_ids2, new_embs + 2 * pert[None, :])],
            "vec_id long, embedding array<float>",
        )
        t0 = time.perf_counter()
        ga.append_graph_index(
            spark, edges_name, new_df2, bits=bits, max_bucket=cap
        )
        append_warm_sec = round(time.perf_counter() - t0, 2)

        # reachability of appended nodes (their own embedding -> rank 1)
        reach = 0
        probe = list(zip(new_ids, new_embs))[:: max(1, n_new // 8)][:8]
        for vid, e in probe:
            top = ga.graph_query_indexed(
                spark, edges_name, e.astype(np.float64), topk=3, bits=bits
            ).collect()
            reach += int(int(top[0][0]) == vid)
        # original-query recall after the appends
        post = []
        for qid in qids:
            q = E[int(np.searchsorted(ids_s, qid))]
            got = {
                x.vec_id
                for x in ga.graph_query_indexed(
                    spark, edges_name, q, bits=bits
                ).collect()
            }
            # brute force over the ORIGINAL corpus ids only (appended
            # twins may legitimately displace originals; count overlap
            # against the union ground truth)
            Eall = np.vstack([E, new_embs.astype(np.float64), (new_embs + 2 * pert[None, :]).astype(np.float64)])
            ids_all = np.concatenate([ids_s, np.asarray(new_ids), np.asarray(new_ids2)])
            sxx_all = npk.self_norms_scaled(Eall)
            p = npk.dot_scaled(Eall, q)
            sq = npk.self_norms_scaled(q[None, :])[0]
            cos = p.astype(np.float64) / (
                np.sqrt(sxx_all.astype(np.float64)) * np.sqrt(float(sq))
            )
            want = set(ids_all[np.lexsort((ids_all, -cos))][:10].tolist())
            post.append(len(got & want) / 10)

        # restore the pristine layout for other consumers
        t0 = time.perf_counter()
        nparts = ga.compact_graph_edges(spark, edges_name)
        compact_sec = round(time.perf_counter() - t0, 2)

        per_scale.append(
            {
                "scale": tag,
                "corpus_vectors": n,
                "bits": bits,
                "max_bucket": cap,
                "serve": serves,
                "mean_jobs_per_query": round(
                    sum(s["jobs_per_query_incl_result_collect"] for s in serves)
                    / len(serves),
                    2,
                ),
                "mean_serve_sec_best": round(
                    sum(s["serve_sec_best"] for s in serves) / len(serves), 4
                ),
                "multiquery_5q_sec": round(m_dt, 4),
                "multiquery_5q_sec_warm": round(m_dt2, 4),
                "multiquery_jobs": m_jobs,
                "append_1000_cold_pool_sec": append_cold_sec,
                "append_1000_warm_pool_sec": append_warm_sec,
                "full_rebuild_sec_r12": REBUILD_SEC_R12[tag],
                "append_vs_rebuild_speedup_cold": round(
                    REBUILD_SEC_R12[tag] / append_cold_sec, 1
                ),
                "append_vs_rebuild_speedup_warm": round(
                    REBUILD_SEC_R12[tag] / append_warm_sec, 1
                ),
                "appended_reachable_rank1": f"{reach}/{len(probe)}",
                "post_append_recall_at_10": round(sum(post) / len(post), 2),
                "compact_sec": compact_sec,
                "src_b_partitions": nparts,
            }
        )
        del E, t

    rec = {
        "experiment": "r13_graph_serve_jobs_and_incremental_append",
        "serve_path": "driver-side pyarrow walk (partition-pruned per-hop "
        "reads, entry from parquet footer stats); Spark pruned-scan path "
        "remains the non-local fallback",
        "append_path": "frozen sign schedule + bidirectional connect; "
        "candidate pool maintained in-process (warm) or one slim index "
        "scan (cold); no pair shuffle, no rewrite",
        "done_bar": "<= 2 jobs/query (round-12 verdict item 2)",
        "scales": per_scale,
    }
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
