#!/usr/bin/env python
"""Round-11 scale rehearsal: the NSW graph layout at sf1 (20k vectors)
with the SCALED construction parameters (bits=8 -> 256 buckets keeps
the bucketed pair join at ~8M scored pairs; the registered fixture
entry pins bits=4 for its unrolled-CTE oracle).

Records: build wall-clock + pair-join shape, edge-table profile
(one file per src_b partition), serve latency best-of-4 for 5 query
ids, recall@10 vs the exact brute-force ranking (driver-side numpy,
same scaled-int64 arithmetic), and the visited-budget per query.
Writes docs/GRAPH_SF1_r11.json via stdout redirection.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf1")
BITS = int(os.environ.get("SPARK_GRAFT_GRAPH_BITS", "8"))


def main() -> None:
    import numpy as np

    from stream_processor_spark.operators import graphann as ga
    from stream_processor_spark.operators import npkernel as npk
    from stream_processor_spark.operators.annindex import (
        _partition_file_counts,
    )
    from stream_processor_spark.session import get_spark

    spark = get_spark("r11-graph-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n = emb.count()

    (name,) = ga.graph_names(SF_DIR, BITS, ga.GRAPH_M)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    from stream_processor_spark.operators.storage import drop_warehouse_dir

    drop_warehouse_dir(spark, name)
    t0 = time.perf_counter()
    (edges_name,) = ga.ensure_graph_index(spark, SF_DIR, bits=BITS)
    build_sec = round(time.perf_counter() - t0, 2)
    files = _partition_file_counts(spark, edges_name, part_col="src_b")
    n_edges = spark.table(edges_name).count()

    # exact ground truth, driver-side (same int64 cosine arithmetic)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    E = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    order = np.argsort(ids)
    ids, E = ids[order], E[order]
    sxx = npk.self_norms_scaled(E)

    def brute_top10(q):
        p = npk.round_half_up((E * q) * npk.SCALE).sum(axis=-1)
        sq = npk.self_norms_scaled(q[None, :])[0]
        cos = p.astype(np.float64) / (
            np.sqrt(sxx.astype(np.float64)) * np.sqrt(float(sq))
        )
        return set(ids[np.lexsort((ids, -cos))][:10].tolist())

    results = []
    for qid in (0, 1, 2, 7, 23):
        qi = int(np.searchsorted(ids, qid))
        q = E[qi]
        stats: dict = {}
        runs = []
        got = None
        for _ in range(4):
            t1 = time.perf_counter()
            got = ga.graph_query_indexed(
                spark, edges_name, q, stats_out=stats, bits=BITS
            ).collect()
            runs.append(time.perf_counter() - t1)
        graph_ids = {r.vec_id for r in got}
        recall = len(graph_ids & brute_top10(q)) / 10
        results.append(
            {
                "query_vec_id": qid,
                "recall_at_10": recall,
                "visited": stats["visited"],
                "serve_sec_best": round(min(runs[1:]), 3),
            }
        )

    rec = {
        "experiment": "r11_graph_sf1_rehearsal",
        "sf_dir": SF_DIR,
        "corpus_vectors": n,
        "bits": BITS,
        "m": ga.GRAPH_M,
        "beam": ga.GRAPH_BEAM,
        "hops": ga.GRAPH_HOPS,
        "build_sec": build_sec,
        "edge_rows": n_edges,
        "src_b_partitions": len(files),
        "files_per_partition_max": max(files.values()) if files else 0,
        "pair_join_estimate": int(5 * n * n / (1 << BITS)),
        "per_query": results,
        "mean_recall": round(
            sum(r["recall_at_10"] for r in results) / len(results), 2
        ),
        "mean_visited_frac_of_corpus": round(
            sum(r["visited"] for r in results) / len(results) / n, 4
        ),
    }
    print(json.dumps(rec, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
