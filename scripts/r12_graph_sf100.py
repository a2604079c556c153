#!/usr/bin/env python
"""Round-12 lead record: the graph-ANN build SCALING LAW, measured.

Builds the NSW graph with the round-12 capped builder
(`ensure_graph_index(max_bucket=GRAPH_MAX_BUCKET)`, bits from
`graph_bits_for(n)`) at three decades — 20k (sf1), 200k (sf10), 2M
(sf100) vectors — and records build wall-clock, edge profile, serve
latency and recall@10 vs exact brute force at every scale. The
sub-quadratic claim is carried by the measured growth exponents
(log-log slope of build_sec between consecutive decades; < 2.0 =
sub-quadratic, the schedule+cap target is ~1.0 = linear-ish).

Baselines to read against: docs/GRAPH_SF1_r11.json (uncapped, 96 s @
20k) and docs/GRAPH_SF10_r11.json (uncapped, 811 s @ 200k).

Usage: python scripts/r12_graph_sf100.py > docs/GRAPH_SF100_r12.json
(generates .scratch/sf{1,10,100} replicas on first run).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.sf1_rehearsal import generate  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = [
    ("sf1", 10),
    ("sf10", 100),
    ("sf100", 1000),
]


def main() -> None:
    import numpy as np
    import pyarrow.parquet as pq

    from stream_processor_spark.operators import graphann as ga
    from stream_processor_spark.operators import npkernel as npk
    from stream_processor_spark.operators.annindex import (
        _partition_file_counts,
    )
    from stream_processor_spark.operators.storage import drop_warehouse_dir
    from stream_processor_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("r12-graph-sf100")
    spark.sparkContext.setLogLevel("ERROR")

    per_scale = []
    for tag, replicas in SCALES:
        sf_dir = os.path.join(ROOT, ".scratch", tag)
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            print(f"generating {sf_dir} (x{replicas})...", file=sys.stderr)
            generate(spark, dst=sf_dir, replicas=replicas)

        emb_path = os.path.join(sf_dir, "embeddings.parquet")
        t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy()
        n = len(ids)
        bits = ga.graph_bits_for(n)
        cap = ga.GRAPH_MAX_BUCKET

        (name,) = ga.graph_names(sf_dir, bits, ga.GRAPH_M, cap)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        drop_warehouse_dir(spark, name)
        t0 = time.perf_counter()
        (edges_name,) = ga.ensure_graph_index(
            spark, sf_dir, bits=bits, max_bucket=cap
        )
        build_sec = round(time.perf_counter() - t0, 2)
        print(f"{tag}: n={n} bits={bits} build={build_sec}s", file=sys.stderr)
        files = _partition_file_counts(spark, edges_name, part_col="src_b")
        n_edges = spark.table(edges_name).count()

        # exact ground truth from the parquet bytes (driver-side numpy,
        # the serve's scaled-int64 convention); fixed 64-dim lists ->
        # one flat buffer reshape, no 2M-element pylist
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

        results = []
        for qid in (0, 1, 2, 7, 23):
            qi = int(np.searchsorted(ids_s, qid))
            q = E[qi]
            stats: dict = {}
            runs, got = [], None
            for _ in range(4):
                t1 = time.perf_counter()
                got = ga.graph_query_indexed(
                    spark, edges_name, q, stats_out=stats, bits=bits
                ).collect()
                runs.append(time.perf_counter() - t1)
            graph_ids = {r.vec_id for r in got}
            results.append(
                {
                    "query_vec_id": qid,
                    "recall_at_10": len(graph_ids & brute_top10(q)) / 10,
                    "visited": stats["visited"],
                    "serve_sec_best": round(min(runs[1:]), 3),
                }
            )
        del E, t
        per_scale.append(
            {
                "scale": tag,
                "corpus_vectors": n,
                "bits": bits,
                "max_bucket": cap,
                "build_sec": build_sec,
                "edge_rows": n_edges,
                "src_b_partitions": len(files),
                "pair_work_hard_bound": n * (bits + 1) * cap,
                "per_query": results,
                "mean_recall": round(
                    sum(r["recall_at_10"] for r in results) / len(results), 2
                ),
                "mean_visited_frac_of_corpus": round(
                    sum(r["visited"] for r in results) / len(results) / n, 5
                ),
            }
        )

    # growth exponents between consecutive decades (log-log slope)
    import math

    slopes = []
    for a, b in zip(per_scale, per_scale[1:]):
        slopes.append(
            {
                "from": a["scale"],
                "to": b["scale"],
                "n_ratio": b["corpus_vectors"] / a["corpus_vectors"],
                "build_ratio": round(b["build_sec"] / a["build_sec"], 2),
                "loglog_slope": round(
                    math.log(b["build_sec"] / a["build_sec"])
                    / math.log(b["corpus_vectors"] / a["corpus_vectors"]),
                    3,
                ),
            }
        )

    rec = {
        "experiment": "r12_graph_sf100_scaling",
        "m": ga.GRAPH_M,
        "beam": ga.GRAPH_BEAM,
        "hops": ga.GRAPH_HOPS,
        "builder": "capped (max_bucket broadcast model, mapInPandas, no pair shuffle)",
        "uncapped_baselines": {
            "sf1_bits8_build_sec": 96.0,
            "sf10_bits12_build_sec": 811.53,
        },
        "scales": per_scale,
        "build_growth": slopes,
        "subquadratic": all(s["loglog_slope"] < 2.0 for s in slopes),
    }
    print(json.dumps(rec, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
