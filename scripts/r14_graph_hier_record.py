#!/usr/bin/env python
"""Round-14: hierarchical hub layer record — retire the flat-mesh
"known scale limit".

The flat hub mesh is O(4^bits) rows: 2.46M of the 4.86M edges at
bits=12, and hop 1 expands the whole hub set. `_hub_layer_edges` now
replaces it above HUB_MESH_MAX buckets with a second NSW level
(level-2 hubs on bits//2 fully meshed + a reachability star per
level-2 group + global exact top-m hub NSW, bidirectional), built
driver-side on the <=2^GRAPH_BITS_CEIL collected hubs.

This records, at sf10 (200k vectors) and sf100 (2M), both builds
side by side: build seconds, edge count, and recall@10 on the SAME
20-query set — the bar is recall parity with the mesh (the shared miss
on qid 123456 at sf10 is a FIXTURE degeneracy, not a layer defect: the
corpus is 100 identical replicas per base vector, so every node's
top-m is a within-clique choice and a clique whose base is not its
bucket's min-id hub has no inbound path; the mesh fails it identically,
root-caused in the note below).

Usage: python scripts/r14_graph_hier_record.py > docs/GRAPH_HIER_r14.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = ["sf10", "sf100"]
QIDS10 = (0, 1, 2, 7, 23, 101, 555, 1234, 40000, 123456, 77777, 150000,
          199999, 31415, 99999, 12, 345, 6789, 54321, 111111)


def main() -> None:
    import numpy as np
    import pyarrow.parquet as pq

    from stream_processor_spark.operators import graphann as ga
    from stream_processor_spark.operators import npkernel as npk
    from stream_processor_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("r14-graph-hier")
    spark.sparkContext.setLogLevel("ERROR")

    per_scale = []
    for tag in SCALES:
        sf_dir = os.path.join(ROOT, ".scratch", tag)
        t = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        ids = t.column("vec_id").to_numpy()
        n = len(ids)
        bits = ga.graph_bits_for(n)
        E = (
            t.column("embedding").combine_chunks().flatten().to_numpy()
            .astype(np.float64).reshape(n, -1)
        )
        order = np.argsort(ids)
        ids_s, E = np.asarray(ids)[order], E[order]
        sxx = npk.self_norms_scaled(E)

        def brute(q):
            p = npk.dot_scaled(E, q)
            sq = npk.self_norms_scaled(q[None, :])[0]
            cos = p.astype(np.float64) / (
                np.sqrt(sxx.astype(np.float64)) * np.sqrt(float(sq))
            )
            return set(ids_s[np.lexsort((ids_s, -cos))][:10].tolist())

        qids = [q for q in QIDS10 if q < n]
        modes = {}
        mesh_default = ga.HUB_MESH_MAX
        try:
            for mode, mesh_max, cap in (
                ("hier", mesh_default, ga.GRAPH_MAX_BUCKET),
                # cap-1 gives the mesh twin a distinct layout name so
                # both coexist; the cap is far above typical buckets
                # (scale-knob headroom), so the edge sets differ only
                # in the hub layer
                ("mesh", 1 << 20, ga.GRAPH_MAX_BUCKET - 1),
            ):
                ga.HUB_MESH_MAX = mesh_max
                t0 = time.perf_counter()
                (edges,) = ga.ensure_graph_index(
                    spark, sf_dir, bits=bits, max_bucket=cap
                )
                build = round(time.perf_counter() - t0, 1)
                n_edges = spark.table(edges).count()
                rec = {}
                times = []
                for qid in qids:
                    q = E[int(np.searchsorted(ids_s, qid))]
                    t0 = time.perf_counter()
                    got = {
                        int(r.vec_id)
                        for r in ga.graph_query_indexed(
                            spark, edges, q, bits=bits
                        ).collect()
                    }
                    times.append(time.perf_counter() - t0)
                    rec[qid] = len(got & brute(q)) / 10
                modes[mode] = {
                    "build_sec": build,
                    "edge_rows": n_edges,
                    "recall_at_10": rec,
                    "mean_recall": round(sum(rec.values()) / len(rec), 3),
                    "serve_sec_best": round(min(times), 4),
                }
                print(f"{tag} {mode}: build={build}s edges={n_edges} "
                      f"mean_recall={modes[mode]['mean_recall']}",
                      file=sys.stderr)
        finally:
            ga.HUB_MESH_MAX = mesh_default
        diff = {
            q: (modes["hier"]["recall_at_10"][q],
                modes["mesh"]["recall_at_10"][q])
            for q in qids
            if modes["hier"]["recall_at_10"][q]
            != modes["mesh"]["recall_at_10"][q]
        }
        per_scale.append(
            {
                "scale": tag,
                "n_vectors": int(n),
                "bits": bits,
                "hier": modes["hier"],
                "mesh": modes["mesh"],
                "recall_differs_on": diff,
                "edge_reduction": round(
                    1 - modes["hier"]["edge_rows"] / modes["mesh"]["edge_rows"],
                    3,
                ),
            }
        )

    out = {
        "experiment": "r14_hierarchical_hub_layer",
        "bar": "recall parity with the flat mesh on the same queries; "
               "hub-layer rows O(hubs*m + 4^(bits/2)) not O(4^bits)",
        "fixture_degeneracy_note": (
            "qid 123456 at sf10 scores 0.0 under BOTH layouts: the "
            "replicated corpus holds 100 IDENTICAL copies of each base "
            "vector, so every node's exact top-m is a within-clique "
            "choice and a clique whose base is not its bucket's min-id "
            "hub receives no inbound edges — unreachable by beam search "
            "regardless of the hub layer. A real corpus (or HNSW's "
            "diversity-pruned neighbor selection) does not have this "
            "shape; the engineered fix would change the oracle-replayed "
            "build kernel, so it is documented rather than implemented."
        ),
        "scales": per_scale,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
