#!/usr/bin/env python
"""Round-15 lead record: ANN recall/serve on a DISPERSED vector corpus.

Round-14 verdict lead item: the scratch embeddings replicated sf0.1
VERBATIM (id-shifted), so at sf10/sf100 every base vector was a
100/1000-member identical clique and every large-scale ANN record
(graph recall@10 = 1.0, the IVF/PQ floors) measured clique structure,
not geometry — the vector twin of the 31-token text degeneracy round 14
fixed (docs/BM25_ZIPF_r14.json). `generate_embeddings` now perturbs
every replica >= EMB_KEEP with deterministic JVM-side per-dim offsets
whose AMPLITUDE is graded per replica (uniform in [EMB_JITTER_MIN,
EMB_JITTER_MAX] from xxhash64(vec_id); per-dim draws from
xxhash64(vec_id, dim)), keeping ONE verbatim twin per base for the
exact-duplicate records. Graded, not fixed: a single shared amplitude
removes the clique but parks every neighbor on an equal-radius shell
(cos ~0.91 +/- 0.04) where exact top-10 is a near-tie lottery — the
first cut of this record measured exactly that (graph 0.38 / pq 0.26
recall at sf100 on near-ties). Smoothly decaying neighbor distances
are what make recall@10 a meaningful target.

This script regenerates the sf1/sf10/sf100 scratch embeddings, drops
every embedding-derived layout (they were built on the clique corpus),
rebuilds the six ANN serve paths and re-pins recall@10 + serve time on
the dispersed geometry:

- graph  (NSW, scale-aware bits/cap, hierarchical hub layer at sf10+)
- ivf    (per-label lists, nprobe=2)
- pq     (8-byte ADC codes, shortlist-50 exact rerank)
- ivfpq  (coarse probe x residual ADC, nprobe=3, shortlist-50)
- sq8    (one-pass scan serve, no layout; shortlist via the
         parameterized `_sq8_multi_frame`)
- hamming(16-byte sign layout, shortlist-50 + exact rerank)

Round-15 schedule changes measured here: GRAPH_BITS_CEIL 12 -> 14 and
the `graph_cap_for` scaled cap (a frozen cap at the old ceiling left
only 26% of a 2M-vector corpus retrievable — recall 0.38), plus a
density-scaled shortlist mode for the quantized serves (pq/ivfpq/sq8
measured at BOTH the pinned 50 and shortlist ~ family size, because
8-bit/PQ score noise exceeds the exact top-10 gaps on a dense
dispersed family).

"Before" figures are the r14 records on the clique corpus:
docs/GRAPH_SPARK_SERVE_r14.json (recall@10 = 1.0 everywhere),
docs/GRAPH_SF100_r12.json, docs/SF100_INDEXES_r6.json — recall there is
NOT comparable by design. The sf0.001/0.01/0.1 oracle fixtures are
untouched, so every hash-checked entry is unaffected.

Usage: python scripts/r15_ann_dispersed_record.py   # writes
docs/ANN_DISPERSED_r15.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.sf1_rehearsal import (  # noqa: E402
    EMB_JITTER_MAX,
    EMB_JITTER_MIN,
    EMB_KEEP,
    generate_embeddings,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = [("sf1", 10), ("sf10", 100), ("sf100", 1000)]
SERVE_SCALES = {"sf10", "sf100"}
QIDS = [0, 1, 2, 7, 23]
#: embedding-derived router layouts — stale once the corpus moves
EMB_LAYOUTS = [
    "ivf_index",
    "ivf_trained",
    "pq_index",
    "semantic_index",
    "ivfpq_index",
    "sign_index",
    "graph_index",
]


def drop_embedding_layouts(spark, sf_dir: str) -> list[str]:
    from stream_processor_spark.operators.storage import drop_warehouse_dir
    from stream_processor_spark.router import LAYOUTS

    dropped = []
    for key in EMB_LAYOUTS:
        names_fn, _ = LAYOUTS[key]
        for name in names_fn(spark, sf_dir):
            if spark.catalog.tableExists(name):
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                drop_warehouse_dir(spark, name)
                dropped.append(name)
    # in-process graph caches keyed by table name would otherwise serve
    # the old corpus
    from stream_processor_spark.operators import graphann as ga

    for cache in (
        ga._POOL_CACHE,
        ga._SPARK_ADJ_CACHE,
        ga._ENTRY_CACHE,
        ga._LOCAL_LAYOUT_CACHE,
    ):
        cache.clear()
    return dropped


def hydrate_corpus(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    from stream_processor_spark.operators import npkernel as npk

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = t.column("vec_id").to_numpy()
    n = len(ids)
    flat = t.column("embedding").combine_chunks().flatten().to_numpy()
    E = flat.astype(np.float64).reshape(n, -1)
    order = np.argsort(ids)
    ids_s, E = np.asarray(ids)[order], E[order]
    sxx = npk.self_norms_scaled(E)
    return ids_s, E, sxx


def brute_top10(ids_s, E, sxx, q):
    import numpy as np

    from stream_processor_spark.operators import npkernel as npk

    p = npk.dot_scaled(E, q)
    sq = npk.self_norms_scaled(q[None, :])[0]
    cos = p.astype(np.float64) / (
        np.sqrt(sxx.astype(np.float64)) * np.sqrt(float(sq))
    )
    return ids_s[np.lexsort((ids_s, -cos))][:10].tolist()


def dispersion_stats(spark, sf_dir: str, v_off: int, replicas: int) -> dict:
    """How non-degenerate is the corpus now? Distinct-vector fraction
    (Spark aggregate) + driver-side cosine profile of one base's
    replica set."""
    import numpy as np

    from pyspark.sql import functions as F

    from stream_processor_spark.operators import npkernel as npk

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    agg = e.agg(
        F.count("*").alias("n"),
        F.countDistinct(F.xxhash64("embedding")).alias("n_distinct"),
    ).collect()[0]
    # base 0's replica family: cos(base, replica_k) for every k
    fam = (
        e.filter(F.col("vec_id") % v_off == 0)
        .select("vec_id", "embedding")
        .collect()
    )
    fam.sort(key=lambda r: int(r[0]))
    Ef = np.stack([np.asarray(r[1], dtype=np.float64) for r in fam])
    sf = npk.self_norms_scaled(Ef)
    p = npk.dot_scaled(Ef, Ef[0])
    cos = p.astype(np.float64) / (
        np.sqrt(sf.astype(np.float64)) * np.sqrt(float(sf[0]))
    )
    verbatim = int((cos >= 1.0 - 1e-12).sum())
    perturbed = cos[cos < 1.0 - 1e-12]
    return {
        "rows": int(agg["n"]),
        "distinct_vectors": int(agg["n_distinct"]),
        "distinct_fraction": round(int(agg["n_distinct"]) / int(agg["n"]), 4),
        "replicas": replicas,
        "base0_family": {
            "verbatim_members": verbatim,
            "perturbed_members": int(len(perturbed)),
            "cos_base_perturbed_mean": round(float(perturbed.mean()), 4)
            if len(perturbed)
            else None,
            "cos_base_perturbed_min": round(float(perturbed.min()), 4)
            if len(perturbed)
            else None,
            "cos_base_perturbed_max": round(float(perturbed.max()), 4)
            if len(perturbed)
            else None,
        },
    }


def timed_serve(fn, runs: int = 2):
    """(rows, best_sec) over ``runs`` collect() executions."""
    best, rows = float("inf"), None
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = fn()
        best = min(best, time.perf_counter() - t0)
    return rows, round(best, 3)


def main() -> None:
    import numpy as np

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from stream_processor_spark.operators import graphann as ga
    from stream_processor_spark.operators import npkernel as npk
    from stream_processor_spark.operators.annindex import (
        ensure_ivf_index,
        ensure_ivfpq_index,
        ensure_pq_index,
        ensure_sign_index,
        hamming_query_indexed,
        ivf_query_indexed,
        ivfpq_query_indexed,
        pq_query_indexed,
    )
    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    spark = get_spark("r15-ann-dispersed")
    spark.sparkContext.setLogLevel("ERROR")

    record: dict = {
        "experiment": "r15_ann_dispersed_corpus",
        "date": "2026-08-16",
        "why": (
            "verbatim id-shifted replicas made sf10/sf100 recall records "
            "measure identical-vector cliques (r14 verdict lead item); "
            "replicas >= EMB_KEEP now carry deterministic xxhash64 "
            "jitter with a per-replica GRADED amplitude (smoothly "
            "decaying neighbor distances, not an equal-radius shell)"
        ),
        "emb_jitter_range": [EMB_JITTER_MIN, EMB_JITTER_MAX],
        "emb_keep_verbatim": EMB_KEEP,
        "before_records_clique_corpus": [
            "docs/GRAPH_SPARK_SERVE_r14.json (recall@10=1.0 at sf10/sf100)",
            "docs/GRAPH_SF100_r12.json",
            "docs/SF100_INDEXES_r6.json",
        ],
        "scales": [],
    }

    for tag, replicas in SCALES:
        sf_dir = os.path.join(ROOT, ".scratch", tag)
        print(f"=== {tag}: regenerating embeddings (x{replicas})", flush=True)
        t0 = time.perf_counter()
        generate_embeddings(spark, sf_dir, replicas)
        regen_sec = round(time.perf_counter() - t0, 1)
        dropped = drop_embedding_layouts(spark, sf_dir)
        v_off = 2000  # sf0.1 base corpus size; replicas shift by k*v_off
        entry: dict = {
            "scale": tag,
            "regen_sec": regen_sec,
            "stale_layouts_dropped": dropped,
            "dispersion": dispersion_stats(spark, sf_dir, v_off, replicas),
        }
        if tag not in SERVE_SCALES:
            record["scales"].append(entry)
            continue

        ids_s, E, sxx = hydrate_corpus(sf_dir)
        n = len(ids_s)
        exact = {}
        for qid in QIDS:
            qi = int(np.searchsorted(ids_s, qid))
            exact[qid] = set(brute_top10(ids_s, E, sxx, E[qi]))
        qvecs = {qid: E[int(np.searchsorted(ids_s, qid))] for qid in QIDS}
        layouts: dict = {}

        # ---- graph (scale-aware bits/cap + hierarchical hub layer)
        bits, cap = ga.graph_auto_params(spark, sf_dir)
        t0 = time.perf_counter()
        (gname,) = ga.ensure_graph_index(spark, sf_dir, bits=bits, max_bucket=cap)
        g_build = round(time.perf_counter() - t0, 1)
        edges = spark.table(gname)
        from pyspark.sql import functions as F

        occ = edges.agg(
            F.countDistinct("src_b").alias("buckets"),
            F.count("*").alias("edge_rows"),
        ).collect()[0]
        per_q = []
        for qid in QIDS:
            stats: dict = {}

            def serve(qid=qid, stats=stats):
                return ga.graph_query_indexed(
                    spark, gname, qvecs[qid], stats_out=stats, bits=bits
                ).collect()

            rows, sec = timed_serve(serve)
            got = {int(r.vec_id) for r in rows}
            per_q.append(
                {
                    "qid": qid,
                    "recall_at_10": len(got & exact[qid]) / 10,
                    "serve_sec": sec,
                    "visited": stats.get("visited"),
                }
            )
        layouts["graph"] = {
            "bits": bits,
            "max_bucket": cap,
            "build_sec": g_build,
            "edge_rows": int(occ["edge_rows"]),
            "occupied_buckets": int(occ["buckets"]),
            "bucket_space": 1 << bits,
            "per_query": per_q,
            "mean_recall": round(sum(r["recall_at_10"] for r in per_q) / len(per_q), 2),
        }
        print(f"{tag} graph: {layouts['graph']['mean_recall']} recall", flush=True)

        # ---- ivf (per-label lists, nprobe=2)
        t0 = time.perf_counter()
        lists_name, cent_name = ensure_ivf_index(spark, sf_dir)
        b = round(time.perf_counter() - t0, 1)
        per_q = []
        for qid in QIDS:
            rows, sec = timed_serve(
                lambda qid=qid: ivf_query_indexed(
                    spark, lists_name, cent_name, qvecs[qid], nprobe=2
                ).collect()
            )
            got = {int(r.vec_id) for r in rows}
            per_q.append(
                {"qid": qid, "recall_at_10": len(got & exact[qid]) / 10, "serve_sec": sec}
            )
        layouts["ivf"] = {
            "build_sec": b,
            "nprobe": 2,
            "per_query": per_q,
            "mean_recall": round(sum(r["recall_at_10"] for r in per_q) / len(per_q), 2),
        }
        print(f"{tag} ivf: {layouts['ivf']['mean_recall']} recall", flush=True)

        # ---- pq (ADC shortlist 50 + exact rerank)
        emb_df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        t0 = time.perf_counter()
        codes_name, books_name = ensure_pq_index(spark, sf_dir)
        b = round(time.perf_counter() - t0, 1)
        # shortlist is the near-neighbor-density knob: at the pinned 50
        # the exact top-10 gaps on a dense dispersed family sit inside
        # the code's quantization noise; the scale profile uses the
        # family size (n/2000 replicas per base on this fixture)
        scaled_short = max(50, n // 2000)
        pq_modes = {}
        for short in sorted({50, scaled_short}):
            per_q = []
            for qid in QIDS:
                rows, sec = timed_serve(
                    lambda qid=qid, short=short: pq_query_indexed(
                        spark, codes_name, books_name, emb_df, qvecs[qid],
                        shortlist=short,
                    ).collect()
                )
                got = {int(r.vec_id) for r in rows}
                per_q.append(
                    {"qid": qid, "recall_at_10": len(got & exact[qid]) / 10, "serve_sec": sec}
                )
            pq_modes[f"shortlist_{short}"] = {
                "per_query": per_q,
                "mean_recall": round(sum(r["recall_at_10"] for r in per_q) / len(per_q), 2),
            }
        layouts["pq"] = {"build_sec": b, "scaled_shortlist": scaled_short, **pq_modes}
        print(f"{tag} pq: " + str({k: v['mean_recall'] for k, v in pq_modes.items()}), flush=True)

        # ---- ivfpq (coarse nprobe=3 x residual ADC, shortlist 50)
        t0 = time.perf_counter()
        ipq_codes, ipq_cent, ipq_books = ensure_ivfpq_index(spark, sf_dir)
        b = round(time.perf_counter() - t0, 1)
        ipq_modes = {}
        for short in sorted({50, scaled_short}):
            per_q = []
            for qid in QIDS:
                rows, sec = timed_serve(
                    lambda qid=qid, short=short: ivfpq_query_indexed(
                        spark, ipq_codes, ipq_cent, ipq_books, emb_df,
                        qvecs[qid], shortlist=short,
                    ).collect()
                )
                got = {int(r.vec_id) for r in rows}
                per_q.append(
                    {"qid": qid, "recall_at_10": len(got & exact[qid]) / 10, "serve_sec": sec}
                )
            ipq_modes[f"shortlist_{short}"] = {
                "per_query": per_q,
                "mean_recall": round(sum(r["recall_at_10"] for r in per_q) / len(per_q), 2),
            }
        layouts["ivfpq"] = {"build_sec": b, "nprobe": 3,
                            "scaled_shortlist": scaled_short, **ipq_modes}
        print(f"{tag} ivfpq: " + str({k: v['mean_recall'] for k, v in ipq_modes.items()}), flush=True)

        # ---- hamming (sign shortlist 50 + exact rerank, driver-side)
        t0 = time.perf_counter()
        (sig_name,) = ensure_sign_index(spark, sf_dir)
        b = round(time.perf_counter() - t0, 1)
        per_q = []
        for qid in QIDS:
            def serve(qid=qid):
                short = hamming_query_indexed(
                    spark, sig_name, query_vec_id=qid, k=50
                ).collect()
                sids = np.asarray(sorted(int(r.vec_id) for r in short))
                idx = np.searchsorted(ids_s, sids)
                sub = E[idx]
                p = npk.dot_scaled(sub, qvecs[qid])
                sq = npk.self_norms_scaled(qvecs[qid][None, :])[0]
                cos = p.astype(np.float64) / (
                    np.sqrt(npk.self_norms_scaled(sub).astype(np.float64))
                    * np.sqrt(float(sq))
                )
                return sids[np.lexsort((sids, -cos))][:10].tolist()

            top, sec = timed_serve(serve)
            per_q.append(
                {
                    "qid": qid,
                    "recall_at_10": len(set(top) & exact[qid]) / 10,
                    "serve_sec": sec,
                }
            )
        layouts["hamming"] = {
            "build_sec": b,
            "shortlist": 50,
            "per_query": per_q,
            "mean_recall": round(sum(r["recall_at_10"] for r in per_q) / len(per_q), 2),
        }
        print(f"{tag} hamming: {layouts['hamming']['mean_recall']} recall", flush=True)

        # ---- sq8 (one-pass scan serve; shortlist via _sq8_multi_frame)
        from stream_processor_spark.catalog import Tables
        from stream_processor_spark.queries.llm_data import _sq8_multi_frame

        tt = Tables(spark, sf_dir)
        sq8_modes = {}
        for short in sorted({50, scaled_short}):
            rows, sec = timed_serve(
                lambda short=short: _sq8_multi_frame(
                    tt, qids=(0, 1, 2), shortlist=short
                ).collect()
            )
            per_q = []
            for qid in (0, 1, 2):
                got = {int(r.vec_id) for r in rows if int(r.query_id) == qid}
                per_q.append(
                    {"qid": qid, "recall_at_10": len(got & exact[qid]) / 10}
                )
            sq8_modes[f"shortlist_{short}"] = {
                "scan_serve_sec_3_queries": sec,
                "per_query": per_q,
                "mean_recall": round(sum(r["recall_at_10"] for r in per_q) / len(per_q), 2),
            }
        layouts["sq8"] = {"scaled_shortlist": scaled_short, **sq8_modes}
        print(f"{tag} sq8: " + str({k: v['mean_recall'] for k, v in sq8_modes.items()}), flush=True)

        del E, sxx
        entry["corpus_vectors"] = n
        entry["layouts"] = layouts
        record["scales"].append(entry)

    out = os.path.join(ROOT, "docs", "ANN_DISPERSED_r15.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
