"""Persisted semantic-dedup layout (SemDeDup index).

`dedup_semantic` (queries/llm_pipeline.py) is correct and
cluster-blocked, but its serve-time cost is dominated by ~10 fixed
stages that have nothing to do with the question being asked: the
iterative Lloyd fit, the argmax-cosine cluster assignment, and the
banded-LSH key derivation are all pure functions of the CORPUS, not of
the request — the same build-once/serve-pruned split the engine already
applies to IVF/PQ (operators/annindex.py) and BM25 postings
(operators/postings.py). This module persists exactly those corpus
functions once:

- ``asn`` table: (vec_id, cluster_id) — the trained Lloyd assignment,
  bucketed on vec_id so the serve-side pair-attach and anti joins need
  no exchange on this side;
- ``band`` table: (vec_id, band_idx, band_key) — the hyperplane-LSH
  band keys AFTER the hot-bucket cap, bucketed on band_key so the
  candidate self-join co-locates buckets at scan time.

``dedup_semantic_indexed`` then serves with ONE self-join + the exact
cosine check over candidate pairs — no training stages in the request
path. Both the trainer (`kmeans.lloyd_fit_np`) and the band keys
(`similarity.sign_bands` + cap) are the SAME deterministic functions
the from-scratch twin runs, so the two entries are hash-identical by
construction and share one DuckDB oracle.

Reference parity note: the reference pipeline (src/consumer.js) has no
vector surface at all; this layout is part of the §2.12 training-data
extension mandate.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def semantic_names(
    sf_dir: str,
    k: int = 10,
    iters: int = 2,
    n_bands: int = 4,
    bits: int = 4,
    max_bucket: int = 256,
) -> tuple[str, str]:
    """Deterministic (assignment, band-keys) table names — pure tag
    computation so the router can probe the layout without building."""
    tag = hashlib.md5(
        f"{sf_dir}|sem|{k}|{iters}|{n_bands}|{bits}|{max_bucket}".encode()
    ).hexdigest()[:8]
    return f"sem_asn_{tag}", f"sem_band_{tag}"


def ensure_semantic_index(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    iters: int = 2,
    n_bands: int = 4,
    bits: int = 4,
    max_bucket: int = 256,
) -> tuple[str, str]:
    """Build (once per sf_dir/params) the semantic-dedup layout; return
    (asn_table, band_table). Same caching contract as `ensure_postings`:
    cached only when BOTH tables exist, stale warehouse dirs cleared.

    Build cost = the exact stages `dedup_semantic` pays per query:
    ``iters`` Lloyd passes (driver-iterated, k·dim model collects), one
    assignment pass, one band-key derivation with the deterministic
    hot-bucket cap (`similarity.banded_candidate_pairs`' guard — the
    cap is part of the layout so serve-side pairing is cap-free)."""
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.operators import kmeans
    from stream_processor_spark.operators import similarity as sim
    from stream_processor_spark.operators.storage import (
        drop_warehouse_dir,
        write_bucketed,
    )

    asn_name, band_name = semantic_names(
        sf_dir, k, iters, n_bands, bits, max_bucket
    )
    if spark.catalog.tableExists(asn_name) and spark.catalog.tableExists(
        band_name
    ):
        return asn_name, band_name
    for name in (asn_name, band_name):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        drop_warehouse_dir(spark, name)

    e = Tables(spark, sf_dir).embeddings
    cent = kmeans.lloyd_fit_np(e, k=k, iters=iters)
    assigned = kmeans.assign_cosine(
        e.select("vec_id", "embedding"),
        kmeans.pack_centroids(cent),
        out_col="cluster_id",
    ).select("vec_id", "cluster_id")
    write_bucketed(assigned, asn_name, "vec_id", 32, sort_col="vec_id")

    bands = e.select(
        F.col("vec_id"),
        F.explode(sim.sign_bands(F.col("embedding"), n_bands, bits)).alias(
            "b"
        ),
    ).select("vec_id", "b.band_idx", "b.band_key")
    w = Window.partitionBy("band_idx", "band_key").orderBy("vec_id")
    capped = (
        bands.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= max_bucket)
        .drop("__rk")
    )
    write_bucketed(capped, band_name, "band_key", 32, sort_col="band_key")
    return asn_name, band_name


def candidate_pairs_from_index(
    spark: SparkSession, band_name: str
):
    """Distinct candidate pairs (id_a < id_b) from the persisted band
    keys — the serve-side half of `similarity.banded_candidate_pairs`:
    the explode, the window cap and its shuffle are already paid in the
    layout, so this is one co-bucketed self-join + distinct."""
    x = spark.table(band_name).alias("x")
    y = spark.table(band_name).alias("y")
    return (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b")
        )
        .distinct()
    )
