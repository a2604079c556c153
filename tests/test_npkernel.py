"""Bit-exactness of the numpy fixed-point kernels vs the JVM expressions.

The IVF serving / Lloyd training rewrite (round 5) moved the data-sized
assignment pass from interpreted higher-order-function folds to
Arrow-batched numpy (`operators/npkernel.py`). These tests pin the claim
that justifies it: every kernel reproduces the JVM expression
BIT-FOR-BIT, so the DuckDB hash oracles hold unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stream_processor_spark.operators import kmeans
from stream_processor_spark.operators import npkernel as npk
from stream_processor_spark.operators import similarity as sim


def test_round_half_up_matches_spark_round(spark):
    """Kernel rounding == F.round(double, 0) on adversarial boundaries
    (exact .5 fractions across magnitudes, the floor(x+0.5) trap value
    0.49999999999999994, ±2^52 integrality edge) and random magnitudes
    spanning 1e-3..1e15."""
    adversarial = [
        0.5, 1.5, 2.5, -0.5, -1.5, -2.5,
        0.49999999999999994, -0.49999999999999994,
        4503599627370494.5, -4503599627370494.5,  # 2^52 - 1.5 region
        2.0**52 + 1, -(2.0**52 + 3),
        0.0, -0.0, 1e-20, -1e-20, 2.675, -2.675,
        1234567.499999999, 1234567.5000000001,
    ]
    rng = np.random.default_rng(7)
    rand = (
        rng.standard_normal(5000) * rng.choice([1e-3, 1.0, 1e7, 1e15], 5000)
    ).tolist()
    vals = adversarial + rand
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    jvm = [r[0] for r in df.select(F.round(F.col("x"), 0).cast("long")).collect()]
    ours = npk.round_half_up(np.asarray(vals)).tolist()
    assert jvm == ours


def test_dot_scaled_matches_jvm_fold(spark):
    """Scaled-int64 dot products == similarity.dot_scaled on random
    float32 vectors (the corpus dtype)."""
    rng = np.random.default_rng(11)
    A = rng.standard_normal((50, 16)).astype(np.float32)
    B = rng.standard_normal((50, 16)).astype(np.float32)
    pdf = pd.DataFrame({"a": list(A), "b": list(B)})
    df = spark.createDataFrame(pdf)
    jvm = [
        r[0]
        for r in df.select(sim.dot_scaled(F.col("a"), F.col("b"))).collect()
    ]
    ours = [
        int(npk.dot_scaled(a[None, :].astype(np.float64), b.astype(np.float64))[0])
        for a, b in zip(A, B)
    ]
    assert jvm == ours


def test_assignment_matches_jvm_expression(spark, sf_dir):
    """npkernel.assign_labels == kmeans.assign_cosine (the interpreted
    JVM formulation) on the real fixture, including tie-break order."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent_rows = kmeans._mean_update(e.select("label", "embedding"), "label", "embedding")
    jvm = {
        r["vec_id"]: r["list_id"]
        for r in kmeans.assign_cosine(
            e.select("vec_id", "embedding"), kmeans.pack_centroids(cent_rows)
        ).collect()
    }
    labels, C, scc = npk.hydrate_centroids(cent_rows)
    rows = e.select("vec_id", "embedding").collect()
    E = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    assigned, _ = npk.assign_labels(E, labels, C, scc)
    ours = {r["vec_id"]: int(a) for r, a in zip(rows, assigned)}
    assert jvm == ours


def test_lloyd_fit_np_trajectory_identical(spark, sf_dir):
    """lloyd_fit_np's full training trajectory == lloyd_fit's — every
    (label, pos, c) of the fitted model bit-equal after 2 iterations."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ref = {
        (r["label"], r["pos"]): r["c"]
        for r in kmeans.lloyd_fit(e, k=5, iters=2).collect()
    }
    ours = {
        (r["label"], r["pos"]): r["c"]
        for r in kmeans.lloyd_fit_np(e, k=5, iters=2).collect()
    }
    assert ref == ours


@pytest.mark.parametrize("x", [np.array([]), np.zeros((0, 8))])
def test_kernels_handle_empty(x):
    assert npk.round_half_up(x).size == 0


def test_mean_update_survives_int64_overflow_scale(spark):
    """A cluster of n vectors contributes up to n·1e16 per dimension —
    int64 overflows past ~900 worst-case rows (caught by ANSI mode at
    the sf10 rehearsal). The DECIMAL(38,0) sums must return the exact
    mean where the long sum would have aborted."""
    import pandas as pd

    n = 2000  # 2000 * 1e16 = 2e19 > int64 max
    df = spark.createDataFrame(
        pd.DataFrame({"label": [0] * n, "embedding": [[1.0, -1.0]] * n})
    )
    out = {
        (r["label"], r["pos"]): r["c"]
        for r in kmeans._mean_update(df, "label", "embedding", dim=2).collect()
    }
    assert out == {(0, 1): 1.0, (0, 2): -1.0}
