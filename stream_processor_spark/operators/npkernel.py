"""Bit-exact numpy kernels for the engine's 1e16-scaled fixed-point math.

The engine's similarity / k-means arithmetic is defined as: round each
scalar product to a 1e16-scaled int64 (`round((a*b)*1e16)` — Spark
`F.round(_, 0)`, HALF_UP), sum the int64 terms, and derive doubles only by
single IEEE ops from the exact integer operands. That definition is what
makes every result bit-identical across partitionings and engines (the
DuckDB oracles replay it).

These kernels reproduce the SAME arithmetic in vectorized numpy so the
data-sized pass of ANN serving / Lloyd training can run as an
Arrow-batched `mapInPandas` stage (~100× the throughput of interpreted
higher-order-function folds) without changing a single output bit:

- `round_half_up` is exact half-away-from-zero on the true binary value,
  NOT `np.round` (half-to-even) and NOT the classic `floor(x+0.5)` (whose
  float addition mis-rounds near .5 boundaries). Verified equal to Spark's
  `F.round(double, 0)` on adversarial boundary values and 20k random
  magnitudes in tests/test_npkernel.py.
- products are computed in the same order as the JVM expressions:
  `(a*b)` first, then `*1e16` — two IEEE ops, bit-identical.
- int64 → double casts, sqrt and division are single IEEE ops in both
  engines, so equality of the integer sums implies equality of the
  derived doubles.

Scale: these kernels are closures over MODEL-sized arrays (k·dim
centroids, one query vector) captured driver-side — the Spark-ML pattern
(`KMeansModel.clusterCenters` lives on the driver and ships to executors
in the task closure). The corpus never leaves the executors; each Arrow
batch is scored with one k×dim matrix multiply worth of int64 work.
"""

from __future__ import annotations

import numpy as np

SCALE = 1e16
_INTEGRAL = 2.0**52  # |x| >= 2^52 → x is already integral in float64


def round_half_up(x: np.ndarray) -> np.ndarray:
    """Exact half-away-from-zero to int64 (== Spark `F.round(double, 0)`).

    `ax - floor(ax)` is exact in IEEE double (Sterbenz), so the >= 0.5
    comparison decides on the TRUE binary value — no `floor(x+0.5)`
    boundary bug, no banker's rounding.

    Inputs must be finite (NaN/inf → undefined int64 cast). The engine
    only feeds it products of embedding components, which the fixtures
    and any sane corpus keep finite; a NaN embedding would already
    poison the JVM expression path identically.
    """
    x = np.asarray(x, dtype=np.float64)
    ax = np.abs(x)
    f = np.floor(ax)
    r = np.where(ax - f >= 0.5, f + 1.0, f)
    r = np.where(ax >= _INTEGRAL, ax, r)
    return np.copysign(r, x).astype(np.int64)


def dot_scaled(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Scaled-int64 dot products, matching `similarity.dot_scaled`.

    a: (n, d); b: (d,) or (k, d). Returns int64 (n,) or (n, k) — the sum
    over d of `round((a_i*b_i)*1e16)` per pair, exactly the JVM fold.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if b.ndim == 1:
        return round_half_up((a * b) * SCALE).sum(axis=-1)
    # (n, 1, d) * (1, k, d) → per-term rounding, then reduce d
    prods = (a[:, None, :] * b[None, :, :]) * SCALE
    return round_half_up(prods).sum(axis=-1)


def dot_scaled_chunked(
    a: np.ndarray, b: np.ndarray, chunk: int = 512
) -> np.ndarray:
    """:func:`dot_scaled` for (n, d) x (k, d) with the k axis processed
    in ``chunk``-sized slabs, so the per-term rounding intermediate
    stays O(n·chunk·d) float64 instead of O(n·k·d) — bit-identical
    output (each slab runs the exact 2D `dot_scaled` path; column
    concatenation commutes with the per-pair sum). Callers that chunk
    their FIRST operand (the hub-layer NSW scorer) use this for the
    second so the transient is bounded by chunk² · d regardless of hub
    count or embedding width."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    out = np.empty((a.shape[0], b.shape[0]), dtype=np.int64)
    for lo in range(0, b.shape[0], chunk):
        out[:, lo : lo + chunk] = dot_scaled(a, b[lo : lo + chunk])
    return out


def self_norms_scaled(a: np.ndarray) -> np.ndarray:
    """Per-row `sum(round((x*x)*1e16))` — the scaled self-norm term."""
    a = np.asarray(a, dtype=np.float64)
    return round_half_up((a * a) * SCALE).sum(axis=-1)


def cosine_from_scaled(p: np.ndarray, saa: np.ndarray, sbb: np.ndarray) -> np.ndarray:
    """cos = p / (sqrt(saa) * sqrt(sbb)) from exact int64 operands —
    the same three IEEE ops the JVM/DuckDB expressions perform."""
    return p.astype(np.float64) / (
        np.sqrt(saa.astype(np.float64)) * np.sqrt(sbb.astype(np.float64))
    )


def argmax_last(scores: np.ndarray) -> np.ndarray:
    """Row-wise argmax with ties to the HIGHEST index — the engine's
    `array_max` struct-order tie-break (`cos DESC, clabel DESC`)."""
    k = scores.shape[1]
    return (k - 1) - np.argmax(scores[:, ::-1], axis=1)


def stack_embeddings(series) -> np.ndarray:
    """pandas Series of float32 array values → (n, d) float64 matrix
    (float32→float64 is exact, same as the JVM `cast("double")`)."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def assign_labels(E: np.ndarray, labels: np.ndarray, C: np.ndarray,
                  scc: np.ndarray):
    """Assign each row of E to its argmax-cosine centroid (ties to the
    HIGHER label — `array_max` struct order / the oracle's
    `cos DESC, cid DESC`). Returns (assigned labels int64[n],
    scaled self-norms int64[n]) — callers reuse the norms for reranking."""
    sxx = self_norms_scaled(E)
    S = dot_scaled(E, C)
    cosm = cosine_from_scaled(S, sxx[:, None], scc[None, :])
    return labels[argmax_last(cosm)], sxx


# ---------------------------------------------------------------- hydration


def hydrate_centroids(cent_rows):
    """Collect a (label, pos, c) centroid frame into model arrays.

    Returns (labels int64[k] ascending, C float64[k, d], scc int64[k])
    where scc = sum(round((c*c)*1e16)) per centroid — the packed model's
    self-norm. ONE driver action over k·d scalars (model-sized, never
    data-sized) — the pyspark.ml pattern (KMeansModel.clusterCenters).
    """
    return model_from_rows(cent_rows.collect())


def model_from_rows(rows):
    """(label, pos, c) row tuples → (labels, C, scc) model arrays."""
    labels = sorted({int(r[0]) for r in rows})
    dim = max(int(r[1]) for r in rows)
    C = np.zeros((len(labels), dim), dtype=np.float64)
    index = {lab: i for i, lab in enumerate(labels)}
    for lab, pos, c in rows:
        C[index[int(lab)], int(pos) - 1] = float(c)
    scc = self_norms_scaled(C)
    return np.asarray(labels, dtype=np.int64), C, scc


def hydrate_query(embeddings, vec_id: int = 0, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> np.ndarray:
    """Collect the single query vector (the serving input — in production
    this arrives as a request parameter, not from the corpus)."""
    from pyspark.sql import functions as F

    row = embeddings.filter(F.col(id_col) == vec_id).select(vec_col).head()
    return np.asarray(row[0], dtype=np.float64)


def hydrate_codebooks(cent_rows):
    """Collect a (m, cid, pos, c) PQ codebook frame into model arrays.

    Returns a list indexed by subspace m: (cids int64[k_m] ascending,
    CB float64[k_m, sub_dim]). Codewords that emptied during training
    simply have no row — consumers index through `cids`, never by dense
    codeword id. One model-sized collect (n_sub·k·sub_dim scalars).
    """
    rows = cent_rows.collect()
    by_m: dict = {}
    for m, cid, pos, c in rows:
        by_m.setdefault(int(m), {}).setdefault(int(cid), {})[int(pos)] = float(c)
    books = []
    for m in sorted(by_m):
        cids = sorted(by_m[m])
        sub_dim = max(max(d) for d in by_m[m].values())
        CB = np.zeros((len(cids), sub_dim), dtype=np.float64)
        for j, cid in enumerate(cids):
            for pos, c in by_m[m][cid].items():
                CB[j, pos - 1] = c
        books.append((np.asarray(cids, dtype=np.int64), CB))
    return books


def pq_code_cids(E: np.ndarray, books, sub_dim: int) -> np.ndarray:
    """Per-subspace winning codeword ids — the code-ASSIGNMENT half of
    :func:`pq_adc_scores`, factored out so the persisted-index build
    (`annindex.ensure_pq_index`) and the inline serve share the exact
    argmin (scaled-int squared distance, ties to the LOWEST cid — argmin
    returns the first minimum and `cids` is ascending). Returns (n, M)
    int64 of cid VALUES (not positions)."""
    n = E.shape[0]
    out = np.zeros((n, len(books)), dtype=np.int64)
    for m, (cids, CB) in enumerate(books):
        Xs = E[:, m * sub_dim:(m + 1) * sub_dim]
        P = Xs[:, None, :] - CB[None, :, :]
        D = round_half_up((P * P) * SCALE).sum(axis=-1)
        out[:, m] = cids[np.argmin(D, axis=1)]
    return out


def pq_adc_tables(books, sub_dim: int, q: np.ndarray) -> list:
    """Per-subspace {cid: scaled-int ADC table entry} for one query —
    the query-side half of :func:`pq_adc_scores`
    (`sum(round((q_i*c_i)*1e16))` per codeword)."""
    return [
        dict(
            zip(
                cids.tolist(),
                dot_scaled(CB, q[m * sub_dim:(m + 1) * sub_dim]).tolist(),
            )
        )
        for m, (cids, CB) in enumerate(books)
    ]


def pq_adc_scores(E: np.ndarray, books, sub_dim: int, q: np.ndarray) -> np.ndarray:
    """PQ code assignment + asymmetric-distance scores in one pass.

    Per subspace: the :func:`pq_code_cids` argmin assignment, then the
    query-side ADC table entry (`sum(round((q_i*c_i)*1e16))`) for the
    winning codeword; scores sum as exact int64 across subspaces —
    bit-identical to the JVM `pq_code_expr`/`pq_adc_expr` expressions
    and the unrolled-CTE oracles.
    """
    codes = pq_code_cids(E, books, sub_dim)
    tables = pq_adc_tables(books, sub_dim, q)
    s = np.zeros(E.shape[0], dtype=np.int64)
    for m, tbl in enumerate(tables):
        cids = np.asarray(sorted(tbl), dtype=np.int64)
        vals = np.asarray([tbl[int(c)] for c in cids], dtype=np.int64)
        s += vals[np.searchsorted(cids, codes[:, m])]
    return s
