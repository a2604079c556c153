"""Embedding similarity: exact cosine, top-k search, bucketed ANN.

All-expression implementation (`zip_with` + `aggregate` array folds) — the
dot product never leaves the JVM and never explodes the array to rows, so a
100 TB embedding table scans once with no shuffle for scoring.

Determinism: per-element products are rounded to 1e16-scaled 64-bit
integers and folded with exact integer addition, so the accumulation order
can never change the result (bit-identical across partitionings and
engines; the scale factor cancels in the cosine ratio). Relative error vs
true float cosine ≈ 1e-14 — far below any similarity-search threshold.

Scale paths:
- Brute-force top-k: score + TakeOrderedAndProject — one scan, no shuffle;
  right answer for one-off queries.
- Bucketed ANN (`sign_bucket`): deterministic sign-bucket on leading
  dimensions ≙ random-hyperplane LSH with axis-aligned planes. Probing only
  the query's bucket cuts the scan ~2^bits×; at cluster scale the table is
  written partitioned by bucket so the probe is a partition-pruned read.
  (Real IVF/PQ needs trained centroids — same plumbing, non-deterministic.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 1e16 puts 64-dim unit-vector dot products at ~1e16-1e17 — well inside
# int64, with ~16 significant digits retained per term.
_SCALE = 1e16


def dot_scaled(a: Column, b: Column) -> Column:
    """Order-independent scaled-integer dot product of two float arrays."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.round(x.cast("double") * y.cast("double") * F.lit(_SCALE), 0).cast(
            "long"
        ),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, deterministic to the bit (scales cancel).

    Fused single-pass fold: ONE ``zip_with`` emits all three scaled
    terms (x·y, x·x, y·y) per element and ONE ``aggregate`` sums them in
    a struct accumulator, with the cosine computed in the fold's
    ``finish`` lambda — the arrays are traversed once instead of three
    times, and the accumulator is consumed exactly once (no repeated
    fold subexpressions in the plan). Per-term arithmetic and int64
    accumulation are identical to the unfused form, so results are
    bit-identical (the DuckDB oracle reproduces them unchanged).
    """
    terms = F.zip_with(
        a,
        b,
        lambda x, y: F.struct(
            F.round(x.cast("double") * y.cast("double") * F.lit(_SCALE), 0)
            .cast("long")
            .alias("xy"),
            F.round(x.cast("double") * x.cast("double") * F.lit(_SCALE), 0)
            .cast("long")
            .alias("xx"),
            F.round(y.cast("double") * y.cast("double") * F.lit(_SCALE), 0)
            .cast("long")
            .alias("yy"),
        ),
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("xy"),
        F.lit(0).cast("long").alias("xx"),
        F.lit(0).cast("long").alias("yy"),
    )
    return F.aggregate(
        terms,
        zero,
        lambda acc, v: F.struct(
            (acc["xy"] + v["xy"]).alias("xy"),
            (acc["xx"] + v["xx"]).alias("xx"),
            (acc["yy"] + v["yy"]).alias("yy"),
        ),
        lambda acc: acc["xy"].cast("double")
        / (F.sqrt(acc["xx"].cast("double")) * F.sqrt(acc["yy"].cast("double"))),
    )


def sign_bucket(a: Column, bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign pattern of the first ``bits`` dims.

    Equivalent to random-hyperplane LSH with axis-aligned hyperplanes —
    deterministic so the DuckDB oracle can reproduce it.
    """
    b = F.lit(0)
    for i in range(1, bits + 1):
        b = b + F.when(F.element_at(a, i).cast("double") > 0, F.lit(1 << (i - 1))).otherwise(
            F.lit(0)
        )
    return b.cast("int")


def sign_bands(a: Column, n_bands: int = 4, bits: int = 4) -> Column:
    """Banded hyperplane-LSH keys: array of (band_idx, band_key) structs.

    Band ``b`` reads the sign pattern of dims ``b*bits+1 .. (b+1)*bits``.
    Two vectors are candidates if ANY band matches (OR-amplification) —
    much higher recall than one wide bucket at the same sub-quadratic
    cost profile. Deterministic, so SQL oracles reproduce it exactly.
    """
    bands = []
    for b in range(n_bands):
        key = F.lit(0)
        for i in range(bits):
            key = key + F.when(
                F.element_at(a, b * bits + i + 1).cast("double") > 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
        bands.append(
            F.struct(F.lit(b).alias("band_idx"), key.cast("int").alias("band_key"))
        )
    return F.array(*bands)


def _capped_bands(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    bits: int = 4,
    max_bucket: int = 256,
) -> DataFrame:
    """Exploded LSH band rows with the hot-bucket cap applied: each
    (band_idx, band_key) bucket keeps its ``max_bucket`` smallest ids
    (deterministic rank, one narrow-row window shuffle). Shared by the
    quadratic pair join and the slim membership-id projection."""
    bands = embeddings.select(
        F.col(id_col).alias("__id"),
        F.explode(sign_bands(F.col(vec_col), n_bands, bits)).alias("b"),
    ).select("__id", "b.band_idx", "b.band_key")
    w = Window.partitionBy("band_idx", "band_key").orderBy("__id")
    return (
        bands.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= max_bucket)
        .drop("__rk")
    )


def capped_band_member_ids(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    bits: int = 4,
    max_bucket: int = 256,
) -> DataFrame:
    """The distinct ids that can appear in ANY banded candidate pair —
    exactly the capped band membership, structurally bounded at
    ``n_bands * 2^bits * max_bucket`` rows (16,384 at the defaults) at
    any corpus size. Computable WITHOUT the quadratic self-join, so the
    exact-verify stage can bound (and broadcast) its embedding fetch
    without re-executing pair generation (round 10: kills the two
    full-table embedding-attach shuffles that dominated
    dedup_cc_clusters at sf10)."""
    return (
        _capped_bands(embeddings, id_col, vec_col, n_bands, bits, max_bucket)
        .select(F.col("__id").alias(id_col))
        .distinct()
    )


def banded_candidate_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    bits: int = 4,
    max_bucket: int = 256,
    distinct: bool = True,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one LSH band.

    ``distinct=False`` skips the pair-level dedup shuffle and returns
    raw pairs (one row per SHARED band, ≤ n_bands per pair). Use it
    only when the consumer's own final aggregate/distinct absorbs
    multiplicity (the semantic-dedup verify does) — the raw form saves
    a full exchange of the widest intermediate (round-15 optimization:
    the dedup here removed only ~9 % of rows at sf0.1 but cost a
    full candidate-pair shuffle; consumers that need set semantics,
    e.g. triangle counting, keep the default).

    Explode bands (n_bands rows per vector, narrow ints) → band-bucket
    self-equi-join → distinct. The join key is hash-derived, so bucket
    cardinality scales with the data — no O(n²/L) blow-up on a
    low-cardinality metadata label.

    ``max_bucket`` bounds the within-bucket join quadratically: each
    (band, key) bucket keeps its ``max_bucket`` smallest ids
    (deterministic rank, one narrow-row window shuffle) before pairing,
    so the worst-case pair count is n_bands × 2^bits × max_bucket²/2 at
    ANY corpus size — without it the 4-band/4-bit configuration grows
    O(n²/2^bits): already ~10^7-10^8 intra-bucket pairs at the sf1
    rehearsal's 20k vectors, and a non-starter at real corpus sizes
    (the classic hot-bucket LSH failure). The truncation trades recall
    inside over-full buckets (over-cap members pair with the kept
    prefix's band-mates only via their OTHER bands), the same bounded
    contract as dedup_near's hot-bucket guard and the streaming
    band_dedup cap; production tunes ``bits`` up (more, smaller
    buckets — dim permitting) before relying on the cap.
    """
    bands = _capped_bands(embeddings, id_col, vec_col, n_bands, bits, max_bucket)
    pairs = bucket_pair_explode(bands, "__id", "id_a", "id_b")
    return pairs.distinct() if distinct else pairs


# a<b pairs from the sorted per-bucket membership `ds`: slice(ds, i+2,
# ...) is every element after 0-based position i+1, so the nested
# transform emits exactly the (ds[i], ds[j]) i<j combinations, and ds
# ascending makes a<b structural.
_PAIR_EXPLODE = (
    "flatten(transform(ds, (a, i) -> "
    "transform(slice(ds, i + 2, size(ds)), b -> struct(a, b))))"
)


def bucket_pair_explode(
    bands: DataFrame, id_name: str, a_name: str, b_name: str
) -> DataFrame:
    """Per-(band_idx, band_key) a<b id pairs, one row per shared band,
    generated by collecting each bucket's (cap-bounded) membership set
    and exploding the combinations in-partition.

    Round-15 shape (guide §2.3/§2.4): replaces the band self-equi-join,
    whose TWO references to the band frame made Catalyst evaluate it
    twice — for `banded_candidate_pairs` that is the explode plus the
    window-cap SHUFFLE twice per query, for the persisted layout two
    scans. The groupBy reuses the band frame's existing
    (band_idx, band_key)-compatible clustering (window exchange or
    bucketed table), so pair generation adds no exchange at all; the
    collect buffer is bounded by the hot-bucket cap the callers apply
    upstream (collect_set additionally heals replayed duplicate rows
    in persisted layouts, where the self-join emitted duplicate pairs
    for the consumer's distinct to absorb). Pair sets are identical to
    the join shape; raw (distinct=False) multiplicity stays one row
    per shared band."""
    return (
        bands.groupBy("band_idx", "band_key")
        .agg(F.sort_array(F.collect_set(id_name)).alias("ds"))
        .filter(F.size("ds") >= 2)
        .select(F.explode(F.expr(_PAIR_EXPLODE)).alias("p"))
        .select(F.col("p.a").alias(a_name), F.col("p.b").alias(b_name))
    )


def fan_out(df: DataFrame) -> DataFrame:
    """Ensure CPU-heavy map work parallelizes: repartition ONLY when the
    input has fewer partitions than the cluster's parallelism (the local
    fixture is one parquet split, which would serialize per-row folds
    onto one core; the explicit count also stops AQE's size heuristic
    from coalescing a kilobyte-scale shuffle back to one partition). On
    a real multi-split corpus this is a no-op — no blanket shuffle."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# Input-bytes threshold above which the brute-force scorers switch from
# the JVM column fold to the npkernel Arrow pass. Both forms are
# bit-identical (tests/test_npkernel.py pins the arithmetic), so this is
# a pure COST choice — the AQE discipline applied at plan-construction
# time: the Arrow pass pays a ~0.5 s fixed worker/transfer floor but has
# ~3x lower per-row cost (docs/SIM_NPK_AB_r10.json: 2.7x faster at sf10's
# 1M vectors, slower below ~300k). Parquet compresses the fixture floats
# ~6x (1M 64-dim vectors = 44 MiB on disk), so 16 MiB ≈ the ~350k-vector
# crossover where the Arrow floor amortizes.
_NPK_BYTES_THRESHOLD = 16 * 1024 * 1024


def _input_bytes(df: DataFrame) -> int | None:
    """Driver-side size estimate: sum of the frame's input file sizes
    (no Spark job — file metadata only). Resolves sizes through the
    Hadoop FileSystem API so it is scheme-agnostic (file://, HDFS, S3A,
    GCS — round-11 ADVICE: the previous os.path.getsize form threw off
    local disk and silently disabled the size-adaptive npkernel fast
    path on the object stores the 100-TB deployment reads). None when
    the frame is not file-backed (in-memory test frames) or listing
    fails — callers treat None as "small" and take the safe JVM fold."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        spark = df.sparkSession
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            jpath = jvm.org.apache.hadoop.fs.Path(f)
            fs = jpath.getFileSystem(hconf)
            total += fs.getFileStatus(jpath).getLen()
        return total
    except Exception:
        return None


def cosine_vs_query(embeddings: DataFrame, query: DataFrame,
                    vec_col: str = "embedding", qvec_col: str = "qv",
                    id_col: str = "vec_id") -> DataFrame:
    """Score every row against a single query vector. Returns
    (id_col, cosine) — the columns every caller consumes.

    SIZE-ADAPTIVE (round 10): small inputs (< _NPK_BYTES_THRESHOLD =
    16 MiB on-disk, or non-file frames) score with the interpreted
    zip_with/aggregate column fold —
    no Python worker, lowest fixed cost; large inputs score with the
    `npkernel` vectorized Arrow pass (the IVF-rerank pattern: the one
    query row hydrates driver-side and each batch takes one
    matrix-vector `round_half_up((e*q)*1e16)` int64 fold, ~3x lower
    per-row cost — 2.7x faster at sf10's 1M vectors,
    docs/SIM_NPK_AB_r10.json). The two forms are bit-identical (pinned
    in tests/test_npkernel.py and by the shared DuckDB oracles), so the
    switch is pure cost, the AQE discipline applied at plan time. The
    corpus never leaves the executors; `fan_out` keeps the map stage
    parallel on single-split local fixtures."""
    import numpy as np

    from stream_processor_spark.operators import npkernel as npk

    nbytes = _input_bytes(embeddings)
    if nbytes is None or nbytes < _NPK_BYTES_THRESHOLD:
        return (
            fan_out(embeddings.select(id_col, vec_col))
            .crossJoin(F.broadcast(query.select(qvec_col)))
            .select(
                id_col,
                cosine(F.col(vec_col), F.col(qvec_col)).alias("cosine"),
            )
        )

    out_schema = f"{id_col} long, cosine double"
    qrow = query.select(qvec_col).head()
    if qrow is None or qrow[0] is None:
        return embeddings.sparkSession.createDataFrame([], out_schema)
    q = np.asarray(qrow[0], dtype=np.float64)
    sqq = float(np.sqrt(float(npk.self_norms_scaled(q[None, :])[0])))

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = npk.stack_embeddings(pdf[vec_col])
            p = npk.dot_scaled(E, q)
            saa = npk.self_norms_scaled(E)
            cos = p.astype(np.float64) / (
                np.sqrt(saa.astype(np.float64)) * sqq
            )
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "cosine": cos})

    return fan_out(embeddings.select(id_col, vec_col)).mapInPandas(
        score, schema=out_schema
    )


def topk_vs_query(embeddings: DataFrame, query: DataFrame, k: int,
                  id_col: str = "vec_id") -> DataFrame:
    """Brute-force exact top-k by cosine (deterministic tie-break on id)."""
    scored = cosine_vs_query(embeddings, query, id_col=id_col)
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# DuckDB oracle template reproducing the identical scaled-integer
# accumulation; {dim} = embedding dimension, {query_filter} selects the
# query row, e.g. "vec_id = 0". Exposes CTE ``scored(vec_id, cosine)``.
ORACLE_COSINE_CTE = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE {query_filter}),
terms AS (
  SELECT e.vec_id,
         CAST(round(CAST(e.embedding[i.i] AS DOUBLE) * CAST(q.qv[i.i] AS DOUBLE)
                    * 1e16) AS BIGINT) AS p,
         CAST(round(CAST(e.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE)
                    * 1e16) AS BIGINT) AS aa,
         CAST(round(CAST(q.qv[i.i] AS DOUBLE) * CAST(q.qv[i.i] AS DOUBLE)
                    * 1e16) AS BIGINT) AS qq
  FROM embeddings e CROSS JOIN q CROSS JOIN generate_series(1, {dim}) AS i(i)
),
scored AS (
  SELECT vec_id,
         CAST(CAST(SUM(p) AS BIGINT) AS DOUBLE)
           / (sqrt(CAST(CAST(SUM(aa) AS BIGINT) AS DOUBLE))
              * sqrt(CAST(CAST(SUM(qq) AS BIGINT) AS DOUBLE))) AS cosine
  FROM terms GROUP BY vec_id
)
"""


def sign_signature(a: Column, lo_bits: int = 32, hi_bits: int = 32):
    """Binary (sign-bit) signature of an embedding: dims 1..32 pack into
    ``sig_lo``, dims 33..64 into ``sig_hi`` (two int64 halves — the
    aHash packing, avoiding the 1<<63 sign bit). Pure column algebra:
    a 32-term CASE sum stays inside whole-stage codegen, and the DuckDB
    oracle reproduces it term by term. 1 bit/dim = 32x smaller than SQ8,
    the coarsest rung of the quantization ladder (binary -> SQ8 -> PQ ->
    float rerank)."""
    def pack(start: int, nbits: int) -> Column:
        b = F.lit(0).cast("long")
        for i in range(nbits):
            b = b + F.when(
                F.element_at(a, start + i).cast("double") > 0,
                F.lit(1 << i).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        return b

    return pack(1, lo_bits), pack(lo_bits + 1, hi_bits)


def hamming_topk(embeddings: DataFrame, query: DataFrame, k: int = 20,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Brute-force Hamming top-k over binary signatures: XOR + bit_count
    against the one query signature (broadcast). The scan reads two
    int64 columns per row — at 100 TB this is the cheap first pass that
    shortlists for an exact float rerank; entirely JVM-side (bit_count
    over xor is codegen), no Python anywhere."""
    lo, hi = sign_signature(F.col(vec_col))
    sigs = embeddings.select(F.col(id_col), lo.alias("sig_lo"), hi.alias("sig_hi"))
    qlo, qhi = sign_signature(F.col("qv"))
    qs = query.select(qlo.alias("q_lo"), qhi.alias("q_hi"))
    ham = (
        F.bit_count(F.expr("sig_lo ^ q_lo")) + F.bit_count(F.expr("sig_hi ^ q_hi"))
    ).cast("long")
    return (
        fan_out(sigs).crossJoin(F.broadcast(qs))
        .select(id_col, ham.alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col(id_col))
        .limit(k)
    )
