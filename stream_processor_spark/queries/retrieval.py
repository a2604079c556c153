"""Hybrid retrieval: lexical (BM25) + semantic (embedding cosine) fusion.

Training-data selection pipelines rarely rank with one signal: the
production pattern (Elastic/Vespa/Milvus "hybrid search") runs a
lexical ranker and a vector ranker and fuses the two lists with
Reciprocal Rank Fusion (Cormack et al., SIGIR 2009). Both legs already
exist in this engine as hash-oracled operators (`text_bm25`,
`sim_topk`); this module registers the fused operator on top of them.

Determinism: RRF needs only the RANKS, and ranks are integers with a
total order (score desc, id asc), so the fusion is exact-integer
arithmetic — `1e9 div (60 + rank)` summed over legs — immune to libm
or accumulation-order divergence. The only doubles involved (the BM25
score rounded to 6 dp, the scaled-int cosine ratio) are the same
expressions already hash-pinned by the leg operators.

Scale: each leg is its own top-k (TakeOrderedAndProject — one scan, no
global sort); the fusion joins two k-row lists (k=50), which is
driver-trivial at any corpus size. At 100 TB the legs serve from their
persisted layouts (BM25 postings, IVF index) via the router; the
fusion cost is unchanged.

Reference parity: the reference (src/consumer.js) has no retrieval
surface; this is part of the beyond-reference LLM-data mandate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stream_processor_spark.operators import similarity as sim
from stream_processor_spark.queries.base import register
from stream_processor_spark.queries.llm_data import (
    _BM25_ORACLE,
    _query_vec,
    text_bm25,
)

# RRF constant from the original paper; 1e9 scaling keeps the fused
# score an exact int64 (max 2 * 1e9/61 < 2^25).
_RRF_K = 60
_RRF_SCALE = 1_000_000_000
_LEG_K = 50

# The BM25 oracle ends in its final SELECT; rewrap it as a CTE by
# splicing the SELECT into the WITH chain. _BM25_ORACLE is
# "WITH docs AS (...), ..., qtok AS (...) SELECT t.doc_id, ... GROUP BY t.doc_id"
_bm25_body = _BM25_ORACLE.strip()
assert _bm25_body.startswith("WITH ")
_split_at = _bm25_body.index("\n    SELECT t.doc_id")
_BM25_CTES = _bm25_body[len("WITH ") : _split_at].rstrip().rstrip(",")
_BM25_FINAL = _bm25_body[_split_at:].strip()

_HYBRID_ORACLE = (
    sim.ORACLE_COSINE_CTE.format(query_filter="vec_id = 0", dim=64).rstrip()
    + ",\n"
    + _BM25_CTES
    + ",\n"
    + f"""
    bm25_scored AS (
      {_BM25_FINAL}
    ),
    lex AS (
      SELECT doc_id, r FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
        FROM bm25_scored
      ) WHERE r <= {_LEG_K}
    ),
    sem AS (
      SELECT doc_id, r FROM (
        SELECT vec_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS r
        FROM scored
      ) WHERE r <= {_LEG_K}
    )
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           CAST(COALESCE({_RRF_SCALE} // (CAST({_RRF_K} AS BIGINT) + l.r), 0)
              + COALESCE({_RRF_SCALE} // (CAST({_RRF_K} AS BIGINT) + s.r), 0)
              AS BIGINT) AS rrf,
           l.r AS lex_rank,
           s.r AS sem_rank
    FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    ORDER BY rrf DESC, doc_id LIMIT 20
    """
)


def _ranked(df, score_col: str, id_col: str, k: int):
    """Top-k by (score desc, id asc) with the rank attached.

    TakeOrderedAndProject does the top-k in one scan; the row_number
    window then runs over the k-row survivor set (driver-trivial), so
    no corpus-sized single-partition sort ever exists in the plan.
    """
    top = df.orderBy(F.col(score_col).desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return top.select(
        F.col(id_col).alias("doc_id"), F.row_number().over(w).cast("long").alias("r")
    )


@register("retrieval_hybrid_rrf", oracle=_HYBRID_ORACLE)
def retrieval_hybrid_rrf(t):
    """Hybrid lexical+semantic retrieval fused with Reciprocal Rank
    Fusion: top-50 BM25 (query doc 0's tokens) and top-50 exact cosine
    (query vector 0) combined as sum of `1e9 div (60 + rank)` — the
    standard hybrid-search ranking, exact-integer end to end.

    Each leg is the already-oracled operator (`text_bm25` /
    `sim_topk`); a document missing from one leg contributes 0 from it.
    Returns the fused top-20 with both leg ranks for auditability.
    """
    lex = _ranked(text_bm25(t), "bm25", "doc_id", _LEG_K).withColumnRenamed(
        "r", "lex_rank"
    )
    sem_scores = sim.cosine_vs_query(t.embeddings, _query_vec(t)).select(
        "vec_id", "cosine"
    )
    sem = _ranked(sem_scores, "cosine", "vec_id", _LEG_K).withColumnRenamed(
        "r", "sem_rank"
    )
    fused = lex.join(sem, "doc_id", "full_outer")
    rrf = (
        F.coalesce(
            F.expr(f"{_RRF_SCALE}L div ({_RRF_K}L + lex_rank)"), F.lit(0).cast("long")
        )
        + F.coalesce(
            F.expr(f"{_RRF_SCALE}L div ({_RRF_K}L + sem_rank)"), F.lit(0).cast("long")
        )
    ).cast("long")
    return (
        fused.select("doc_id", rrf.alias("rrf"), "lex_rank", "sem_rank")
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------- indexed hybrid ----

from stream_processor_spark.queries.llm_data import (  # noqa: E402
    _IVF_CENT_SQL,
    _ivf_serve_sql,
)

_serve = _ivf_serve_sql(2)
_ivf_split = _serve.rindex("SELECT vec_id,")
_IVF_CTES = _serve[:_ivf_split].rstrip()
assert _IVF_CTES.endswith(")")
_IVF_FINAL = _serve[_ivf_split:].strip()

_SEM_K = 10  # the IVF serve's pinned top-k

_HYBRID_IDX_ORACLE = (
    "WITH "
    + _IVF_CENT_SQL
    + ",\n"
    + _IVF_CTES
    + ",\n"
    + f"""
    ivf_scored AS (
      {_IVF_FINAL}
    ),
    """
    + _BM25_CTES
    + ",\n"
    + f"""
    bm25_scored AS (
      {_BM25_FINAL}
    ),
    lex AS (
      SELECT doc_id, r FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
        FROM bm25_scored
      ) WHERE r <= {_LEG_K}
    ),
    sem AS (
      SELECT vec_id AS doc_id,
             ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS r
      FROM ivf_scored
    )
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           CAST(COALESCE({_RRF_SCALE} // (CAST({_RRF_K} AS BIGINT) + l.r), 0)
              + COALESCE({_RRF_SCALE} // (CAST({_RRF_K} AS BIGINT) + s.r), 0)
              AS BIGINT) AS rrf,
           l.r AS lex_rank,
           s.r AS sem_rank
    FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    ORDER BY rrf DESC, doc_id LIMIT 20
    """
)


@register("retrieval_hybrid_rrf_indexed", oracle=_HYBRID_IDX_ORACLE)
def retrieval_hybrid_rrf_indexed(t):
    """`retrieval_hybrid_rrf` served from BOTH persisted layouts: the
    lexical leg ranks from the BM25 postings index (bucket-pruned scan,
    `text_bm25_postings`' plan) and the semantic leg from the IVF
    inverted-list index (partition-pruned scan, `sim_ann_ivf_indexed`'s
    plan) — the production hybrid-search shape, where per-query cost is
    matched-postings + probed-lists, never a corpus pass. The semantic
    leg carries IVF's approximation (nprobe=2, top-10), so the oracle
    replays the probe exactly; the fusion arithmetic is the same
    exact-integer RRF as the from-scratch operator.
    """
    import numpy as np

    from stream_processor_spark.operators.annindex import (
        ensure_ivf_index,
        ivf_query_indexed,
    )
    from stream_processor_spark.operators.postings import (
        bm25_from_postings,
        ensure_postings,
    )

    spark = t._spark
    qrow = t.documents.filter(F.col("doc_id") == 0).select("text").head()
    if qrow is None or qrow[0] is None:
        raise ValueError("hybrid: query document (doc_id=0) not found")
    qtokens = sorted({tok for tok in qrow[0].split(" ") if tok != ""})
    post_name, stats_name = ensure_postings(spark, t._dir)
    lex = _ranked(
        bm25_from_postings(spark, post_name, stats_name, qtokens),
        "bm25",
        "doc_id",
        _LEG_K,
    ).withColumnRenamed("r", "lex_rank")

    vrow = t.embeddings.filter(F.col("vec_id") == 0).select("embedding").head()
    if vrow is None:
        raise ValueError("hybrid: query vector (vec_id=0) not found")
    lists_name, cent_name = ensure_ivf_index(spark, t._dir)
    sem_scores = ivf_query_indexed(
        spark, lists_name, cent_name, np.asarray(vrow[0], dtype=np.float64)
    )
    sem = _ranked(sem_scores, "cosine", "vec_id", _SEM_K).withColumnRenamed(
        "r", "sem_rank"
    )
    fused = lex.join(sem, "doc_id", "full_outer")
    rrf = (
        F.coalesce(
            F.expr(f"{_RRF_SCALE}L div ({_RRF_K}L + lex_rank)"), F.lit(0).cast("long")
        )
        + F.coalesce(
            F.expr(f"{_RRF_SCALE}L div ({_RRF_K}L + sem_rank)"), F.lit(0).cast("long")
        )
    ).cast("long")
    return (
        fused.select("doc_id", rrf.alias("rrf"), "lex_rank", "sem_rank")
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
    )


# --- MMR diversity rerank (round 9) ---------------------------------------

_MMR_C = 30   # candidate pool (top-C by relevance)
_MMR_K = 10   # selections
_MMR_LAM = 0.75  # relevance weight; (1-λ) penalizes redundancy


def _mmr_oracle() -> str:
    """Unrolled greedy MMR replay: candidate pool + exact-int pairwise
    cosines, then K-1 MATERIALIZED pick/accumulate steps (each step's
    accumulator is referenced three times — the engine's standard
    unrolled-trajectory oracle discipline)."""
    head = (
        sim.ORACLE_COSINE_CTE.format(query_filter="vec_id = 0", dim=64).rstrip()
        + f""",
    cand AS MATERIALIZED (
      SELECT vec_id, cosine AS rel FROM scored
      ORDER BY cosine DESC, vec_id LIMIT {_MMR_C}
    ),
    cterms AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST(round(CAST(ea.embedding[i.i] AS DOUBLE)
                        * CAST(eb.embedding[i.i] AS DOUBLE) * 1e16) AS BIGINT) AS p,
             CAST(round(CAST(ea.embedding[i.i] AS DOUBLE)
                        * CAST(ea.embedding[i.i] AS DOUBLE) * 1e16) AS BIGINT) AS aa,
             CAST(round(CAST(eb.embedding[i.i] AS DOUBLE)
                        * CAST(eb.embedding[i.i] AS DOUBLE) * 1e16) AS BIGINT) AS bb
      FROM cand a JOIN cand b ON a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      CROSS JOIN generate_series(1, 64) AS i(i)
    ),
    psim0 AS (
      SELECT va, vb,
             CAST(CAST(SUM(p) AS BIGINT) AS DOUBLE)
               / (sqrt(CAST(CAST(SUM(aa) AS BIGINT) AS DOUBLE))
                  * sqrt(CAST(CAST(SUM(bb) AS BIGINT) AS DOUBLE))) AS s
      FROM cterms GROUP BY va, vb
    ),
    pairsim AS MATERIALIZED (
      SELECT va AS a, vb AS b, s FROM psim0
      UNION ALL SELECT vb, va, s FROM psim0
    ),
    acc1 AS MATERIALIZED (
      SELECT vec_id, 1 AS rnk, rel, rel AS mmr FROM cand
      ORDER BY rel DESC, vec_id LIMIT 1
    )"""
    )
    steps = []
    for i in range(2, _MMR_K + 1):
        steps.append(f"""
    pick{i} AS MATERIALIZED (
      SELECT c.vec_id, {i} AS rnk, c.rel,
             {_MMR_LAM} * c.rel - {round(1 - _MMR_LAM, 10)} * (
               SELECT MAX(s.s) FROM pairsim s
               JOIN acc{i - 1} t ON s.b = t.vec_id
               WHERE s.a = c.vec_id
             ) AS mmr
      FROM cand c LEFT JOIN acc{i - 1} x ON c.vec_id = x.vec_id
      WHERE x.vec_id IS NULL
      ORDER BY mmr DESC, c.vec_id LIMIT 1
    ),
    acc{i} AS MATERIALIZED (
      SELECT * FROM acc{i - 1} UNION ALL SELECT * FROM pick{i}
    )""")
    tail = f"""
    SELECT CAST(rnk AS BIGINT) AS mmr_rank, vec_id,
           round(rel, 6) AS relevance, round(mmr, 6) AS mmr
    FROM acc{_MMR_K}
    """
    return head + "," + ",".join(steps) + tail


@register("retrieval_mmr", oracle=_mmr_oracle())
def retrieval_mmr(t):
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR
    1998): greedily pick K=10 results from the top-C=30 relevance pool,
    each pick maximizing λ·rel(d) − (1−λ)·max_{s∈picked} sim(d, s) —
    the standard redundancy-suppressing rerank between retrieval and a
    training-data or RAG consumer (near-duplicate hits waste the slot
    budget that diversity would spend on coverage).

    Split of labor at scale: the CORPUS-sized work is the relevance
    top-C (one TakeOrderedAndProject scan — served from the IVF/PQ
    layouts via the router in production); the greedy loop then runs on
    the driver over the C-row pool with the same scaled-int64 cosine
    kernels the distributed plans use (`operators/npkernel` —
    C²·dim ≈ 58k multiplies, constant in corpus size, the same bounded
    driver-model pattern as the Lloyd/BPE argmax steps). The oracle
    replays the whole greedy trajectory as K−1 unrolled MATERIALIZED
    pick/accumulate CTEs over exact-int pairwise cosines, so every
    selection (not just the final list) is hash-verified.

    Determinism: relevance and pair similarities are the engine's
    pinned scaled-int64 cosine (int sums; IEEE sqrt/div), the MMR
    combination is the same two multiplies and subtract on both sides,
    ties break on vec_id, and doubles are rounded to 6 dp only at the
    output boundary."""
    import numpy as np

    from stream_processor_spark.operators import npkernel as npk

    e = t.embeddings
    pool = (
        sim.cosine_vs_query(e, _query_vec(t))
        .select("vec_id", "cosine")
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(_MMR_C)
    )
    rows = (
        pool.join(e.select("vec_id", "embedding"), "vec_id")
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .collect()
    )
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    rel = np.asarray([r["cosine"] for r in rows], dtype=np.float64)
    E = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
    )
    # exact-int pairwise cosines (C x C), same kernel as the oracle
    P = npk.dot_scaled(E, E)  # int64 pair dot sums
    n = npk.self_norms_scaled(E).astype(np.float64)
    S = P.astype(np.float64) / (np.sqrt(n)[:, None] * np.sqrt(n)[None, :])

    c = len(ids)
    picked: list[int] = []
    out = []
    # pick 1: pure relevance (rows already sorted rel desc, id asc)
    picked.append(0)
    out.append((1, int(ids[0]), float(rel[0]), float(rel[0])))
    for rnk in range(2, min(_MMR_K, c) + 1):
        best_i, best_score = -1, None
        for i in range(c):
            if i in picked:
                continue
            ms = max(float(S[i, j]) for j in picked)
            score = _MMR_LAM * float(rel[i]) - (1 - _MMR_LAM) * ms
            # oracle tie-break: mmr DESC, vec_id ASC (exact-tie floats
            # are real here — the corpus contains duplicate embeddings)
            if (
                best_score is None
                or score > best_score
                or (score == best_score and ids[i] < ids[best_i])
            ):
                best_i, best_score = i, score
        picked.append(best_i)
        out.append((rnk, int(ids[best_i]), float(rel[best_i]), float(best_score)))

    res = t._spark.createDataFrame(
        out, "mmr_rank long, vec_id long, relevance double, mmr double"
    )
    return res.select(
        "mmr_rank",
        "vec_id",
        F.round("relevance", 6).alias("relevance"),
        F.round("mmr", 6).alias("mmr"),
    )
