"""Round-5 additions to the LLM-training-data surface.

Four operators a production corpus pipeline runs that were not yet
covered: token-budget sharding (the step that turns a filtered corpus
into ~equal training shards), per-document keyword extraction (TF-IDF
top-k), temperature-scaled mixture sampling (the multilingual alpha-
sampling scheme), and OHLC time-series resampling over the events
stream (min_by/max_by surface). All four are hash-oracled; every
selection/score is integer-exact (or IEEE-exact like sqrt) so no float
boundary can flip a row between engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stream_processor_spark.operators import text as tx
from stream_processor_spark.queries.base import register
from stream_processor_spark.queries.relational import _dsum_sql, dsum

_SHARD_TOKENS = 5000  # token budget per training shard
_RANGE = 200  # doc_ids per prefix-sum bucket (static, key-derived)


@register(
    "corpus_shard_by_tokens",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                 - n_tokens) // {_SHARD_TOKENS} AS BIGINT) AS shard_id
    FROM sized
    """,
)
def corpus_shard_by_tokens(t):
    """Token-budget sharding: assign documents (in stable doc_id order)
    to contiguous ~{5000}-token training shards — the packing step that
    feeds a tokenizer/writer fleet. A document's shard is
    ``floor(prefix_token_count / budget)``.

    Scale notes: the oracle's single global running sum would
    single-thread at 100 TB, so the Spark side runs the DISTRIBUTED
    prefix sum: documents bucket by ``doc_id div 200`` (static key
    ranges — no sampling, fully deterministic), each bucket computes its
    local running sum in parallel, and the per-bucket totals (bucket
    count ~ N/200 rows) take one tiny cascaded cumsum that joins back as
    bucket offsets. Two shuffles of the slim (doc_id, n_tokens)
    projection; the text column never moves. Result is bit-identical to
    the sequential definition by associativity of +.
    """
    d = t.documents
    sized = d.select(
        "doc_id",
        F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tokens"),
        # integer `div`, not `/`: double division loses exactness past
        # 2^53 and could flip a bucket/shard boundary vs the oracle
        F.expr(f"doc_id div {_RANGE}").alias("bucket"),
    )
    # Round 15: bucket totals via max(local_cum) over the SAME windowed
    # frame — with both branches reading one identical
    # scan→filter→exchange subtree, AQE's exchange reuse tokenizes and
    # scans the corpus ONCE (final adaptive plan: 1 Scan parquet, was
    # 2; the old separate sum(n_tokens) aggregate defeated reuse via
    # column pruning + one-sided isnotnull pushdown, which is why the
    # previous comment resorted to "persist sized at 100 TB" — no
    # longer needed). The explicit isnotnull(bucket) filter mirrors the
    # join's pushed predicate symmetrically; max == sum because
    # n_tokens >= 0 keeps the cumsum non-decreasing. The second window
    # sort over the reused shuffle is a per-partition sort of slim
    # (doc_id, n_tokens) rows — noise next to a corpus re-scan.
    shared = sized.filter(F.col("bucket").isNotNull())
    local = shared.withColumn(
        "local_cum",
        F.sum("n_tokens").over(
            Window.partitionBy("bucket")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    offsets = (
        local.groupBy("bucket")
        .agg(F.max("local_cum").alias("bucket_total"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("bucket_total").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            F.expr(
                f"(offset + local_cum - n_tokens) div {_SHARD_TOKENS}"
            ).alias("shard_id"),
        )
    )


@register(
    "text_tfidf_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             tf.tf * ((n.n_docs * 1000000) // df.df) AS score
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, score
    FROM (SELECT doc_id, token, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, token) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def text_tfidf_topk(t):
    """Per-document keyword extraction: top-3 tokens by TF-IDF. IDF is
    integer-scaled (``(N * 1e6) div document_frequency`` — exact int64
    in both engines, no log/float boundary), score = tf x scaled-idf.

    Scale notes: one token explode -> (doc, token) aggregate (partial
    combine), document frequencies re-aggregate the slim tf frame on
    token; the vocabulary joins back broadcast (real vocabularies fit;
    hash join beyond); N rides as a 1-row cross join. The top-3 window
    partitions by doc_id — same shuffle key the tf aggregate already
    produced, so AQE reuses the exchange. No corpus re-scan.
    """
    d = t.documents
    tok = d.select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (F.col("tf") * F.expr("(n_docs * 1000000) div df")).alias("score"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("score").desc(), F.col("token")
        )
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "score")
    )


@register(
    "sample_temperature",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY source
    ),
    weights AS (
      SELECT source, cnt,
             CAST(floor(1000.0 * sqrt(CAST(cnt AS DOUBLE))) AS BIGINT) AS w
      FROM counts
    ),
    quotas AS (
      SELECT source, cnt, w,
             (200 * w) // (SELECT SUM(w) FROM weights) AS quota
      FROM weights
    ),
    ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quotas q USING (source)
    WHERE r.rn <= q.quota
    """,
)
def sample_temperature(t):
    """Temperature-scaled mixture sampling (the multilingual
    alpha-sampling scheme, alpha = 0.5): each source's share of the
    200-doc budget is proportional to ``count^alpha``, boosting
    low-resource sources relative to their raw share; rows within a
    source are chosen by deterministic hash rank. sqrt is IEEE
    correctly-rounded (bit-identical cross-engine) and every other step
    is int64, so the selected set is engine-exact.

    Scale notes: source counts are a partial-combined aggregate (rows =
    #sources, broadcast back); the per-source hash-rank window shuffles
    on source — for a skewed mega-source, swap the window for the
    top-k-by-hash pattern of `sample_uniform_k` per stratum. At extreme
    N (>~10^13 docs) the 1e3-scaled weights approach int64 limits —
    raise to DECIMAL there.
    """
    d = t.documents
    weights = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "source",
            F.floor(F.lit(1000.0) * F.sqrt(F.col("cnt").cast("double")))
            .cast("long")
            .alias("w"),
        )
    )
    total_w = weights.agg(F.sum("w").alias("total_w"))
    quotas = (
        weights.crossJoin(F.broadcast(total_w))
        .select("source", F.expr("(200 * w) div total_w").alias("quota"))
    )
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rn", rn)
        .join(F.broadcast(quotas), "source")
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "source")
    )


@register(
    "ts_ohlc",
    oracle="""
    WITH r AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             value,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id, day,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM r GROUP BY user_id, day
    """,
)
def ts_ohlc(t):
    """OHLC resampling: per user per day, the first/last (by event time,
    event_id tie-break) plus min/max of `value` — the downsample every
    metrics/feature store runs. Spark side uses min_by/max_by with a
    struct ordering key (one aggregate, no window); the oracle proves
    the equivalence against the two-window row_number formulation.

    Scale notes: ONE shuffle on (user_id, day) with partial min/max/
    min_by combine map-side — contrast the oracle's shape, which would
    sort every group twice. Raw-value comparisons only (no arithmetic),
    so doubles hash-check as-is.
    """
    e = t.events
    day = F.date_trunc("day", F.col("ts")).alias("day")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy(F.col("user_id"), day)
        .agg(
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


# ------------------------------------------------------------ time series ----

_EWMA_W = [500000, 250000, 125000, 62500]  # 1e6-scaled 0.5 * 0.5^k


def _ewma_lag_sql(col: str, k: int) -> str:
    return (
        f"LAG({col}, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    )


@register(
    "ts_ewma_truncated",
    oracle=f"""
    WITH q AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq
      FROM events
    )
    SELECT user_id, event_id,
           CAST((
             {" + ".join(
                 f"COALESCE({_ewma_lag_sql('vq', k)} * {w}, 0)"
                 for k, w in enumerate(_EWMA_W))}
           ) AS DOUBLE) / CAST(NULLIF((
             {" + ".join(
                 f"(CASE WHEN {_ewma_lag_sql('vq', k)} IS NOT NULL"
                 f" THEN {w} ELSE 0 END)"
                 for k, w in enumerate(_EWMA_W))}
           ), 0) AS DOUBLE) / 100.0 AS ewma
    FROM q
    """,
)
def ts_ewma_truncated(t):
    """Exponentially weighted moving average (alpha = 0.5), truncated at
    4 lags — the smoothing pass of monitoring/feature pipelines. The
    recursive EWMA is not a SQL window aggregate; the K-term truncation
    (weights decay 16x over the window) makes it one: a weighted sum of
    LAG 0..3 with the weight mass renormalized over the lags that exist
    at the partition head.

    Determinism: values are fixed-point cents, weights 1e6-scaled int64;
    numerator/denominator are exact integers < 2^53, so the final two
    IEEE divisions are correctly rounded identically in both engines.
    Scale notes: ONE shuffle on user_id serves all 8 window terms (same
    frame); no self-joins, no state.
    """
    e = t.events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = e.select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("vq"),
    )
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for k, wk in enumerate(_EWMA_W):
        lagk = F.lag("vq", k).over(w)
        num = num + F.coalesce(lagk * F.lit(wk), F.lit(0))
        den = den + F.when(lagk.isNotNull(), F.lit(wk)).otherwise(F.lit(0))
    return q.select(
        "user_id", "event_id",
        # den = 0 when the current row AND all 3 lags carry NULL values
        # (e.g. a partition head whose value is NULL): emit NULL, never
        # 0.0/0.0 = NaN. Oracle mirrors with NULLIF(den, 0) — both
        # engines then agree on NULL regardless of DuckDB's
        # ieee_floating_point_ops setting (round-5 ADVICE).
        F.when(
            den > 0,
            num.cast("double") / den.cast("double") / F.lit(100.0),
        ).alias("ewma"),
    )


@register(
    "scd2_intervals",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM marked
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER
             (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
    FROM changes
    """,
)
def scd2_intervals(t):
    """SCD type-2 interval build: collapse each user's event-type stream
    into change-point rows with [valid_from, valid_to) validity — the
    transformation that turns an event log into a slowly-changing
    dimension (valid_to NULL = current). Gaps-and-islands via LAG to
    detect changes, LEAD over the surviving change rows to close each
    interval.

    Scale notes: one shuffle on user_id; both window passes and the
    filter reuse the same partitioning (no second exchange — Spark
    keeps the hash partitioning through the filter). Deterministic
    (ts, event_id) total order per user.
    """
    e = t.events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = marked.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_type", F.col("ts").alias("valid_from"),
             "event_id")
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id", "event_type", "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


# -------------------------------------------------------------- embeddings ----

_PROJ_IN_DIM = 64
_PROJ_OUT_DIM = 8


def _proj_sign(i: int, j: int) -> int:
    """Deterministic +-1 from the engine's pinned LCG (same constants as
    corpus_mix / sample ranking)."""
    x = (1103515245 * (i * _PROJ_IN_DIM + j) + 12345) % 2147483648
    return 1 if ((x >> 16) & 1) == 0 else -1


def _proj_oracle() -> str:
    outs = []
    for i in range(_PROJ_OUT_DIM):
        terms = " + ".join(
            "{s}CAST(round(CAST(embedding[{idx}] AS DOUBLE) * 1000000.0)"
            " AS BIGINT)".format(
                s="" if _proj_sign(i, j) > 0 else "-", idx=j + 1
            )
            for j in range(_PROJ_IN_DIM)
        )
        outs.append(f"CAST({terms} AS BIGINT) AS p{i}")
    return "SELECT vec_id, " + ", ".join(outs) + " FROM embeddings"


@register("embedding_random_projection", oracle=_proj_oracle())
def embedding_random_projection(t):
    """Johnson-Lindenstrauss sign random projection: 64-dim float
    embeddings down to 8 fixed-point dims via a pinned +-1 matrix (LCG
    bit per cell) — the cheap dimensionality reduction that front-ends
    clustering / dedup at corpus scale (distances preserved within
    ~1/sqrt(8)). Components are exact int64 sums of 1e6-scaled
    coordinates, so the projection hash-checks bit-for-bit.

    Scale notes: narrow map-only stage, whole-stage codegen (no UDF, no
    shuffle); the sign matrix is compiled into the plan as +-
    expressions. For out-dims in the hundreds, switch to the
    `npkernel` Arrow pass — same contract, one numpy matmul per batch.
    """
    emb = t.embeddings
    q = [
        F.round(F.col("embedding").getItem(j).cast("double") * 1000000.0, 0)
        .cast("long")
        .alias(f"q{j}")
        for j in range(_PROJ_IN_DIM)
    ]
    base = emb.select("vec_id", *q)
    outs = []
    for i in range(_PROJ_OUT_DIM):
        expr = None
        for j in range(_PROJ_IN_DIM):
            term = base[f"q{j}"] if _proj_sign(i, j) > 0 else -base[f"q{j}"]
            expr = term if expr is None else expr + term
        outs.append(expr.cast("long").alias(f"p{i}"))
    return base.select("vec_id", *outs)


# ------------------------------------------------------------ data layout ----

from stream_processor_spark.operators import storage as st  # noqa: E402


@register(
    "layout_zorder_key",
    oracle=f"""
    SELECT event_id,
           CAST({st.morton_sql("user_id", "event_id")} AS BIGINT)
             AS z_key
    FROM events
    """,
)
def layout_zorder_key(t):
    """Morton (Z-order) interleave key over two dimensions — the sort
    key behind `operators.storage.write_zordered` (multi-dimensional
    file clustering: each file covers a small (x, y) rectangle so
    parquet min/max stats prune on either dimension). Registered so the
    bit-interleave itself is hash-verified against DuckDB: the SAME SQL
    text generator (`storage.morton_sql`) compiles to both engines.

    Scale notes: pure whole-stage-codegen bit arithmetic, map-only."""
    e = t.events
    return e.select(
        "event_id", st.morton_key("user_id", "event_id").alias("z_key")
    )


# ---------------------------------------------------------- data profiling ----

_CORR_COLS = [  # (name, fixed-point scale chosen to keep Σq² inside int64)
    ("l_quantity", 100),
    ("l_extendedprice", 1),
    ("l_discount", 10000),
]


def _corr_sql() -> str:
    quant = ", ".join(
        f"CAST(floor({c} * {s}.0 + 0.5) AS BIGINT) AS q_{c}"
        for c, s in _CORR_COLS
    )
    moments, pairs = ["CAST(COUNT(*) AS BIGINT) AS n"], []
    for c, _ in _CORR_COLS:
        moments.append(f"CAST(SUM(q_{c}) AS BIGINT) AS s_{c}")
        moments.append(f"CAST(SUM(q_{c} * q_{c}) AS BIGINT) AS ss_{c}")
    for i, (a, _) in enumerate(_CORR_COLS):
        for b, _s in _CORR_COLS[i + 1:]:
            moments.append(f"CAST(SUM(q_{a} * q_{b}) AS BIGINT) AS sp_{a}_{b}")
            pairs.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y, round("
                f"(CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
                f" / (sqrt(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
                f"         - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
                f"    * sqrt(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
                f"           - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
                f", 6) AS corr FROM m"
            )
    return (
        f"WITH q AS (SELECT {quant} FROM lineitem),"
        f" m AS (SELECT {', '.join(moments)} FROM q) "
        + " UNION ALL ".join(pairs)
    )


@register("profile_correlations", oracle=_corr_sql())
def profile_correlations(t):
    """Pairwise Pearson correlation matrix over numeric fact columns in
    ONE table pass — the feature-analysis step of data profiling
    (`profile_table`'s bivariate sibling). All 10 moment sums
    (n, Σx, Σx², Σxy per pair) come from a single aggregate over
    fixed-point int64 values; the only float math is the final per-pair
    ratio, identical expression shape in both engines, rounded to 6 dp.

    Per-column scales are chosen so Σq² stays inside int64 headroom at
    ~10^8 rows per aggregate partition-merge (price at scale 1:
    max 10^5 -> Σq² ≈ 10^10/row); extreme row counts switch to DECIMAL.
    Scale notes: scan -> partial moment sums -> 1-row reduce; the
    3-pair report is expression-side Expand of the single row (free).
    """
    l = t.lineitem
    q = l.select(
        *[
            F.floor(F.col(c) * F.lit(float(s)) + F.lit(0.5))
            .cast("long")
            .alias(f"q_{c}")
            for c, s in _CORR_COLS
        ]
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c, _ in _CORR_COLS:
        aggs.append(F.sum(F.col(f"q_{c}")).cast("long").alias(f"s_{c}"))
        aggs.append(
            F.sum(F.col(f"q_{c}") * F.col(f"q_{c}")).cast("long")
            .alias(f"ss_{c}")
        )
    for i, (a, _) in enumerate(_CORR_COLS):
        for b, _s in _CORR_COLS[i + 1:]:
            aggs.append(
                F.sum(F.col(f"q_{a}") * F.col(f"q_{b}")).cast("long")
                .alias(f"sp_{a}_{b}")
            )
    m = q.agg(*aggs)

    def corr(a: str, b: str):
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        return F.round(
            (n * F.col(f"sp_{a}_{b}").cast("double") - sa * sb)
            / (
                F.sqrt(n * F.col(f"ss_{a}").cast("double") - sa * sa)
                * F.sqrt(n * F.col(f"ss_{b}").cast("double") - sb * sb)
            ),
            6,
        )
    return m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_x"),
                        F.lit(b).alias("col_y"),
                        corr(a, b).alias("corr"),
                    )
                    for i, (a, _) in enumerate(_CORR_COLS)
                    for b, _s in _CORR_COLS[i + 1:]
                ]
            )
        ).alias("p")
    ).select("p.*")


# ------------------------------------------------------------ data quality ----


@register(
    "dq_checks",
    oracle="""
    SELECT 'orders.custkey_not_null' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders.totalprice_positive',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.status_in_domain',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P'))
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.custkey_ref_customer',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT)
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
)
def dq_checks(t):
    """Data-quality expectation suite (the dbt-test / Great-Expectations
    shape): not-null, range, domain-membership and referential-integrity
    checks, each reported as (check, rows, violations). The three
    row-local rules share ONE scan via conditional aggregates +
    expression-side unpivot; the referential check is a broadcast left
    join counted in the same style (violation = unmatched key).

    Scale notes: one fact scan for the row-local rules (map-side
    collapse to one row), one broadcast-dim join for the FK rule — at
    two fact tables the FK check shuffles on the key like any equi
    join. No rule ever materializes violating ROWS (counts only);
    pair with `dlq_split` to route them.
    """
    o, c = t.orders, t.customer
    local = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).cast("long")
        .alias("v_null"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).cast("long")
        .alias("v_price"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)
        ).cast("long").alias("v_domain"),
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.col("n_rows"),
                        F.col(v).alias("n_violations"),
                    )
                    for name, v in [
                        ("orders.custkey_not_null", "v_null"),
                        ("orders.totalprice_positive", "v_price"),
                        ("orders.status_in_domain", "v_domain"),
                    ]
                ]
            )
        ).alias("p")
    ).select("p.*")
    fk = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count(F.when(F.col("c_custkey").isNull(), 1)).cast("long")
            .alias("n_violations"),
        )
        .select(
            F.lit("orders.custkey_ref_customer").alias("check_name"),
            "n_rows",
            "n_violations",
        )
    )
    return local.unionAll(fk)


@register(
    "ts_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def ts_transition_matrix(t):
    """Behavioral transition matrix: counts of (previous event ->
    next event) per-user transitions — the Markov-chain summary behind
    path analysis and next-action models; completes the events-analytics
    family (funnel / retention / sessionize / SCD2).

    Scale notes: one shuffle on user_id for the LAG, then the transition
    aggregate collapses map-side to |event_types|^2 groups."""
    e = t.events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ------------------------------------------------------- data management ----


@register(
    "merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT s_suppkey + 1000000, s_name, s_acctbal FROM supplier
    )
    SELECT COALESCE(u.c_custkey, c.c_custkey) AS c_custkey,
           COALESCE(u.c_name, c.c_name) AS c_name,
           COALESCE(u.c_acctbal, c.c_acctbal) AS c_acctbal
    FROM customer c FULL OUTER JOIN updates u
      ON c.c_custkey = u.c_custkey
    """,
)
def merge_upsert(t):
    """MERGE INTO semantics (SCD type-1 upsert) as a pure query: matched
    keys take the update row, unmatched updates insert, unmatched base
    rows carry through — FULL OUTER join + per-column COALESCE
    preferring the update side. The updates feed here is derived
    deterministically from the fixture (balance bump for custkey%7,
    supplier roster as inserts under shifted keys).

    The COALESCE form assumes update rows carry complete records (an
    update with NULL columns would fall back to base — use an
    is-matched flag per side for partial updates). At 100 TB this is
    one key-partitioned shuffle join; with the base table bucketed on
    the key the base side needs no exchange at all (`join_bucketed`),
    which is exactly how table formats implement MERGE compaction."""
    c, s = t.customer, t.supplier
    updates = (
        c.filter(c.c_custkey % 7 == 0)
        .select(
            "c_custkey", "c_name",
            (c.c_acctbal + F.lit(100.0)).alias("c_acctbal"),
        )
        .unionAll(
            s.select(
                (s.s_suppkey + F.lit(1000000)).alias("c_custkey"),
                s.s_name.alias("c_name"),
                s.s_acctbal.alias("c_acctbal"),
            )
        )
    )
    base = t.customer.select("c_custkey", "c_name", "c_acctbal")
    u = updates.alias("u")
    b = base.alias("b")
    return u.join(
        b, F.col("u.c_custkey") == F.col("b.c_custkey"), "full_outer"
    ).select(
        F.coalesce(F.col("u.c_custkey"), F.col("b.c_custkey"))
        .alias("c_custkey"),
        F.coalesce(F.col("u.c_name"), F.col("b.c_name")).alias("c_name"),
        F.coalesce(F.col("u.c_acctbal"), F.col("b.c_acctbal"))
        .alias("c_acctbal"),
    )


@register(
    "cdc_apply_lww",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type AS last_op, value AS last_value,
           ts AS last_ts
    FROM ranked WHERE rn = 1 AND event_type <> 'purchase'
    """,
)
def cdc_apply_lww(t):
    """CDC apply, last-write-wins: collapse a change log to final state
    — per key take the latest op by (event time, event_id), drop keys
    whose final op is the delete sentinel (here: 'purchase' stands in
    for D). ONE max_by aggregate with a struct ordering key — no window
    sort; the oracle runs the row_number formulation, proving the
    aggregate equivalence (same pattern as `ts_ohlc`).

    Scale notes: partial max_by combines map-side, so the shuffle
    carries one candidate row per key per input partition — the
    standard compaction pass of any CDC ingestion (Debezium-style) at
    arbitrary log size. Restart-safe streaming twin:
    `streaming_analogs`' stateful dedup with the same ordering key."""
    e = t.events
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    last = (
        e.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct(
                    F.col("event_type").alias("last_op"),
                    F.col("value").alias("last_value"),
                    F.col("ts").alias("last_ts"),
                ),
                ordk,
            ).alias("last")
        )
        .select("user_id", "last.*")
    )
    return last.filter(F.col("last_op") != "purchase")


@register(
    "join_null_safe",
    oracle="""
    WITH k AS (
      SELECT c_custkey, NULLIF(c_custkey % 5, 0) AS grp
      FROM customer WHERE c_custkey < 1000
    )
    SELECT COALESCE(CAST(a.grp AS VARCHAR), 'NULL') AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM k a JOIN k b ON a.grp IS NOT DISTINCT FROM b.grp
    GROUP BY a.grp
    ORDER BY grp
    """,
)
def join_null_safe(t):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantic corner that
    silently drops rows when an upsert/merge keys on a nullable column.
    Derived nullable key (custkey%5, 0 -> NULL) self-joined null-safely;
    the NULL group's pair count proves the matches happened (a plain
    equi join would return nothing for it).

    Scale notes: Spark plans eqNullSafe as a hash join on a
    null-coalesced key (no nested loop); bounded input slice keeps the
    demo's pair fan-out fixed across scale factors."""
    c = t.customer
    k = c.filter(c.c_custkey < 1000).select(
        "c_custkey",
        F.nullif((c.c_custkey % 5), F.lit(0)).alias("grp"),
    )
    a, b = k.alias("a"), k.alias("b")
    return (
        a.join(b, F.col("a.grp").eqNullSafe(F.col("b.grp")))
        .groupBy(
            F.coalesce(F.col("a.grp").cast("string"), F.lit("NULL"))
            .alias("grp")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("grp")
    )


# ------------------------------------------------- beyond-int64 aggregates ----


def _dsum_dec_sql(expr: str, scale: int = 6) -> str:
    """DuckDB mirror of `dsum_dec`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS VARCHAR)"
    )


def dsum_dec(col, scale: int = 6):
    """Order-independent exact DECIMAL sum — `dsum`'s beyond-int64 path.

    `dsum`'s int64 fixed-point accumulator overflows once
    Σ(value x 10^scale) exceeds 2^63 — a boundary the sf100 decade
    rehearsal measured as REAL (the IVF centroid sums crossed it at
    ~3.5e19; Q1's scale-6 group sums sit at 2.8e18 there, one decade
    from the cliff). DECIMAL(30,scale) accumulation is exact to 10^30
    and order-independent; the total is EMITTED AS ITS EXACT STRING
    SERIALIZATION (fixed scale digits, e.g. "7.750000") — the consumer
    parses it at whatever precision it owns, the same
    no-lossy-conversion contract as `agg_groupby_wide`'s integer pairs.
    The round-6 sf1 sweep is why: a double finalization was correctly
    rounded in Spark but NOT in DuckDB (decimal128->double diverges in
    the last ulp past 2^53 totals ≈ sf1's 2.8e16), so the hash oracle
    broke at exactly the magnitude the operator exists for; the string
    form is bit-stable at ANY magnitude in both engines. Remaining
    caveat (measured at sf100): Spark plans decimal sums without
    whole-stage codegen (~7x slower) — `agg_groupby_wide`'s hi/lo int64
    split is the fast path."""
    return (
        F.sum(col.cast(f"decimal(30,{scale})")).cast("string")
    )


@register(
    "agg_groupby_decimal",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_dec_sql('l_quantity', 2)} AS sum_qty,
           {_dsum_dec_sql('l_extendedprice', 2)} AS sum_base_price,
           {_dsum_dec_sql('l_extendedprice * (1 - l_discount)', 6)}
             AS sum_disc_price,
           {_dsum_dec_sql(
               'l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}
             AS sum_charge,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_decimal(t):
    """DECIMAL-path Q1 (teaching entry — at scale use `agg_groupby_wide`: 0.99x vs 6.6x at sf100).

    The beyond-int64 twin of `agg_groupby_basic`, for aggregates whose
    scaled totals exceed dsum's 2^63 headroom (the sf100 rehearsal
    measured Q1's scale-6 sums at 3.5e19 over 600M rows). Same single
    partial-combined scan shape; the accumulator is DECIMAL(30,s),
    exact and order-independent, emitted as the exact string
    serialization (see `dsum_dec` — the sf1 sweep caught DuckDB's
    int128->double finalization diverging past 2^53, so no double
    conversion exists on either side; hash-stable at any magnitude).
    KEPT REGISTERED as the documented illustration of WHY the decimal
    path is not the scale answer: Spark plans decimal sums with zero
    whole-stage codegen (measured 6.56x DuckDB at sf100) —
    `agg_groupby_wide`'s hi/lo int64 split (0.99x at 600M rows) is the
    REGISTERED ANSWER for over-int64 totals."""
    l = t.lineitem
    disc_price = l.l_extendedprice * (1 - l.l_discount)
    charge = disc_price * (1 + l.l_tax)
    return (
        l.filter(l.l_shipdate <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_dec(l.l_quantity, 2).alias("sum_qty"),
            dsum_dec(l.l_extendedprice, 2).alias("sum_base_price"),
            dsum_dec(disc_price, 6).alias("sum_disc_price"),
            dsum_dec(charge, 6).alias("sum_charge"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


_SPLIT = 1 << 20  # hi/lo split point for over-int64 totals


def _split_sums_sql(expr: str, scale: int, name: str) -> str:
    q = f"CAST(floor(({expr}) * {10**scale}.0 + 0.5) AS BIGINT)"
    return (
        f"CAST(SUM({q} // {_SPLIT}) AS BIGINT) AS {name}_hi, "
        f"CAST(SUM({q} % {_SPLIT}) AS BIGINT) AS {name}_lo"
    )


@register(
    "agg_groupby_wide",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           {_split_sums_sql('l_extendedprice * (1 - l_discount)', 6,
                            'disc')},
           {_split_sums_sql(
               'l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6,
               'charge')},
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_wide(t):
    """TPC-H Q1 with WIDE totals kept exact AND codegen-fast: the
    over-int64 scale-6 sums are carried as TWO int64 accumulators each
    (hi = q div 2^20, lo = q mod 2^20) and EMITTED as exact integer
    pairs (total = hi x 2^20 + lo, recombined by the consumer at
    whatever precision it owns).

    This is the third point in the wide-total design space, built from
    sf100 measurements: `dsum` (int64, fastest; Q1's scale-6 sums
    reach 2.8e18 at sf100 — a decade from the 2^63 cliff the IVF sums
    crossed); `dsum_dec` (DECIMAL, exact, but Spark plans it with ZERO
    whole-stage codegen — 6.6x DuckDB at sf100 — and DuckDB's
    int128->double conversion diverges from Spark's in the last ulp
    past 2^53, measured at sf100); THIS form (all-int64 codegen
    aggregation, no wide-int->double conversion anywhere, hash-exact at
    any scale; headroom: lo-sums cap at ~8.8e12 rows per group).
    """
    l = t.lineitem
    disc_price = l.l_extendedprice * (1 - l.l_discount)
    charge = disc_price * (1 + l.l_tax)

    def split(expr, scale, name):
        q = F.floor(expr * F.lit(float(10 ** scale)) + F.lit(0.5)).cast(
            "long"
        )
        return [
            F.sum(F.expr(f"q_{name} div {_SPLIT}")).cast("long")
            .alias(f"{name}_hi"),
            F.sum(F.col(f"q_{name}") % F.lit(_SPLIT)).cast("long")
            .alias(f"{name}_lo"),
        ], q.alias(f"q_{name}")

    disc_aggs, disc_q = split(disc_price, 6, "disc")
    charge_aggs, charge_q = split(charge, 6, "charge")
    base = l.filter(
        l.l_shipdate <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    ).select("l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", disc_q, charge_q)
    return base.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        *disc_aggs,
        *charge_aggs,
        F.count(F.lit(1)).cast("long").alias("count_order"),
    )


@register(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY day
    ),
    win AS (
      SELECT day, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS wsum,
             CAST(COUNT(*) OVER w AS BIGINT) AS wcnt,
             CAST(dayofweek(day) AS INT) AS dow
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    trended AS (
      SELECT day, dow,
             CAST(cents AS DOUBLE) / 100.0 AS total,
             CAST(wsum AS DOUBLE) / 700.0 AS trend,
             7 * cents - wsum AS det_num
      FROM win WHERE wcnt = 7
    ),
    seasonal AS (
      SELECT dow,
             CAST(SUM(det_num) AS DOUBLE)
               / (700.0 * COUNT(*)) AS seasonal
      FROM trended GROUP BY dow
    )
    SELECT t.day, t.total, t.trend, s.seasonal,
           t.total - t.trend - s.seasonal AS remainder
    FROM trended t JOIN seasonal s USING (dow)
    """,
)
def ts_seasonal_decompose(t):
    """Classical seasonal decomposition (STL-lite) of the daily total
    series: trend = centered 7-day moving average, seasonal = per-
    weekday mean of the detrended series, remainder = the rest. Kept
    hash-exact the fixed-point way: daily totals are cents, the
    detrended series is carried as the INTEGER ``7*cents - window_sum``
    (full 7-day windows only, so the denominator is constant), and
    every double is a single exact-int division — remainder is then a
    difference of three bit-identical doubles, identical in any engine.

    Scale notes: the raw scan collapses to day cardinality in one
    partial-combined aggregate; all window/seasonal math runs on that
    tiny frame (a global 7-row window over days is bounded by the
    calendar, not the data — the same argument as `window_time_spine`).
    """
    e = t.events
    daily = (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
            ).cast("long").alias("cents")
        )
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    win = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w).cast("long").alias("wsum"),
        F.count(F.lit(1)).over(w).cast("long").alias("wcnt"),
        F.dayofweek("day").cast("int").alias("dow"),
    )
    trended = win.filter(F.col("wcnt") == 7).select(
        "day",
        "dow",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("total"),
        (F.col("wsum").cast("double") / F.lit(700.0)).alias("trend"),
        (F.lit(7) * F.col("cents") - F.col("wsum")).alias("det_num"),
    )
    seasonal = trended.groupBy("dow").agg(
        (
            F.sum("det_num").cast("double")
            / (F.lit(700.0) * F.count(F.lit(1)))
        ).alias("seasonal")
    )
    return (
        trended.join(F.broadcast(seasonal), "dow")
        .select(
            "day",
            "total",
            "trend",
            "seasonal",
            (F.col("total") - F.col("trend") - F.col("seasonal"))
            .alias("remainder"),
        )
    )


@register(
    "window_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(t):
    """Positional window functions: first_value / last_value /
    nth_value over an explicit whole-partition frame — the functions
    behind "vs first session" / "vs latest reading" features. The
    UNBOUNDED FOLLOWING frame is spelled out because last_value's
    DEFAULT frame (ending at CURRENT ROW) returns the current row — the
    classic silent-wrong-answer; the explicit frame makes both engines
    agree and the query say what it means. Raw value passthrough (no
    arithmetic), deterministic (ts, event_id) order."""
    e = t.events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@register(
    "scalar_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' ||
               CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
      FROM documents
    )
    SELECT doc_id, url,
           string_split(string_split(url, '://')[2], '/')[1] AS host,
           '/' || array_to_string(
             string_split(string_split(string_split(url, '://')[2],
                                       '?')[1], '/')[2:], '/') AS path,
           string_split(url, '?')[2] AS query
    FROM u
    """,
)
def scalar_url_parse(t):
    """URL decomposition (host / path / query) — the first step of every
    web-corpus pipeline (domain filtering, dedup by canonical URL,
    robots scoping). Spark side uses the built-in `parse_url` (JVM
    java.net parsing); the oracle rebuilds the same parts with pure
    string splits over deterministically constructed URLs, proving the
    built-in agrees with the spec on well-formed inputs.

    Scale notes: map-only codegen; at corpus scale pair with
    `dedup_cross_source`-style fingerprints keyed on (host, path)."""
    d = t.documents
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(t):
    """ROLLUP with grouping_id: the bitmask that tells report consumers
    WHICH level each output row aggregates (0 = leaf, 1 = per-flag
    subtotal, 3 = grand total) — without it, rollup output rows with
    NULL keys are ambiguous against genuinely-NULL data. Spark's
    grouping_id() == the oracle's GROUPING-bit arithmetic by
    construction."""
    l = t.lineitem
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n")
    )


@register(
    "dedup_exact_normalized",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '[ \\t\\n]+', ' ', 'g'))))
               AS fp
      FROM documents WHERE text IS NOT NULL
    )
    SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM norm GROUP BY fp
    """,
)
def dedup_exact_normalized(t):
    """Exact dedup under TEXT NORMALIZATION (casefold + whitespace-run
    collapse + trim) — catches the near-trivial duplicates raw exact
    dedup misses (trailing spaces, tabs vs spaces, case drift), which
    in web corpora are the most common duplicate class. Survivor = min
    doc_id per normalized fingerprint; identical regex/casefold
    semantics in both engines (the dirty fixture pins the corners).

    Scale notes: one md5-key shuffle with map-side combine — the
    fingerprint (16 bytes) shuffles, never the text."""
    d = t.documents
    fp = F.md5(
        F.lower(F.trim(F.regexp_replace(F.col("text"), "[ \t\n]+", " ")))
    )
    return (
        d.filter(F.col("text").isNotNull())
        .select(fp.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").cast("long").alias("survivor_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


@register(
    "scalar_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT) AS b_and,
           CAST(l_orderkey | 4096 AS BIGINT) AS b_or,
           CAST(xor(l_orderkey, l_linenumber) AS BIGINT) AS b_xor,
           CAST(l_orderkey << 3 AS BIGINT) AS b_shl,
           CAST(l_orderkey >> 2 AS BIGINT) AS b_shr,
           CAST(bit_count(l_orderkey) AS INT) AS b_pop
    FROM lineitem
    """,
)
def scalar_bitwise(t):
    """Bitwise scalar family (&, |, xor, shifts, popcount) — the
    primitives behind the engine's Morton keys, SimHash bands and
    bucket masks, surfaced as a checkable family row. Pure codegen."""
    l = t.lineitem
    k = F.col("l_orderkey")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(4096)).alias("b_or"),
        k.bitwiseXOR(F.col("l_linenumber").cast("long")).alias("b_xor"),
        F.shiftleft(k, 3).alias("b_shl"),
        F.shiftright(k, 2).alias("b_shr"),
        F.bit_count(k).alias("b_pop"),
    )


@register(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_hour_cents
    FROM events
    """,
)
def window_time_range_frame(t):
    """Time-interval RANGE frame: per user, the trailing-1-hour rolling
    sum by EVENT TIME (peers at the same timestamp aggregate together —
    RANGE semantics, which no ROWS frame can express when timestamps
    tie or gap). The rolling-metrics shape of rate limiting and
    sliding-window features; fixed-point cents keep it exact.

    Scale notes: one shuffle on user_id, one ordered pass per
    partition — same profile as any window; the frame bound is
    event-time arithmetic, no self-join."""
    e = t.events
    # Spark's RANGE frames need a numeric ordering key: exact epoch
    # MICROS (lossless for the fixture's us-aligned events) with the
    # hour expressed in the same unit — peers/bounds identical to the
    # oracle's INTERVAL frame over the raw timestamp.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))  # NTZ->TS is a pure reinterpretation in the UTC session
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(cents).over(w).cast("long").alias("trailing_hour_cents"),
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id, c.ts,
           CASE WHEN p.ts >= c.ts - INTERVAL 1 DAY THEN p.ts END AS ts_asof,
           CASE WHEN p.ts >= c.ts - INTERVAL 1 DAY THEN p.value END
             AS value_asof
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def join_asof_tolerance(t):
    """As-of join with a STALENESS TOLERANCE (the feature-store
    variant): the latest purchase at-or-before each click counts only
    if it is at most 1 day old — older matches null out, exactly like a
    feature whose TTL expired. Same single-window union-tag plan as
    `join_asof` plus one codegen predicate; the oracle applies the
    identical tolerance over DuckDB's native ASOF."""
    e = t.events
    from stream_processor_spark.operators.asof import asof_join

    clicks = e.filter(e.event_type == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(e.event_type == "purchase").select(
        "user_id", F.col("ts").alias("pts"), "value"
    )
    joined = asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="pts",
        value_cols=["pts", "value"],
    )
    fresh = F.col("pts_asof") >= F.col("ts") - F.expr("INTERVAL 1 DAY")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("pts_asof")).alias("ts_asof"),
        F.when(fresh, F.col("value_asof")).alias("value_asof"),
    )


@register(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / (100.0 * SUM(CAST(l_quantity AS BIGINT))) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(t):
    """Quantity-weighted average price — Σ(w·x)/Σw with the numerator
    as exact int64 (cents x integer weight; headroom ~10^9 rows/group
    at these magnitudes), one division per group. The weighted-mean
    shape of every per-segment pricing / per-strata scoring report."""
    l = t.lineitem
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast(
        "long"
    )
    wq = F.col("l_quantity").cast("long")
    return l.groupBy("l_returnflag").agg(
        (
            F.sum(cents * wq).cast("double")
            / (F.lit(100.0) * F.sum(wq))
        ).alias("wavg_price")
    )


@register(
    "events_dau_wau",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                      user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM pairs)
    SELECT d.day,
           CAST((SELECT COUNT(*) FROM pairs p WHERE p.day = d.day)
                AS BIGINT) AS dau,
           CAST((SELECT COUNT(DISTINCT p.user_id) FROM pairs p
                 WHERE p.day > d.day - INTERVAL 7 DAY AND p.day <= d.day)
                AS BIGINT) AS wau
    FROM days d
    """,
)
def events_dau_wau(t):
    """DAU / WAU: daily actives and EXACT trailing-7-day distinct
    actives — the growth metrics every product pipeline reports. The
    corpus collapses to distinct (day, user) pairs first (one
    partial-combined shuffle; the raw scan never moves again); WAU then
    joins the bounded pair set to the day spine over the 7-day range
    (pairs x 7 rows — calendar-bounded, not data-bounded) and counts
    distinct per day. The oracle runs the correlated-subquery
    formulation, proving the range-join decorrelation.

    Scale notes: at 100 TB the pair set is |days| x |active users| —
    the standard DAU compaction; for exact WAU beyond memory, swap the
    final distinct for the HLL sketch variant (`profile_table_approx`
    contract)."""
    e = t.events
    pairs = (
        e.select(
            F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
        ).distinct()
    )
    days = pairs.select("day").distinct()
    dau = pairs.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    win = days.alias("d").join(
        pairs.alias("p"),
        (F.col("p.day") > F.col("d.day") - F.expr("INTERVAL 7 DAY"))
        & (F.col("p.day") <= F.col("d.day")),
    ).groupBy(F.col("d.day").alias("day")).agg(
        F.countDistinct("p.user_id").cast("long").alias("wau")
    )
    return dau.join(win, "day").select("day", "dau", "wau")
