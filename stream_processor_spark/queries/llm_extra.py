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
        (F.col("doc_id") / F.lit(_RANGE)).cast("long").alias("bucket"),
    )
    local = sized.withColumn(
        "local_cum",
        F.sum("n_tokens").over(
            Window.partitionBy("bucket")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    offsets = (
        sized.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_total"))
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
            (
                (F.col("offset") + F.col("local_cum") - F.col("n_tokens"))
                / F.lit(_SHARD_TOKENS)
            ).cast("long").alias("shard_id"),
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
