"""Batch analogs of the streaming event-time surface (SURVEY.md §2.11).

Every Structured Streaming operator here also runs in batch mode on the
static ``events`` table — that is how the DuckDB oracle checks the
windowing math. The true streaming paths (watermarks, output modes, state)
are exercised in ``tests/test_streaming.py`` over a file-stream harness.

Spark window semantics being verified:
- ``window(ts, 1h)``: tumbling, epoch-aligned → ``date_trunc('hour')``.
- ``window(ts, 1h, 15m)``: each event belongs to 4 windows with starts
  ``bucket15(ts) - k*15min, k ∈ 0..3`` (epoch-aligned slide grid).
- ``session_window(ts, 30m)``: merge events whose gap < 30 min; session end
  = last ts + gap. Oracle reproduces via lag/cumsum island labeling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processor_spark.queries.base import register
from stream_processor_spark.queries.relational import dsum


@register(
    "stream_tumbling_batch_analog",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           COUNT(*) AS n_events,
           (CAST(CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
)
def stream_tumbling_batch_analog(t):
    """Tumbling 1-hour window aggregate (streaming: + watermark, same code)."""
    return (
        t.events.groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "stream_sliding_batch_analog",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes'
               AS window_start,
             value
      FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) AS k(k)
    )
    SELECT window_start,
           COUNT(*) AS n_events,
           (CAST(CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0) AS sum_value
    FROM assigned
    GROUP BY window_start
    """,
)
def stream_sliding_batch_analog(t):
    """Sliding 1h/15m window aggregate; each event lands in 4 windows."""
    return (
        t.events.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "stream_session_batch_analog",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    labeled AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM labeled
    GROUP BY user_id, session_id
    """,
)
def stream_session_batch_analog(t):
    """Session windows (30-min gap) per user via native session_window.

    The oracle reproduces Spark's merge rule with lag/cumsum islands — a
    real cross-engine check of gap semantics (gap ≥ 30 min ⇒ new session).
    """
    return (
        t.events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT user_id, event_type,
           MIN(event_id) AS event_id,
           COUNT(*) AS n_dupes
    FROM events
    GROUP BY user_id, event_type
    """,
)
def dedup_exact(t):
    """Exact dedup with deterministic survivor (min event_id per key).

    Streaming twin: ``dropDuplicates(['user_id','event_type'])`` within a
    watermark (state-bounded) — exercised in tests/test_streaming.py.
    """
    return t.events.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("event_id"),
        F.count(F.lit(1)).alias("n_dupes"),
    )
