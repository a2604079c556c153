"""Advanced relational surface: as-of join, pivot, deep star join.

Extensions beyond SURVEY.md §2.6-2.8's core rows, each with a DuckDB
oracle. The as-of join exercises ``operators/asof.py``'s union+window
formulation against DuckDB's native ``ASOF JOIN`` — a real cross-engine
semantics check of the at-or-before rule.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processor_spark.operators.asof import asof_join
from stream_processor_spark.queries.base import register
from stream_processor_spark.queries.relational import _dsum_sql, dsum


@register(
    "join_asof",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS ts_asof, p.value AS value_asof
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def join_asof(t):
    """As-of join: for each click, the user's latest purchase at-or-before.

    Spark side: union-tag + window carry-forward (operators/asof.py) — one
    shuffle, no nested loop. Oracle: DuckDB's native ASOF JOIN.
    """
    e = t.events
    clicks = e.filter(e.event_type == "click").select("event_id", "user_id", "ts")
    purchases = e.filter(e.event_type == "purchase").select(
        "user_id", F.col("ts").alias("pts"), "value"
    )
    return asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="pts",
        value_cols=["pts", "value"],
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("pts_asof").alias("ts_asof"),
        F.col("value_asof"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events
    GROUP BY user_id
    """,
)
def agg_pivot(t):
    """Pivot event counts per user (fixed value list → single-pass plan).

    Passing the value list to ``pivot`` avoids the extra distinct-values
    job — mandatory at scale.
    """
    return (
        t.events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "join_star_5way",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY r.r_name, n.n_name
    """,
)
def join_star_5way(t):
    """TPC-H Q5-shaped 5-way star: fact ⋈ 4 broadcast dims + filter + agg.

    Every dimension broadcasts → the only shuffle is the final tiny
    aggregation; the orderdate filter pushes into the orders scan.
    """
    l, o, c, n, r = t.lineitem, t.orders, t.customer, t.nation, t.region
    revenue = l.l_extendedprice * (1 - l.l_discount)
    return (
        l.join(
            F.broadcast(
                o.filter(o.o_orderdate >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            ),
            l.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(r.r_name.alias("region"), n.n_name.alias("nation"))
        .agg(
            dsum(revenue, 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
