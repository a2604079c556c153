"""Window functions, global sort, top-k, set operations (SURVEY.md §2.8).

Scale notes: window functions shuffle once on the partition key and sort
within partitions — the partition key (``o_custkey``/``user_id``) has high
cardinality so the shuffle is balanced. Running sums use exact fixed-point
int64 accumulation so frame-evaluation strategy (sequential vs
segment-tree) cannot change the result. Top-k compiles to TakeOrderedAndProject — each
partition keeps k rows, only k×partitions rows reach the driver-side merge,
never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stream_processor_spark.queries.base import register

# ------------------------------------------------------- window functions ----


@register(
    "window_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(row_number() OVER w AS INT) AS rn,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank(t):
    """Ranking family over a total order (tie-break on unique o_orderkey)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(t):
    """Analytic lag/lead/first over the per-user event timeline."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t.events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("ts").over(wf).alias("first_ts"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS DOUBLE) / 100.0 AS running_spend,
           CAST(CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS DOUBLE) / 100.0 / LEAST(CAST(row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS INT), 3) AS moving_avg3
    FROM orders
    """,
)
def window_running_sum(t):
    """Running sum + 3-row moving average per customer (frame aggregates).

    Exact fixed-point (int64 cents) accumulation → result independent of
    how the engine evaluates frames (sequential vs segment tree).
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.sum(cents).over(run).cast("double") / F.lit(100.0)).alias("running_spend"),
        (
            F.sum(cents).over(mov).cast("double") / F.lit(100.0)
            / F.least(F.row_number().over(w), F.lit(3))
        ).alias("moving_avg3"),
    )


# ---------------------------------------------------------- sort / top-k ----


@register(
    "sort_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def sort_orders(t):
    """Global sort (range-partitioned exchange + per-partition sort)."""
    return t.orders.select("o_orderkey", "o_totalprice", "o_orderdate").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk_orders(t):
    """Top-k: TakeOrderedAndProject, no global sort. Total order via tie-break."""
    return (
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------- set ops ----


@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS id, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_suppkey AS id, 'supplier' AS src FROM supplier
    """,
)
def set_union_all(t):
    """UNION ALL by name (no dedup, no shuffle)."""
    c = t.customer.select(F.col("c_custkey").alias("id"), F.lit("customer").alias("src"))
    s = t.supplier.select(F.col("s_suppkey").alias("id"), F.lit("supplier").alias("src"))
    return c.unionByName(s)


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey AS id FROM orders
    UNION
    SELECT c_custkey AS id FROM customer
    """,
)
def set_union_distinct(t):
    """UNION DISTINCT (hash-dedup after concat)."""
    a = t.orders.select(F.col("o_custkey").alias("id"))
    b = t.customer.select(F.col("c_custkey").alias("id"))
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS id FROM orders
    INTERSECT
    SELECT c_custkey AS id FROM customer
    """,
)
def set_intersect(t):
    """INTERSECT (distinct semantics, plans as left-semi after dedup)."""
    a = t.orders.select(F.col("o_custkey").alias("id"))
    b = t.customer.select(F.col("c_custkey").alias("id"))
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey AS id FROM customer
    EXCEPT ALL
    SELECT o_custkey AS id FROM orders
    """,
)
def set_except(t):
    """EXCEPT ALL (multiset difference, plans as left-anti with counting)."""
    a = t.customer.select(F.col("c_custkey").alias("id"))
    b = t.orders.select(F.col("o_custkey").alias("id"))
    return a.exceptAll(b)


@register(
    "window_rank_variants",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           nth_value(c_custkey, 3) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_best
    FROM customer
    WINDOW w AS (
      PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
    )
    """,
)
def window_rank_variants(t):
    """The remaining ANSI rank-family functions in one query:
    percent_rank ((rank−1)/(n−1)), cume_dist (peers-≤ / n), and
    nth_value over the full-partition frame — rounding out §2.8 beyond
    rank/dense_rank/ntile. Both engines define the two ratios
    identically and the ordering is total (acctbal desc, custkey), so
    the doubles are the same exact divisions on both sides.

    Scale: one hash-partitioned sort per segment — the canonical window
    shuffle; nothing beyond the standard exchange.
    """
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t.customer.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("c_custkey", 3).over(w_full).alias("third_best"),
    )
