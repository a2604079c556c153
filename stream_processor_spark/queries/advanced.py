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


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {_dsum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(t):
    """Explicit grouping sets (neither rollup nor cube): two parallel
    groupings in one pass via the Expand operator."""
    o = t.orders
    o.createOrReplaceTempView("__gs_orders")
    return o.sparkSession.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               (CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                     AS DOUBLE) / 100.0) AS sum_price
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_right_outer(t):
    """Right outer join (plans as the mirrored left outer)."""
    return t.orders.join(
        t.customer, t.orders.o_custkey == t.customer.c_custkey, "right"
    ).select("o_orderkey", "c_custkey", "c_name")


@register(
    "join_full_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c FULL JOIN orders o ON o.o_custkey = c.c_custkey
    """,
)
def join_full_outer(t):
    """Full outer join preserving both unmatched sides."""
    return t.customer.join(
        t.orders, t.orders.o_custkey == t.customer.c_custkey, "full"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "window_percentiles",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           round(CAST(ntile(10) OVER w AS INT) / 10.0, 1) AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_percentiles(t):
    """Distribution window functions: percent_rank, cume_dist, deciles."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return t.orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.round(F.ntile(10).over(w) / F.lit(10.0), 1).alias("decile"),
    )


@register(
    "scalar_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           md5(c_name || '/' || c_mktsegment) AS compound_md5
    FROM customer
    """,
)
def scalar_hash(t):
    """Hash family (md5 / sha-256) — engine-portable fingerprints."""
    c = t.customer
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.md5(F.concat_ws("/", "c_name", "c_mktsegment")).alias("compound_md5"),
    )


@register(
    "tpch_q6_shape",
    oracle=f"""
    SELECT {_dsum_sql('l_extendedprice * l_discount', 6)} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6_shape(t):
    """TPC-H Q6 shape: highly selective scan-aggregate, zero joins.

    The canonical pushdown test — every predicate reaches the parquet
    reader, aggregation is a single global partial+final.
    """
    l = t.lineitem
    return (
        l.filter(
            (l.l_shipdate >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (l.l_shipdate < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & l.l_discount.between(0.02, 0.06)
            & (l.l_quantity < 24)
        )
        .agg(
            dsum(l.l_extendedprice * l.l_discount, 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
