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
    "join_asof_forward",
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
      ON c.user_id = p.user_id AND p.ts >= c.ts
    """,
)
def join_asof_forward(t):
    """Forward as-of join: for each click, the user's EARLIEST purchase
    at-or-after — the attribution-window direction. Same union-tag +
    single window pass as the backward form, over descending time
    (operators/asof.py, direction="forward"); oracle is DuckDB's native
    forward ASOF (p.ts >= c.ts)."""
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
        direction="forward",
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
    """Q5-shaped 5-way star, shuffle-era (at scale use `join_star_5way_bucketed`: 1.4s vs 4.8s at sf10).

    fact ⋈ orders ⋈ 3 broadcast dims. Dimension hints only on the true
    dims (customer/nation/region); the lineitem⋈orders edge is
    fact-fact at real scale — its strategy is left to Catalyst/AQE
    (broadcast locally under the threshold, sort-merge with skew
    splitting at 100 TB). The orderdate filter pushes into the orders
    scan either way. That fact-fact Exchange is the measured scale cost
    (sf10: 5.0x DuckDB); the write-time answer is the same bucketed
    layout `join_star_3way_bucketed`/`join_bucketed` demonstrate —
    co-bucket lineitem and orders on orderkey and the Exchange
    disappears while the dims still broadcast.
    """
    l, o, c, n, r = t.lineitem, t.orders, t.customer, t.nation, t.region
    revenue = l.l_extendedprice * (1 - l.l_discount)
    return (
        l.join(
            o.filter(o.o_orderdate >= F.lit("1996-01-01 00:00:00").cast("timestamp")),
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
    "join_star_5way_bucketed",
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
def join_star_5way_bucketed(t):
    """`join_star_5way` on the write-time-bucketed layout — the
    registered scale answer its shuffle-era twin points at (round 6):
    the lineitem⋈orders fact edge reads both sides bucketed+sorted on
    orderkey (merge hint ⇒ zero Exchange, zero sort), the three true
    dims broadcast as before, and the orderdate filter still pushes
    into the bucketed orders scan. Same oracle as the portable plan —
    the layout must not change the answer."""
    from stream_processor_spark.operators.storage import bucketed_pair

    li, o = bucketed_pair(t._spark, t._dir)
    c, n, r = t.customer, t.nation, t.region
    revenue = li.l_extendedprice * (1 - li.l_discount)
    return (
        li.join(
            o.filter(
                o.o_orderdate
                >= F.lit("1996-01-01 00:00:00").cast("timestamp")
            ).hint("merge"),
            li.l_orderkey == o.o_orderkey,
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


@register(
    "join_lateral",
    oracle="""
    SELECT c.c_custkey, o.top_orderkey, o.top_price
    FROM customer c, LATERAL (
      SELECT o_orderkey AS top_orderkey, o_totalprice AS top_price
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 1
    ) o
    """,
)
def join_lateral(t):
    """Lateral (correlated) subquery: top-1 order per customer.

    Catalyst decorrelates to a ranked window join — same plan you'd write
    by hand with row_number, but expressed as the user would in SQL.
    """
    o = t.orders
    c = t.customer
    c.createOrReplaceTempView("__lat_customer")
    o.createOrReplaceTempView("__lat_orders")
    return c.sparkSession.sql(
        """
        SELECT c.c_custkey, o.top_orderkey, o.top_price
        FROM __lat_customer c, LATERAL (
          SELECT o_orderkey AS top_orderkey, o_totalprice AS top_price
          FROM __lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 1
        ) o
        """
    )


@register(
    "filter_null_safe_eq",
    oracle="""
    WITH x AS (
      SELECT event_id, nullif(event_type, 'error') AS et FROM events
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b
    FROM x a JOIN x b
      ON a.et IS NOT DISTINCT FROM b.et AND a.event_id + 1 = b.event_id
    """,
)
def filter_null_safe_eq(t):
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) in a join: adjacent
    events with the same (possibly NULL) type — NULL matches NULL."""
    x = t.events.select(
        "event_id", F.nullif(F.col("event_type"), F.lit("error")).alias("et")
    )
    a = x.select(F.col("event_id").alias("id_a"), F.col("et").alias("et_a"))
    b = x.select(F.col("event_id").alias("id_b"), F.col("et").alias("et_b"))
    return a.join(
        b, a.et_a.eqNullSafe(b.et_b) & (a.id_a + 1 == b.id_b)
    ).select("id_a", "id_b")


@register(
    "scalar_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0)) AS INT)
             AS n_pos,
           CASE WHEN len(list_filter(embedding,
                  x -> abs(CAST(x AS DOUBLE)) >= 1.0)) = 0
                THEN 1 ELSE 0 END AS all_lt_one,
           CASE WHEN len(list_filter(embedding,
                  x -> CAST(x AS DOUBLE) > 0.3)) > 0
                THEN 1 ELSE 0 END AS any_gt_03
    FROM embeddings
    """,
)
def scalar_array_hof(t):
    """Array higher-order functions: filter / forall / exists — all
    JVM-side lambdas, no explode, no shuffle."""
    e = F.col("embedding")
    as_d = lambda x: x.cast("double")  # noqa: E731
    return t.embeddings.select(
        "vec_id",
        F.size(F.filter(e, lambda x: as_d(x) > 0)).alias("n_pos"),
        F.when(F.forall(e, lambda x: F.abs(as_d(x)) < 1.0), 1).otherwise(0).alias(
            "all_lt_one"
        ),
        F.when(F.exists(e, lambda x: as_d(x) > 0.3), 1).otherwise(0).alias(
            "any_gt_03"
        ),
    )


@register(
    "timeseries_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT user_id,
             date_trunc('day', MIN(ts)) AS d0,
             date_trunc('day', MAX(ts)) AS d1
      FROM events GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
      FROM bounds
    ),
    actual AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT g.user_id, g.day, COALESCE(a.n, 0) AS n_events
    FROM grid g LEFT JOIN actual a
      ON g.user_id = a.user_id AND g.day = a.day
    """,
)
def timeseries_gapfill(t):
    """Gap-filled daily series per user: sequence + explode builds the
    dense grid, left join fills zeros — the resample/gap-fill shape for
    training-data time features. Grid generation is per-key expression
    work (no cross join against a calendar table)."""
    e = t.events
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    actual = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        grid.join(actual, ["user_id", "day"], "left")
        .select("user_id", "day", F.coalesce(F.col("n"), F.lit(0)).alias("n_events"))
    )


@register(
    "timeseries_interpolate",
    oracle=f"""
    WITH bounds AS (
      SELECT user_id, date_trunc('day', MIN(ts)) AS d0,
             date_trunc('day', MAX(ts)) AS d1
      FROM events GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM bounds
    ),
    daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             {_dsum_sql('value')} / COUNT(*) AS dv
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    g AS (
      SELECT gr.user_id, gr.day, d.dv
      FROM grid gr LEFT JOIN daily d ON d.user_id = gr.user_id AND d.day = gr.day
    ),
    fb AS (
      SELECT user_id, day, dv,
        last_value(dv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN dv IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(dv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN dv IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM g
    )
    SELECT user_id, day,
           CASE WHEN dv IS NOT NULL THEN dv
                ELSE pv + (nv - pv)
                     * (CAST(date_diff('day', pd, day) AS DOUBLE)
                        / CAST(date_diff('day', pd, nd) AS DOUBLE)) END
             AS value_interp,
           dv IS NOT NULL AS observed
    FROM fb
    """,
)
def timeseries_interpolate(t):
    """Linear interpolation over a resampled daily series — the feature-
    engineering companion to `timeseries_gapfill` (which zero-fills
    counts): per user, days with events carry their exact fixed-point
    mean value; interior gap days get the straight line between the
    surrounding anchors. The per-user grid is bounded by that user's own
    first/last event day, so every gap has both anchors by construction
    (no edge extrapolation case).

    Determinism: anchor means come from scaled-int sums (one double
    division); the interpolation is ``pv + (nv - pv) * (gap_pos /
    gap_len)`` with integer day distances — identical IEEE op order in
    both engines, so the result value-hashes. Spark shape: one grid
    explode (expression-side sequence, no calendar cross join), one
    (user, day) aggregate shuffle, two IGNORE NULLS window passes over
    the SAME user partitioning (AQE reuses the exchange).
    """
    from pyspark.sql.window import Window

    e = t.events
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg((dsum(F.col("value")) / F.count(F.lit(1))).alias("dv"))
    g = grid.join(daily, ["user_id", "day"], "left")
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    anchor_day = F.when(F.col("dv").isNotNull(), F.col("day"))
    pv = F.last("dv", ignorenulls=True).over(w_back)
    pd_ = F.last(anchor_day, ignorenulls=True).over(w_back)
    nv = F.first("dv", ignorenulls=True).over(w_fwd)
    nd = F.first(anchor_day, ignorenulls=True).over(w_fwd)
    frac = F.datediff(F.col("day"), pd_).cast("double") / F.datediff(
        nd, pd_
    ).cast("double")
    interp = F.when(F.col("dv").isNotNull(), F.col("dv")).otherwise(
        pv + (nv - pv) * frac
    )
    return g.select(
        "user_id",
        "day",
        interp.alias("value_interp"),
        F.col("dv").isNotNull().alias("observed"),
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           true AS p50_ok,
           true AS p95_ok
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_approx_percentile(t):
    """Approximate percentiles (KLL-style sketch) — the 100 TB quantile
    path: constant-space mergeable sketches instead of a global sort.

    Estimates are engine-specific, so the oracle contract is banded:
    Spark brackets each sketch estimate between exact percentiles at
    ±5% rank (deterministic for fixed data) and emits the booleans; the
    oracle emits ``true`` plus the exact group counts as the anchor.
    """

    def ok(p: float, acc: int) -> "F.Column":
        approx = F.percentile_approx("o_totalprice", p, acc)
        lo = F.percentile("o_totalprice", max(p - 0.05, 0.0))
        hi = F.percentile("o_totalprice", min(p + 0.05, 1.0))
        return (approx >= lo) & (approx <= hi)

    return t.orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        ok(0.5, 1000).alias("p50_ok"),
        ok(0.95, 1000).alias("p95_ok"),
    )


@register(
    "tpch_q3_shape",
    oracle=f"""
    SELECT l.l_orderkey,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shape(t):
    """TPC-H Q3 shape: segment filter → star join → grouped revenue →
    top-10. Selective dim filter broadcasts; top-k avoids a global sort."""
    l, o, c = t.lineitem, t.orders, t.customer
    revenue = l.l_extendedprice * (1 - l.l_discount)
    return (
        c.filter(c.c_mktsegment == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(o.o_orderdate < F.lit("1998-03-15 00:00:00").cast("timestamp"))
        .join(l, l.l_orderkey == o.o_orderkey)
        .filter(l.l_shipdate > F.lit("1995-03-15 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, 6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q10_shape",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_shape(t):
    """TPC-H Q10 shape: returned-item revenue by customer, top-20."""
    l, o, c, n = t.lineitem, t.orders, t.customer, t.nation
    revenue = l.l_extendedprice * (1 - l.l_discount)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (o.o_orderdate >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (o.o_orderdate < F.lit("1996-07-01 00:00:00").cast("timestamp"))
        )
        .join(l, l.l_orderkey == o.o_orderkey)
        .filter(l.l_returnflag == "R")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, 6).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "reshape_unpivot",
    oracle="""
    WITH wide AS (
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             COUNT(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY user_id
    )
    SELECT user_id, kind, n
    FROM wide
    UNPIVOT (n FOR kind IN (click, view))
    """,
)
def reshape_unpivot(t):
    """Unpivot/melt: wide per-user counts back to long form (the inverse
    of agg_pivot). Expression-level Expand — no shuffle beyond the agg."""
    wide = (
        t.events.groupBy("user_id")
        .pivot("event_type", ["click", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return wide.unpivot(
        ids=["user_id"], values=["click", "view"], variableColumnName="kind",
        valueColumnName="n",
    )


@register(
    "tpch_q12_shape",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS fulfilled,
           COUNT(*) FILTER (WHERE o_orderstatus <> 'F') AS pending
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def tpch_q12_shape(t):
    """TPC-H Q12 shape: conditional counting per category (CASE-in-agg)."""
    o = t.orders
    return (
        o.filter(o.o_orderdate >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(o.o_orderstatus == "F", 1)).alias("fulfilled"),
            F.count(F.when(o.o_orderstatus != "F", 1)).alias("pending"),
        )
    )


@register(
    "tpch_q14_shape",
    oracle=f"""
    SELECT
      100.0 * {_dsum_sql("CASE WHEN p.p_type = 'ECONOMY' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END", 6)}
            / {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS economy_revenue_pct,
      COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def tpch_q14_shape(t):
    """TPC-H Q14 shape: conditional revenue share (promo%) over a month."""
    l, p = t.lineitem, t.part
    rev = l.l_extendedprice * (1 - l.l_discount)
    economy = F.when(p.p_type == "ECONOMY", rev).otherwise(F.lit(0.0))
    return (
        l.filter(
            (l.l_shipdate >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (l.l_shipdate < F.lit("1996-02-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * dsum(economy, 6) / dsum(rev, 6)).alias(
                "economy_revenue_pct"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "tpch_q18_shape",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING {_dsum_sql('l_quantity')} > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           {_dsum_sql('l.l_quantity')} AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def tpch_q18_shape(t):
    """TPC-H Q18 shape (large-volume customer): HAVING-filtered aggregate
    feeding a semi-restricted multi-way join, re-aggregated.

    Scale notes: the `big` order-key set is aggregated BEFORE joining
    (shuffle carries order-level partials, not line items), then drives a
    key-restricted join; the customer dim is broadcast."""
    l, o, c = t.lineitem, t.orders, t.customer
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(l.l_quantity).alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    li = l.select(
        F.col("l_orderkey").alias("li_orderkey"), F.col("l_quantity").alias("li_qty")
    )
    return (
        o.join(big, o.o_orderkey == F.col("big_orderkey"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, F.col("li_orderkey") == o.o_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(dsum(F.col("li_qty")).alias("total_qty"))
    )


@register(
    "tpch_q5_shape",
    oracle=f"""
    SELECT n.n_name,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def tpch_q5_shape(t):
    """TPC-H Q5 shape (local supplier volume): 6-table star-plus-snowflake
    join with the customer-and-supplier-in-same-nation equi-constraint,
    revenue per nation, sorted.

    Reference parity: composite of the reference's per-record pipeline
    primitives over the TPC-H-ish fixture (no single reference query —
    coverage target from SURVEY §2.6/§2.7 composite shapes).

    Scale notes: supplier/nation/region are TRUE dimensions → explicit
    broadcasts, so the 100 TB fact flow (lineitem⋈orders) shuffles only
    on the fact-fact key and the same-nation filter rides the broadcast
    hash join; the final per-nation aggregate is 25 groups — partial
    aggregation collapses it map-side."""
    l, o, c = t.lineitem, t.orders, t.customer
    s, n, r = t.supplier, t.nation, t.region
    revenue = l.l_extendedprice * (1 - l.l_discount)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (o.o_orderdate >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (o.o_orderdate < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              n.n_regionkey == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(revenue, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "tpch_q7_shape",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY sn.n_name, cn.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_shape(t):
    """TPC-H Q7 shape (volume shipping): nation-pair trade flow with a
    symmetric OR over two dimension aliases of the SAME table, grouped by
    shipment year.

    Scale notes: nation joins twice under different aliases — both
    broadcast, so the OR pair-predicate is evaluated map-side after two
    broadcast probes; no fact shuffle beyond lineitem⋈orders. Group
    cardinality (2 pairs × years) is tiny → map-side partial collapse."""
    l, o, c, s = t.lineitem, t.orders, t.customer, t.supplier
    sn = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = l.l_extendedprice * (1 - l.l_discount)
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.filter(
            (l.l_shipdate >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (l.l_shipdate < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .filter(pair)
        .withColumn("l_year", F.year(l.l_shipdate).cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(revenue, 6).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q19_shape",
    oracle=f"""
    SELECT {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def tpch_q19_shape(t):
    """TPC-H Q19 shape (discounted revenue): disjunction of three brand ×
    size × quantity predicate blocks spanning BOTH join sides.

    Scale notes: the part-side conjuncts cannot be pushed below the join
    as a whole (the OR spans tables), but Catalyst derives the
    per-table implied filters (brand IN (...), size ranges, quantity
    envelope) and pushes THOSE into both scans; part broadcasts, so the
    residual OR evaluates map-side with zero fact shuffle."""
    l, p = t.lineitem, t.part
    revenue = l.l_extendedprice * (1 - l.l_discount)
    block = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (p.p_brand == brand)
        & p.p_size.between(s_lo, s_hi)
        & (l.l_quantity >= q_lo)
        & (l.l_quantity <= q_hi)
    )
    cond = (
        block("Brand#1", 1, 15, 1, 20)
        | block("Brand#7", 10, 30, 10, 30)
        | block("Brand#13", 20, 50, 20, 40)
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .filter(cond)
        .agg(
            dsum(revenue, 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "window_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def window_sessionize(t):
    """Batch sessionization via window functions: a gap > 30 min starts a
    new session (lag + running sum of session markers), then per-session
    rollup — the classic log-sessionize pattern, complementing the
    streaming `session_window` analog.

    Scale: one shuffle on user_id serves both window passes and the final
    aggregation (same partitioning reused across stages).

    The gap test is pure timestamp-difference vs an interval literal —
    wall-clock semantics that hold for TIMESTAMP and TIMESTAMP_NTZ alike
    (no epoch cast, so no session-timezone/DST dependence) and match the
    DuckDB oracle's `ts - lag(ts) > INTERVAL 30 MINUTE` exactly. Both
    window passes tie-break on event_id so equal-timestamp rows order
    deterministically in both engines."""
    from pyspark.sql.window import Window

    e = t.events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull() | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = e.select(
        "user_id", "ts", "event_id", new_session.alias("new_session")
    ).withColumn("session_id", F.sum("new_session").over(run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "agg_mode",
    oracle="""
    SELECT event_type, user_id AS top_user, n
    FROM (
      SELECT event_type, user_id, COUNT(*) AS n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY COUNT(*) DESC, user_id) AS rn
      FROM events GROUP BY event_type, user_id
    ) WHERE rn = 1
    """,
)
def agg_mode(t):
    """Deterministic per-group mode (most frequent value, ties to the
    smallest): count + ranked pick. Built-in `mode()` has unspecified tie
    order in both engines, so the deterministic argmax pattern is the
    oracle-checkable form — and the one a pipeline should use anyway.

    Scale: counting aggregates first (map-side combine), then a per-group
    top-1 window over the already-aggregated (group × value) frame."""
    from pyspark.sql.window import Window

    counts = t.events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("user_id"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("user_id").alias("top_user"), "n")
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(COUNT(*) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING
           ) AS BIGINT) AS n_similar_price,
           nth_value(o_orderkey, 2) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS second_cheapest_key
    FROM orders
    """,
)
def window_range_frame(t):
    """RANGE frame (value-based window: ±5000 of current price) and
    nth_value — the frame kinds not covered by the rowsBetween queries."""
    from pyspark.sql import Window

    wr = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-5000, 5000)
    )
    wn = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(wr).alias("n_similar_price"),
        F.nth_value("o_orderkey", 2).over(wn).alias("second_cheapest_key"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT o_custkey,
           array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_collect_sorted(t):
    """Deterministic list aggregation: collect_list is order-nondeterministic
    under parallelism, so ALWAYS sort_array before exposing — emitted as a
    joined string for cross-engine comparison."""
    return t.orders.groupBy("o_custkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("o_orderkey"))).alias(
            "order_keys"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_stats_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sx,
             CAST(CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sy,
             CAST(CAST(SUM(CAST(floor(l_quantity * l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sxy,
             CAST(CAST(SUM(CAST(floor(l_quantity * l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sxx,
             CAST(CAST(SUM(CAST(floor(l_extendedprice * l_extendedprice * 0.01 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) * 100.0 AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
           round((n * sxy - sx * sy) / n / n, 4) AS covar_pop,
           round(sqrt((n * sxx - sx * sx) / n / n), 6) AS stddev_pop_qty
    FROM m
    """,
)
def agg_stats_moments(t):
    """Deterministic statistics via explicit fixed-point moment sums.

    Built-in corr/stddev use order-dependent merge formulas (results vary
    across partitionings and engines); computing the raw moments with
    exact int64 sums and applying the closed-form formulas afterwards
    gives bit-stable correlation / covariance / stddev at any scale.
    (syy is scaled down 100x before rounding: price^2 ~ 2.5e11 keeps int64
    headroom at large SFs.)
    """
    l = t.lineitem

    def fsum(col, factor):
        return F.sum(F.floor(col * F.lit(factor) + F.lit(0.5))).cast("double") / F.lit(
            factor
        )

    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        fsum(l.l_quantity, 100.0).alias("sx"),
        fsum(l.l_extendedprice, 100.0).alias("sy"),
        fsum(l.l_quantity * l.l_extendedprice, 100.0).alias("sxy"),
        fsum(l.l_quantity * l.l_quantity, 100.0).alias("sxx"),
        (
            F.sum(
                F.floor(l.l_extendedprice * l.l_extendedprice * F.lit(0.01) + F.lit(0.5))
            ).cast("double")
            * F.lit(100.0)
        ).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "l_returnflag",
        "n",
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
        F.round((n * sxy - sx * sy) / n / n, 4).alias("covar_pop"),
        F.round(F.sqrt((n * sxx - sx * sx) / n / n), 6).alias("stddev_pop_qty"),
    )


@register(
    "tpch_q8_shape",
    oracle=f"""
    WITH flow AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           {_dsum_sql("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0.0 END", 6)}
             / {_dsum_sql('volume', 6)} AS mkt_share
    FROM flow GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_shape(t):
    """TPC-H Q8 shape (national market share): 8-table snowflake — nation
    joined TWICE under different roles (customer side restricts the
    market region, supplier side feeds the share numerator) — with a
    conditional-share aggregate per order year.

    Scale notes: part/customer/nation/region/supplier are all true
    dimensions → broadcast; the only fact shuffle is lineitem⋈orders.
    The share is a ratio of two fixed-point sums computed in ONE
    aggregate pass (conditional numerator), not two scans."""
    l, o, c, s, p = t.lineitem, t.orders, t.customer, t.supplier, t.part
    cn = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = t.region
    volume = l.l_extendedprice * (1 - l.l_discount)
    share_num = F.when(F.col("supp_nation") == "NATION_2", volume).otherwise(
        F.lit(0.0)
    )
    return (
        l.join(F.broadcast(p.filter(p.p_type == "ECONOMY")), p.p_partkey == l.l_partkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("cn_region"),
        )
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .withColumn("o_year", F.year(o.o_orderdate).cast("long"))
        .groupBy("o_year")
        .agg((dsum(share_num, 6) / dsum(volume, 6)).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "tpch_q17_shape",
    oracle=f"""
    WITH avg_qty AS (
      SELECT l_partkey,
             {_dsum_sql('l_quantity')} / COUNT(*) AS aq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {_dsum_sql('l.l_extendedprice')} / 7.0 AS avg_yearly,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.2 * a.aq
    """,
)
def tpch_q17_shape(t):
    """TPC-H Q17 shape (small-quantity-order revenue): the classic
    correlated scalar subquery — each lineitem compared against the
    average quantity OF ITS OWN PART — decorrelated into a per-part
    aggregate joined back to the fact.

    Scale notes: the per-part average aggregates map-side then shuffles
    group partials only; the join back to lineitem is on the SAME key
    (l_partkey), so AQE co-partitions the two sides; part is broadcast.
    The 0.2·avg comparison uses the exact fixed-point average, identical
    in both engines (ratio of exact int sum and count)."""
    l, p = t.lineitem, t.part
    avg_qty = (
        l.groupBy(F.col("l_partkey").alias("ap_key"))
        .agg((dsum(l.l_quantity) / F.count(F.lit(1))).alias("aq"))
    )
    return (
        l.join(F.broadcast(p.filter(p.p_brand == "Brand#1")), p.p_partkey == l.l_partkey)
        .join(avg_qty, F.col("ap_key") == l.l_partkey)
        .filter(l.l_quantity < F.lit(0.2) * F.col("aq"))
        .agg(
            (dsum(l.l_extendedprice) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "tpch_q4_shape",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4_shape(t):
    """TPC-H Q4 shape (order-priority checking): EXISTS decorrelated to a
    LEFT SEMI join from the filtered order slice to the qualifying
    lineitem set, then a priority count. (Predicate adapted to the
    fixture's columns: quantity > 45 stands in for the
    commit-vs-receipt-date lateness test, same shape.)

    Scale notes: the date filter pushes into the orders scan; the semi
    join shuffles only matching keys and stops at the first match per
    order (no fan-out row multiplication); the count aggregate is
    5 groups — map-side collapse."""
    l, o = t.lineitem, t.orders
    return (
        o.filter(
            (o.o_orderdate >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (o.o_orderdate < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .join(
            l.filter(l.l_quantity > 45).select("l_orderkey"),
            o.o_orderkey == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q13_shape",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'F'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_shape(t):
    """TPC-H Q13 shape (customer distribution): left join with a
    JOIN-CONDITION filter on the right side (customers keep their row
    even when every order is filtered away — a WHERE would drop them),
    per-customer order counts, then the distribution of those counts.

    Scale notes: the join shuffles on custkey; the first aggregate's
    groups are customer-cardinality (partial combine), the second's are
    the handful of distinct counts — collapses map-side. COUNT(o_orderkey)
    counts non-NULL right rows, so no-order customers land in bucket 0
    identically in both engines."""
    c, o = t.customer, t.orders
    per_cust = (
        c.join(
            o.filter(o.o_orderstatus != "F"),
            o.o_custkey == c.c_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "window_rolling_median",
    oracle="""
    SELECT event_id, user_id, ts,
           round(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS roll_median
    FROM events
    """,
)
def window_rolling_median(t):
    """Rolling median of `value` over each user's trailing 5 events —
    the robust smoother dashboards and anomaly baselines use where a
    rolling mean would chase every spike. Spark has no built-in
    windowed median, so the frame's values are collected and sorted
    per row (bounded: the frame is 5 rows) and the median read out with
    DuckDB `median`'s exact semantics: NULLs ignored, odd count → the
    middle element, even count → lower + 0.5·(upper − lower)
    (quantile_cont interpolation order, mirrored operation-for-
    operation so the doubles agree bit-for-bit before the 6 dp output
    rounding).

    Scale: one window pass, state bounded by the 5-row frame — no
    per-user full-history buffering."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.array_sort(F.collect_list(F.col("value")).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (n / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int")))
        .otherwise(lo + (hi - lo) * 0.5)
    )
    return t.events.select(
        "event_id",
        "user_id",
        "ts",
        F.round(med, 6).alias("roll_median"),
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    b AS (
      SELECT c.event_id, c.user_id, c.ts, p.ts AS bts, p.value AS bval
      FROM clicks c ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND p.ts <= c.ts
    ),
    f AS (
      SELECT c.event_id, p.ts AS fts, p.value AS fval
      FROM clicks c ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND p.ts >= c.ts
    )
    SELECT b.event_id, b.user_id, b.ts,
           CASE WHEN f.fts IS NULL
                  OR (b.bts IS NOT NULL
                      AND epoch_us(b.ts) - epoch_us(b.bts)
                          <= epoch_us(f.fts) - epoch_us(b.ts))
                THEN b.bts ELSE f.fts END AS ts_nearest,
           CASE WHEN f.fts IS NULL
                  OR (b.bts IS NOT NULL
                      AND epoch_us(b.ts) - epoch_us(b.bts)
                          <= epoch_us(f.fts) - epoch_us(b.ts))
                THEN b.bval ELSE f.fval END AS value_nearest
    FROM b JOIN f USING (event_id)
    """,
)
def join_asof_nearest(t):
    """Nearest-event as-of join: for each click, the user's purchase
    with the SMALLEST time distance in either direction (ties prefer
    the backward match — the sensor-fusion / feature-alignment
    variant; pandas `merge_asof(direction='nearest')`). Composed from
    the engine's two directional as-of passes (operators/asof.py — one
    union-tag window shuffle each) joined on the click id, then an
    integer microsecond-distance pick; the oracle mirrors with two
    native ASOF joins and the same epoch_us arithmetic.

    Scale: two key-partitioned window passes + one click-keyed join of
    two already-slim result sets; no range explosion anywhere."""
    e = t.events
    clicks = e.filter(e.event_type == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(e.event_type == "purchase").select(
        "user_id", F.col("ts").alias("pts"), "value"
    )
    b = asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="pts",
        value_cols=["pts", "value"],
    ).select(
        "event_id", "user_id", "ts",
        F.col("pts_asof").alias("bts"), F.col("value_asof").alias("bval"),
    )
    f = asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="pts",
        value_cols=["pts", "value"], direction="forward",
    ).select(
        "event_id",
        F.col("pts_asof").alias("fts"), F.col("value_asof").alias("fval"),
    )
    j = b.join(f, "event_id")
    # events.ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the cast
    # is a deterministic relabel under the engine's pinned UTC session
    def _us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    pick_back = F.col("fts").isNull() | (
        F.col("bts").isNotNull()
        & (_us("ts") - _us("bts") <= _us("fts") - _us("ts"))
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_back, F.col("bts")).otherwise(F.col("fts")).alias(
            "ts_nearest"
        ),
        F.when(pick_back, F.col("bval")).otherwise(F.col("fval")).alias(
            "value_nearest"
        ),
    )


@register(
    "window_hampel_outliers",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CASE WHEN value IS NULL THEN NULL
                ELSE abs(value - median(value) OVER w)
                     > 3.0 * 1.4826 * (mad(value) OVER w) END AS is_outlier
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def window_hampel_outliers(t):
    """Hampel filter over each user's trailing 5 events: flag a value
    whose deviation from the rolling median exceeds 3·1.4826·MAD — the
    robust outlier detector that, unlike z-scores, a single previous
    spike cannot blind (both the center and the spread are medians).

    Spark has neither windowed median nor MAD, so both derive from the
    sorted 5-value frame array in two projections (the array and its
    median materialize FIRST; the deviations transform then references
    materialized columns — a higher-order lambda re-evaluates any
    inlined expression per element). Median/MAD interpolation mirrors
    DuckDB's quantile_cont order (lower + 0.5·(upper − lower)) so the
    doubles agree bit-for-bit at the comparison boundary.

    Scale: one window pass, 5-row bounded state, map-only afterwards."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )

    def med_of(a):
        n = F.size(a)
        lo = F.element_at(a, (n / 2).cast("int"))
        hi = F.element_at(a, (n / 2 + 1).cast("int"))
        return (
            F.when(n == 0, F.lit(None).cast("double"))
            .when(n % 2 == 1, F.element_at(a, ((n + 1) / 2).cast("int")))
            .otherwise(lo + (hi - lo) * 0.5)
        )

    staged = t.events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.array_sort(F.collect_list(F.col("value")).over(w)).alias("__fr"),
    ).withColumn("__med", med_of(F.col("__fr")))
    staged = staged.withColumn(
        "__mad",
        med_of(
            F.array_sort(
                F.transform(
                    F.col("__fr"), lambda x: F.abs(x - F.col("__med"))
                )
            )
        ),
    )
    return staged.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(F.col("value").isNull(), F.lit(None).cast("boolean"))
        .otherwise(
            F.abs(F.col("value") - F.col("__med"))
            > 3.0 * 1.4826 * F.col("__mad")
        )
        .alias("is_outlier"),
    )
