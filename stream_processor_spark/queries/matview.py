"""Incremental materialized-view query (delta-state IVM, round 7c).

`agg_incremental_mv` computes a groupBy aggregate by FOLDING PARTIAL
STATES over three disjoint slices of the fact table — exactly the
computation `operators/aggmv.py`'s persisted MV performs across
appends — and the oracle is the from-scratch SQL aggregate. The hash
match is therefore a proof of the maintenance algebra itself: states
are monoids, so any batch decomposition folds to the single-scan
answer bit-for-bit (AVG included, via the exact integer
``sum_scaled div n``). The persisted/streaming/compaction surfaces of
the same operator are pinned in tests/test_aggmv.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processor_spark.operators import aggmv
from stream_processor_spark.queries.base import register
from stream_processor_spark.queries.relational import _dsum_sql


@register(
    "agg_incremental_mv",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_price,
           CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) // COUNT(*) AS avg_qty_c,
           MIN(l_shipdate) AS mn_ship,
           MAX(l_shipdate) AS mx_ship
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_incremental_mv(t):
    """Materialized-aggregate maintenance fold (operators/aggmv.py).

    The fact table arrives as three disjoint batches (l_orderkey mod
    3); each contributes only its PARTIAL states (count / fixed-point
    sums / min / max — all commutative monoids), and the serve-time
    fold + finalize reproduces the from-scratch aggregate exactly,
    scaled AVG included. This is the algebra that makes the persisted
    MV's O(batch + |groups|) appends exact at any scale — a 100 TB
    fact table is maintained without ever being re-scanned.
    """
    l = t.lineitem
    states = aggmv.merge_states(
        aggmv.partial_states(l.filter(F.col("l_orderkey") % 3 == 0), "b0")
        .unionByName(
            aggmv.partial_states(l.filter(F.col("l_orderkey") % 3 == 1), "b1")
        )
        .unionByName(
            aggmv.partial_states(l.filter(F.col("l_orderkey") % 3 == 2), "b2")
        )
    )
    return aggmv.finalize(states)


@register(
    "join_incremental_mv",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_incremental_mv(t):
    """Incremental JOIN-view maintenance fold (operators/joinmv.py).

    Both sides of ``orders ⋈ customer`` arrive in two interleaved
    insert batches; each append contributes exactly Δ ⋈ other-side-so-
    far (the Blakeley'86 delta-join rule), so the union of the three
    deltas covers every (order, customer) pair exactly once and folds
    to the from-scratch join bit-for-bit. The persisted/replayed/
    crash-windowed surfaces of the same operator are pinned in
    tests/test_joinmv.py; at scale each delta join shuffles only the
    batch (accumulators bucketed by key), so a 100 TB view is
    maintained without rescanning either side.
    """
    from stream_processor_spark.operators.joinmv import VIEW_COLS

    o = t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    c = t.customer.select("c_custkey", "c_name")
    a0 = o.filter(F.col("o_orderkey") % 2 == 0)
    a1 = o.filter(F.col("o_orderkey") % 2 == 1)
    b0 = c.filter(F.col("c_custkey") % 2 == 0)
    b1 = c.filter(F.col("c_custkey") % 2 == 1)
    on = F.col("o_custkey") == F.col("c_custkey")
    # append schedule: a0 (empty right), b0, a1, b1
    v1 = a0.join(b0, on)          # Δb0 ⋈ A={a0}
    v2 = a1.join(b0, on)          # Δa1 ⋈ B={b0}
    v3 = a0.unionByName(a1).join(b1, on)  # Δb1 ⋈ A={a0,a1}
    return (
        v1.select(*VIEW_COLS)
        .unionByName(v2.select(*VIEW_COLS))
        .unionByName(v3.select(*VIEW_COLS))
    )


@register(
    "mv_join_agg_incremental",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {_dsum_sql('o.o_totalprice')} AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def mv_join_agg_incremental(t):
    """CHAINED incremental maintenance: an aggregate view OVER a join
    view, both maintained from deltas — the composition every real MV
    stack needs (fact ⋈ dim → segment rollup). Each of the three join
    deltas (the `join_incremental_mv` schedule) contributes only its
    PARTIAL aggregate states (count + fixed-point int64 price sum —
    commutative monoids); the serve-time fold equals the from-scratch
    join+aggregate bit-for-bit. At 100 TB each delta's state rows are
    |segments|-sized, so the chained view is maintained without ever
    rescanning either base table or the join view itself.
    """
    o = t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    c = t.customer.select("c_custkey", "c_mktsegment")
    a0 = o.filter(F.col("o_orderkey") % 2 == 0)
    a1 = o.filter(F.col("o_orderkey") % 2 == 1)
    b0 = c.filter(F.col("c_custkey") % 2 == 0)
    b1 = c.filter(F.col("c_custkey") % 2 == 1)
    on = F.col("o_custkey") == F.col("c_custkey")

    def states(delta):
        return delta.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
            ).alias("s"),
        )

    merged = (
        states(a0.join(b0, on))
        .unionByName(states(a1.join(b0, on)))
        .unionByName(states(a0.unionByName(a1).join(b1, on)))
        .groupBy("c_mktsegment")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    return merged.select(
        "c_mktsegment",
        F.col("n").alias("n_orders"),
        (F.col("s").cast("double") / 100.0).alias("sum_price"),
    )


@register(
    "join_incremental_mv_retract",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey % 3 <> 1
    """,
)
def join_incremental_mv_retract(t):
    """Join-view maintenance WITH RETRACTIONS (the z-set / DBSP
    algebra): deltas carry a signed weight (+1 insert, −1 delete), each
    delta joins the other side as usual, and the view is the rows whose
    net weight is positive. Here two insert batches land and one of
    them is then retracted; the fold equals the join of the surviving
    rows bit-for-bit. This is the general form of `join_incremental_mv`
    — updates are delete+insert pairs, so the same fold maintains views
    under arbitrary DML.

    Scale: the weighted union is the same delta-join dataflow; the
    net-weight aggregate groups on the view's own columns with map-side
    combine — rows that were never touched by a retraction fold to
    weight 1 without a comparison against anything corpus-sized.
    """
    o = t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    c = t.customer.select("c_custkey", "c_name")
    on = F.col("o_custkey") == F.col("c_custkey")
    i1 = o.filter(F.col("o_orderkey") % 3 <= 1)   # insert: keys 0,1 (mod 3)
    i2 = o.filter(F.col("o_orderkey") % 3 == 2)   # insert: keys 2 (mod 3)
    d1 = o.filter(F.col("o_orderkey") % 3 == 1)   # retract: keys 1 (mod 3)
    view_cols = ["o_orderkey", "o_custkey", "o_totalprice", "c_name"]
    deltas = (
        i1.join(c, on).select(*view_cols).withColumn("w", F.lit(1))
        .unionByName(
            i2.join(c, on).select(*view_cols).withColumn("w", F.lit(1))
        )
        .unionByName(
            d1.join(c, on).select(*view_cols).withColumn("w", F.lit(-1))
        )
    )
    return (
        deltas.groupBy(*view_cols)
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") > 0)
        .select(*view_cols)
    )
