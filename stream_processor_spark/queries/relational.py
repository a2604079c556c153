"""Relational surface [EXT]: joins and aggregations (SURVEY.md §2.6-2.7).

Not present in the reference (its data plane never joins or aggregates);
this is the declared engine surface, all built-in Catalyst operators.

Scale notes (100 TB stance, see docs/SCALE.md):
- Dimension joins (customer/part/nation/region) are broadcast — zero
  shuffle of the fact side. ``F.broadcast`` hints where the statistics
  alone might not trigger it.
- Fact-fact joins shuffle on the join key; AQE handles skew splits.
- All money aggregates use exact fixed-point int64 sums (see ``dsum``):
  associative/commutative, so results are bit-identical across any
  partitioning / merge order — deterministic at 32 partitions or 32k.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from stream_processor_spark.operators import rollup as ru
from stream_processor_spark.queries.base import register


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent sum of a money-like DOUBLE.

    Per-row values are fixed-point-scaled to int64 (``floor(x*10^s + 0.5)``
    — pure codegen arithmetic, ~4× faster than Spark's BigDecimal sums) and
    summed exactly, so the merge order can never change the result; the
    final division restores the scale. int64 headroom: 10^18/10^(s+digits)
    rows — beyond that (extreme 100 TB aggregates) switch ``scale`` down or
    use the DECIMAL path (``queries.llm_extra.dsum_dec``) or the hi/lo
    split (``agg_groupby_wide``). The boundary is real, not
    theoretical: the sf100 rehearsal measured the IVF family's
    per-dimension centroid sums at ~3.5e19 (past int64), and Q1's own
    scale-6 group sums reach 2.8e18 at 600M rows — one decade of
    growth from the cliff.
    """
    factor = float(10**scale)
    return F.sum(F.floor(col * F.lit(factor) + F.lit(0.5))).cast("double") / F.lit(factor)


def _dsum_sql(expr: str, scale: int = 2) -> str:
    f = 10**scale
    return (
        f"(CAST(CAST(SUM(CAST(floor(({expr}) * {f}.0 + 0.5) AS BIGINT)) AS BIGINT)"
        f" AS DOUBLE) / {f}.0)"
    )


# ----------------------------------------------------------------- joins ----


@register(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner(t):
    """Inner equi-join; Catalyst picks broadcast-hash (customer ≪ orders)."""
    return t.orders.join(
        F.broadcast(t.customer), t.orders.o_custkey == t.customer.c_custkey, "inner"
    ).select("o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment")


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    """,
)
def join_left_outer(t):
    """Left outer join preserving customers with no orders."""
    return t.customer.join(
        t.orders, t.orders.o_custkey == t.customer.c_custkey, "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(t):
    """Left semi join: customers having at least one order."""
    return t.customer.join(
        t.orders, t.orders.o_custkey == t.customer.c_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(t):
    """Left anti join: customers with no orders."""
    return t.customer.join(
        t.orders, t.orders.o_custkey == t.customer.c_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_broadcast",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, p.p_name, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def join_broadcast(t):
    """Explicit broadcast hint: ship the small dim to every executor.

    At 100 TB the fact side never shuffles for a dimension join — this is
    the single most important join strategy at scale.
    """
    return t.lineitem.join(
        F.broadcast(t.part), t.lineitem.l_partkey == t.part.p_partkey
    ).select("l_orderkey", "l_linenumber", "l_quantity", "p_name", "p_brand")


@register(
    "join_cross_nations",
    oracle="SELECT n.n_name, r.r_name FROM nation n CROSS JOIN region r",
)
def join_cross_nations(t):
    """Cartesian product of two bounded dims (BroadcastNestedLoop)."""
    return t.nation.crossJoin(t.region).select("n_name", "r_name")


@register(
    "join_range",
    oracle="""
    SELECT e.event_id, e.user_id, n.n_nationkey AS bin, n.n_name AS bin_name
    FROM events e JOIN nation n
      ON e.user_id >= n.n_nationkey * 6 AND e.user_id < (n.n_nationkey + 1) * 6
    """,
)
def join_range(t):
    """Theta/range join: events binned against ranges derived from a dim.

    The range side is tiny → BroadcastNestedLoopJoin; each event probes 25
    ranges in-memory. At scale, a range join against a large interval table
    would instead bucket both sides by coarse range ids first (equi-join on
    bucket, residual range predicate after) — see docs/SCALE.md.
    """
    e, n = t.events, t.nation
    cond = (e.user_id >= n.n_nationkey * 6) & (e.user_id < (n.n_nationkey + 1) * 6)
    return e.join(F.broadcast(n), cond).select(
        "event_id",
        "user_id",
        n.n_nationkey.alias("bin"),
        n.n_name.alias("bin_name"),
    )


@register(
    "join_star_3way",
    oracle=f"""
    SELECT c.c_mktsegment,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_star_3way(t):
    """Star join, shuffle-era layout (at scale use `join_star_3way_bucketed`: 1.36x vs 5.1x at sf10).

    fact ⋈ orders ⋈ customer dim, then aggregate. Only the true
    dimension (customer) carries a broadcast hint. orders is fact-sized
    at real scale — Catalyst/AQE picks its strategy from stats
    (broadcast locally, sort-merge + skew-split at 100 TB); hard-coding
    a broadcast there would OOM a real cluster. The fact-fact Exchange
    is this plan's measured scale cost (sf10: 5.1x DuckDB's embedded
    hash join) — the registered scale answer is the write-time bucketed
    layout (`join_star_3way_bucketed`, zero-Exchange on the fact edge,
    1.36x), this entry being the ad-hoc-query baseline it amortizes.
    """
    l, o, c = t.lineitem, t.orders, t.customer
    revenue = l.l_extendedprice * (1 - l.l_discount)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            dsum(revenue, 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------- aggregations ----


@register(
    "agg_groupby_basic",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {_dsum_sql('l_quantity')} / COUNT(*) AS avg_qty,
           {_dsum_sql('l_extendedprice')} / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_basic(t):
    """Hash aggregate with partial (map-side) combine — TPC-H Q1 shape.

    Spark plans partial_sum per input partition then a final merge after a
    32-way shuffle of only the grouped partials — at 100 TB the shuffle
    carries ~groups×partitions rows, not the fact table.
    """
    l = t.lineitem
    disc_price = l.l_extendedprice * (1 - l.l_discount)
    charge = disc_price * (1 + l.l_tax)
    return (
        l.filter(l.l_shipdate <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(l.l_quantity).alias("sum_qty"),
            dsum(l.l_extendedprice).alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            (dsum(l.l_quantity) / F.count(F.lit(1))).alias("avg_qty"),
            (dsum(l.l_extendedprice) / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           {_dsum_sql('l_quantity')} AS total_qty,
           MIN(l_shipdate) AS min_shipdate,
           MAX(l_shipdate) AS max_shipdate
    FROM lineitem
    """,
)
def agg_global(t):
    """Global (no-group) aggregate — single-row result."""
    l = t.lineitem
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        dsum(l.l_quantity).alias("total_qty"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(t):
    """Exact count-distinct (expand + two-phase aggregate under the hood)."""
    return t.lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           true AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_count_distinct(t):
    """HyperLogLog++ approximate distinct — the 100 TB-scale path.

    At scale exact countDistinct explodes the shuffle; HLL sketches merge
    in constant space. Estimates are engine-specific, so the oracle
    contract is banded: Spark emits the exact count plus a boolean
    asserting the HLL estimate landed within 5% of it (HLL is
    deterministic for fixed data, so the boolean is stable), and the
    oracle emits the exact count plus ``true``.
    """
    return t.lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", 0.01)
                - F.countDistinct("l_partkey")
            )
            <= 0.05 * F.countDistinct("l_partkey")
        ).alias("approx_ok"),
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(t):
    """Rollup: hierarchical subtotals + grand total.

    Round-5 rewrite: re-aggregation instead of Spark's Expand plan
    (`operators/rollup.py`). The fact table aggregates ONCE at the
    finest level — one scan, one shuffle of base-group partials — and
    the subtotal levels re-aggregate the dozens-of-rows base frame.
    Spark's built-in ``rollup()`` would Expand-replicate all 60M rows
    ×3 levels before the partial aggregate (measured ~5× slower at
    sf10). Bit-identical to SQL ROLLUP: the fixed-point int64 sums are
    associative, so sums-of-partial-sums equal the direct sums exactly
    (the unchanged DuckDB ROLLUP oracle verifies it)."""
    l = t.lineitem
    return ru.rollup_reagg(
        l,
        ["l_returnflag", "l_linestatus"],
        int_sums={"sum_qty": F.floor(l.l_quantity * F.lit(100.0) + F.lit(0.5))},
        finish={"sum_qty": F.col("__i_sum_qty").cast("double") / F.lit(100.0)},
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {_dsum_sql('o_totalprice')} AS sum_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(t):
    """Cube: all grouping-set combinations — same re-aggregation form as
    `agg_rollup` (`operators/rollup.py`): one scan + one base-group
    shuffle; the Expand quadruples base groups, not fact rows."""
    o = t.orders
    return ru.rollup_reagg(
        o,
        ["o_orderstatus", "o_orderpriority"],
        int_sums={
            "sum_price": F.floor(o.o_totalprice * F.lit(100.0) + F.lit(0.5))
        },
        finish={"sum_price": F.col("__i_sum_price").cast("double") / F.lit(100.0)},
        count_alias="n_orders",
        mode="cube",
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS order_count,
           {_dsum_sql('o_totalprice')} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
)
def agg_having(t):
    """HAVING-style post-aggregation filter."""
    o = t.orders
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            dsum(o.o_totalprice).alias("total_spend"),
        )
        .filter(F.col("order_count") >= 3)
    )


@register(
    "agg_salted_skew",
    oracle=f"""
    SELECT event_type,
           {_dsum_sql('value')} AS sum_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_skew(t):
    """Two-phase salted aggregation over a hot low-cardinality key.

    ``event_type`` has a handful of values over millions of events — the
    power-law shape where one reducer would receive a whole key's rows.
    Phase 1 aggregates on (key, salt) spreading each hot key over 16
    reducers; phase 2 merges the per-salt partials (operators/skew.py).
    Exactness: the partials are order-independent scaled-int64 sums and
    counts, so the merged result is bit-identical to the unsalted plan
    regardless of how the salt scattered the rows — which is why a plain
    GROUP BY is a valid oracle. At 100 TB this is the fallback when
    AQE's skew splitting can't help (single-key hot spots in the MAP
    output, not just oversized shuffle partitions).
    """
    from stream_processor_spark.operators.skew import salted_agg

    e = t.events
    out = salted_agg(
        e.select("event_type", "value"),
        keys=["event_type"],
        partials={
            "sum_value": lambda: F.sum(
                F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            ),
            "n_events": lambda: F.count(F.lit(1)),
        },
        merges={
            "sum_value": lambda c: F.sum(c),
            "n_events": lambda c: F.sum(c),
        },
    )
    return out.select(
        "event_type",
        (F.col("sum_value").cast("double") / F.lit(100.0)).alias("sum_value"),
        F.col("n_events").cast("long").alias("n_events"),
    )


@register(
    "join_salted_skew",
    oracle=f"""
    SELECT o.o_orderpriority,
           {_dsum_sql('l.l_extendedprice')} AS sum_price,
           COUNT(*) AS n
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_salted_skew(t):
    """Salted fact-fact equi-join (operators/skew.py:salted_shuffle_join):
    the probe side carries a random salt, the other side is replicated
    16× so the join key becomes (key, salt) — a hot order key's line
    items spread over 16 reducers instead of one.

    Results are provably identical to the unsalted join (each probe row
    meets each matching row exactly once via its single salt replica),
    so the plain-join SQL is a valid oracle despite the RNG salt. This
    is the explicit fallback for the case AQE skew handling cannot fix:
    ONE key bigger than a shuffle-block split, on a join where neither
    side fits a broadcast. The demo aggregates to priority level to keep
    the checked result compact.
    """
    from stream_processor_spark.operators.skew import salted_shuffle_join

    l = t.lineitem.select("l_orderkey", "l_extendedprice")
    o = t.orders.select("o_orderkey", "o_orderpriority").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    joined = salted_shuffle_join(l, o, key="l_orderkey", salt_buckets=16)
    return joined.groupBy("o_orderpriority").agg(
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "join_bucketed",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
           o.o_orderstatus, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def join_bucketed(t):
    """Storage-partitioned (bucketed) fact-fact join — the one 100 TB
    join shape broadcast can't save: neither lineitem nor orders fits
    in memory, so the shuffle is paid ONCE at write time instead of on
    every query. Both tables are persisted bucketed+sorted on the join
    key with the same bucket count (``operators/storage.py:
    bucketed_pair``); Catalyst then plans this join with ZERO Exchange
    on either side — each task zips bucket i with bucket i
    (tests/test_storage.py pins the no-Exchange plan with broadcast
    disabled; this entry hash-checks the joined values against the
    plain-join oracle, which bucketing must not change).

    At 100 TB this is the bread-and-butter layout for fact-fact joins:
    re-bucketing costs one shuffle amortized over every subsequent
    join/aggregation on the key, and sorted buckets let the sort-merge
    join skip its per-task sort.
    """
    from stream_processor_spark.operators.storage import bucketed_pair

    li, o = bucketed_pair(t._spark, t._dir)
    # MERGE hint: on the bucketed layout sort-merge is exchange-free and
    # sort-free; without it Catalyst may broadcast a column-pruned fact
    # side that squeaks under the size threshold — a single-threaded
    # driver hash build of millions of rows (measured 8 s at sf10) and
    # an OOM at real scale.
    return li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_quantity",
        "o_orderstatus", "o_orderpriority",
    )


@register(
    "join_star_3way_bucketed",
    oracle=f"""
    SELECT c.c_mktsegment,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_star_3way_bucketed(t):
    """`join_star_3way` on the write-time-bucketed layout — the fast
    path for the star's fact-fact edge, hash-checked against the SAME
    oracle semantics as the shuffle-era plan.

    The lineitem⋈orders edge reads both sides bucketed+sorted on the
    join key (zero Exchange, one task per bucket); the customer dim
    broadcasts as usual. This is the layout docs/SCALE.md's sf1/sf10
    isolation identifies as the only strategy whose cost is flat in
    cluster size: every shuffle-era alternative (broadcast build,
    shuffle-hash, sort-merge) pays a per-query data movement this plan
    paid once at write time. Measured at 60M rows: the bucketed edge
    alone is ~2× faster than the best shuffle strategy, and the gap is
    the entire exchange volume at 1000-executor scale.
    """
    from stream_processor_spark.operators.storage import bucketed_pair

    li, o = bucketed_pair(t._spark, t._dir)
    c = t.customer
    revenue = li.l_extendedprice * (1 - li.l_discount)
    # merge-hint the fact-fact edge (see join_bucketed): zero-exchange
    # zero-sort SMJ on the bucketed layout; never broadcast a fact side
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            dsum(revenue, 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS median_qty,
           quantile_cont(l_quantity, 0.75) AS q75,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(t):
    """Exact grouped percentiles (continuous interpolation).

    Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    definition q·(n-1) rank + linear interpolation. Cross-engine float
    parity holds because the chosen quantiles are dyadic (.25/.5/.75):
    q·(n-1) is exactly representable, and x + f·(y−x) over the
    integral-valued l_quantity is exact in binary floating point.
    Scale note: exact percentile keeps per-group value buffers — at
    100 TB prefer approx_percentile (registered separately) unless the
    group count is high enough to bound per-group cardinality.
    """
    l = t.lineitem
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.50).alias("median_qty"),
        F.percentile("l_quantity", 0.75).alias("q75"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "join_salted_auto",
    oracle="""
    WITH profile AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, p.n_events
    FROM events e JOIN profile p USING (user_id)
    """,
)
def join_salted_auto(t):
    """Skew-ADAPTIVE join (operators/skew.py:auto_salted_join): count
    fact rows per key at runtime, salt ONLY the keys above the hot
    threshold (the busiest users here), and join the cold majority
    normally — the production middle ground between broadcasting (dim
    fits memory) and blanket salting (everything replicated 16×). The
    hot threshold (75 events) genuinely splits this corpus, so BOTH
    paths execute and the hash checks their union.

    The oracle is the PLAIN join: per slice the salted join is
    result-identical to the unsalted one and every fact row lands in
    exactly one slice, so auto-salting can only reshape the shuffle,
    never the answer.

    Scale: one map-side-combined key count + a broadcast hot set +
    one normal join over the cold ~everything + a salted join over the
    hot sliver. At 100 TB this is what you reach for when ONE entity
    (a bot user, a null-like default key) holds >1 shuffle block and
    the build side is too big to broadcast."""
    from stream_processor_spark.operators.skew import auto_salted_join

    ev = t.events.select("event_id", "user_id")
    profile = t.events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    return auto_salted_join(
        ev, profile, key="user_id", hot_threshold=75, salt_buckets=8
    ).select("event_id", "user_id", "n_events")
