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
