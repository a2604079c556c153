"""Subquery surface: scalar, IN, correlated EXISTS, CTEs.

Catalyst rewrites all of these into joins (scalar subquery → broadcast of a
1-row aggregate; IN → left-semi; correlated EXISTS → left-semi with pushed
correlation predicate), so the 100 TB story reduces to the join story.
Expressed via ``spark.sql`` over temp views — the SQL front door of the
engine, proving the same registry works through either API.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processor_spark.queries.base import register


def _sql(t, name: str, tables: list[str], query: str):
    for tbl in tables:
        t.table(tbl).createOrReplaceTempView(f"__sq_{tbl}")
    return t.table(tables[0]).sparkSession.sql(query)


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    """,
)
def subquery_scalar(t):
    """Scalar subquery in a predicate (plans as broadcast 1-row join).

    AVG is order-sensitive on doubles in general; here both engines
    compute the global average over the identical value set and the
    comparison threshold is far from any row boundary at 1.5x, so the
    filter set is stable. (Money-exact variants use dsum.)
    """
    return _sql(
        t,
        "subquery_scalar",
        ["orders"],
        """
        SELECT o_orderkey, o_totalprice
        FROM __sq_orders
        WHERE o_totalprice > (SELECT (CAST(SUM(CAST(floor(o_totalprice * 100.0
                 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) / COUNT(*) * 1.5
               FROM __sq_orders)
        """,
    )


@register(
    "subquery_in",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey IN (
      SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
    )
    """,
)
def subquery_in(t):
    """IN-subquery (rewrites to left-semi join)."""
    return _sql(
        t,
        "subquery_in",
        ["part", "lineitem"],
        """
        SELECT p_partkey, p_name
        FROM __sq_part
        WHERE p_partkey IN (
          SELECT l_partkey FROM __sq_lineitem WHERE l_quantity >= 49
        )
        """,
    )


@register(
    "subquery_correlated_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def subquery_correlated_exists(t):
    """Correlated EXISTS (decorrelated into a filtered left-semi join)."""
    return _sql(
        t,
        "subquery_correlated_exists",
        ["customer", "orders"],
        """
        SELECT c.c_custkey, c.c_name
        FROM __sq_customer c
        WHERE EXISTS (
          SELECT 1 FROM __sq_orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        """,
    )


@register(
    "sql_cte",
    oracle="""
    WITH big_orders AS (
      SELECT o_custkey, COUNT(*) AS n
      FROM orders WHERE o_totalprice > 200000
      GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, b.n AS big_order_count
    FROM customer c JOIN big_orders b ON b.o_custkey = c.c_custkey
    """,
)
def sql_cte(t):
    """CTE through the SQL front door (inlined by Catalyst)."""
    return _sql(
        t,
        "sql_cte",
        ["customer", "orders"],
        """
        WITH big_orders AS (
          SELECT o_custkey, COUNT(*) AS n
          FROM __sq_orders WHERE o_totalprice > 200000
          GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, b.n AS big_order_count
        FROM __sq_customer c JOIN big_orders b ON b.o_custkey = c.c_custkey
        """,
    )


@register(
    "sample_deterministic",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR))
          < '1a000000'
    """,
)
def sample_deterministic(t):
    """~10% deterministic sample by md5 prefix — reproducible across
    engines and runs (unlike TABLESAMPLE), the right way to carve stable
    train/eval splits from a 100 TB corpus."""
    l = t.lineitem
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return l.filter(F.md5(key) < "1a000000").select("l_orderkey", "l_linenumber")
