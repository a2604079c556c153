"""Cross-engine query fuzzer: random expression ASTs compiled BOTH ways.

Each case builds one AST and lowers it twice — to a PySpark Column tree
(the DataFrame API path the engine's operators use) and to ANSI SQL text
for DuckDB — then runs the two through the same value-hash compare as
the main parity suite. This generalizes oracle parity from the 175
hand-written queries to a sampled slice of the whole expression space:
arithmetic, comparisons, boolean combinations, conditional aggregates.

Determinism rules (why every case is hash-exact, not approximate):
- integer-only arithmetic over non-negative columns;
- `div`/`%` only by positive literals, and only over +/* subtrees
  (truncating vs flooring division differ on negatives between
  engines, so the grammar never produces a negative dividend);
- subtraction allowed only OUTSIDE div/% operands (results may go
  negative, which +,*,comparisons handle identically);
- depth/width caps keep magnitudes < 2^40 — no int64 overflow.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from stream_processor_spark.catalog import Tables
from tests.oracle_harness import compare

# non-negative integer columns of lineitem (sf0.001 magnitudes ≤ ~6e3)
INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
GROUP_COLS = ["l_returnflag", "l_linestatus"]


class Node:
    """AST node lowering to both a Spark Column and SQL text."""

    def __init__(self, kind, children=(), payload=None):
        self.kind = kind
        self.children = list(children)
        self.payload = payload

    def sql(self) -> str:
        k, c = self.kind, self.children
        if k == "col":
            return self.payload
        if k == "lit":
            return str(self.payload)
        if k in ("+", "*", "-"):
            return f"({c[0].sql()} {k} {c[1].sql()})"
        if k == "div":
            return f"({c[0].sql()} // {self.payload})"
        if k == "mod":
            return f"({c[0].sql()} % {self.payload})"
        if k in ("<", "<=", "=", "<>"):
            return f"({c[0].sql()} {k} {c[1].sql()})"
        if k in ("AND", "OR"):
            return f"({c[0].sql()} {k} {c[1].sql()})"
        if k == "NOT":
            return f"(NOT {c[0].sql()})"
        raise AssertionError(k)

    def spark(self):
        k, c = self.kind, self.children
        if k == "col":
            return F.col(self.payload)
        if k == "lit":
            return F.lit(self.payload)
        if k == "+":
            return c[0].spark() + c[1].spark()
        if k == "-":
            return c[0].spark() - c[1].spark()
        if k == "*":
            return c[0].spark() * c[1].spark()
        if k == "div":
            # integer division via pure Column ops (no SQL-text detour):
            # for dividend >= 0 and positive literal divisor,
            # (a - a % b) / b is exact and < 2^53, so the double
            # division round-trips losslessly; truncating-vs-flooring
            # divergence can't arise because dividends are non-negative
            a = c[0].spark()
            b = F.lit(self.payload)
            return ((a - a % b) / b).cast("long")
        if k == "mod":
            return c[0].spark() % F.lit(self.payload)
        if k == "<":
            return c[0].spark() < c[1].spark()
        if k == "<=":
            return c[0].spark() <= c[1].spark()
        if k == "=":
            return c[0].spark() == c[1].spark()
        if k == "<>":
            return c[0].spark() != c[1].spark()
        if k == "AND":
            return c[0].spark() & c[1].spark()
        if k == "OR":
            return c[0].spark() | c[1].spark()
        if k == "NOT":
            return ~c[0].spark()
        raise AssertionError(k)


def gen_nonneg(rng: random.Random, depth: int) -> Node:
    """Non-negative integer expression: columns, positive literals, +, *,
    guarded div/mod."""
    if depth <= 0 or rng.random() < 0.35:
        if rng.random() < 0.7:
            return Node("col", payload=rng.choice(INT_COLS))
        return Node("lit", payload=rng.randrange(1, 50))
    r = rng.random()
    if r < 0.4:
        return Node("+", [gen_nonneg(rng, depth - 1), gen_nonneg(rng, depth - 1)])
    if r < 0.65:
        return Node("*", [gen_nonneg(rng, depth - 1),
                          Node("lit", payload=rng.randrange(1, 9))])
    if r < 0.85:
        return Node("div", [gen_nonneg(rng, depth - 1)],
                    payload=rng.randrange(2, 13))
    return Node("mod", [gen_nonneg(rng, depth - 1)],
                payload=rng.randrange(2, 17))


def gen_int(rng: random.Random, depth: int) -> Node:
    """Possibly-negative integer expression (subtraction at the top)."""
    a, b = gen_nonneg(rng, depth), gen_nonneg(rng, depth)
    return Node("-", [a, b]) if rng.random() < 0.4 else a


def gen_bool(rng: random.Random, depth: int) -> Node:
    if depth <= 0 or rng.random() < 0.4:
        op = rng.choice(["<", "<=", "=", "<>"])
        return Node(op, [gen_int(rng, 2), gen_int(rng, 2)])
    op = rng.choice(["AND", "OR", "NOT"])
    if op == "NOT":
        return Node("NOT", [gen_bool(rng, depth - 1)])
    return Node(op, [gen_bool(rng, depth - 1), gen_bool(rng, depth - 1)])


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_project_filter(spark, sf_dir, seed):
    """SELECT keys, <int expr> FROM lineitem WHERE <bool expr>."""
    rng = random.Random(1000 + seed)
    e, b = gen_int(rng, 3), gen_bool(rng, 2)
    sql = (
        f"SELECT l_orderkey, l_linenumber, CAST({e.sql()} AS BIGINT) AS v "
        f"FROM lineitem WHERE {b.sql()}"
    )
    df = (
        Tables(spark, sf_dir).lineitem
        .filter(b.spark())
        .select("l_orderkey", "l_linenumber",
                e.spark().cast("long").alias("v"))
    )
    res = compare(f"fuzz_pf_{seed}", df, sql, sf_dir)
    assert res.ok, f"{sql}\n{res.detail}"


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_grouped_aggregate(spark, sf_dir, seed):
    """Grouped SUM/MIN/MAX of a random expression + conditional count."""
    rng = random.Random(2000 + seed)
    e, b = gen_int(rng, 3), gen_bool(rng, 2)
    g = rng.choice(GROUP_COLS)
    sql = (
        f"SELECT {g}, CAST(SUM({e.sql()}) AS BIGINT) AS s, "
        f"CAST(MIN({e.sql()}) AS BIGINT) AS mn, "
        f"CAST(MAX({e.sql()}) AS BIGINT) AS mx, "
        f"CAST(COUNT(*) FILTER (WHERE {b.sql()}) AS BIGINT) AS nc "
        f"FROM lineitem GROUP BY {g}"
    )
    df = (
        Tables(spark, sf_dir).lineitem
        .groupBy(g)
        .agg(
            F.sum(e.spark()).cast("long").alias("s"),
            F.min(e.spark()).cast("long").alias("mn"),
            F.max(e.spark()).cast("long").alias("mx"),
            F.count(F.when(b.spark(), 1)).cast("long").alias("nc"),
        )
    )
    res = compare(f"fuzz_agg_{seed}", df, sql, sf_dir)
    assert res.ok, f"{sql}\n{res.detail}"


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_join_aggregate(spark, sf_dir, seed):
    """Random filtered equi-join lineitem x orders + grouped aggregate:
    samples the join-then-aggregate plan space the composite queries
    live in."""
    rng = random.Random(3000 + seed)
    lb = gen_bool(rng, 1)
    e = gen_int(rng, 2)
    o_cut = rng.randrange(2, 9)
    g = rng.choice(GROUP_COLS + ["o_orderpriority"])
    sql = (
        f"SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM({e.sql()}) AS BIGINT) AS s "
        f"FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        f"WHERE ({lb.sql()}) AND o.o_custkey % {o_cut} = 0 "
        f"GROUP BY {g}"
    )
    t = Tables(spark, sf_dir)
    l, o = t.lineitem, t.orders
    df = (
        l.filter(lb.spark())
        .join(o.filter(o.o_custkey % o_cut == 0),
              l.l_orderkey == o.o_orderkey)
        .groupBy(g)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(e.spark()).cast("long").alias("s"),
        )
    )
    res = compare(f"fuzz_join_{seed}", df, sql, sf_dir)
    assert res.ok, f"{sql}\n{res.detail}"
