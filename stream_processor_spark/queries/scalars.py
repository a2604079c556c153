"""Scalar function families (SURVEY.md §2.9).

The reference exercises upper/concat/reverse/+/% (its four transformations
and one filter); this module generalizes to the full built-in surface. All
JVM-side expressions inside whole-stage codegen — zero Python in the hot
path. Oracle parity conventions (FIXTURES.md §C): explicit casts where
Spark/DuckDB return-type conventions differ (length INT vs BIGINT, floor
BIGINT vs DOUBLE), `round(…, 6)` on transcendental outputs (libm last-ulp
divergence), ASCII-only case functions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processor_spark.queries.base import register


@register(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_type) AS low_type,
           CAST(length(p_name) AS INT) AS name_len,
           substring(p_name, 1, 5) AS name_head,
           trim('  ' || p_brand || ' ') AS brand_trim,
           reverse(p_name) AS name_rev,
           p_brand || '/' || p_type AS brand_type,
           lpad(p_brand, 12, '*') AS brand_pad,
           CAST(instr(p_name, 'e') AS INT) AS first_e,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           string_split(p_name, ' ')[1] AS token1
    FROM part
    """,
)
def scalar_string(t):
    """String family: case, slice, pad, regex, split."""
    p = t.part
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_type").alias("low_type"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        F.reverse("p_name").alias("name_rev"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.instr(F.col("p_name"), "e").alias("first_e"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.element_at(F.split("p_name", " "), 1).alias("token1"),
    )


@register(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT)
             AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_day
    FROM orders
    """,
)
def scalar_datetime(t):
    """Date/time family: extract, trunc, arithmetic, epoch (UTC session TZ)."""
    o = t.orders
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        d.cast("timestamp").alias("order_day"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_ddisc,
           round(l_extendedprice, 1) AS price_r1,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           sqrt(l_quantity) AS qty_sqrt,
           pow(l_quantity, 2) AS qty_sq,
           l_orderkey % 7 AS key_mod7,
           round(exp(l_discount), 6) AS disc_exp,
           round(ln(l_quantity), 6) AS qty_ln,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def scalar_math(t):
    """Math family; transcendentals rounded to 6 dp (libm ulp parity)."""
    l = t.lineitem
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_ddisc"),
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_quantity"), 6).alias("qty_ln"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low'
                ELSE 'healthy' END AS balance_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
           least(c_acctbal, 0.0) AS capped_low,
           greatest(c_acctbal, 0.0) AS capped_high
    FROM customer
    """,
)
def scalar_conditional(t):
    """Conditional/null family: CASE, coalesce, nullif, least/greatest."""
    c = t.customer
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("healthy")
        .alias("balance_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        F.least(F.col("c_acctbal"), F.lit(0.0)).alias("capped_low"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("capped_high"),
    )


@register(
    "scalar_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS e1,
           CAST(embedding[64] AS DOUBLE) AS e64,
           CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
             + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head4_sum,
           CASE WHEN CAST(embedding[1] AS DOUBLE) > 0 THEN 1 ELSE 0 END AS e1_pos
    FROM embeddings
    """,
)
def scalar_array(t):
    """Array family on the embedding column: size, element access, arithmetic.

    Element-wise double arithmetic in fixed order → bit-deterministic.
    """
    e = t.embeddings
    el = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        el(1).alias("e1"),
        el(64).alias("e64"),
        (el(1) + el(2) + el(3) + el(4)).alias("head4_sum"),
        F.when(el(1) > 0, F.lit(1)).otherwise(F.lit(0)).alias("e1_pos"),
    )


@register(
    "scalar_struct",
    oracle="""
    SELECT c_custkey,
           c_name AS struct_name,
           c_acctbal AS struct_bal,
           c_mktsegment AS map_segment
    FROM customer
    """,
)
def scalar_struct(t):
    """Struct/map construction + field access (flattened output for parity)."""
    c = t.customer
    s = F.struct(F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal"))
    m = F.create_map(F.lit("seg"), F.col("c_mktsegment"))
    return c.select(
        "c_custkey",
        s.getField("name").alias("struct_name"),
        s.getField("bal").alias("struct_bal"),
        F.element_at(m, "seg").alias("map_segment"),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CASE WHEN json_extract_string(props, '$.missing') IS NULL
                THEN 1 ELSE 0 END AS missing_is_null
    FROM events
    """,
)
def scalar_json(t):
    """JSON extraction from a string column (events.props)."""
    e = t.events
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.when(F.get_json_object("props", "$.missing").isNull(), 1)
        .otherwise(0)
        .alias("missing_is_null"),
    )


@register(
    "scalar_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS INT) AS qty_int,
           CAST(l_quantity AS VARCHAR) AS qty_str,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(l_orderkey AS VARCHAR) AS key_str
    FROM lineitem
    """,
)
def scalar_cast(t):
    """Cast family incl. decimal; decimals emitted as strings for parity."""
    l = t.lineitem
    return l.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_orderkey").cast("string").alias("key_str"),
    )
