"""Property-based parity: Spark expressions ≡ the reference's JS semantics.

Each reference processor is a pure function; Hypothesis generates records
and asserts the Spark column expression produces exactly what the JS would
(ported to Python; ASCII corpus to dodge locale divergence — FIXTURES.md
§C). Chain fuzzing mirrors update_pipelines.js:63-76 (1-3 random
processors per pipeline) over the whole routed-chain compiler.

Spark actions are batched: one createDataFrame + one collect per case
class, not per record.
"""

from __future__ import annotations

import random
import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_processor_spark.operators.dlq import ROUTE_DROPPED, ROUTE_OK
from stream_processor_spark.pipeline.processors import BUILTIN_PROCESSORS

ascii_text = st.text(alphabet=string.ascii_letters + string.digits + " _-", max_size=24)
records = st.lists(
    st.fixed_dictionaries(
        {
            "key": ascii_text,
            "value": st.one_of(st.none(), ascii_text),
            "num": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        }
    ),
    min_size=1,
    max_size=40,
)

# Python ports of the reference processors (semantics source of truth):
#   add10        src/transformations/add10.js:5        num + 10
#   appendString src/transformations/appendString.js:4 value + '_appended'
#   capitalize   src/transformations/capitalize.js:4   value.toUpperCase()
#   reverseString src/transformations/reverseString.js:4 reversed value
#   isEven       src/filters/isEven.js:2               keep iff num % 2 == 0
# JS string methods throw on null receiver; filters return null to drop.
PY_REFERENCE = {
    # JS coercions: null+10 → 10, null+'_appended' → 'null_appended'
    "add10": lambda r: {**r, "num": (r["num"] or 0) + 10},
    "appendString": lambda r: {
        **r,
        "value": ("null" if r["value"] is None else r["value"]) + "_appended",
    },
    # String.prototype methods throw on null receiver → DLQ
    "capitalize": lambda r: {**r, "value": r["value"].upper()},
    "reverseString": lambda r: {**r, "value": r["value"][::-1]},
}
FILTERS = {"isEven": lambda r: r["num"] % 2 == 0}


def run_python_chain(rec: dict, chain: list[str]) -> tuple[str, dict | None]:
    """Faithful port of the reference fold (consumer.js:88-109): a filter's
    null return does NOT short-circuit — the null message reaches the next
    step, which throws on the deref (every reference processor derefs the
    message) → that step's DLQ; only a chain ENDING null is dropped
    (consumer.js:134-137)."""
    cur: dict | None = dict(rec)
    for name in chain:
        if cur is None:
            return f"dlq_{name}", None  # JS deref throw on null message
        if name in FILTERS:
            cur = cur if FILTERS[name](cur) else None
            continue
        try:
            cur = PY_REFERENCE[name](cur)
        except (AttributeError, TypeError):
            return f"dlq_{name}", None  # JS throw → DLQ (dlq bound per step)
    if cur is None:
        return ROUTE_DROPPED, None
    return ROUTE_OK, cur


def run_spark_chain(spark, recs: list[dict], chain: list[str]) -> dict:
    # int overflow parity: JS numbers don't wrap; use long in Spark
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("value", StringType()),
            StructField("num", LongType()),
        ]
    )
    df = spark.createDataFrame(
        [(r["key"], r["value"], r["num"]) for r in recs], schema=schema
    )
    routed = BUILTIN_PROCESSORS.apply_expression_chain(
        df, chain, ["dlq"] * len(chain)
    )
    return {
        r["key"]: (r["route"], r["out_value"], r["out_num"])
        for r in routed.collect()
    }


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(recs=records)
def test_full_chain_matches_reference_semantics(spark, recs):
    # unique keys so results map cleanly
    for i, r in enumerate(recs):
        r["key"] = f"k{i}"
    chain = ["add10", "capitalize", "appendString", "isEven"]
    got = run_spark_chain(spark, recs, chain)
    for r in recs:
        route, out = run_python_chain(r, chain)
        g_route, g_value, g_num = got[r["key"]]
        assert g_route == route, (r, got[r["key"]])
        if route == ROUTE_OK:
            assert g_value == out["value"] and g_num == out["num"], (r, got[r["key"]])


def test_randomized_chain_fuzz(spark):
    """update_pipelines.js:63-76 port: random 1-3 processor chains."""
    rng = random.Random(42)
    names = list(PY_REFERENCE) + list(FILTERS)
    recs = [
        {"key": f"k{i}", "value": None if i % 7 == 3 else f"v{i}x", "num": i * 3 - 20}
        for i in range(30)
    ]
    for trial in range(8):
        chain = [rng.choice(names) for _ in range(rng.randint(1, 3))]
        got = run_spark_chain(spark, recs, chain)
        for r in recs:
            route, out = run_python_chain(r, chain)
            g_route, g_value, g_num = got[r["key"]]
            assert g_route == route, (trial, chain, r, got[r["key"]])
            if route == ROUTE_OK:
                assert g_value == out["value"] and g_num == out["num"], (
                    trial,
                    chain,
                    r,
                )
