"""Edge-case pins for the round-5 re-aggregation rollup and banded
interval join — properties the SQL oracles exercise only on fixture
data, checked here on adversarial inputs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stream_processor_spark.operators.rangejoin import banded_interval_join
from stream_processor_spark.operators.rollup import rollup_reagg


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_rollup_reagg_matches_builtin_with_null_groups(spark):
    """Genuine NULL group values: SQL ROLLUP emits BOTH the real
    (NULL, x) base groups and the rolled-up NULL-marker subtotals as
    visually identical rows; the re-aggregation form must reproduce the
    exact multiset."""
    data = [
        ("a", "x", 1.0),
        ("a", None, 2.0),
        (None, "x", 4.0),
        (None, None, 8.0),
        ("a", "x", 16.0),
    ]
    df = spark.createDataFrame(data, "g1 string, g2 string, v double")
    builtin = df.rollup("g1", "g2").agg(
        F.sum(F.floor(F.col("v") * 100 + F.lit(0.5))).alias("s"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ours = rollup_reagg(
        df, ["g1", "g2"],
        int_sums={"s": F.floor(F.col("v") * 100 + F.lit(0.5))},
    )
    assert _rows(builtin.select("g1", "g2", "s", "n_rows")) == _rows(
        ours.select("g1", "g2", "s", "n_rows")
    )


def test_cube_reagg_matches_builtin(spark):
    data = [("a", "x", 1.0), ("b", "x", 2.0), ("a", "y", 4.0), (None, "y", 8.0)]
    df = spark.createDataFrame(data, "g1 string, g2 string, v double")
    builtin = df.cube("g1", "g2").agg(
        F.sum(F.floor(F.col("v") * 100 + F.lit(0.5))).alias("s"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ours = rollup_reagg(
        df, ["g1", "g2"],
        int_sums={"s": F.floor(F.col("v") * 100 + F.lit(0.5))},
        mode="cube",
    )
    assert _rows(builtin.select("g1", "g2", "s", "n_rows")) == _rows(
        ours.select("g1", "g2", "s", "n_rows")
    )


def test_banded_interval_join_boundary_exactness(spark):
    """Pairs exactly AT the window boundary, just outside it, and
    spanning a bucket edge must match the brute-force inequality join
    exactly — the bucket quantization may only affect candidates, never
    results."""
    base = dt.datetime(2024, 3, 1, 0, 0, 0)

    def t(sec, micro=0):
        return base + dt.timedelta(seconds=sec, microseconds=micro)

    # bucket width = 60s; bucket edges at :00 of each minute
    left = [
        (1, 1, t(59)),          # near a bucket edge
        (2, 1, t(120)),         # on a bucket edge
        (3, 2, t(30)),
    ]
    right = [
        (10, 1, t(119)),            # 60s after left 1 → AT boundary: in
        (11, 1, t(119, 1)),         # 60.000001s after left 1 → out; 1s before left 2 → in
        (12, 1, t(180)),            # 60s after left 2 → AT boundary: in
        (13, 1, t(180, 1)),         # just out for left 2
        (14, 2, t(90)),             # 60s after left 3 → in
        (15, 3, t(30)),             # key mismatch → out
    ]
    ldf = spark.createDataFrame(left, "lid long, k long, lts timestamp")
    rdf = spark.createDataFrame(right, "rid long, k long, rts timestamp")
    got = _rows(
        banded_interval_join(ldf, rdf, key="k", left_ts="lts", right_ts="rts",
                             window_sec=60).select("lid", "rid")
    )
    brute = _rows(
        ldf.join(
            rdf,
            (ldf.k == rdf.k)
            & (rdf.rts >= ldf.lts - F.expr("INTERVAL 60 SECONDS"))
            & (rdf.rts <= ldf.lts + F.expr("INTERVAL 60 SECONDS")),
        ).select("lid", "rid")
    )
    assert got == brute
    assert (1, 10) in got and (2, 12) in got and (1, 11) not in got


def test_fuzzy_token_blocking_is_sound(spark):
    """The first-char/last-char/short blocking must lose NO pair within
    edit distance 1 — checked against the brute-force quadratic join on
    an adversarial vocabulary (edits at both ends, inserts/deletes at
    the front and back, empty and single-char strings)."""
    from stream_processor_spark.operators.text import fuzzy_token_pairs

    vocab = [
        "", "a", "b", "ab", "ba", "aa", "bb", "abc", "bbc", "abd",
        "bc", "ac", "cab", "abcd", "xbcd", "abcx", "bcd", "abdc",
    ]
    vdf = spark.createDataFrame([(v,) for v in set(vocab)], "tok string")
    got = sorted(
        (r.tok_a, r.tok_b) for r in fuzzy_token_pairs(vdf, "tok").collect()
    )
    a, b = vdf.alias("a"), vdf.alias("b")
    from pyspark.sql import functions as F

    brute = sorted(
        (r[0], r[1])
        for r in a.join(
            b,
            (F.col("a.tok") < F.col("b.tok"))
            & (F.levenshtein(F.col("a.tok"), F.col("b.tok")) <= 1),
        )
        .select("a.tok", "b.tok")
        .collect()
    )
    assert got == brute
    assert ("a", "b") in got and ("", "a") in got  # short-string blocks work
