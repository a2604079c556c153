"""Oracle parity on a DIRTY documents fixture.

The driver's corpus is clean ASCII with single spaces and no NULLs, which
can hide tokenizer/NULL-semantics divergences between the Spark operators
and their DuckDB oracles (round-3 ADVICE: simhash whitespace-run split,
multimodal_resize NULL-payload sentinel). This suite rebuilds a tiny
sf-dir whose documents table contains whitespace runs, tabs/newlines,
empty strings, and NULL text, then replays the affected queries through
the SAME compare harness as the main parity suite.

Two fixture variants:
- full dirty set (incl. a unicode row) for tokenizer/text/dedup queries;
- ASCII-only dirty set for the multimodal payload queries, whose oracles
  are defined over ASCII text (byte ≡ char; DuckDB 1.0 has no md5(BLOB),
  so a byte-exact oracle over multi-byte text is not expressible — the
  engine itself is byte-correct either way).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from stream_processor_spark.catalog import TABLE_NAMES
from stream_processor_spark.queries import REGISTRY
from tests.conftest import SF_SMALL
from tests.oracle_harness import compare

DIRTY_TEXTS = [
    "plain single space tokens here",
    "double  space   runs    inside",
    " leading and trailing spaces ",
    "tab\tseparated\ttokens and\nnewlines mixed",
    "",
    None,
    "x",  # single token, below shingle/minhash minimums
    "repeat repeat repeat repeat repeat repeat",
    "the  quick   brown fox " * 8,  # long doc with runs
    "unicode café naïve 中文 tokens",
]

ASCII_DIRTY_TEXTS = [t for t in DIRTY_TEXTS if t is None or t.isascii()]

DIRTY_QUERIES = [
    "dedup_simhash",
    "dedup_near",
    "dedup_token_jaccard",
    "text_token_counts",
    "text_fingerprint",
    # continuation-session text operators (NULL text, empty docs,
    # whitespace runs must tokenize identically in both engines)
    "text_tfidf_topk",
    "corpus_shard_by_tokens",
    # round 6: the BPE-ish pre-tokenizer must split runs/tabs/newlines/
    # unicode identically under Java and RE2 (no lookahead, ASCII
    # classes — see _BPE_RE)
    "text_token_counts_bpe",
]

MULTIMODAL_QUERIES = [
    "multimodal_resize",
    "multimodal_features",
]


def _write_sf_dir(base_dir, texts):
    for name in TABLE_NAMES:
        src = os.path.join(SF_SMALL, f"{name}.parquet")
        if name != "documents" and os.path.exists(src):
            shutil.copy(src, base_dir / f"{name}.parquet")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(texts), type=pa.string()),
            "source": pa.array(
                [f"src{i % 3}" for i in range(len(texts))], type=pa.string()
            ),
            "n_chars": pa.array([len(t) if t else 0 for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, base_dir / "documents.parquet")
    return str(base_dir)


@pytest.fixture(scope="module")
def dirty_sf_dir(tmp_path_factory):
    return _write_sf_dir(tmp_path_factory.mktemp("dirty_sf"), DIRTY_TEXTS)


@pytest.fixture(scope="module")
def dirty_ascii_sf_dir(tmp_path_factory):
    return _write_sf_dir(tmp_path_factory.mktemp("dirty_ascii_sf"), ASCII_DIRTY_TEXTS)


@pytest.mark.parametrize("name", DIRTY_QUERIES)
def test_dirty_oracle_parity(spark, dirty_sf_dir, name):
    spec = REGISTRY[name]
    assert spec.oracle, f"{name} must have an oracle for this suite"
    result = compare(name, spec.fn(spark, dirty_sf_dir), spec.oracle, dirty_sf_dir)
    assert result.ok, f"{name}: {result.detail}"


@pytest.mark.parametrize("name", MULTIMODAL_QUERIES)
def test_dirty_multimodal_oracle_parity(spark, dirty_ascii_sf_dir, name):
    spec = REGISTRY[name]
    result = compare(
        name, spec.fn(spark, dirty_ascii_sf_dir), spec.oracle, dirty_ascii_sf_dir
    )
    assert result.ok, f"{name}: {result.detail}"


# ---- dirty RELATIONAL fixture: NULL join keys and NULL measures ----------

RELATIONAL_DIRTY_QUERIES = [
    "join_inner",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "agg_groupby_basic",
    "agg_having",
    "sort_orders",
]


@pytest.fixture(scope="module")
def dirty_rel_sf_dir(tmp_path_factory):
    """sf-dir whose orders/lineitem/customer carry NULL keys and NULL
    measures — SQL three-valued logic must agree between engines: NULL
    join keys match nothing (inner/semi) and survive as unmatched rows
    (left/anti); aggregates skip NULLs; a NULL-only group sums to NULL."""
    import duckdb

    d = tmp_path_factory.mktemp("dirty_rel_sf")
    for name in TABLE_NAMES:
        src = os.path.join(SF_SMALL, f"{name}.parquet")
        if os.path.exists(src):
            shutil.copy(src, d / f"{name}.parquet")
    con = duckdb.connect()
    # NULL o_custkey rows + one customer key matching nothing
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{SF_SMALL}/orders.parquet'
          UNION ALL
          SELECT 900001, NULL, 'X', NULL, TIMESTAMP '2024-01-01', '1-URGENT'
          UNION ALL
          SELECT 900002, NULL, 'X', 12.34, NULL, NULL
        ) TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{SF_SMALL}/lineitem.parquet'
          UNION ALL
          SELECT 900001, 1, 1, 1, NULL, NULL, NULL, NULL, 'N', 'O',
                 TIMESTAMP '2024-01-02'
          UNION ALL
          SELECT NULL, 1, 1, 2, 5.0, 100.0, 0.1, 0.0, 'Z', 'Z',
                 TIMESTAMP '2024-01-03'
        ) TO '{d}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize("name", RELATIONAL_DIRTY_QUERIES)
def test_dirty_relational_oracle_parity(spark, dirty_rel_sf_dir, name):
    spec = REGISTRY[name]
    assert spec.oracle
    result = compare(
        name, spec.fn(spark, dirty_rel_sf_dir), spec.oracle, dirty_rel_sf_dir
    )
    assert result.ok, f"{name}: {result.detail}"


# ---------------------------------------------------------- dirty events ----

DIRTY_EVENTS_QUERIES = [
    "ts_ewma_truncated",
    "ts_ohlc",
    "scd2_intervals",
    "ts_transition_matrix",
    "cdc_apply_lww",
]


@pytest.fixture(scope="module")
def dirty_events_sf_dir(tmp_path_factory):
    """Events fixture with the corners the clean generator never emits:
    NULL values, exactly-tied timestamps (tie-break must carry), a
    single-event user, and a user whose events all share one type."""
    import datetime as dt

    base = tmp_path_factory.mktemp("dirty_events_sf")
    for name in TABLE_NAMES:
        src = os.path.join(SF_SMALL, f"{name}.parquet")
        if name != "events" and os.path.exists(src):
            shutil.copy(src, base / f"{name}.parquet")

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: NULL value mid-stream + tied timestamps
        (1, t0, 1, "click", 1.25, "{}"),
        (2, t0, 1, "view", None, "{}"),          # NULL value
        (3, t0, 1, "click", -2.555, "{}"),       # tied ts, negative value
        (4, t0 + dt.timedelta(hours=1), 1, "purchase", 0.0, "{}"),
        # user 2: single event
        (5, t0, 2, "signup", 9.99, "{}"),
        # user 3: all same type (SCD2 must emit ONE interval)
        (6, t0, 3, "view", 1.0, "{}"),
        (7, t0 + dt.timedelta(minutes=5), 3, "view", 2.0, "{}"),
        (8, t0 + dt.timedelta(minutes=9), 3, "view", None, "{}"),
        # user 4: ends on the delete sentinel (cdc_apply_lww drops it)
        (9, t0, 4, "click", 5.0, "{}"),
        (10, t0 + dt.timedelta(minutes=1), 4, "purchase", 6.0, "{}"),
        # user 5: NULL value AT the partition head — ts_ewma_truncated's
        # den=0 corner (current row and all lags NULL): both engines
        # must emit NULL, not NaN (round-5 ADVICE)
        (11, t0, 5, "view", None, "{}"),
        (12, t0 + dt.timedelta(minutes=2), 5, "click", 3.5, "{}"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array([r[5] for r in rows], type=pa.string()),
        }
    )
    pq.write_table(tbl, base / "events.parquet")
    return str(base)


@pytest.mark.parametrize("name", DIRTY_EVENTS_QUERIES)
def test_dirty_events_oracle_parity(spark, dirty_events_sf_dir, name):
    spec = REGISTRY[name]
    assert spec.oracle, f"{name} must have an oracle for this suite"
    result = compare(
        name, spec.fn(spark, dirty_events_sf_dir), spec.oracle,
        dirty_events_sf_dir,
    )
    assert result.ok, f"{name}: {result.detail}"
