"""Round-13 surfaces: the round-12 ADVICE fixes (hamming multiquery
small-corpus fallback, graph_auto_params resilience, GIF assumed-palette
surfacing, Scala-ABI detection)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def test_hamming_multiquery_small_corpus_returns_all_rows(spark, tmp_path):
    """Round-12 ADVICE: a corpus with fewer than topk rows must return
    EVERY row per query (the old window plan's behavior), not an empty
    frame — the histogram threshold loop now falls back to the max
    hamming present when `need` is never satisfied."""
    from stream_processor_spark.queries.base import REGISTRY

    tiny = tmp_path / "tiny"
    tiny.mkdir()
    (
        spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
        .filter("vec_id < 5")
        .write.parquet(str(tiny / "embeddings.parquet"))
    )
    out = REGISTRY["sim_ann_hamming_multiquery"].fn(spark, str(tiny))
    rows = out.collect()
    # 3 queries x all 5 corpus rows — nothing dropped
    assert len(rows) == 15
    per_q = {}
    for r in rows:
        per_q.setdefault(int(r.query_id), set()).add(int(r.vec_id))
    assert per_q == {0: {0, 1, 2, 3, 4}, 1: {0, 1, 2, 3, 4}, 2: {0, 1, 2, 3, 4}}
    # each query's own vector is its hamming-0 hit
    for r in rows:
        if int(r.query_id) == int(r.vec_id):
            assert int(r.hamming) == 0


def test_graph_auto_params_missing_table_and_path_normalization(spark, tmp_path):
    """Round-12 ADVICE: (a) a corpus without embeddings.parquet reports
    the fixture profile instead of raising (the router's layout-name
    probe must never fail on a corpus that has no embeddings); (b) the
    corpus-size memo is keyed by the ABSOLUTE path, so spelling
    variants of the same directory share one count."""
    from stream_processor_spark.operators import graphann as ga

    empty = tmp_path / "noemb"
    empty.mkdir()
    assert ga.graph_auto_params(spark, str(empty)) == (ga.GRAPH_BITS, None)
    # un-countable corpora are not memoized (a later build would want
    # the real error, and the table may appear afterwards)
    assert os.path.abspath(str(empty)) not in ga._AUTO_N_CACHE

    variant = SF_SMALL.rstrip("/") + "/./"
    got = ga.graph_auto_params(spark, variant)
    assert got == ga.graph_auto_params(spark, SF_SMALL)
    # one memo entry for both spellings, keyed by the abspath
    key = os.path.abspath(SF_SMALL)
    assert key in ga._AUTO_N_CACHE
    assert os.path.abspath(variant) == key


def test_gif_assumed_palette_is_surfaced():
    """Round-12 ADVICE: the no-color-table grayscale fallback is an
    ASSUMPTION and must be visible — flags_out records it, and
    assume_palette=False restores the loud-failure (DLQ) path. A file
    WITH a palette sets no flag under either setting."""
    from stream_processor_spark.operators import multimodal as mm
    from stream_processor_spark.operators.gif import decode_gif, encode_gif

    idx = mm.gif_fixture_indices(5)
    no_table = encode_gif(idx, None, no_table=True)
    flags: dict = {}
    rgb = decode_gif(no_table, flags_out=flags)
    assert flags == {"assumed_palette": True}
    assert np.array_equal(rgb[:, :, 0], idx)
    with pytest.raises(ValueError, match="no color table"):
        decode_gif(no_table, assume_palette=False)

    pal = mm.gif_fixture_palette()
    with_table = encode_gif(idx, pal)
    flags = {}
    out = decode_gif(with_table, assume_palette=False, flags_out=flags)
    assert flags == {}
    assert np.array_equal(out, pal[idx])


def test_detect_scala_abi_matches_distribution():
    """The ABI suffix comes from the local distribution's scala-library
    jar (correct even on a Scala-2.13 Spark 3.x build); the version-line
    heuristic is only the no-jars fallback."""
    import glob
    import re

    from pyspark import __version__ as pv
    from pyspark.find_spark_home import _find_spark_home

    from stream_processor_spark.session import _detect_scala_abi

    got = _detect_scala_abi(pv)
    jars = sorted(
        glob.glob(os.path.join(_find_spark_home(), "jars", "scala-library-*.jar"))
    )
    if jars:
        m = re.search(r"scala-library-(\d+\.\d+)\.", os.path.basename(jars[0]))
        assert m and got == m.group(1)
    else:  # pragma: no cover - exotic layout
        assert got in ("2.12", "2.13")


def test_graph_serve_spark_fallback_matches_driver_walk(spark, monkeypatch):
    """The pruned-scan Spark path (non-local warehouses) must return
    EXACTLY the driver-walk rows — pins the fallback against rot, since
    every other test runs on a local warehouse and exercises only the
    pyarrow path."""
    import numpy as np

    from stream_processor_spark.operators import graphann as ga

    (name,) = ga.ensure_graph_index(spark, SF_SMALL)
    emb = spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
    q = np.asarray(emb.filter("vec_id = 7").head()[1], dtype=np.float64)
    qs = {0: q, 1: np.asarray(emb.filter("vec_id = 11").head()[1], np.float64)}

    fast = sorted(map(tuple, ga.graph_query_indexed(spark, name, q).collect()))
    fast_m = sorted(
        map(tuple, ga.graph_multi_query_indexed(spark, name, qs).collect())
    )
    monkeypatch.setattr(ga, "_local_graph_layout", lambda *a, **k: None)
    slow = sorted(map(tuple, ga.graph_query_indexed(spark, name, q).collect()))
    slow_m = sorted(
        map(tuple, ga.graph_multi_query_indexed(spark, name, qs).collect())
    )
    assert fast == slow and len(fast) == 10
    assert fast_m == slow_m and len(fast_m) == 20
