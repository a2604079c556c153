"""Round-11 fixes under test.

- IVF/IVF-PQ append clustering: each append adds AT MOST one file per
  touched list (round-10's build-path one-file-per-list discipline
  extended to the append path), and `compact_ivf_lists` restores the
  exact one-file-per-list profile without changing served results.
- `compact_flat_index` right-sizes the unpartitioned sign/PQ tables.
- ADVICE guards: `hamming_query_indexed` raises on a missing query id;
  `_exact_pair_cosines` fails loudly when cand references vec_ids
  absent from the hydrated set; `sim_centroids` keeps string labels on
  the explode branch at any input size.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from tests.conftest import SF_SMALL


def _emb_dirs(tmp_path, spark, split=300):
    full_dir, a_dir = tmp_path / "full", tmp_path / "a"
    full_dir.mkdir(), a_dir.mkdir()
    src = os.path.join(SF_SMALL, "embeddings.parquet")
    shutil.copy(src, full_dir / "embeddings.parquet")
    emb = spark.read.parquet(src)
    emb.filter(f"vec_id < {split}").write.mode("overwrite").parquet(
        str(a_dir / "embeddings.parquet")
    )
    return str(a_dir), str(full_dir)


def test_ivf_append_adds_at_most_one_file_per_list(spark, tmp_path):
    """Round-11: the append path clusters the batch on list_id before
    insertInto, so N appends leave <= 1 + N files in any list partition
    (vs up-to-tasks files per touched list per append before the fix —
    the re-fragmentation VERDICT-r10 flagged)."""
    from stream_processor_spark.operators.annindex import (
        _partition_file_counts,
        append_ivf_index,
        compact_ivf_lists,
        ensure_ivf_index,
        ivf_query_indexed,
    )

    a_dir, full_dir = _emb_dirs(tmp_path, spark)
    lists_name, cent_name = ensure_ivf_index(spark, a_dir)
    base_counts = _partition_file_counts(spark, lists_name)
    assert base_counts and all(v == 1 for v in base_counts.values())

    emb = spark.read.parquet(
        os.path.join(SF_SMALL, "embeddings.parquet")
    ).filter("vec_id >= 300")
    n_appends = 3
    lo, hi = 300, 1000
    step = (hi - lo) // n_appends
    for i in range(n_appends):
        batch = emb.filter(
            f"vec_id >= {lo + i * step} and vec_id < {lo + (i + 1) * step}"
        )
        append_ivf_index(spark, lists_name, cent_name, batch)

    counts = _partition_file_counts(spark, lists_name)
    assert counts, "no list partitions found"
    assert all(v <= 1 + n_appends for v in counts.values()), counts

    qvec = np.asarray(
        spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
        .filter("vec_id = 0")
        .head()[1],
        dtype=np.float64,
    )
    before = [
        (r.vec_id, round(r.cosine, 12))
        for r in ivf_query_indexed(
            spark, lists_name, cent_name, qvec, nprobe=2, topk=10
        ).collect()
    ]

    n_lists = compact_ivf_lists(spark, lists_name)
    after_counts = _partition_file_counts(spark, lists_name)
    assert n_lists == len(after_counts) > 0
    assert all(v == 1 for v in after_counts.values()), after_counts

    after = [
        (r.vec_id, round(r.cosine, 12))
        for r in ivf_query_indexed(
            spark, lists_name, cent_name, qvec, nprobe=2, topk=10
        ).collect()
    ]
    assert after == before and len(after) == 10


def test_compact_ivf_lists_heals_replayed_append(spark, tmp_path):
    """LSM discipline: a foreachBatch retry lands the same batch twice;
    compaction dedups vec_id permanently and the serve equals the
    replay-free index."""
    from stream_processor_spark.operators.annindex import (
        append_ivf_index,
        compact_ivf_lists,
        ensure_ivf_index,
        ivf_query_indexed,
    )

    a_dir, _full = _emb_dirs(tmp_path, spark)
    lists_name, cent_name = ensure_ivf_index(spark, a_dir)
    batch = spark.read.parquet(
        os.path.join(SF_SMALL, "embeddings.parquet")
    ).filter("vec_id >= 300 and vec_id < 500")
    append_ivf_index(spark, lists_name, cent_name, batch)
    append_ivf_index(spark, lists_name, cent_name, batch)  # retry replay
    compact_ivf_lists(spark, lists_name)

    n_rows = spark.table(lists_name).count()
    n_distinct = (
        spark.table(lists_name).select("vec_id").distinct().count()
    )
    assert n_rows == n_distinct  # replay healed

    qvec = np.asarray(
        spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
        .filter("vec_id = 1")
        .head()[1],
        dtype=np.float64,
    )
    got = ivf_query_indexed(
        spark, lists_name, cent_name, qvec, nprobe=2, topk=10
    ).collect()
    assert len(got) == 10
    assert len({r.vec_id for r in got}) == 10  # no duplicate serves


def test_ivfpq_append_adds_at_most_one_file_per_list(spark, tmp_path):
    from stream_processor_spark.operators.annindex import (
        _partition_file_counts,
        append_ivfpq_index,
        compact_ivf_lists,
        ensure_ivfpq_index,
    )

    a_dir, _full = _emb_dirs(tmp_path, spark)
    codes_name, cent_name, books_name = ensure_ivfpq_index(spark, a_dir)
    emb = spark.read.parquet(
        os.path.join(SF_SMALL, "embeddings.parquet")
    ).filter("vec_id >= 300")
    for lo, hi in ((300, 500), (500, 700)):
        append_ivfpq_index(
            spark,
            codes_name,
            cent_name,
            books_name,
            emb.filter(f"vec_id >= {lo} and vec_id < {hi}"),
        )
    counts = _partition_file_counts(spark, codes_name)
    assert counts and all(v <= 3 for v in counts.values()), counts
    compact_ivf_lists(spark, codes_name)
    counts = _partition_file_counts(spark, codes_name)
    assert counts and all(v == 1 for v in counts.values()), counts


def test_compact_flat_index_bounds_sign_table_files(spark, tmp_path):
    from stream_processor_spark.operators.annindex import (
        append_sign_index,
        compact_flat_index,
        ensure_sign_index,
        hamming_query_indexed,
    )

    a_dir, _full = _emb_dirs(tmp_path, spark)
    (sig_name,) = ensure_sign_index(spark, a_dir)
    emb = spark.read.parquet(
        os.path.join(SF_SMALL, "embeddings.parquet")
    ).filter("vec_id >= 300 and vec_id < 600")
    append_sign_index(spark, sig_name, emb)
    # the replay-free serve is the contract compaction must restore
    before = [
        tuple(r)
        for r in hamming_query_indexed(
            spark, sig_name, query_vec_id=5, k=20
        ).collect()
    ]
    append_sign_index(spark, sig_name, emb)  # foreachBatch retry replay
    n_files = compact_flat_index(spark, sig_name)
    assert 0 < n_files <= spark.sparkContext.defaultParallelism
    n_rows = spark.table(sig_name).count()
    assert n_rows == spark.table(sig_name).select("vec_id").distinct().count()
    after = [
        tuple(r)
        for r in hamming_query_indexed(
            spark, sig_name, query_vec_id=5, k=20
        ).collect()
    ]
    assert after == before and len(after) == 20


def test_hamming_query_indexed_raises_on_missing_query_id(spark, tmp_path):
    from stream_processor_spark.operators.annindex import (
        ensure_sign_index,
        hamming_query_indexed,
    )

    a_dir, _full = _emb_dirs(tmp_path, spark)
    (sig_name,) = ensure_sign_index(spark, a_dir)
    with pytest.raises(ValueError, match="not found"):
        hamming_query_indexed(spark, sig_name, query_vec_id=10_000_000)


def test_exact_pair_cosines_rejects_foreign_candidate_ids(spark):
    """ADVICE-r11 (medium): searchsorted lookups must be validated —
    a cand pair referencing a vec_id outside the hydrated cand_ids set
    must raise, not silently score a neighboring vector."""
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.queries.llm_data import _exact_pair_cosines

    t = Tables(spark, SF_SMALL)
    e = t.embeddings
    cand = spark.createDataFrame(
        [(0, 10_000_000)], "id_a long, id_b long"
    )  # id_b not in the corpus
    cand_ids = spark.createDataFrame([(0,)], "vec_id long")
    df = _exact_pair_cosines(e, cand, cand_ids=cand_ids)
    with pytest.raises(Exception, match="absent from the hydrated"):
        df.collect()


def test_exact_pair_cosines_happy_path_unchanged(spark):
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.queries.llm_data import _exact_pair_cosines

    t = Tables(spark, SF_SMALL)
    e = t.embeddings
    cand = spark.createDataFrame(
        [(0, 1), (2, 3)], "id_a long, id_b long"
    )
    rows = {
        (r.id_a, r.id_b): r.cosine
        for r in _exact_pair_cosines(e, cand).collect()
    }
    assert set(rows) == {(0, 1), (2, 3)}
    assert all(-1.0 <= v <= 1.0 for v in rows.values())


def test_sim_centroids_string_labels_any_size(spark, monkeypatch):
    """ADVICE-r11: a string-labeled frame must produce identical
    centroids whether the size probe lands below or above the npkernel
    threshold — the large branch only accepts integral labels, so
    string labels take the explode path at ANY size."""
    from stream_processor_spark.operators import similarity as sim
    from stream_processor_spark.queries import llm_data

    rows = [
        ("a", [1.0, 0.0, 3.0]),
        ("a", [3.0, 2.0, 1.0]),
        ("b", [0.5, 0.5, 0.5]),
    ]
    emb = spark.createDataFrame(
        rows, "label string, embedding array<float>"
    )

    class T:
        embeddings = emb

    # @register returns the undecorated fn — call it directly
    impl = llm_data.sim_centroids

    small = sorted(tuple(r) for r in impl(T()).collect())
    # force the "large" branch decision: threshold 0 would route ANY
    # file-backed frame to npkernel; string labels must still explode
    monkeypatch.setattr(sim, "_NPK_BYTES_THRESHOLD", 0)
    monkeypatch.setattr(sim, "_input_bytes", lambda df: 10**12)
    large = sorted(tuple(r) for r in impl(T()).collect())
    assert small == large and len(small) == 6


def test_input_bytes_hadoop_fs_resolution(spark):
    """ADVICE-r11: _input_bytes resolves through the Hadoop FileSystem
    API — on the local scheme it must agree with os.path.getsize."""
    import os as _os

    from stream_processor_spark.operators import similarity as sim

    src = os.path.join(SF_SMALL, "embeddings.parquet")
    df = spark.read.parquet(src)
    got = sim._input_bytes(df)
    if _os.path.isdir(src):
        want = sum(
            _os.path.getsize(os.path.join(src, f))
            for f in _os.listdir(src)
            if f.endswith(".parquet")
        )
    else:
        want = _os.path.getsize(src)
    assert got == want > 0
    # non-file frames stay None (callers treat as "small")
    assert sim._input_bytes(spark.range(5)) is None


def test_dup_spans_spill_safe_twin_identical_on_pathological_skew(
    spark, tmp_path
):
    """VERDICT r10 ask #9: the fused collect_list member recovery holds
    all of a duplicated gram's windows in one aggregation buffer; the
    spill-safe window-count form must produce IDENTICAL spans — pinned
    here on a pathological corpus where one 10-gram repeats ~50k times
    (1000 docs x ~50 duplicated window starts), plus unique filler."""
    from stream_processor_spark.queries import curation_extra as ce

    boiler = " ".join(["dup"] * 60)  # 51 duplicated window starts/doc
    rows = [(i, f"u{i}a u{i}b u{i}c " + boiler + f" t{i}x t{i}y") for i in range(1000)]
    d_dir = tmp_path / "skew"
    d_dir.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(d_dir / "documents.parquet")
    )

    class T:
        documents = spark.read.parquet(str(d_dir / "documents.parquet"))

    fused = sorted(
        tuple(r)
        for r in ce._spans_from_dup_windows(
            ce._dup_windows_fast(T(), fused=True)
        ).collect()
    )
    spill = sorted(
        tuple(r)
        for r in ce._spans_from_dup_windows(
            ce._dup_windows_fast(T(), fused=False)
        ).collect()
    )
    assert fused == spill
    assert len(fused) == 1000  # every doc carries exactly one span
    # module-constant switch resolves at call time (monkeypatch works)
    import pytest

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(ce, "_DUP_SPANS_FUSED", False)
        via_const = sorted(
            tuple(r)
            for r in ce._spans_from_dup_windows(
                ce._dup_windows_fast(T())
            ).collect()
        )
    finally:
        mp.undo()
    assert via_const == fused


def test_graph_multiquery_rows_equal_single_serves(spark):
    """The batched walk shares READS, never beams: for every query_id
    the rows must equal the single-query serve exactly."""
    import numpy as np

    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.operators.graphann import (
        ensure_graph_index,
        graph_multi_query_indexed,
        graph_query_indexed,
    )

    sf = "/root/testdata/sf0.01"
    (edges_name,) = ensure_graph_index(spark, sf)
    t = Tables(spark, sf)
    qrows = (
        t.embeddings.filter("vec_id in (0, 1, 2)")
        .select("vec_id", "embedding")
        .collect()
    )
    queries = {int(r[0]): np.asarray(r[1], dtype=np.float64) for r in qrows}
    multi = graph_multi_query_indexed(spark, edges_name, queries).collect()
    by_q = {}
    for r in multi:
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.cosine))
    assert set(by_q) == {0, 1, 2}
    for q, qv in queries.items():
        single = [
            (r.vec_id, r.cosine)
            for r in graph_query_indexed(spark, edges_name, qv).collect()
        ]
        assert by_q[q] == single and len(single) == 10
