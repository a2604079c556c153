"""Key-lookup queries: the zone-map skipping layout vs the full scan.

The serving side of `operators/zonemap.py` — point and range lookups
on the `documents` table, registered as a scratch/indexed twin pair
(the round-6 convention: both variants hash against the SAME oracle,
so the layout can only change the plan, never the answer; the router
picks the indexed plan when the layout exists).

The probe keys are fixed across scales; keys beyond a fixture's
max doc_id simply match nothing on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processor_spark.queries.base import register

_KEYS = [1, 7, 103, 5003, 49999]
_LO, _HI = 10, 29

_COLS_SQL = "doc_id, lang, source, n_chars, md5(text) AS text_md5"

_POINT_ORACLE = f"""
    SELECT {_COLS_SQL} FROM documents
    WHERE doc_id IN ({", ".join(str(k) for k in _KEYS)})
    """

_RANGE_ORACLE = f"""
    SELECT {_COLS_SQL} FROM documents
    WHERE doc_id BETWEEN {_LO} AND {_HI}
    """


def _project(df):
    return df.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    )


@register("point_lookup", oracle=_POINT_ORACLE)
def point_lookup(t):
    """Point lookup by key, full-scan plan (the scratch twin).

    Catalyst pushes the ``IN`` filter to the parquet scan
    (PushedFilters), so row groups skip via footer stats — but every
    file of the table is still listed and its footer opened. The
    indexed twin (`point_lookup_indexed`) is the 100 TB answer.
    """
    return _project(t.documents.filter(F.col("doc_id").isin(_KEYS)))


@register("point_lookup_indexed", oracle=_POINT_ORACLE)
def point_lookup_indexed(t):
    """Point lookup through the zone-map manifest: only files whose
    [min,max] key span can contain a probe key are scanned — planning-
    time file skipping, the Snowflake/Delta/ClickHouse minmax pattern.
    Same oracle as `point_lookup`: the layout changes the plan only.

    Scale: the manifest is one row per file (KB-scale at any corpus
    size); a 5-key lookup on a million-file table reads ≤5 files.
    """
    from stream_processor_spark.operators.zonemap import lookup_by_keys

    return _project(lookup_by_keys(t._spark, t._dir, _KEYS))


@register("range_lookup_indexed", oracle=_RANGE_ORACLE)
def range_lookup_indexed(t):
    """Range lookup through the zone map: files intersecting [lo, hi]
    only — with the table range-clustered by key, that is
    ceil(span / rows-per-file) files regardless of corpus size."""
    from stream_processor_spark.operators.zonemap import lookup_by_range

    return _project(lookup_by_range(t._spark, t._dir, _LO, _HI))


@register("range_lookup", oracle=_RANGE_ORACLE)
def range_lookup(t):
    """Range lookup, full-scan plan (the scratch twin of
    `range_lookup_indexed` — same oracle, so the zone-map layout can
    only change the plan). Catalyst pushes the BETWEEN to the parquet
    scan; every file's footer is still opened, which is the cost the
    indexed twin removes at planning time."""
    return _project(
        t.documents.filter((F.col("doc_id") >= _LO) & (F.col("doc_id") <= _HI))
    )
