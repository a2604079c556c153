"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same parquet
tables and compares row count, column names, and an order-insensitive
canonical value comparison — STRICTER than any plausible driver hash
(exact cell-by-cell equality after canonicalization), so passing here
implies passing the driver's check.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from stream_processor_spark.catalog import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        # Spark-written tables are DIRECTORIES of part files (the sf1+
        # rehearsal dirs); DuckDB needs the explicit glob form there.
        # Driver fixtures are single files — registered as-is.
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(float(v))
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (int,)):
        return f"i:{int(v)}"
    if isinstance(v, (bytes, bytearray)):
        return f"b:{bytes(v).hex()}"
    return f"s:{v}"


def canon_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False, name=None):
        rows.append(tuple(_canon_cell(_scalarize(v)) for v in row))
    rows.sort()
    return cols, rows


def _scalarize(v):
    # numpy scalars → python scalars; keeps _canon_cell simple
    if hasattr(v, "item") and not isinstance(v, (bytes, str)):
        try:
            return v.item()
        except Exception:
            return v
    if v is pd.NaT:
        return None
    if v is pd.NA:
        return None
    return v


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare(name: str, spark_df, oracle_sql_text: str, sf_dir: str) -> CompareResult:
    spdf = spark_df.toPandas()
    con = duck_con(sf_dir)
    try:
        dkdf = con.execute(oracle_sql_text).df()
    finally:
        con.close()

    if len(spdf) != len(dkdf):
        return CompareResult(name, False, f"row count: spark={len(spdf)} duckdb={len(dkdf)}")
    sp_cols, sp_rows = canon_frame(spdf)
    dk_cols, dk_rows = canon_frame(dkdf)
    if sp_cols != dk_cols:
        return CompareResult(name, False, f"columns: spark={sp_cols} duckdb={dk_cols}")
    if sp_rows != dk_rows:
        diffs = []
        for i, (a, b) in enumerate(zip(sp_rows, dk_rows)):
            if a != b:
                diffs.append(f"row {i}: spark={a} duckdb={b}")
            if len(diffs) >= 3:
                break
        return CompareResult(name, False, "values differ; first diffs:\n" + "\n".join(diffs))
    return CompareResult(name, True, f"{len(sp_rows)} rows")
