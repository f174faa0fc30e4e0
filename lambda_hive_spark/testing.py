"""Local mirror of the driver's t2 oracle comparison
(`__spark_entry__.py`: row-count + schema + order-insensitive
value-hash), so t2 never sees a first-time failure (SURVEY.md §5.2).

Comparison is EXACT on values (the driver hashes; a hash has no
tolerance). The decimal-exact aggregation pattern (helpers.py) is what
makes exactness achievable for float aggregates.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from lambda_hive_spark.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the driver's pre-registered views.
    A `{t}.parquet` that is a DIRECTORY of part files (Spark sink
    layout, used by the multi-rowgroup bench corpus) is read via a
    glob — DuckDB's read_parquet doesn't descend into directories."""
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.datetime64):
        return pd.Timestamp(v).to_pydatetime()
    if isinstance(v, datetime):
        return v
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day)
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, np.bool_):
        return bool(v)
    return v


def _sort_key(row: tuple) -> tuple:
    key = []
    for v in row:
        if v is None:
            key.append((0, ""))
        elif isinstance(v, bool):
            key.append((1, str(int(v))))
        elif isinstance(v, (int, float)):
            key.append((2, f"{float(v):+.17e}"))
        elif isinstance(v, datetime):
            key.append((3, v.isoformat()))
        elif isinstance(v, tuple):
            key.append((4, str(v)))
        else:
            key.append((5, str(v)))
    return tuple(key)


def normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=_sort_key)
    return cols, rows


def assert_parity(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    spdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()
    scols, srows = normalize(spdf)
    dcols, drows = normalize(ddf)
    assert scols == dcols, f"[{name}] column mismatch: spark={scols} duckdb={dcols}"
    assert len(srows) == len(drows), f"[{name}] row count: spark={len(srows)} duckdb={len(drows)}"
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            diffs = [
                f"  col {c}: spark={x!r} duckdb={y!r}"
                for c, x, y in zip(scols, a, b)
                if x != y
            ]
            raise AssertionError(
                f"[{name}] value mismatch at sorted row {i}/{len(srows)}:\n" + "\n".join(diffs)
            )
