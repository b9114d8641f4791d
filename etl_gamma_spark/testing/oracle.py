"""Differential-oracle harness mirroring the driver's correctness gate.

Runs an engine DataFrame and a DuckDB SQL string over the same parquet
fixtures, then compares row count, column-name set, and an
order-insensitive canonicalized value multiset. Used by tests/ so every
`queries()` / `oracle_sql()` pair is verified locally before the driver
ever sees it.

Canonicalization notes: Spark's toPandas yields decimal.Decimal /
datetime.date objects while DuckDB's fetchdf yields float64 / datetime64 —
both sides are normalized to the same strings (numerics at 4dp fixed
point, midnight timestamps folded to dates) so only genuine value
differences fail.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..io import ALL_TABLES


def run_duckdb(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (int, np.integer, float, np.floating, decimal.Decimal)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        # kill negative zero / sub-tolerance negatives: '-0.0000' must
        # canonicalize equal to '0.0000'
        f = round(f, 4) + 0.0
        return f"{f:.4f}"
    if isinstance(v, dt.datetime):  # includes pd.Timestamp
        if v.time() == dt.time(0, 0) and getattr(v, "nanosecond", 0) == 0:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    return sorted(
        tuple(_canon(v) for v in t)
        for t in pdf[cols].itertuples(index=False, name=None)
    )


def compare(spark_df: DataFrame, oracle_sql: str, sf_dir: str) -> None:
    """Assert engine result == oracle result (schema names + values)."""
    sp = spark_df.toPandas()
    du = run_duckdb(oracle_sql, sf_dir)
    assert sorted(sp.columns) == sorted(du.columns), (
        f"column mismatch: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"row count: spark={len(sp)} duckdb={len(du)}"
    rs, rd = _rows(sp), _rows(du)
    diffs = [(a, b) for a, b in zip(rs, rd) if a != b]
    assert not diffs, f"value mismatch ({len(diffs)} rows); first 3: {diffs[:3]}"
