"""Local replica of the driver's duckdb-oracle correctness gate.

The driver runs each queries()[name] on Spark and oracle_sql()[name] on
DuckDB over the same parquet tables, then compares row-count + schema +
order-insensitive value hash (column order normalized by sorting names).
This module reproduces that comparison so tests catch mismatches before
the driver does.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from tiflash_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    """Dtype-STRICT normalization: the driver's value-hash distinguishes an
    int64 4 from a float64 4.0 (DuckDB SUM(int) → HUGEINT → fetchdf float64),
    so numeric cells are tagged by kind — int vs float vs Decimal never
    compare equal here, making local parity predict the driver gate."""
    if v is None:
        return None
    # pandas missing markers (nullable dtypes from fetchdf) ≡ SQL NULL
    if v is pd.NA or v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):  # includes numpy float64 (subclass)
        if math.isnan(v):
            # pandas can't distinguish NULL from NaN (DuckDB fetchdf uses
            # nan for NULL even in object columns); fold both to None
            return None
        # kill last-ulp noise from different summation orders
        return ("f", round(v, 9))
    if hasattr(v, "tolist"):  # numpy scalars / arrays → python, renormalize
        return _norm_cell(v.tolist())
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, int):
        return ("i", v)
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    return v


def normalize_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    """Raise AssertionError with a diff summary when Spark and DuckDB disagree."""
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duckdb={len(du)}"
    a, b = normalize_rows(sp), normalize_rows(du)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs (spark, duckdb): {diffs}")
