"""Local mirror of the driver's correctness compare.

Runs a Spark DataFrame and a DuckDB SQL side-by-side, sorts columns by name
and rows by all columns, and compares values exactly (floats: exact bitwise,
plus a tolerance diagnostic so we can tell "real mismatch" from "last-ulp").
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int
    rows_duck: int
    detail: str = ""

    def __str__(self) -> str:
        s = "OK  " if self.ok else "FAIL"
        return f"[{s}] {self.name}: spark={self.rows_spark} duck={self.rows_duck} {self.detail}"


_KIND_FAMILY = {
    "i": "int", "u": "int", "b": "bool", "f": "float",
    "M": "datetime", "m": "timedelta", "O": "object", "S": "object", "U": "object",
}


def _dtype_family(s: pd.Series) -> str:
    return _KIND_FAMILY.get(s.dtype.kind, s.dtype.kind)


def compare_frames(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> CompareResult:
    sdf, ddf = _canon(sdf), _canon(ddf)
    if list(sdf.columns) != list(ddf.columns):
        return CompareResult(name, False, len(sdf), len(ddf), f"columns differ: {list(sdf.columns)} vs {list(ddf.columns)}")
    if len(sdf) != len(ddf):
        return CompareResult(name, False, len(sdf), len(ddf), "row count differs")
    for col in sdf.columns:
        fa, fb = _dtype_family(sdf[col]), _dtype_family(ddf[col])
        # The driver's value hash is dtype-sensitive: a BIGINT 2 and a DOUBLE
        # 2.0 hash differently even though they compare numerically equal.
        # Mirror that by refusing int-vs-float (and any cross-family) column
        # pairs outright — EXCEPT when either side is object dtype, where the
        # per-value int/float guard below decides (pandas uses object for
        # nullable/decimal columns on both engines).
        if fa != fb and "object" not in (fa, fb):
            return CompareResult(
                name, False, len(sdf), len(ddf),
                f"dtype mismatch col={col}: spark {sdf[col].dtype} ({fa}) vs duck {ddf[col].dtype} ({fb})",
            )
    for col in sdf.columns:
        a, b = sdf[col], ddf[col]
        for i, (x, y) in enumerate(zip(a, b)):
            xn = x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NaT
            yn = y is None or (isinstance(y, float) and math.isnan(y)) or y is pd.NaT
            if xn or yn:
                if xn != yn:
                    return CompareResult(name, False, len(sdf), len(ddf), f"null mismatch col={col} row={i}: {x!r} vs {y!r}")
                continue
            if isinstance(x, float) or isinstance(y, float):
                # Value-level dtype guard for object columns: an int on one
                # side vs a float on the other is a driver hash mismatch even
                # when numerically equal (2 vs 2.0).
                xf = isinstance(x, float) or (hasattr(x, "dtype") and x.dtype.kind == "f")
                yf = isinstance(y, float) or (hasattr(y, "dtype") and y.dtype.kind == "f")
                if xf != yf:
                    return CompareResult(
                        name, False, len(sdf), len(ddf),
                        f"value dtype mismatch col={col} row={i}: {type(x).__name__} {x!r} vs {type(y).__name__} {y!r}",
                    )
                if float(x) != float(y):
                    close = math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-12)
                    return CompareResult(
                        name, False, len(sdf), len(ddf),
                        f"float mismatch col={col} row={i}: {x!r} vs {y!r} ({'within 1e-9 (ulp-level!)' if close else 'REAL'})",
                    )
            elif str(x) != str(y):
                return CompareResult(name, False, len(sdf), len(ddf), f"value mismatch col={col} row={i}: {x!r} vs {y!r}")
    return CompareResult(name, True, len(sdf), len(ddf))
