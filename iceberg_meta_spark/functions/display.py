"""Scalar display functions as pure Column expressions (reference F1-F6, F11).

Reference: utils.py:8-35 (format_bytes / format_timestamp / truncate_path),
formatters.py:50-56 (_format_net), tui/widgets.py:1091-1099 (_compact_number).
The reference computes these per-row in Python; here they are JVM-side column
expressions (whole-stage codegen, no Python workers on the hot path —
SURVEY §2.10).

Determinism note: fractional display values are built with *integer
arithmetic* (round-half-up via ``(v*10 + base/2) DIV base`` then digit
assembly) rather than float-to-string, so the same text is produced by any
engine — the DuckDB oracle mirrors these expressions exactly, and the
half-up rounding matches the reference's ``f'{x:.1f}'`` on non-half values
(1126 B -> '1.1 KB', not the truncated '1.0 KB').
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _one_decimal(scaled10: Column) -> Column:
    """Integer n*10 -> 'n.d' string."""
    return F.concat(
        (scaled10 / 10).cast("long").cast("string"),
        F.lit("."),
        (scaled10 % 10).cast("long").cast("string"),
    )


def _round10(v: Column, base: int) -> Column:
    """round(v*10/base) half-up, exact: the remainder is subtracted in LONG
    arithmetic first, so the one double division divides an exact multiple of
    ``base`` with a small quotient — bit-exact in any engine (plain
    ``(v*10/base).cast('long')`` loses integer precision past 2^53)."""
    x = v.cast("long") * 10 + base // 2
    return ((x - x % base) / base).cast("long")


def format_bytes(v: Column) -> Column:
    """F1: bytes -> '5.2 KB' (1024 steps, one rounded decimal, B..PB ladder;
    reference utils.py:8-14). Exact for inputs up to ~800 PB (v*10 must fit
    a BIGINT)."""
    KB, MB, GB, TB, PB = 1024, 1024**2, 1024**3, 1024**4, 1024**5
    return (
        F.when(v < KB, F.concat(_one_decimal(v * 10), F.lit(" B")))
        .when(v < MB, F.concat(_one_decimal(_round10(v, KB)), F.lit(" KB")))
        .when(v < GB, F.concat(_one_decimal(_round10(v, MB)), F.lit(" MB")))
        .when(v < TB, F.concat(_one_decimal(_round10(v, GB)), F.lit(" GB")))
        .when(v < PB, F.concat(_one_decimal(_round10(v, TB)), F.lit(" TB")))
        .otherwise(F.concat(_one_decimal(_round10(v, PB)), F.lit(" PB")))
    )


def compact_number(v: Column) -> Column:
    """F6: 1234567 -> '1.2M' (K/M/B, one rounded decimal; reference
    tui/widgets.py:1091-1099)."""
    K, M, B = 1_000, 1_000_000, 1_000_000_000
    return (
        F.when(v < K, v.cast("long").cast("string"))
        .when(v < M, F.concat(_one_decimal(_round10(v, K)), F.lit("K")))
        .when(v < B, F.concat(_one_decimal(_round10(v, M)), F.lit("M")))
        .otherwise(F.concat(_one_decimal(_round10(v, B)), F.lit("B")))
    )


def format_timestamp_us(us: Column) -> Column:
    """F2: epoch-micros -> 'YYYY-MM-DD HH:MM:SS UTC' (reference utils.py:17-25).

    Built on TIMESTAMP_NTZ so the session timezone can never leak in.
    """
    secs = (us / 1_000_000).cast("long")
    ntz = F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")
    return F.concat(
        F.date_format(F.timestamp_add("SECOND", secs, ntz), "yyyy-MM-dd HH:mm:ss"),
        F.lit(" UTC"),
    )


def truncate_path(p: Column, max_len: int = 60) -> Column:
    """F3: keep basename when the path is long ('…/file.parquet');
    reference utils.py:28-35."""
    return F.when(F.length(p) <= max_len, p).otherwise(
        F.concat(F.lit(".../"), F.regexp_extract(p, r"([^/]*)$", 1))
    )


def format_net(v: Column) -> Column:
    """F4: signed '+N' / '-N' delta formatting (reference formatters.py:50-56)."""
    return F.when(v > 0, F.concat(F.lit("+"), v.cast("long").cast("string"))).otherwise(
        v.cast("long").cast("string")
    )
