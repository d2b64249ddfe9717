"""Spark 4 declarative SQL UDFs: the display functions callable from SQL.

``CREATE TEMPORARY FUNCTION name(args) RETURNS type RETURN <expr>`` (SQL
UDFs, Spark 4) registers a named function whose body is a Catalyst
EXPRESSION — no Python worker, no serialization boundary, inlined into
whole-stage codegen exactly like the Column versions in ``display.py``.
This closes the last gap for a SQL-first user of the reference: every F*
scalar is reachable from ``spark.sql(...)`` text, not just the DataFrame
API, and stays on the JVM hot path.

The bodies are generated FROM the Column implementations (compiled to SQL
text via ``Column.__repr__`` would be fragile; instead each body restates
the same integer-exact arithmetic — the parity test pins them equal row
for row against the Column versions, so they cannot drift).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

def _one_decimal(x: str) -> str:
    return (
        f"concat(CAST(({x}) DIV 10 AS STRING), '.', CAST(({x}) % 10 AS STRING))"
    )


def register_sql_functions(spark: SparkSession) -> None:
    """Register format_bytes / compact_number / format_net / truncate_path
    as SQL UDFs (temporary, session-scoped; idempotent via REPLACE)."""
    KB, MB, GB, TB, PB = 1024, 1024**2, 1024**3, 1024**4, 1024**5
    K, M, B = 1_000, 1_000_000, 1_000_000_000

    def r10(base: int) -> str:
        x = f"(v * 10 + {base // 2})"
        return f"CAST(({x} - {x} % {base}) / {base} AS BIGINT)"

    def dec(base: int) -> str:
        return _one_decimal(r10(base))

    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION format_bytes(v BIGINT)
        RETURNS STRING RETURN
        CASE WHEN v < {KB} THEN concat({_one_decimal("v * 10")}, ' B')
             WHEN v < {MB} THEN concat({dec(KB)}, ' KB')
             WHEN v < {GB} THEN concat({dec(MB)}, ' MB')
             WHEN v < {TB} THEN concat({dec(GB)}, ' GB')
             WHEN v < {PB} THEN concat({dec(TB)}, ' TB')
             ELSE concat({dec(PB)}, ' PB') END
        """
    )
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION compact_number(v BIGINT)
        RETURNS STRING RETURN
        CASE WHEN v < {K} THEN CAST(v AS STRING)
             WHEN v < {M} THEN concat({dec(K)}, 'K')
             WHEN v < {B} THEN concat({dec(M)}, 'M')
             ELSE concat({dec(B)}, 'B') END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION format_net(v BIGINT)
        RETURNS STRING RETURN
        CASE WHEN v > 0 THEN concat('+', CAST(v AS STRING))
             ELSE CAST(v AS STRING) END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION truncate_path(p STRING)
        RETURNS STRING RETURN
        CASE WHEN length(p) <= 60 THEN p
             ELSE concat('.../', regexp_extract(p, '([^/]*)$', 1)) END
        """
    )
