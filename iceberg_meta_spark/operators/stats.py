"""Single-pass correlation matrix from exact integer sufficient statistics.

Pearson correlation for every column pair in ONE aggregate over the table:
the five sufficient statistics per pair (n, Σx, Σy, Σx², Σy², Σxy) reduce
with map-side combine, and the k² correlations are pure arithmetic on the
1-row result. `F.corr` would give the same numbers per pair but (a) one
pass per pair and (b) float accumulation whose order varies with
partitioning — this form is deterministic on any engine and any
partitioning because every SUM is integer-exact.

Inputs must be INTEGER-valued columns (scale fixed-point data first:
cents, centi-percent, micros). Sums accumulate as DECIMAL(38,0) so a
100 TB table can't overflow a BIGINT Σx² (a 1e7-scale value squared is
1e14; times 1e10 rows is 1e24 — past int64, well inside 38 digits). The
final decimal→double conversions round the same exact integer on every
engine, and the remaining ops are scalar IEEE arithmetic — hash-gate safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def correlation_matrix(df: DataFrame, cols: list[str], digits: int = 6) -> DataFrame:
    """Pearson r for every unordered pair of ``cols`` -> (col_x, col_y,
    n_rows, corr) rows, NULL corr when either side has zero variance."""
    aggs = [F.count(F.lit(1)).cast(_DEC).alias("__n")]
    for c in cols:
        d = F.col(c).cast(_DEC)
        aggs.append(F.sum(d).alias(f"{c}__s"))
        aggs.append(F.sum(d * d).alias(f"{c}__ss"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(
            F.sum(F.col(a).cast(_DEC) * F.col(b).cast(_DEC)).alias(f"{a}__{b}__sxy")
        )
    one = df.agg(*aggs)

    def corr_expr(a: str, b: str):
        n = F.col("__n").cast("double")
        sx = F.col(f"{a}__s").cast("double")
        sy = F.col(f"{b}__s").cast("double")
        sxx = F.col(f"{a}__ss").cast("double")
        syy = F.col(f"{b}__ss").cast("double")
        sxy = F.col(f"{a}__{b}__sxy").cast("double")
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        return F.when(
            (var_x > 0) & (var_y > 0),
            F.round((n * sxy - sx * sy) / F.sqrt(var_x * var_y), digits),
        )

    packed = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_x"),
                        F.lit(b).alias("col_y"),
                        F.col("__n").cast("long").alias("n_rows"),
                        corr_expr(a, b).alias("corr"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("p")
    )
    return packed.select("p.*")
