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


def grouped_ols(
    df: DataFrame, keys: list[str], x: str, y: str, digits: int = 6
) -> DataFrame:
    """Per-group least-squares line ``y = slope·x + intercept`` + r², from
    the same exact-integer sufficient statistics as
    :func:`correlation_matrix`, ONE aggregate per group.

    The grouped-regression shape for trend detection over 10⁹ series: no
    per-group sort, no window, no model library — five DECIMAL(38,0) sums
    reduce with map-side combine and the closed-form OLS solution is scalar
    arithmetic on each group's row. ``x``/``y`` must be integer-valued
    (scale fixed-point first). Groups with < 2 points or zero x-variance
    emit NULL slope/intercept/r2.
    """
    d = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast(_DEC).alias("__n"),
        F.sum(d(x)).alias("__sx"),
        F.sum(d(y)).alias("__sy"),
        F.sum(d(x) * d(x)).alias("__sxx"),
        F.sum(d(y) * d(y)).alias("__syy"),
        F.sum(d(x) * d(y)).alias("__sxy"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = cov / var_x
    return agg.select(
        *keys,
        F.col("__n").cast("long").alias("n_points"),
        F.when(var_x > 0, F.round(slope, digits)).alias("slope"),
        F.when(var_x > 0, F.round((sy - slope * sx) / n, digits)).alias("intercept"),
        F.when(
            (var_x > 0) & (var_y > 0), F.round(cov * cov / (var_x * var_y), digits)
        ).alias("r2"),
    )
