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
    df: DataFrame, keys: list[str], x: str, y: str, scale: int = 1000
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

    Output is hash-gate-exact on ANY engine: slope and intercept are
    fixed-point LONGs (``slope_fp = slope·scale``, ``intercept_fp =
    intercept·scale``) computed by integer division (truncation toward
    zero — Spark ``div`` on DECIMAL and DuckDB ``//`` on HUGEINT agree,
    verified for negative numerators) over the EXACT decimal sufficient
    statistics. A double-rounded slope/intercept is not portable: at
    magnitudes ≥ ~1e10 a 6-decimal round demands more significant digits
    than IEEE-754 double carries, so two engines' last-ULP difference
    survives the round (caught live by tests/test_cross_engine_fuzz.py on
    an intercept at ~1.19e9). r² ∈ [0, 1] is magnitude-bounded, so a
    6-digit double round IS portable there (same convention as
    :func:`correlation_matrix`'s corr) — it stays a readable double.
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
    # exact integer moments: var_x, var_y, cov never leave DECIMAL(38,0)
    stats = agg.select(
        *keys,
        F.col("__n"),
        F.col("__sx"),
        F.col("__sy"),
        (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).alias("__vx"),
        (F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")).alias("__vy"),
        (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).alias("__cov"),
    )
    sc = f"CAST({int(scale)} AS DECIMAL(38,0))"
    vx_d = F.col("__vx").cast("double")
    vy_d = F.col("__vy").cast("double")
    cov_d = F.col("__cov").cast("double")
    return stats.select(
        *keys,
        F.col("__n").cast("long").alias("n_points"),
        F.when(F.col("__vx") > 0, F.expr(f"(__cov * {sc}) div __vx")).alias(
            "slope_fp"
        ),
        F.when(
            F.col("__vx") > 0,
            F.expr(f"((__sy * __vx - __cov * __sx) * {sc}) div (__n * __vx)"),
        ).alias("intercept_fp"),
        F.when(
            (F.col("__vx") > 0) & (F.col("__vy") > 0),
            F.round(cov_d * cov_d / (vx_d * vy_d), 6),
        ).alias("r2"),
    )
