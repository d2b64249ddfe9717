"""Column profiler: one-pass ANALYZE-style statistics for any table.

The engine-side complement to `data_quality_checks` (which asserts named
constraints): profile EVERY column's shape — null share, exact distinct
count, numeric range, string length — in ONE aggregate pass, long format
(one row per column), so schema drift / null regressions / cardinality
explosions in a 100 TB ingest surface from a single shrinking job.

Scale notes:
- All metrics reduce in one `df.agg(...)`: Catalyst plans the multiple
  exact `countDistinct`s via EXPAND (k× row duplication through one
  shuffle) — the standard price of exact ANALYZE; pass ``approx=True`` to
  swap in HLL++ `approx_count_distinct` (single pass, no expand, the
  deployment default at petabyte scale — kept OFF where an engine-exact
  oracle comparison gates the result).
- The long format comes from exploding an array-of-structs built ON the
  1-row aggregate — the table is scanned once, not once per column.
- Ratios divide integer-exact sums cast to double, so the result is
  bit-reproducible across engines (no avg() accumulation-order variance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def column_profile(df: DataFrame, cols: list[str] | None = None, approx: bool = False) -> DataFrame:
    """Profile ``cols`` (default: all) -> one row per column:
    (column, n_rows, n_nulls, null_share, n_distinct, min_num, max_num,
    avg_len). ``min_num``/``max_num`` are double casts for numeric and
    timestamp (epoch micros) columns, NULL otherwise; ``avg_len`` is the
    mean string length over non-null values, NULL for non-strings."""
    dtypes = dict(df.dtypes)
    cols = cols or list(dtypes)
    distinct = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        t = dtypes[c].split("(")[0]
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"))
        aggs.append(distinct(F.col(c)).cast("long").alias(f"{c}__distinct"))
        if t in _NUMERIC:
            num = F.col(c)
        elif t == "timestamp":
            num = F.unix_micros(F.col(c))
        else:
            num = F.lit(None)
        aggs.append(F.min(num).cast("double").alias(f"{c}__min"))
        aggs.append(F.max(num).cast("double").alias(f"{c}__max"))
        str_len = F.length(F.col(c)) if t in ("string", "varchar") else F.lit(None)
        aggs.append(F.sum(str_len).cast("long").alias(f"{c}__sumlen"))
    one = df.agg(*aggs)
    packed = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"{c}__nulls").alias("n_nulls"),
                        F.when(F.col("__n") == 0, F.lit(0.0))
                        .otherwise(
                            F.round(F.col(f"{c}__nulls").cast("double") / F.col("__n"), 6)
                        )
                        .alias("null_share"),
                        F.col(f"{c}__distinct").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_num"),
                        F.col(f"{c}__max").alias("max_num"),
                        F.round(
                            F.col(f"{c}__sumlen").cast("double")
                            / (F.col("__n") - F.col(f"{c}__nulls")),
                            4,
                        ).alias("avg_len"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return packed.select("p.*")
