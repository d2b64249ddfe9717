"""Planning-index-sized DataFrames as TRUE LocalRelations.

``spark.createDataFrame(list_of_rows)`` in classic PySpark parallelizes the
rows into ``defaultParallelism`` RDD partitions — so every tiny
planning-index frame (per-file sequence maps, delete descriptors, centroid
tables) plans a ``Scan ExistingRDD`` whose broadcast build runs a
32-task job (~0.3–0.5 s of pure scheduling on local[32], once per
broadcast, regardless of row count). Building from a pandas DataFrame
takes the Arrow conversion path instead, which lands as a
``LocalTableScan``: zero tasks, the literal rows ride the plan.

The helper is semantics-neutral: same rows, same schema (positional
column naming, ``dtype=object`` so None stays NULL in numeric columns);
empty inputs and shapes the Arrow converter rejects fall back to the
plain list path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_frame(spark: SparkSession, rows, ddl: str) -> DataFrame:
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], ddl)
    import pandas as pd

    try:
        return spark.createDataFrame(pd.DataFrame(rows, dtype=object), schema=ddl)
    except Exception as e:
        # The classic list path has different type-coercion/validation
        # behavior than the Arrow path, so a silent flip could mask a
        # schema bug — leave a trace when it happens (expected only for
        # shapes the Arrow converter rejects, e.g. nested NULL-only cols).
        import logging

        logging.getLogger(__name__).debug(
            "local_frame: Arrow path rejected (%s: %s); using classic "
            "createDataFrame for schema %r", type(e).__name__, e, ddl
        )
        return spark.createDataFrame(rows, ddl)
