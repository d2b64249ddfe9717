"""Verify every fixture derivation produces identical rows in Spark & DuckDB."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from iceberg_meta_spark.session import get_spark
from iceberg_meta_spark.sources import fixtures
from tools.compare import compare_frames, duckdb_connect


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    spark = get_spark("check-fixtures", cpus="8")
    con = duckdb_connect(sf_dir)
    failed = 0
    for name in fixtures.CTE:
        sdf = fixtures.derive(spark, sf_dir, name).toPandas()
        ddf = con.execute(fixtures.cte_sql(name, "duckdb")).df()
        res = compare_frames(name, sdf, ddf)
        print(res)
        failed += not res.ok
    spark.stop()
    return failed


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
