"""Local mirror of the driver's t2 correctness gate.

Runs every registry query on Spark and its DuckDB oracle side-by-side at the
given scale factor and compares canonicalized results.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from iceberg_meta_spark.session import get_spark
from tools.compare import compare_frames, duckdb_connect


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    names = args[1:] if args and args[0].startswith("/") else args

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    selected = names or list(qs)

    spark = get_spark("check-oracle", cpus="16")
    con = duckdb_connect(sf_dir)
    failed = 0
    for name in selected:
        if name not in qs:
            print(f"[SKIP] {name}: unknown query", flush=True)
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {str(e).splitlines()[0][:300]}", flush=True)
            failed += 1
            continue
        if name not in oracles:
            print(f"[ROWS] {name}: {len(sdf)} rows (no oracle; rows-only)", flush=True)
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {str(e).splitlines()[0][:300]}", flush=True)
            failed += 1
            continue
        res = compare_frames(name, sdf, ddf)
        print(f"{res}  ({time.time()-t0:.1f}s)", flush=True)
        failed += not res.ok
    spark.stop()
    print(f"\n{'ALL OK' if not failed else f'{failed} FAILURES'} / {len(selected)} queries", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
