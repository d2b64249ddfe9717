"""Local mirror of the driver's t2 correctness gate.

Runs every registry query on Spark and its DuckDB oracle side-by-side at the
given scale factor and compares canonicalized results.

The driver's own artifact covers only the first 50 registrations; passing
``--json PATH`` writes the same-shaped artifact for EVERY query checked, so
each round can commit full-registry parity evidence
(CORRECTNESS_FULL_r*.json).

Usage: python tools/check_oracle.py [--json PATH] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from iceberg_meta_spark.session import get_spark
from tools.compare import compare_frames, duckdb_connect


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    names = args[1:] if args and args[0].startswith("/") else args

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    selected = names or list(qs)

    spark = get_spark("check-oracle", cpus="16")
    con = duckdb_connect(sf_dir)
    failed = 0
    report: dict[str, dict] = {}
    for name in selected:
        if name not in qs:
            print(f"[SKIP] {name}: unknown query", flush=True)
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            err = f"spark error: {str(e).splitlines()[0][:300]}"
            print(f"[FAIL] {name}: {err}", flush=True)
            report[name] = {"match": False, "spark_rows": None, "oracle_rows": None, "err": err}
            failed += 1
            continue
        if name not in oracles:
            print(f"[ROWS] {name}: {len(sdf)} rows (no oracle; rows-only)", flush=True)
            report[name] = {"match": None, "spark_rows": len(sdf), "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            err = f"duckdb error: {str(e).splitlines()[0][:300]}"
            print(f"[FAIL] {name}: {err}", flush=True)
            report[name] = {"match": False, "spark_rows": len(sdf), "oracle_rows": None, "err": err}
            failed += 1
            continue
        res = compare_frames(name, sdf, ddf)
        print(f"{res}  ({time.time()-t0:.1f}s)", flush=True)
        report[name] = {
            "match": res.ok,
            "spark_rows": res.rows_spark,
            "oracle_rows": res.rows_duck,
            "err": res.detail or None,
        }
        failed += not res.ok
    spark.stop()
    if json_path:
        with open(json_path, "w", encoding="utf-8") as fh:
            json.dump({"sf_dir": sf_dir, "n_queries": len(report), "results": report}, fh, indent=1)
        print(f"wrote {json_path}", flush=True)
    print(f"\n{'ALL OK' if not failed else f'{failed} FAILURES'} / {len(selected)} queries", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
