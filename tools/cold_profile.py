"""Cold-cost profiler: first-run wall time of ONE query in a fresh JVM,
split into construct (DataFrame build = analysis), explain (optimization +
physical planning), and execute (codegen + run), with optional whole-stage
codegen off for A/B.

Usage: python tools/cold_profile.py QUERY [--no-codegen] [sf_dir]
Prints one JSON line. Run once per query per process — cold means cold."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_meta_spark.registry import load_all
from iceberg_meta_spark.session import get_spark
from iceberg_meta_spark.sources.parquet import enable_cache


def main() -> int:
    name = sys.argv[1]
    no_cg = "--no-codegen" in sys.argv
    rest = [a for a in sys.argv[2:] if a != "--no-codegen"]
    sf_dir = rest[0] if rest else "/root/testdata/sf0.1"
    t_jvm = time.time()
    spark = get_spark("cold-profile", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if no_cg:
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
    enable_cache(False)
    jvm_s = time.time() - t_jvm
    spec = load_all()[name]
    t0 = time.time()
    df = spec.spark_fn(spark, sf_dir)
    t1 = time.time()
    df.sparkSession  # analysis already done at construction in classic mode
    plan = df._jdf.queryExecution().executedPlan()  # forces optimization+planning
    t2 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t3 = time.time()
    print(json.dumps({
        "query": name, "codegen": not no_cg, "jvm_s": round(jvm_s, 3),
        "construct_s": round(t1 - t0, 3), "plan_s": round(t2 - t1, 3),
        "execute_s": round(t3 - t2, 3), "total_s": round(t3 - t0, 3),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
