"""Empirical scaling audit: wall time vs data scale for the bench queries.

PLANS.md argues each plan survives a 100× scale-up structurally; this tool
MEASURES it. Every bench-tagged query runs (warm, min-of-2) at three scale
factors spanning 100× in row count, and the log-log slope of wall time vs
scale factor is reported as the query's empirical scaling exponent:

- ``~0``  — overhead-bound at these sizes (fixed job cost dominates);
- ``~1``  — linear in data (the target for scans/aggregates/equi-joins);
- ``>1.3`` — super-linear: the flag to chase before a real 100 TB run
  (quadratic candidate generation, per-key state blowup, a global sort).

The exponent is fit between sf_mid and sf_high only (the low point is
pure overhead for almost every query and would bias slopes toward 0);
the low point still prints for context. Output: markdown table on
stdout — redirect into SCALING.md to commit the audit.

Usage: python tools/scale_probe.py [sf_low sf_mid sf_high]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_meta_spark.registry import load_all  # noqa: E402
from iceberg_meta_spark.session import get_spark  # noqa: E402
from iceberg_meta_spark.sources.parquet import enable_cache, load_table  # noqa: E402

BASE_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def timed(spark, fn, sf_dir: str) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = math.inf
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    dirs = sys.argv[1:4] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    sfs = [float(d.rsplit("sf", 1)[1]) for d in dirs]
    registry = load_all()
    bench = {n: s for n, s in registry.items() if "bench" in s.tags}
    spark = get_spark("scale-probe")
    enable_cache(True)
    for d in dirs:
        for t in BASE_TABLES:
            load_table(spark, d, t)
    rows = []
    for name, spec in bench.items():
        ts = [timed(spark, spec.spark_fn, d) for d in dirs]
        # slope between the two largest points; low point shown for context
        expo = math.log(ts[2] / ts[1]) / math.log(sfs[2] / sfs[1])
        rows.append((name, *ts, expo))
        print(
            f"| {name} | {ts[0]:.2f} | {ts[1]:.2f} | {ts[2]:.2f} | {expo:+.2f} |",
            file=sys.stderr, flush=True,
        )
    spark.stop()

    print(f"# SCALING — empirical wall-time exponents ({', '.join(map(str, sfs))})")
    print()
    print("Per bench query: warm min-of-2 wall seconds at each scale factor, and the")
    print("log-log slope fit between the two LARGEST scale points (the low point is")
    print("overhead-dominated). ~0 = overhead-bound, ~1 = linear (the target), >1.3 =")
    print("super-linear — investigate before a real 100x run.")
    print()
    print(f"| query | sf{sfs[0]} s | sf{sfs[1]} s | sf{sfs[2]} s | exponent |")
    print("|---|---|---|---|---|")
    for name, t0, t1, t2, expo in sorted(rows, key=lambda r: -r[4]):
        flag = " ⚠" if expo > 1.3 else ""
        print(f"| {name}{flag} | {t0:.2f} | {t1:.2f} | {t2:.2f} | {expo:+.2f} |")


if __name__ == "__main__":
    main()
