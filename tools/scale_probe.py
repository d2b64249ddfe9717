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

Coverage rule (no silent caps): the default run measures bench-tagged
queries at three scale points; ``--all`` measures EVERY registered query at
the two largest points so no query ships without an empirical exponent.
The committed SCALING.md carries both tables.

Usage: python tools/scale_probe.py [--all] [--only a,b,c] [sf_low sf_mid sf_high]

``--only`` measures just the named queries at the two largest points with
the identical protocol — for appending rows for newly registered queries
without re-sweeping the whole registry.
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
    args = sys.argv[1:]
    probe_all = "--all" in args
    if probe_all:
        args.remove("--all")
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    dirs = args[:3] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    if probe_all or only:
        dirs = dirs[-2:]  # two largest points; full registry, one fit each
    sfs = [float(d.rsplit("sf", 1)[1]) for d in dirs]
    registry = load_all()
    if only:
        unknown = only - set(registry)
        if unknown:
            raise SystemExit(f"--only names not in registry: {', '.join(sorted(unknown))}")
        selected = {n: s for n, s in registry.items() if n in only}
    elif probe_all:
        selected = registry
    else:
        selected = {n: s for n, s in registry.items() if "bench" in s.tags}
    spark = get_spark("scale-probe")
    enable_cache(True)
    for d in dirs:
        for t in BASE_TABLES:
            load_table(spark, d, t)
    rows = []
    for name, spec in selected.items():
        try:
            ts = [timed(spark, spec.spark_fn, d) for d in dirs]
        except Exception as exc:
            print(f"| {name} | ERROR {str(exc).splitlines()[0][:120]} |", file=sys.stderr, flush=True)
            continue
        # slope between the two largest points; any lower point is context
        expo = math.log(ts[-1] / ts[-2]) / math.log(sfs[-1] / sfs[-2])
        rows.append((name, ts, expo))
        cells = " | ".join(f"{t:.2f}" for t in ts)
        print(f"| {name} | {cells} | {expo:+.2f} |", file=sys.stderr, flush=True)
    spark.stop()

    scope = "EVERY registered query" if probe_all else "bench query"
    print(f"# SCALING — empirical wall-time exponents ({', '.join(map(str, sfs))})")
    print()
    print(f"Per {scope}: warm min-of-2 wall seconds at each scale factor, and the")
    print("log-log slope fit between the two LARGEST scale points (lower points are")
    print("overhead-dominated). ~0 = overhead-bound, ~1 = linear (the target), >1.3 =")
    print("super-linear — investigate before a real 100x run.")
    print()
    hdr = " | ".join(f"sf{s} s" for s in sfs)
    print(f"| query | {hdr} | exponent |")
    print("|---|" + "---|" * (len(sfs) + 1))
    for name, ts, expo in sorted(rows, key=lambda r: -r[2]):
        flag = " ⚠" if expo > 1.3 else ""
        cells = " | ".join(f"{t:.2f}" for t in ts)
        print(f"| {name}{flag} | {cells} | {expo:+.2f} |")
    if probe_all:
        missing = sorted(set(registry) - {n for n, _, _ in rows})
        print()
        print(f"Coverage: {len(rows)}/{len(registry)} registered queries measured.")
        if missing:
            print(f"UNMEASURED (errors above): {', '.join(missing)}")


if __name__ == "__main__":
    main()
