"""Dump .explain('formatted') for every bench-tagged query to a directory.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [sf_dir] [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt (deliverable for optimization rounds)."""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from iceberg_meta_spark.registry import load_all
from iceberg_meta_spark.session import get_spark


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    names = rest[1:] if rest and os.path.isdir(rest[0]) else rest
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-dump", cpus="8")
    registry = load_all()
    targets = names or [n for n, s in registry.items() if "bench" in s.tags]
    for name in targets:
        try:
            df = registry[name].spark_fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"[ok] {name}")
        except Exception as e:
            print(f"[ERR] {name}: {e}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
