"""Empty-input robustness sweep: every registered query on ZERO-row tables.

The classic production failure nobody tests: the upstream partition is
empty (a holiday, a broken crawler, a new tenant), and a query that was
green for months dies on a divide-by-zero, a collect()[0] on an empty
frame, or a codebook trained on nothing. This tool materializes an empty
(schema-identical) copy of every base table and runs EVERY registered
query against it — a query passes when it either returns rows or returns
an empty frame with its normal schema; any raised exception is a finding.

Usage: python tools/empty_probe.py [source_sf_dir]
Exit code = number of failing queries.
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_meta_spark.registry import load_all  # noqa: E402
from iceberg_meta_spark.session import get_spark  # noqa: E402
from iceberg_meta_spark.sources import parquet  # noqa: E402

BASE_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("empty-probe")
    parquet.enable_cache(False)
    empty_dir = tempfile.mkdtemp(prefix="empty_sf_")
    for t in BASE_TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            f"{empty_dir}/{t}.parquet"
        )
    failures: list[tuple[str, str]] = []
    for name, spec in load_all().items():
        try:
            out = spec.spark_fn(spark, empty_dir)
            out.write.format("noop").mode("overwrite").save()
            print(f"[OK  ] {name}", flush=True)
        except Exception as exc:  # noqa: BLE001 — the report IS the handler
            head = str(exc).splitlines()[0][:160] if str(exc) else type(exc).__name__
            failures.append((name, head))
            print(f"[FAIL] {name}: {head}", flush=True)
            if os.environ.get("EMPTY_PROBE_TRACE"):
                traceback.print_exc()
    print(f"\n{len(failures)} failures / {len(load_all())} queries")
    for name, head in failures:
        print(f"  {name}: {head}")
    spark.stop()
    return len(failures)


if __name__ == "__main__":
    raise SystemExit(main())
