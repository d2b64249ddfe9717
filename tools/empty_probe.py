"""Empty-input robustness sweep: every registered query on ZERO-row tables,
and every streaming foreachBatch sink on empty micro-batch sequences.

The classic production failure nobody tests: the upstream partition is
empty (a holiday, a broken crawler, a new tenant), and a query that was
green for months dies on a divide-by-zero, a collect()[0] on an empty
frame, or a codebook trained on nothing. This tool materializes an empty
(schema-identical) copy of every base table and runs EVERY registered
query against it — a query passes when it either returns rows or returns
an empty frame with its normal schema; any raised exception is a finding.

The streaming sweep (round-5 verdict #2 — the batch sweep missed the
foreachBatch state paths where the round-5 crash hid) drives every
parquet-state sink through the sequence
``empty@0 → rows@1 → empty@2 → rows@3``, which covers the three failure
shapes: an empty FIRST micro-batch (writes a zero-row state dir), a merge
against that empty state store, and an empty batch arriving after
non-empty state.

Usage: python tools/empty_probe.py [source_sf_dir]   (batch-query sweep)
       python tools/empty_probe.py --streaming       (streaming-sink sweep)
Exit code = number of failures.
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

# ---------------------------------------------------------------------------
# Streaming-sink sweep
# ---------------------------------------------------------------------------

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_FILES_SCHEMA = (
    "part_key string, file_path string, record_count long, file_size_in_bytes long"
)
_CDC_SCHEMA = (
    "user_id long, ts_us long, event_id long, event_type string, value_cents long"
)
_EMB_SCHEMA = "vec_id long, embedding array<double>, label int"

_LONG_TEXT = " ".join(f"tok{i}" for i in range(25))
_DOCS_ROWS = [
    (1, "alpha beta gamma delta", "en", "web", 22),
    (2, _LONG_TEXT, "en", "web", len(_LONG_TEXT)),
    (3, _LONG_TEXT + " tail", "de", "books", len(_LONG_TEXT) + 5),
]
_FILES_ROWS = [("a", "f1", 10, 100), ("a", "f2", 20, 200), ("b", "f3", 5, 50)]
_CDC_ROWS = [(1, 100, 7, "click", 25), (1, 90, 6, "view", 10), (2, 50, 8, "click", 5)]
_EMB_ROWS = [
    (1, [1.0, 0.0, 0.0, 0.0], 0),
    (2, [0.9, 0.1, 0.0, 0.0], 0),
    (3, [0.0, 0.0, 1.0, 0.0], 1),
]


def _streaming_sinks(spark, root: str):
    """(name, apply_fn, rows_df, empty_df) for every parquet-state
    foreachBatch sink in ``iceberg_meta_spark/streaming`` — keep this list
    in sync with ``grep -l 'def apply(batch' streaming/*.py``."""
    from iceberg_meta_spark.streaming.budget import budget_merge_sink
    from iceberg_meta_spark.streaming.cdc import upsert_sink
    from iceberg_meta_spark.streaming.drift import drift_sink, label_centroids
    from iceberg_meta_spark.streaming.incremental import stats_merge_sink
    from iceberg_meta_spark.streaming.lsh import lsh_dedup_sink
    from iceberg_meta_spark.streaming.quota import quota_merge_sink
    from iceberg_meta_spark.streaming.substring import substring_dedup_sink

    docs = spark.createDataFrame(_DOCS_ROWS, _DOCS_SCHEMA)
    files = spark.createDataFrame(_FILES_ROWS, _FILES_SCHEMA)
    cdc = spark.createDataFrame(_CDC_ROWS, _CDC_SCHEMA)
    emb = spark.createDataFrame(_EMB_ROWS, _EMB_SCHEMA)
    ref = label_centroids(emb, dims=4)
    return [
        ("incremental.stats_merge_sink",
         stats_merge_sink(f"{root}/stats"), files,
         spark.createDataFrame([], _FILES_SCHEMA)),
        ("budget.budget_merge_sink",
         budget_merge_sink(f"{root}/hist", budget_tokens=100), docs,
         spark.createDataFrame([], _DOCS_SCHEMA)),
        ("quota.quota_merge_sink",
         quota_merge_sink(f"{root}/keep", q=2), docs,
         spark.createDataFrame([], _DOCS_SCHEMA)),
        ("cdc.upsert_sink",
         upsert_sink(f"{root}/state"), cdc,
         spark.createDataFrame([], _CDC_SCHEMA)),
        ("lsh.lsh_dedup_sink",
         lsh_dedup_sink(f"{root}/sigs", f"{root}/dups"), docs,
         spark.createDataFrame([], _DOCS_SCHEMA)),
        ("substring.substring_dedup_sink",
         substring_dedup_sink(f"{root}/win", f"{root}/sstats"), docs,
         spark.createDataFrame([], _DOCS_SCHEMA)),
        ("drift.drift_sink",
         drift_sink(ref, f"{root}/drift", dims=4), emb,
         spark.createDataFrame([], _EMB_SCHEMA)),
    ]


# (scenario-name, which-batch); batch ids run 0..3 so the sequence is
# empty@0 → rows@1 → empty@2 → rows@3.
_SCENARIOS = (
    ("empty-first-batch", "empty"),
    ("merge-into-empty-state", "rows"),
    ("empty-after-nonempty-state", "empty"),
    ("merge-after-empty-batch", "rows"),
)


def run_streaming_sweep(
    spark, root: str
) -> tuple[list[str], list[tuple[str, str, str]]]:
    """Drive every sink through empty@0 → rows@1 → empty@2 → rows@3;
    returns (sink-names, findings) where each finding is
    (sink, scenario, error-head) — empty findings list = clean."""
    names: list[str] = []
    findings: list[tuple[str, str, str]] = []
    for name, apply_fn, rows, empty in _streaming_sinks(spark, root):
        names.append(name)
        for batch_id, (scenario, kind) in enumerate(_SCENARIOS):
            batch = empty if kind == "empty" else rows
            try:
                apply_fn(batch, batch_id)
            except Exception as exc:  # noqa: BLE001 — the report IS the handler
                head = str(exc).splitlines()[0][:160] if str(exc) else type(exc).__name__
                findings.append((name, scenario, head))
                if os.environ.get("EMPTY_PROBE_TRACE"):
                    traceback.print_exc()
                break  # later batches of a crashed sink are meaningless
    return names, findings


def streaming_main(spark=None) -> int:
    """Run the sweep and print one [OK]/[FAIL] line per sink. Pass an
    existing SparkSession (tests do) to reuse it; otherwise one is created
    and stopped here."""
    owns_session = spark is None
    if owns_session:
        spark = get_spark("empty-probe-streaming")
    root = tempfile.mkdtemp(prefix="empty_stream_")
    names, findings = run_streaming_sweep(spark, root)
    for n in names:
        bad = [f for f in findings if f[0] == n]
        if bad:
            print(f"[FAIL] {n}: {bad[0][1]}: {bad[0][2]}", flush=True)
        else:
            print(f"[OK  ] {n}", flush=True)
    print(f"\n{len(findings)} failures / {len(names)} streaming sinks")
    if owns_session:
        spark.stop()
    return len(findings)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--streaming"]
    if "--streaming" in sys.argv[1:]:
        return streaming_main()
    src = args[0] if args else "/root/testdata/sf0.001"
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
