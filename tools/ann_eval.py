"""ANN quality harness: recall@k of every approximate variant vs brute force.

    python tools/ann_eval.py [sf_dir] [k]

Runs the exact baseline (`ann_cosine_topk`) and each approximate search
path — LSH buckets, IVF probe, PQ-ADC, IVF-PQ, IVF-PQ+refine — over the
same query set and reports per-query and mean recall@k, plus each variant's
wall time. The measurement a deployment runs before trading exactness for
throughput; `test_ann_eval_harness` keeps it runnable.

Expected shape on the SYNTHETIC corpus: near-uniform random vectors give
LOW recall for code-based variants at any codebook size (top-k gaps sit
below quantization error — see pipeline/pq.adc_topk's docstring); the
refinement stage recovers exact ordering within the probed region, so its
recall equals the probe's cell-coverage. On clustered real-model embeddings
recall is high (pinned by the cluster-corpus unit tests).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_meta_spark.registry import load_all
from iceberg_meta_spark.session import get_spark

VARIANTS = (
    "ann_lsh_bucketed",
    "ann_ivf_probe",
    "ann_pq_adc",
    "ann_ivf_pq",
    "ann_ivf_pq_refined",
)


def evaluate(spark, sf_dir: str, k: int = 5) -> dict[str, dict]:
    registry = load_all()

    def topk(name: str) -> tuple[dict[int, list[int]], float]:
        t0 = time.time()
        rows = registry[name].spark_fn(spark, sf_dir).collect()
        dt = time.time() - t0
        out: dict[int, list[int]] = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(int(r["neighbor_id"]))
        return out, dt

    exact, _ = topk("ann_cosine_topk")
    report: dict[str, dict] = {}
    for name in VARIANTS:
        if name not in registry:
            continue
        approx, dt = topk(name)
        shared = sorted(set(exact) & set(approx))  # variants may use their
        # own registered query sets; score only queries both ran
        if not shared:
            report[name] = {"recall_at_k": None, "per_query": {}, "sec": round(dt, 2)}
            continue
        per_q = {
            q: len(set(exact[q][:k]) & set(approx[q][:k])) / min(k, len(exact[q]))
            for q in shared
        }
        report[name] = {
            "recall_at_k": round(sum(per_q.values()) / len(per_q), 3),
            "per_query": {q: round(v, 2) for q, v in per_q.items()},
            "sec": round(dt, 2),
        }
    return report


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ann-eval", cpus="16")
    report = evaluate(spark, sf_dir, k)
    print(f"{'variant':24s} {'recall@'+str(k):>9s} {'sec':>6s}  per-query")
    for name, r in report.items():
        rec = "n/a" if r["recall_at_k"] is None else f"{r['recall_at_k']:.3f}"
        print(f"{name:24s} {rec:>9s} {r['sec']:6.2f}  {r['per_query']}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
