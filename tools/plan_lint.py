"""Fleet-wide physical-plan lint: every registered query, every plan.

The per-kernel plan tests pin the designed shapes; this sweep catches the
query nobody wrote a test for. For each registry entry it compiles the plan
at sf0.001 and flags the two patterns that are invisible locally and fatal
at 100 TB:

- ``CartesianProduct`` — an unkeyed join product (a BroadcastNestedLoopJoin
  of a 1-row bounds/total frame is NOT flagged: broadcasting one row is the
  designed idiom).
- ``Exchange SinglePartition`` feeding a Window/Sort — a global-ordering
  funnel. Queries where the single partition provably holds a BOUNDED frame
  (per-bucket aggregates, month grain, decile boundaries) are allowlisted
  with the reason inline.

Usage: ``python tools/plan_lint.py`` — prints one line per flagged query,
exits nonzero on any non-allowlisted finding. ``tests/test_plans.py``
runs the same sweep in CI.
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

# A single partition is acceptable ONLY when the frame it holds is bounded
# by design, independent of data scale. Keep reasons current.
SINGLE_PARTITION_ALLOWED: dict[str, str] = {
    # per-bucket prefix-max aggregate: rows == #buckets (bounded constant)
    "meta_overlap_sweepline": "window over per-bucket aggregate (#buckets rows)",
    "health_report": "sweep-line section: window over per-bucket aggregate",
    # exact global ntile is the documented driver-side twin; the _approx
    # twin is the deployment path (VERDICT r1 #2 — both ship)
    "user_value_deciles": "exact-ntile twin; user_value_deciles_approx is the scale path",
    # exact-median rank selection (operators/file_health._exact_median_frame):
    # same single-reducer funnel the exact `median` aggregate already had,
    # now codegen'd; meta_file_health_approx is the >10^8-files path
    "meta_file_health": "exact-median selection twin; meta_file_health_approx is the scale path",
    "iceberg_native_file_health": "exact-median selection over the manifest-entry frame (metadata-sized)",
    "user_value_pareto": "exact-ntile base (same twin reasoning) + a 10-row decile window",
    # metadata-sized frames: rows bounded independent of data scale
    "meta_snapshot_expiry": "rank over the snapshot log (O(snapshots/table); multi-table partitions by table)",
    "meta_retention_policy": "same snapshot-log recency rank as snapshot_expiry (metadata-sized; partition by table at multi-table scale)",
    "monthly_revenue_growth": "lag over month-grain frame (#months rows)",
    # two-stage retrieval: every window ranks the <=topk_bm25 candidate set
    "hybrid_retrieval": "rank windows over the <=25-row BM25 candidate set (bounded by construction)",
    # the span top-k is TakeOrderedAndProject (per-partition heaps); only the
    # <=20 surviving rows pass through the rank window
    "boilerplate_spans": "rank window over the <=top_k rows surviving a TakeOrdered limit",
}


def _has_global_window(p: str) -> bool:
    """True when a SinglePartition exchange feeds a (Sort→)Window chain —
    the every-row-through-one-task funnel. A SinglePartition exchange under
    a final AGGREGATE is benign (it carries one partial row per task and is
    how every global total works), so structure matters, not presence.
    """
    import re

    # details section: one block per node, "(N) Exchange" header then its
    # arguments — parse per block (a spanning lazy regex would attribute a
    # later exchange's SinglePartition to an earlier hashpartitioning one)
    single_ids = set()
    for block in re.split(r"\n(?=\(\d+\) )", p):
        m = re.match(r"\((\d+)\) Exchange\b", block)
        if m and "SinglePartition" in block:
            single_ids.add(m.group(1))
    if not single_ids:
        return False
    tree = p.split("\n\n")[0].splitlines()

    def node(line: str) -> tuple[str, str] | None:
        m = re.search(r"([A-Za-z]+) \((\d+)\)\s*$", line)
        return (m.group(1), m.group(2)) if m else None

    def indent(line: str) -> int:
        return len(line) - len(line.lstrip(" +-"))

    for i, line in enumerate(tree):
        n = node(line)
        if not n or n[0] != "Exchange" or n[1] not in single_ids:
            continue
        # walk up to the nearest shallower line = parent; then its parent
        chain = []
        depth = indent(line)
        for j in range(i - 1, -1, -1):
            d = indent(tree[j])
            if d < depth:
                pn = node(tree[j])
                if pn:
                    chain.append(pn[0])
                depth = d
                if len(chain) == 2:
                    break
        if chain[:1] == ["Window"] or chain[:2] == ["Sort", "Window"]:
            return True
    return False


def lint(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> list[tuple[str, str]]:
    from iceberg_meta_spark.registry import load_all
    from iceberg_meta_spark.session import get_spark

    # getOrCreate returns any ACTIVE session, so stopping here would kill a
    # caller's session (it did: one lint call in CI broke every later test).
    # Only stop what this function itself created.
    own_session = spark is None
    if own_session:
        spark = get_spark("plan-lint", cpus="4")
    findings: list[tuple[str, str]] = []
    for name, spec in load_all().items():
        try:
            df = spec.spark_fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            p = buf.getvalue()
        except Exception as exc:
            findings.append((name, f"plan error: {str(exc).splitlines()[0][:200]}"))
            continue
        if "CartesianProduct" in p:
            findings.append((name, "CartesianProduct"))
        if name not in SINGLE_PARTITION_ALLOWED and _has_global_window(p):
            findings.append((name, "unpartitioned Window over a SinglePartition exchange"))
        # Spark's [CURRENT ROW, UNBOUNDED FOLLOWING] frame rescans to the
        # partition end per row — O(rows²)/partition (PLANS.md pitfall,
        # measured 300×). The same value always comes from a DESC-ordered
        # GROWING frame; flag any plan that compiles the quadratic one.
        if "currentrow$(), unboundedfollowing$()" in p:
            findings.append((name, "O(n²) [currentRow, unboundedFollowing] window frame"))
    if own_session:
        spark.stop()
    return findings


def main() -> int:
    findings = lint()
    for name, what in findings:
        print(f"[FLAG] {name}: {what}", flush=True)
    print(f"{len(findings)} findings", flush=True)
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
