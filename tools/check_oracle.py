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
from iceberg_meta_spark.registry import load_all
from iceberg_meta_spark.session import get_spark
from tools.compare import compare_frames, duckdb_connect


# ---------------------------------------------------------------------------
# Tolerance gates for sketch queries (round-5 verdict #3).
#
# These four queries are approximate BY CONSTRUCTION (percentile_approx /
# Datasketches HLL), so no engine-portable hash oracle can exist: the sketch
# values depend on the engine's sketch implementation. Each instead gates
# against its EXACT twin's DuckDB oracle with the same tolerance its unit
# test pins, so the committed parity artifact itself proves the bound
# (previously the artifact said only `err: no_oracle`).
# ---------------------------------------------------------------------------

def _gate_file_health(sdf, ddf) -> str | None:
    """meta_file_health_approx: all non-sketch columns exactly equal to the
    exact twin's oracle; percentile_approx median within 1% relative."""
    if len(sdf) != 1 or len(ddf) != 1:
        return f"row counts {len(sdf)} vs {len(ddf)}"
    s, d = sdf.iloc[0], ddf.iloc[0]
    for c in ("file_count", "total_size", "min_size", "max_size", "avg_size",
              "small_files", "small_pct"):
        if s[c] != d[c]:
            return f"exact column {c}: {s[c]} vs {d[c]}"
    exact_med = float(d["median_size"])
    if abs(float(s["median_size"]) - exact_med) > 0.01 * max(abs(exact_med), 1.0):
        return f"median_size {s['median_size']} vs exact {exact_med} (>1% rel)"
    return None


def _gate_deciles(sdf, ddf) -> str | None:
    """user_value_deciles_approx: same decile set, same user total, per-
    decile counts within +/-1 (boundary-tie granularity), buckets value-
    ordered and non-overlapping."""
    s = {int(r.decile): r for r in sdf.itertuples()}
    d = {int(r.decile): r for r in ddf.itertuples()}
    if set(s) != set(d):
        return f"decile sets differ: {sorted(s)} vs {sorted(d)}"
    if sum(r.n_users for r in s.values()) != sum(r.n_users for r in d.values()):
        return "total n_users differ"
    for k in d:
        if abs(int(s[k].n_users) - int(d[k].n_users)) > 1:
            return f"decile {k}: n_users {s[k].n_users} vs {d[k].n_users} (>1)"
    for k in sorted(s)[:-1]:
        if not (s[k].max_cents <= s[k + 1].min_cents):
            return f"buckets {k},{k+1} overlap"
    return None


def _gate_doc_quantiles(sdf, ddf) -> str | None:
    """doc_length_quantiles_approx: per (lang, q_idx), sketch quantile
    within max(5% relative, 2.0 absolute) of the exact interpolated one."""
    s = {(r.lang, int(r.q_idx)): float(r.chars_q) for r in sdf.itertuples()}
    d = {(r.lang, int(r.q_idx)): float(r.chars_q) for r in ddf.itertuples()}
    if set(s) != set(d):
        return "(lang, q_idx) key sets differ"
    for k, v in d.items():
        if abs(s[k] - v) > max(0.05 * max(abs(v), 1.0), 2.0):
            return f"{k}: {s[k]} vs exact {v} (out of tolerance)"
    return None


def _gate_audience_overlap(sdf, ddf) -> str | None:
    """audience_overlap_hll: same pair set; HLL reach within max(3, 10%);
    inclusion-exclusion intersection within max(5, 20%) of exact."""
    s = {(r.type_a, r.type_b): r for r in sdf.itertuples()}
    d = {(r.type_a, r.type_b): r for r in ddf.itertuples()}
    if set(s) != set(d):
        return "pair sets differ"
    for k, e in d.items():
        g = s[k]
        if abs(int(g.reach_a_est) - int(e.reach_a)) > max(3, 0.1 * int(e.reach_a)):
            return f"{k}: reach_a_est {g.reach_a_est} vs {e.reach_a}"
        if abs(int(g.reach_b_est) - int(e.reach_b)) > max(3, 0.1 * int(e.reach_b)):
            return f"{k}: reach_b_est {g.reach_b_est} vs {e.reach_b}"
        if abs(int(g.both_users_est) - int(e.both_users)) > max(5, 0.2 * int(e.both_users)):
            return f"{k}: both_users_est {g.both_users_est} vs {e.both_users}"
    return None


def _gate_distinct_bigrams(sdf, ddf) -> str | None:
    """corpus_distinct_bigrams_hll: same lang set; HLL++ estimate within
    max(5, 10%) of the exact distinct count (the unit test pins the same
    bound)."""
    s = {r.lang: int(r.distinct_ngrams) for r in sdf.itertuples()}
    d = {r.lang: int(r.distinct_ngrams) for r in ddf.itertuples()}
    if set(s) != set(d):
        return f"lang sets differ: {sorted(s)} vs {sorted(d)}"
    for k, exact in d.items():
        if abs(s[k] - exact) > max(5, 0.1 * exact):
            return f"{k}: hll {s[k]} vs exact {exact} (out of 10% tolerance)"
    return None


# name -> comparator gate. The exact-twin query whose DuckDB oracle supplies
# ground truth comes from the REGISTRY (QuerySpec.tolerance_twin) — the
# registry contract (test_oracle_parity) requires every oracle-less query to
# declare its twin, and every declared twin to have a gate here, so a new
# approx query can't silently ship ungated.
SKETCH_GATES = {
    "meta_file_health_approx": _gate_file_health,
    "user_value_deciles_approx": _gate_deciles,
    "doc_length_quantiles_approx": _gate_doc_quantiles,
    "audience_overlap_hll": _gate_audience_overlap,
    "corpus_distinct_bigrams_hll": _gate_distinct_bigrams,
}


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
    specs = load_all()
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
            twin = specs[name].tolerance_twin
            if twin is not None and name in SKETCH_GATES:
                gate = SKETCH_GATES[name]
                ddf = None
                try:
                    ddf = con.execute(oracles[twin]).df()
                    detail = gate(sdf, ddf)
                except Exception as e:  # twin oracle or gate failure
                    detail = f"tolerance gate error: {str(e).splitlines()[0][:300]}"
                ok = detail is None
                tag = "OK" if ok else "FAIL"
                print(
                    f"[{tag}] {name}: tolerance-vs-exact-twin({twin})"
                    + ("" if ok else f": {detail}")
                    + f"  ({time.time()-t0:.1f}s)",
                    flush=True,
                )
                report[name] = {
                    "match": ok,
                    "spark_rows": len(sdf),
                    "oracle_rows": len(ddf) if ddf is not None else None,
                    "err": detail,
                    "gate": f"tolerance-vs-exact-twin({twin})",
                }
                failed += not ok
                continue
            if twin is not None:
                # a twin-declared query MUST have a comparator gate — falling
                # through to rows-only would ship a sketch ungated, which the
                # in-file contract forbids; fail loudly instead
                err = f"tolerance_twin={twin!r} declared but no SKETCH_GATES entry"
                print(f"[FAIL] {name}: {err}", flush=True)
                report[name] = {
                    "match": False,
                    "spark_rows": len(sdf),
                    "oracle_rows": None,
                    "err": err,
                }
                failed += 1
                continue
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
