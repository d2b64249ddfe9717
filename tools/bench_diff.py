"""Canary-normalized bench comparison (judge r10, "Next round" #7).

Reads two bench FULL artifacts (``BENCH_FULL_r*.json``), divides each
per-query time by its run's single-core sha256 canary
(``load.calib_sha256_100mb_ms``) to cancel machine-speed drift, and
reports the queries whose NORMALIZED ratio exceeds a threshold — turning
BASELINE.md's manual "normalize by the canary before calling anything a
regression" rule into a mechanical check.

Usage::

    python tools/bench_diff.py OLD.json NEW.json [--threshold 2.0]

Exit code 0 always (this is a reporter, not a gate — the judge reads the
verdict line); prints one JSON line::

    {"verdict": "ok" | "regressions", "canary_ratio": r,
     "threshold": t, "regressions": {q: {"old": s, "new": s,
     "normalized_ratio": r}}, "median_normalized_ratio": m}

Queries present in only one artifact are skipped (added/removed between
rounds, not regressions). Artifacts without a canary (pre-r10) fall back
to raw ratios with ``"canary_ratio": null``.
"""

from __future__ import annotations

import json
import statistics
import sys


def compare(old: dict, new: dict, threshold: float = 2.0) -> dict:
    c_old = (old.get("load") or {}).get("calib_sha256_100mb_ms")
    c_new = (new.get("load") or {}).get("calib_sha256_100mb_ms")
    # canary_ratio > 1 means the NEW run's box was slower; dividing the
    # raw new/old time ratio by it removes that machine component
    canary_ratio = (float(c_new) / float(c_old)) if c_old and c_new else None
    q_old = old.get("queries") or {}
    q_new = new.get("queries") or {}
    shared = sorted(set(q_old) & set(q_new))
    regressions: dict[str, dict] = {}
    ratios: list[float] = []
    for q in shared:
        t_old, t_new = float(q_old[q]), float(q_new[q])
        if t_old <= 0:
            continue
        r = t_new / t_old
        if canary_ratio:
            r /= canary_ratio
        ratios.append(r)
        if r > threshold:
            regressions[q] = {
                "old": t_old, "new": t_new, "normalized_ratio": round(r, 3),
            }
    return {
        "verdict": "regressions" if regressions else "ok",
        "canary_ratio": round(canary_ratio, 4) if canary_ratio else None,
        "threshold": threshold,
        "n_shared": len(shared),
        "median_normalized_ratio": (
            round(statistics.median(ratios), 4) if ratios else None
        ),
        "regressions": dict(
            sorted(regressions.items(),
                   key=lambda kv: kv[1]["normalized_ratio"], reverse=True)
        ),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        print("usage: python tools/bench_diff.py OLD.json NEW.json "
              "[--threshold 2.0]", file=sys.stderr)
        raise SystemExit(2)
    threshold = 2.0
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
    with open(args[0]) as fh:
        old = json.load(fh)
    with open(args[1]) as fh:
        new = json.load(fh)
    print(json.dumps(compare(old, new, threshold)))


if __name__ == "__main__":
    main()
