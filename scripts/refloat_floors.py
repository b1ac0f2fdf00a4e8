#!/usr/bin/env python
"""Re-record BENCH_FLOOR.json from quiet best-of-N bench runs on the
CURRENT machine class.

Round-7 context: the committed floors were recorded on a box ~1.5x
faster than the round-7 session's, which made that round's regression
analysis noisy (three re-probes, two judgment calls). This tool runs
`bench.py` N times back-to-back (run it on a QUIET machine — no
concurrent pytest/parity), takes the per-query MINIMUM across runs
(the reproducible cost of the plan), and rewrites BENCH_FLOOR.json:

  * `queries`  — new floors: min across runs for EVERY query the
    bench reports (queries that never had a floor get one now);
  * `history`  — the replaced floor sets, appended with their source
    notes, so the drift story stays auditable;
  * tolerance knobs (`relative_tolerance`, `hard_cap`,
    `min_skew_speedup`) carry over unchanged.

Usage: python scripts/refloat_floors.py [n_runs] (default 3)
       python scripts/refloat_floors.py --only-missing [n_runs]

``--only-missing`` (round 9): record floors ONLY for headline queries
that have none yet (new queries land unarmed against the regression
tripwire until their first recording); every existing floor is left
untouched, so the refloat cannot absorb a regression into the
baseline. The previous floor set still goes to history for audit.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR = os.path.join(REPO, "BENCH_FLOOR.json")


def merge_query_floors(runs: list[dict]) -> dict[str, float]:
    """Per-query minimum across bench runs — the reproducible cost of
    each plan. ``*_reprobe`` keys are skipped: they are conditional
    audit artifacts of a flagged run (the skew re-probe pair), not a
    benched series — a floor for them would be stale on every clean
    run."""
    merged: dict[str, float] = {}
    for r in runs:
        for q, sec in r["queries"].items():
            if q.endswith(("_reprobe", "_reprobe2")):
                continue
            merged[q] = min(merged.get(q, float("inf")), sec)
    return merged


def main() -> None:
    args = [a for a in sys.argv[1:]]
    only_missing = "--only-missing" in args
    args = [a for a in args if a != "--only-missing"]
    n = int(args[0]) if args else 3
    runs = []
    for i in range(n):
        print(f"bench run {i + 1}/{n} ...", file=sys.stderr)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, check=True,
        ).stdout.strip().splitlines()[-1]
        runs.append(json.loads(out))
    merged = merge_query_floors(runs)
    # ADVICE r13: when a run's own re-probe cleared a transient
    # skew_speedup flag, the re-probed ratio is the credible one —
    # recording the transient original would seed observed_skew_speedups
    # with a value the run itself disowned. Both are kept when present.
    skews = [
        {"skew_speedup": r.get("skew_speedup"),
         "skew_speedup_reprobe": r.get("skew_speedup_reprobe")}
        if r.get("skew_speedup_reprobe") is not None
        else r.get("skew_speedup")
        for r in runs
        if r.get("skew_speedup") or r.get("skew_speedup_reprobe")
    ]

    with open(FLOOR) as fh:
        old = json.load(fh)
    history = old.pop("history", [])
    # round-13 verdict #5: the old→new per-query ratio table rides the
    # history entry, so a refloat can never silently bake in a plan
    # regression — a query that RISES >1.3× while the median falls is
    # recorded as a warning that fails check_floor_coverage until a
    # human re-records it or documents the cause in notes.
    overlap = {q: merged[q] / old["queries"][q]
               for q in merged if q in old["queries"]
               and old["queries"][q] > 0}
    ratios_sorted = sorted(overlap.values())
    median_ratio = (
        ratios_sorted[len(ratios_sorted) // 2] if ratios_sorted else 1.0
    )
    # ADVICE r13: warn on the MEDIAN-NORMALIZED rise, regardless of the
    # median's direction — the old `median < 1.0` precondition disabled
    # the guard exactly when the box was slower than the previous
    # recording (the r13 session: median 1.106, 29 floors rose >1.3x
    # with zero warnings). A query whose floor rises >1.3x against the
    # run's own uniform drift is an outlier the machine cannot explain.
    norm = max(median_ratio, 1e-9)
    risers = sorted(q for q, r in overlap.items() if r / norm > 1.3)
    warnings = []
    if risers:
        warnings = [
            f"{q}: floor rose {overlap[q]:.2f}x ({overlap[q] / norm:.2f}x "
            f"median-normalized, median {median_ratio:.2f}x) — a plan "
            "regression may be riding this refloat; re-record on a quiet "
            "box or document the cause in notes, then clear "
            "refloat_warnings"
            for q in risers
        ]
        for w in warnings:
            print(f"WARNING: {w}", file=sys.stderr)
    history.append({
        "queries": old["queries"],
        "source": old.get("source"),
        "notes": old.get("notes"),
        "diff_to_next": {q: round(r, 3) for q, r in sorted(overlap.items())},
        "diff_median": round(median_ratio, 3),
    })
    if only_missing:
        added = {q: s for q, s in merged.items()
                 if q not in old["queries"]}
        merged = dict(old["queries"]) | added
        src = (
            f"refloat_floors.py --only-missing best-of-{n} quiet runs: "
            f"added floors for {sorted(added)}; all pre-existing "
            "floors carried unchanged (previous set under history)"
        )
    else:
        src = (
            f"refloat_floors.py best-of-{n} quiet runs; "
            "previous floors preserved under history"
        )
    new = {
        "source": src,
        "notes": old.get("notes"),
        "relative_tolerance": old.get("relative_tolerance", 1.5),
        "hard_cap": old.get("hard_cap", 3.0),
        "min_skew_speedup": old.get("min_skew_speedup", 2.0),
        "observed_skew_speedups": skews,
        "refloat_warnings": warnings,
        "queries": {q: round(s, 3) for q, s in sorted(merged.items())},
        "history": history,
    }
    with open(FLOOR, "w") as fh:
        json.dump(new, fh, indent=1)
    print(f"wrote {FLOOR}: {len(merged)} floors "
          f"(was {len(history[-1]['queries'])})", file=sys.stderr)


if __name__ == "__main__":
    main()
