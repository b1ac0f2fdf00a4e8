#!/usr/bin/env python
"""Round-gate check (VERDICT r9 #1): every registered query is ARMED —
it has a BENCH_FLOOR.json floor — or carries a documented exclusion
reason in bench.py's EXCLUDED map. Exits nonzero listing any unarmed
query, so a new queries() entry can never again ship without a perf
tripwire (r8: holt_trend/edit_distance_pairs; r9: the span pair all
landed after the floor commit and ran unguarded for a round).

Also flags stale floors (floor entries naming neither a registered
query nor a bench-generated fixture series) so renames stay auditable.

Usage: python scripts/check_floor_coverage.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# bench-generated series that are not queries() entries: the skew
# demonstration fixture pair and the multifile layout controls
FIXTURE_SERIES = {
    "skew_join_plain",
    "skew_join_salted",
    "flagship_consolidation_singlefile",
    "reconciliation_singlefile",
}


def main() -> int:
    import bench
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    headline = bench.headline_queries(qs)
    with open(os.path.join(REPO, "BENCH_FLOOR.json")) as fh:
        floor_doc = json.load(fh)
    floors = floor_doc["queries"]
    refloat_warnings = floor_doc.get("refloat_warnings") or []

    unarmed = sorted(set(headline) - set(floors))
    stale = sorted(set(floors) - set(qs) - FIXTURE_SERIES)
    overlap = sorted(set(bench.EXCLUDED) & set(floors))

    ok = True
    if unarmed:
        ok = False
        print(
            f"UNARMED ({len(unarmed)}): registered queries with no "
            "BENCH_FLOOR entry and no bench.py EXCLUDED reason — run "
            "scripts/refloat_floors.py --only-missing on a quiet box:"
        )
        for q in unarmed:
            print(f"  {q}")
    if stale:
        ok = False
        print(
            f"STALE ({len(stale)}): floors naming neither a registered "
            "query nor a bench fixture series (renamed or deleted "
            "query?):"
        )
        for q in stale:
            print(f"  {q}")
    if overlap:
        # informational: an excluded query with a historical floor is
        # harmless (the floor is simply never compared) but worth a line
        print(f"note: EXCLUDED queries with historical floors: {overlap}")
    if refloat_warnings:
        # round-13 verdict #5: a refloat that raised a floor >1.3×
        # while the median fell may have baked in a plan regression —
        # fail the gate until it is re-recorded or the cause is
        # documented and the warning cleared.
        ok = False
        print(f"REFLOAT WARNINGS ({len(refloat_warnings)}): a floor "
              "rose sharply against a falling median — investigate, "
              "then re-record or document and clear refloat_warnings:")
        for w in refloat_warnings:
            print(f"  {w}")
    if ok:
        print(
            f"floor coverage OK: {len(headline)} armed queries, "
            f"{len(bench.EXCLUDED)} documented exclusions, "
            f"{len(FIXTURE_SERIES & set(floors))} fixture series"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
