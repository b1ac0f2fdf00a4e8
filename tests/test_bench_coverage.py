"""Structural perf-tripwire pins (VERDICT r9 #1): the bench query set
derives from the registry, and every registered query either has a
committed BENCH_FLOOR entry or a documented exclusion reason — so a new
queries() entry can never ship unarmed against the regression gate
(the r8/r9 recurring class: holt_trend, edit_distance_pairs, the span
pair all landed after the floor commit and ran a full round
unguarded).

No SparkSession needed: everything here is registry/file introspection.
"""

import json
import os

import bench
import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _floors():
    with open(os.path.join(REPO, "BENCH_FLOOR.json")) as fh:
        return json.load(fh)["queries"]


def test_every_registered_query_armed_or_excluded():
    """The gate itself: registered minus EXCLUDED ⊆ floored."""
    qs = entrymod.queries()
    headline = bench.headline_queries(qs)
    floors = _floors()
    unarmed = sorted(set(headline) - set(floors))
    assert unarmed == [], (
        f"registered queries with no floor and no exclusion: {unarmed} — "
        "run scripts/refloat_floors.py --only-missing on a quiet box"
    )


def test_exclusions_name_real_queries_with_reasons():
    """EXCLUDED cannot drift: every entry names a live registry query
    and carries a non-trivial reason string."""
    qs = entrymod.queries()
    stale = sorted(set(bench.EXCLUDED) - set(qs))
    assert stale == [], f"EXCLUDED names unknown queries: {stale}"
    for name, reason in bench.EXCLUDED.items():
        assert isinstance(reason, str) and len(reason) > 40, (
            f"EXCLUDED[{name!r}] needs a real documented reason"
        )


def test_headline_derivation_rejects_stale_exclusions():
    """A rename cannot silently shrink coverage: headline_queries
    raises when EXCLUDED names a query that no longer exists."""
    import pytest

    with pytest.raises(SystemExit, match="EXCLUDED"):
        bench.headline_queries({"only_query": lambda s, d: None})


def test_no_stale_floors():
    """Every floor entry is a registered query or a bench-generated
    fixture series (skew pair / layout controls)."""
    from scripts.check_floor_coverage import FIXTURE_SERIES

    qs = entrymod.queries()
    floors = _floors()
    stale = sorted(set(floors) - set(qs) - FIXTURE_SERIES)
    assert stale == [], f"floors for unknown queries: {stale}"


def test_skew_reprobe_clears_transient_direction_flip():
    """A flagged skew_speedup is re-probed before it stands (round-13:
    one quiet-box run recorded 0.75 whose immediate re-probes read
    3.86/2.05; round-14/ADVICE-r13: the re-probe itself is best-of-2
    fixture runs). Clearing first re-probe -> flag moves to cleared
    with the pair recorded under *_reprobe and no second run;
    persistently failing re-probes -> flag stands with both pairs."""
    # clears on the FIRST re-probe: ratio 6.0/3.0 = 2.0 >= bar 1.2
    reg = {"query": "skew_speedup", "sec": 0.75, "floor": 1.2, "ratio": None}
    timings, cleared, still = {}, [], []
    got = bench.reprobe_skew(
        lambda: {"skew_join_plain": 6.0, "skew_join_salted": 3.0},
        reg, timings, 1.2, cleared, still,
    )
    assert got == 2.0 and still == [] and cleared == [reg]
    assert reg["speedup_reprobe"] == 2.0 and reg["reprobed"] is True
    assert timings == {"skew_join_plain_reprobe": 6.0,
                       "skew_join_salted_reprobe": 3.0}

    # stands: BOTH re-probed ratios 3.0/3.0 = 1.0 < bar 1.2; both
    # measurement pairs recorded (*_reprobe and *_reprobe2)
    reg2 = {"query": "skew_speedup", "sec": 0.9, "floor": 1.2, "ratio": None}
    timings2, cleared2, still2 = {}, [], []
    got2 = bench.reprobe_skew(
        lambda: {"skew_join_plain": 3.0, "skew_join_salted": 3.0},
        reg2, timings2, 1.2, cleared2, still2,
    )
    assert got2 == 1.0 and cleared2 == [] and still2 == [reg2]
    assert timings2 == {"skew_join_plain_reprobe": 3.0,
                        "skew_join_salted_reprobe": 3.0,
                        "skew_join_plain_reprobe2": 3.0,
                        "skew_join_salted_reprobe2": 3.0}

    # a transient SECOND re-probe clears too (best-of-2 discipline)
    seq = iter([{"skew_join_plain": 3.0, "skew_join_salted": 3.0},
                {"skew_join_plain": 6.0, "skew_join_salted": 3.0}])
    reg3 = {"query": "skew_speedup", "sec": 0.9, "floor": 1.2, "ratio": None}
    timings3, cleared3, still3 = {}, [], []
    got3 = bench.reprobe_skew(
        lambda: next(seq), reg3, timings3, 1.2, cleared3, still3,
    )
    assert got3 == 2.0 and cleared3 == [reg3] and still3 == []


def test_refloat_merge_skips_reprobe_artifacts():
    """refloat_floors must never mint a floor for the conditional
    *_reprobe audit keys (they'd be stale on every clean run and trip
    test_no_stale_floors)."""
    from scripts.refloat_floors import merge_query_floors

    merged = merge_query_floors([
        {"queries": {"q1": 2.0, "skew_join_plain_reprobe": 5.0}},
        {"queries": {"q1": 1.5, "skew_join_salted_reprobe": 2.0,
                     "skew_join_plain_reprobe2": 4.0}},
    ])
    assert merged == {"q1": 1.5}
