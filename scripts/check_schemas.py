#!/usr/bin/env python
"""Round-start testdata schema self-check.

The driver regenerates ``/root/testdata`` between rounds and has
changed physical types before (``events.ts``: timestamp[ns] in rounds
1-2, timestamp[us] since round 3). This script diffs every table's
parquet schema against the committed expectation
(``scripts/expected_schemas.json``) and fails fast with the exact
delta, so drift surfaces as ONE clear failure instead of thirty
cryptic parity/test errors.

Usage: python scripts/check_schemas.py [sf_dir ...]
       (default: every /root/testdata/sf* directory)

Exit 0 = all schemas match; exit 1 prints per-table diffs:
missing/unexpected columns, column-order changes, type changes.
"""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
EXPECTED_PATH = os.path.join(HERE, "expected_schemas.json")


def load_expected() -> dict[str, dict[str, list[str]]]:
    with open(EXPECTED_PATH) as f:
        raw = json.load(f)
    return {k: v for k, v in raw.items() if not k.startswith("_")}


def diff_table(path: str, expected: dict[str, list[str]]) -> list[str]:
    """Return human-readable problems for one parquet file ([] = ok)."""
    import pyarrow.parquet as pq

    if not os.path.exists(path):
        return [f"file missing: {path}"]
    schema = pq.read_schema(path)
    actual = [(f.name, str(f.type)) for f in schema]
    problems: list[str] = []
    actual_names = [n for n, _ in actual]
    exp_names = list(expected)
    if actual_names != exp_names:
        missing = [n for n in exp_names if n not in actual_names]
        extra = [n for n in actual_names if n not in exp_names]
        if missing:
            problems.append(f"missing columns: {missing}")
        if extra:
            problems.append(f"unexpected columns: {extra}")
        if not missing and not extra:
            problems.append(
                f"column ORDER changed: expected {exp_names}, got {actual_names}"
            )
    for name, typ in actual:
        allowed = expected.get(name)
        if allowed is not None and typ not in allowed:
            problems.append(
                f"column {name!r}: type {typ!r} not in allowed {allowed}"
            )
    return problems


def check_dir(sf_dir: str, expected_all: dict) -> list[str]:
    problems = []
    for table, expected in expected_all.items():
        for p in diff_table(os.path.join(sf_dir, f"{table}.parquet"), expected):
            problems.append(f"{sf_dir}/{table}: {p}")
    return problems


def main() -> int:
    dirs = sys.argv[1:] or sorted(glob.glob("/root/testdata/sf*"))
    if not dirs:
        print("no testdata directories found")
        return 1
    expected_all = load_expected()
    all_problems: list[str] = []
    for d in dirs:
        ps = check_dir(d, expected_all)
        print(f"{'DRIFT' if ps else 'OK  '}  {d}  ({len(expected_all)} tables)")
        all_problems.extend(ps)
    for p in all_problems:
        print(f"  {p}")
    if all_problems:
        print(
            "\nTestdata schema DRIFT detected — the harness regenerated "
            "/root/testdata with a changed schema. Update readers "
            "(sources/readers.py normalizers) and oracles first, then "
            "refresh scripts/expected_schemas.json."
        )
        return 1
    print("\nall testdata schemas match scripts/expected_schemas.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
