#!/usr/bin/env python
"""Regenerate CATALOG.md: one row per registered query — name, oracle
coverage, and the first sentence of the query's docstring. Run after
adding queries; the pytest guard (tests/test_catalog_fresh.py) fails
when the file is stale."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    m = re.search(r"(?<=[a-z0-9)\"'\]])\.(?:\s|$)", text)
    s = text[: m.end()].strip() if m else text
    return s if len(s) <= 400 else s[:397] + "..."


def render() -> str:
    qs, osql = entry.queries(), entry.oracle_sql()
    lines = [
        "# Query catalog (auto-generated — scripts/gen_catalog.py)",
        "",
        f"{len(qs)} registered queries, {len(osql)} with DuckDB value "
        "oracles (the rest are approximate/iterative tiers with "
        "oracle-checked invariant twins).",
        "",
        "| Query | Oracle | What it computes |",
        "|---|---|---|",
    ]
    for name in sorted(qs):
        mark = "value" if name in osql else "rows-only"
        lines.append(f"| `{name}` | {mark} | {first_sentence(qs[name].__doc__)} |")
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    out = os.path.join(REPO, "CATALOG.md")
    with open(out, "w") as fh:
        fh.write(render())
    print(f"wrote {out}")
