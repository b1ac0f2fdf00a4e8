#!/usr/bin/env python
"""AQE width-collapse probe (round-10 verdict task #4).

The edit-distance fix uncovered a pathology class: a candidate-
generation join EMITS millions of rows from kilobyte-scale shuffle
inputs, AQE's byte-based coalescing sees the tiny input bytes and
funnels the whole explosion onto 1-4 cores (PERF.md r9: a 7 s
single stage at sf0.1). This probe sweeps the other candidate-
explosion operators for the same trap: it EXECUTES each query, then
walks the FINAL adaptive physical plan via py4j and reports, for
every materialized shuffle stage, the width AQE actually chose
(AQEShuffleRead partition count) next to the row count that came out
of it (numOutputRows metric) — a stage with width <= NARROW_W and
rows >= HEAVY_ROWS is flagged.

The interesting width is the one feeding the big downstream operator,
so rows are read from the shuffle-read node itself (what the next
stage consumed).

Usage: python scripts/check_stage_width.py [query ...]
       (default: the candidate-explosion suspects + the fixed control)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod
from smartbots_etl_facturas_spark.session import get_spark

DEFAULT = [
    "similarity_join",      # PPJoin prefix postings
    "minhash_lsh_pairs",    # banded (band, bucket) equi-join
    "spatial_radius_join",  # grid-cell equi-join
    "ngram_jaccard_pairs",  # inverted-index shingle self-join
    "edit_distance_pairs",  # the r9-fixed control (explicit repartition)
]
NARROW_W = 4
HEAVY_ROWS = 1_000_000


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def stage_widths(df) -> list[dict]:
    """(node, width, rows) for every AQEShuffleRead / shuffle stage in
    the EXECUTED adaptive plan. Call after an action on ``df``."""
    out = []
    stack = [df._jdf.queryExecution().executedPlan()]  # noqa: SLF001
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(node.executedPlan())
            continue
        if cls.endswith("QueryStageExec"):
            stack.append(node.plan())
            continue
        if cls == "AQEShuffleReadExec":
            width = node.partitionSpecs().size()
            rows = None
            try:
                m = node.metrics()
                if m.contains("numOutputRows"):
                    rows = m.apply("numOutputRows").value()
            except Exception:
                pass
            out.append({"node": cls, "width": int(width),
                        "rows": None if rows is None else int(rows)})
        elif cls == "ShuffleExchangeExec":
            # un-coalesced exchange: width = its output partitioning
            try:
                width = node.outputPartitioning().numPartitions()
            except Exception:
                width = None
            rows = None
            try:
                m = node.metrics()
                if m.contains("numOutputRows"):
                    rows = m.apply("numOutputRows").value()
            except Exception:
                pass
            out.append({"node": cls, "width": width,
                        "rows": None if rows is None else int(rows)})
        stack.extend(_children(node))
    return out


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stage-width-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    flagged_any = False
    for name in names:
        df = qs[name](spark, sf_dir)
        # aggregate on top so nothing ships to the driver; the
        # interesting join stages still run at their real widths
        agg = df.groupBy().count()
        n = agg.collect()[0][0]
        stages = stage_widths(agg)
        flags = [
            s for s in stages
            if s["width"] is not None and s["width"] <= NARROW_W
            and (s["rows"] or 0) >= HEAVY_ROWS
        ]
        flagged_any = flagged_any or bool(flags)
        print(json.dumps({
            "query": name, "result_rows": int(n),
            "stages": stages, "narrow_heavy": flags,
        }))
    return 1 if flagged_any else 0


if __name__ == "__main__":
    sys.exit(main())
