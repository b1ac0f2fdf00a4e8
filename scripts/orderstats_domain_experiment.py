#!/usr/bin/env python
"""Measure the histogram-selection domain-growth crossover (round-12
verdict #5): the exact-quantile tier (operators/orderstats.py) runs
its rank window on the REDUCED (key × distinct-value) frame, guarded
at MAX_DOMAIN_PER_KEY = 2M distinct values per group — a limit that
until now rested on the round-8 single-task window crossover
benchmark (ranking.SMALL_FRAME_ROWS), not on a domain-growth
experiment of THIS operator.

This script sweeps a synthetic continuous-ish column whose per-group
distinct count D grows toward (and past) the guard, at FIXED corpus
size, and times:

  exact   group_quantile_values(..., max_domain_per_key=None)
          — the guard lifted so the >2M points are measurable
  kll     kll_group_quantiles(k=256)
          — the approximate tier the guard's error message names

Run on a QUIET box (the floor-recording discipline). One JSON line
per (D, tier) with best-of-2 wall seconds; paste the table into
PERF.md's round-12 section and sanity-check the guard: the handoff
point is where the exact tier's window cost overtakes KLL's
corpus-pass cost.

Usage: python scripts/orderstats_domain_experiment.py [rows]
       (default 16_000_000 rows, 4 groups)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.orderstats import (
    group_quantile_values,
)
from smartbots_etl_facturas_spark.operators.quantiles import (
    kll_group_quantiles,
)
from smartbots_etl_facturas_spark.session import get_spark

PROBS = (("p50", 1, 2), ("p90", 9, 10))
DOMAINS = (10_000, 100_000, 500_000, 1_000_000, 2_000_000, 4_000_000)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    spark = get_spark("orderstats-domain-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    for d in DOMAINS:
        # per-group distinct count ≈ d: value = (id·PRIME mod d) scaled
        # into a continuous-looking double; 4 groups share the domain
        base = spark.range(rows).select(
            (F.col("id") % 4).alias("k"),
            ((F.col("id") * 2654435761) % d).cast("double").alias("v"),
        )
        for tier, fn in (
            ("exact", lambda df: group_quantile_values(
                df, ["k"], "v", PROBS, max_domain_per_key=None)),
            ("kll", lambda df: kll_group_quantiles(
                df, "k", "v", [0.5, 0.9])),
        ):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(base).collect()
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "domain_per_group": d, "rows": rows, "tier": tier,
                "best_sec": round(best, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
