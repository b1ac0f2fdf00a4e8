#!/usr/bin/env python
"""Measure edit_distance_join's skew handling on an ADVERSARIAL
shared-prefix corpus (round-9 verdict task #1 "done" criterion).

Corpus: zero-padded sequential ids behind one constant prefix
("Account#000000001"-style) — every string shares the same first half,
so plain PassJoin's (length, segment, substring) equi-join funnels the
WHOLE table through one posting key: the naive candidate count is
|group_idx| x |group_probe| per hot key, quadratic in the corpus.

Measured here, at 1x (15k) and 8x (120k):
  - naive candidates: computed EXACTLY from the posting-group product
    sum (sum over keys of idx_count * probe_count) without running the
    quadratic join (at 8x it would be ~2e10 pairs);
  - refined candidates: the frequency-aware residual recursion's
    actual candidate count (run for real);
  - true pairs + wall time end-to-end.

Run: python scripts/edit_skew_experiment.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from smartbots_etl_facturas_spark.operators import linkage as L  # noqa: E402
from smartbots_etl_facturas_spark.session import get_spark  # noqa: E402


def corpus(spark, n):
    return spark.range(1, n + 1).select(
        F.col("id"),
        F.concat(F.lit("Account#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("s"),
    )


def naive_candidates(base, d):
    """Exact candidate count of the UNREFINED level-0 equi-join:
    sum over keys of idx_postings * probe_postings (computed by a
    reduced join of two counts frames, never materializing pairs)."""
    mains = base.filter(F.col("__L") >= d + 1)
    ic = L._edit_idx_level0(mains, d).groupBy("k").agg(F.count(F.lit(1)).alias("ci"))
    pc = L._edit_probe_level0(mains, d).groupBy("k").agg(F.count(F.lit(1)).alias("cp"))
    row = (
        ic.join(pc, "k")
        .agg(F.sum(F.col("ci") * F.col("cp")).alias("n"))
        .collect()[0]
    )
    return int(row["n"] or 0)


def main():
    spark = get_spark("edit-skew-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for label, n in (("1x", 15_000), ("8x", 120_000)):
        df = corpus(spark, n)
        base = df.select(
            F.col("id").alias("__id"), F.col("s").alias("__s"),
            F.length("s").alias("__L"),
        )
        naive = naive_candidates(base, 1)
        t0 = time.time()
        refined = L._edit_candidates(base, 1, 16_000_000, 6, 32).count()
        t_cand = time.time() - t0
        t0 = time.time()
        pairs = L.edit_distance_join(df, "id", "s").count()
        t_full = time.time() - t0
        out[label] = {
            "rows": n,
            "naive_candidates": naive,
            "refined_candidates": refined,
            "reduction": round(naive / max(refined, 1), 1),
            "true_pairs": pairs,
            "candidate_stage_sec": round(t_cand, 2),
            "end_to_end_sec": round(t_full, 2),
        }
        print(label, json.dumps(out[label]))
    r1, r8 = out["1x"], out["8x"]
    print(json.dumps({
        "metric": "edit_skew_experiment",
        "scale_ratio_8x_over_1x": {
            "refined_candidates": round(
                r8["refined_candidates"] / max(r1["refined_candidates"], 1), 2),
            "end_to_end_sec": round(
                r8["end_to_end_sec"] / max(r1["end_to_end_sec"], 1e-9), 2),
        },
        "naive_candidates_8x": r8["naive_candidates"],
        "refined_candidates_8x": r8["refined_candidates"],
    }))


if __name__ == "__main__":
    main()
