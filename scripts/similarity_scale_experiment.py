#!/usr/bin/env python
"""Output-controlled 32x scale evidence for `similarity_join`
(round-11, r10 verdict #6).

The replicated-corpus SCALE32 methodology cannot measure this
operator: K replicas give every document K exact copies, so TRUE
matches grow K^2 BY CONSTRUCTION (a dedup-first workload, not an
engine property). This experiment grows a Zipfian-vocabulary corpus
to 32x the base size with BOUNDED true-pair density instead: each
document draws DOC_LEN tokens from a Zipf(s~1) vocabulary of 2n types
(deterministic inverse-CDF over xxhash64 — reproducible, no RNG
state), and ~1% of documents get ONE seeded near-duplicate clone
(Jaccard (L-1)/(L+1) = 0.905 >= the 0.8 threshold), so the true
output grows LINEARLY with n while the pair space grows n^2.

Measured per scale, using the REGISTERED query's exact shape
(jaccard_similarity_join at threshold 0.8, two disjoint 1/6 sides):
candidate-pair count from the lossless prefix filter, match count,
and wall time. Subquadratic verdict: candidates at 32x vs base
against the 1024x pair-space growth.

Usage: python scripts/similarity_scale_experiment.py [base_n] [k]
       (default base_n=2000 k=32)
Prints one JSON line; the result row feeds SCALE32_r11.json + PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.linkage import (
    jaccard_similarity_join,
    prefix_candidate_pairs,
)
from smartbots_etl_facturas_spark.session import get_spark

DOC_LEN = 20
THRESHOLD = 0.8  # the registered similarity_join threshold


def zipf_docs_with_clones(spark, n: int):
    """n Zipf docs + ~1% single-token-swap clones (Jaccard ~0.9).

    Clones are made of LEFT-side originals (doc_id % 6 == 0) and get
    ids nudged onto the RIGHT side (% 6 == 3), so every clone pair
    straddles the join's two sides: the TRUE output grows linearly in
    n (one pair per cloned doc) while the pair space grows n^2 — the
    bounded-density corpus the r10 SCALE32 exclusion note prescribes.
    Id nudge is +n plus at most 5 (originals are 100 apart — no
    collisions)."""
    v = 2 * n
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, {DOC_LEN}), j -> concat('w', CAST("
                f"1 + CAST(pow({v}.0, (abs(xxhash64(id, j)) % 1000000) / 1000000.0) "
                f"AS BIGINT) % {v} AS STRING)))"
            )
        ).alias("toks"),
    )
    raw_clone_id = F.col("doc_id") + n
    right_clone_id = raw_clone_id + (3 - raw_clone_id % 6 + 6) % 6
    clones = base.filter(
        (F.col("doc_id") % 100 == 0) & (F.col("doc_id") % 6 == 0)
    ).select(
        right_clone_id.alias("doc_id"),
        F.concat(
            F.slice("toks", 1, F.size("toks") - 1),
            F.array(F.concat(F.lit("u"), F.col("doc_id").cast("string"))),
        ).alias("toks"),
    )
    return base.unionByName(clones)


def run_scale(spark, n: int) -> dict:
    docs = zipf_docs_with_clones(spark, n).localCheckpoint()
    left = docs.filter(F.col("doc_id") % 6 == 0)
    right = docs.filter(F.col("doc_id") % 6 == 3)
    nl, nr = left.count(), right.count()
    t0 = time.perf_counter()
    cands = prefix_candidate_pairs(left, right, THRESHOLD).count()
    t_cand = time.perf_counter() - t0
    t0 = time.perf_counter()
    matches = jaccard_similarity_join(left, right, THRESHOLD).count()
    t_join = time.perf_counter() - t0
    return {
        "n_docs": n, "n_left": nl, "n_right": nr,
        "pair_space": nl * nr,
        "candidates": cands,
        "cand_frac_of_pairs": round(cands / (nl * nr), 6) if nl * nr else None,
        "matches": matches,
        "cand_sec": round(t_cand, 2),
        "join_sec": round(t_join, 2),
    }


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("similarity-scale")
    spark.sparkContext.setLogLevel("ERROR")
    lo = run_scale(spark, base_n)
    hi = run_scale(spark, base_n * k)
    out = {
        "threshold": THRESHOLD, "doc_len": DOC_LEN, "k": k,
        "base": lo, "scaled": hi,
        "wall_ratio": round(hi["join_sec"] / lo["join_sec"], 2)
        if lo["join_sec"] else None,
        "candidate_ratio": round(hi["candidates"] / lo["candidates"], 2)
        if lo["candidates"] else None,
        "match_ratio": round(hi["matches"] / lo["matches"], 2)
        if lo["matches"] else None,
        "pair_space_ratio": round(hi["pair_space"] / lo["pair_space"], 2),
        "subquadratic": None,
    }
    # candidates growing slower than the pair space by >10x = the
    # prefix filter is doing its job at scale
    if out["candidate_ratio"] and out["pair_space_ratio"]:
        out["subquadratic"] = (
            out["candidate_ratio"] < out["pair_space_ratio"] / 10
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
