#!/usr/bin/env python
"""Measures the PPJoin prefix+length filter's pruning on a REALISTIC
(Zipfian-vocabulary) corpus — the evidence PERF.md could not provide
from the committed 40-word-vocabulary testdata, where most pairs
genuinely match and candidates ≈ all pairs BY CONSTRUCTION.

Synthetic corpus: n docs, each with L distinct tokens drawn from a
Zipf(s≈1) vocabulary of V = 2·n types via deterministic inverse-CDF
sampling (rank = floor(V^u), u = xxhash64-uniform — token frequency
∝ 1/rank, the canonical natural-text shape). Everything is a Column
expression; no RNG state, so runs are reproducible.

For each corpus size the script reports the candidate-pair count from
``prefix_candidate_pairs`` (threshold 0.6, self-join) against the
n·(n-1) ordered pair space, the final match count, and wall time.
If the filter works, candidates/pairs FALLS as n grows (each rare
prefix token's posting list stays short while the pair space grows
quadratically) — strongly sub-quadratic candidates.

Usage: python scripts/ppjoin_pruning_experiment.py [sizes ...]
       (default 2000 8000 32000)
Prints one JSON line; results table lives in PERF.md.
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
THRESHOLD = 0.6


def zipf_docs(spark, n: int):
    """n docs × DOC_LEN tokens from a Zipf vocabulary of 2n types.

    u = xxhash64(doc, slot) mapped to [0,1); rank = 1 + floor(V^u)
    inverts the Zipf(s=1) CDF (P[rank<=r] ≈ ln r / ln V), so token
    'w<r>' appears with frequency ∝ 1/r. Duplicate ranks within a doc
    collapse via array_distinct — set semantics, like the operator.
    """
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
    # seed TRUE near-duplicates (~1%): a clone keeps all but the last
    # two tokens and adds two unique ones — Jaccard >= (L-2)/(L+2)
    # = 0.78 at L=20, so the join has real answers to find and the
    # candidate set provably contains them
    clones = base.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(
            F.slice("toks", 1, F.size("toks") - 2),
            F.array(F.concat(F.lit("u"), (F.col("doc_id") * 2).cast("string")),
                    F.concat(F.lit("u"), (F.col("doc_id") * 2 + 1).cast("string"))),
        ).alias("toks"),
    )
    return base.unionByName(clones)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 8000, 32000]
    spark = get_spark("ppjoin-pruning")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for n in sizes:
        docs = zipf_docs(spark, n).localCheckpoint()  # freeze the corpus
        n_total = docs.count()
        pair_space = n_total * (n_total - 1)
        t0 = time.perf_counter()
        cands = prefix_candidate_pairs(docs, docs, THRESHOLD).filter(
            F.col("left_id") != F.col("right_id")
        ).count()
        t_cand = time.perf_counter() - t0
        t0 = time.perf_counter()
        matches = jaccard_similarity_join(docs, docs, THRESHOLD).filter(
            F.col("left_id") != F.col("right_id")
        ).count()
        t_join = time.perf_counter() - t0
        results[n] = {
            "n_docs": n_total,
            "pair_space": pair_space,
            "candidates": cands,
            "cand_ratio": round(cands / pair_space, 6),
            "matches": matches,
            "cand_sec": round(t_cand, 2),
            "join_sec": round(t_join, 2),
        }
        print(f"## n={n}: candidates {cands:,} / pair space "
              f"{pair_space:,} = {cands / pair_space:.4%}  "
              f"(matches {matches}, {t_join:.1f}s)", flush=True)
    print(json.dumps({"threshold": THRESHOLD, "doc_len": DOC_LEN,
                      "results": results}))


if __name__ == "__main__":
    main()
