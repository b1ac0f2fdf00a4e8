#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect overhead). One tiny warmup query first so JVM
startup/codegen doesn't pollute the first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod
from smartbots_etl_facturas_spark.session import get_spark

HEADLINE = [
    "flagship_consolidation",
    "upsert_insert_only",
    "upsert_full_status",
    "reconciliation",
    "validation_valid",
    "dedup_first_wins",
    "take_while",
    "pricing_summary",
    "top_customers",
    "window_rank",
    "rollup_sales",
    "events_hourly",
    "dedup_exact_docs",
    "text_quality",
    "doc_fingerprint",
    "sessions",
    "asof_enrich",
    "range_join_counts",
    "cube_sales",
    "token_count",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "ann_bruteforce",
    "dedup_embedding",
    "multimodal_features",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark("smartbots-etl-facturas-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warmup: JVM + codegen + parquet footer caches
    _force(qs["pricing_summary"](spark, sf_dir))

    # best-of-2 per query: single-shot timings on a shared machine are
    # ±30% noisy; the minimum is the reproducible cost of the plan
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
