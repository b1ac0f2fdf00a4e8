#!/usr/bin/env python
"""Scale-up experiment: replicate the sf0.1 tables K× (facts get
shifted primary keys so uniqueness and join consistency hold; dims
stay fixed — fact growth against a stable dimension set, the
realistic shape) into a scratch dir, then run a subset of headline
queries at both scales and report the runtime ratio per query.

A scale-SAFE operator grows ≤~K× (most grow sublinearly thanks to
fixed overheads); anything superlinear is a red flag the plan gate
missed. Results print as one JSON line and feed PERF.md.

Usage: python scripts/scale_experiment.py [K] [out_dir] [--queries a,b,c]

``--queries`` (round 10): restrict to a named subset — the 32× sweep
runs the ~16 representative headline queries (full list too costly at
that scale); omitted = the full 85-query list used by the 8× sweep.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
# facts: (table, [key columns to shift per replica]); keys shifted by
# replica*OFFSET so PKs stay unique and intra-fact joins (orders ⋈
# lineitem on orderkey; events by event_id) stay consistent
FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]
OFFSET = 1_000_000_000

QUERIES = [
    "flagship_consolidation",
    "reconciliation",
    "dedup_exact_docs",
    "line_dedup",
    "duplicate_spans",
    "lm_quality",
    "minhash_lsh_pairs",
    "ann_lsh",
    "events_hourly",
    "bpe_merges",
    # round-4 second-session additions (all expected ~linear; the
    # similarity join is deliberately absent — its candidate count is
    # quadratic BY DESIGN on this fixed-vocabulary corpus, see PERF.md;
    # its pruning at a realistic vocabulary is measured separately by
    # scripts/ppjoin_pruning_experiment.py)
    "doc_chunks",
    "tfidf_top_terms",
    "corpus_curation_pipeline",
    "scd2_history",
    "cohort_retention",
    "ewma_values",
    "pagerank",
    "incremental_agg",
    # round-5 additions: the compact duplicate_spans (above) should now
    # hold its OUTPUT ~flat as replicas grow, not just its runtime
    # linear; probe-only index paths should grow with delta/candidates
    "regional_revenue",
    "apply_changelog",
    "training_examples_pipeline",
    "minhash_incremental",
    "ann_pq_prebuilt",
    "funnel_counts",
    # round-5 third-session additions. Note on triangle_count: part
    # keys are dims (fixed), so replicas regenerate the SAME edge set
    # K× before the dedup — the ratio measures pair-generation +
    # dedup-shuffle scaling over a fixed wedge workload (wedge growth
    # itself is bounded O(m^1.5) by orientation). Sketch queries must
    # stay ~linear-cost with BOUNDED output; the bloom bitmap build
    # grows with the (replicated) dim key count but stays m-capped.
    "triangle_count",
    "bloom_join_prune",
    "training_shards",
    "curriculum_interleave",
    "hll_distinct",
    "cms_heavy_hitters",
    "nation_trade_volume",
    "customer_distribution",
    # second-wave session additions: k_core/bfs re-derive their edge
    # set per round/level (dedup'd, so the graph is fixed across
    # replicas — see the triangle_count note); hll_incremental must
    # stay ~flat (64-row state merge + delta sketch); bm25/mad/
    # winsorize are linear passes
    "k_core",
    "bfs_reach",
    "bm25_search",
    "mad_outliers",
    "winsorized_stats",
    "hll_incremental",
    "relational_division",
    "sample_exact_k",
    # session-4 additions: cusum/transitions/trend/drift/quantiles/
    # decile/rrf are single-pass keyed aggs or reduced-frame windows
    # (expect ~linear or flatter); sssp/connected_components re-derive
    # a replica-fixed part graph like k_core/bfs (dims don't grow), so
    # their ratio measures pair-generation + iteration shuffle scaling
    "cusum_changepoints",
    "event_transitions",
    "trend_slope_per_user",
    "token_drift",
    "exact_quantiles_qty",
    "decile_lift",
    "rrf_fusion",
    "weighted_sample_k",
    "incremental_join",
    "sssp_weighted",
    "connected_components",
    "stickiness_dau_wau",
    "embedding_project",
    # round-7 additions. Dim-derived queries (spatial_radius_join,
    # fd_violations, corr over customer) are absent — their input is
    # replica-fixed. kll/kmv must stay ~linear with BOUNDED output;
    # profile/drift/entropy are single-agg passes over the orders
    # fact; topk_two_pass bounds its pass-2 frame at k*slices;
    # frequent_pairs' pair space is replica-fixed (same part sets)
    # while its support counts grow; bm25_incremental times
    # delta-tokenize + monoid merge + probe over the 8x corpus
    "kll_quantiles",
    "kmv_set_cardinality",
    "topk_two_pass",
    "psi_drift",
    "chi_square_cells",
    "mi_cells",
    "column_profile",
    "corr_matrix",
    "categorical_entropy",
    "acf_daily_orders",
    "key_skew_topk",
    "frequent_pairs",
    "seasonal_dow",
    "linreg_price",
    "bm25_incremental",
    # round-8 additions: impute_median/mad_outliers/winsorized now run
    # on the histogram-selection plan (windows over the (key ×
    # distinct-value) frame — expect ~linear scan cost, flat window
    # cost); rfm_segments on the fused multi_order_index; the approx
    # profile must stay a single sketch pass; the three TPC-H shapes
    # are join+agg plans expected ~linear
    "impute_median",
    "rfm_segments",
    "spend_gini",
    "column_profile_approx",
    "returned_items",
    "priority_late_orders",
    "blocking_suppliers",
    # holt is a linear per-key pass; edit-distance input is the fixed
    # customer dim (replica-invariant), so its ratio measures overhead
    "holt_trend",
    "edit_distance_pairs",
    # round-9 additions: the Q2/Q22/Q13/Q16/Q20 shapes are keyed or
    # broadcast joins + bounded aggs (expect ~linear); the d2
    # edit-distance and the fast-tier profiles run on fixed dims
    # (replica-invariant inputs measure overhead); dormant/customer
    # distribution grow with orders
    "edit_distance_pairs_d2",
    "min_cost_supplier",
    "dormant_high_balance",
    "customer_order_distribution",
    "supplier_part_offering",
    "promotion_candidate_suppliers",
    "duplicate_span_runs",
    "span_redacted_docs",
]


def build_scaled(spark, k: int, out_dir: str, multifile: bool = False) -> None:
    """``multifile=False`` coalesces each scaled fact to ONE file like
    the generated testdata (structural scan shape comparable to the
    raw sf dir). ``multifile=True`` (round-11, r10 verdict #7) keeps
    the natural 32-file layout — paired with timing the BASE scale on
    bench.py's splittable rewrite, so the ratio measures the ENGINE's
    scaling rather than single-file scan serialization."""
    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        shutil.copyfile(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, keys in FACTS.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        rep = df.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        for kcol in keys:
            rep = rep.withColumn(
                kcol, (F.col(kcol) + F.col("__r").cast("long") * OFFSET)
                .cast(dict(df.dtypes)[kcol])
            )
        (rep.drop("__r").repartition(8)
         .write.mode("overwrite").parquet(f"{out_dir}/{t}.tmp"))
        if multifile:
            (spark.read.parquet(f"{out_dir}/{t}.tmp").repartition(32)
             .write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet"))
            shutil.rmtree(f"{out_dir}/{t}.tmp")
            continue
        # single-file layout like the generated testdata (keeps the
        # structural scan shape comparable between the two scales)
        one = spark.read.parquet(f"{out_dir}/{t}.tmp").coalesce(1)
        one.write.mode("overwrite").parquet(f"{out_dir}/{t}.dir")
        part = [f for f in os.listdir(f"{out_dir}/{t}.dir")
                if f.endswith(".parquet")][0]
        shutil.move(f"{out_dir}/{t}.dir/{part}", f"{out_dir}/{t}.parquet")
        shutil.rmtree(f"{out_dir}/{t}.tmp")
        shutil.rmtree(f"{out_dir}/{t}.dir")


def best_of_2(fn, spark, sf_dir) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    args = list(sys.argv[1:])
    subset = None
    if "--queries" in args:
        i = args.index("--queries")
        subset = [q for q in args[i + 1].split(",") if q]
        del args[i:i + 2]
    multifile = "--multifile" in args
    if multifile:
        args.remove("--multifile")
    k = int(args[0]) if len(args) > 0 else 8
    out_dir = args[1] if len(args) > 1 else "/tmp/spark_graft_scale"
    spark = get_spark("scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    # build marker: a scratch built under a different layout, K, or
    # BASE content must not be silently reused — a --multifile run over
    # a stale singlefile dir would measure the very scan artifact the
    # flag removes, and a k=8 scratch timed under a k=32 label (or a
    # pre-regeneration BASE) reports wrong ratios (r11 review)
    def _build_tag(k_):
        import hashlib
        base_fp = hashlib.md5(repr(sorted(
            (f, os.stat(os.path.join(BASE, f)).st_mtime_ns,
             os.stat(os.path.join(BASE, f)).st_size)
            for f in os.listdir(BASE)
        )).encode()).hexdigest()[:12]
        return f"{'multifile' if multifile else 'singlefile'}:k={k_}:base={base_fp}"

    def ensure_scaled(k_, dir_):
        marker = f"{dir_}/._build"
        tag = _build_tag(k_)
        if os.path.exists(f"{dir_}/lineitem.parquet"):
            built = (open(marker).read().strip()
                     if os.path.exists(marker) else "?")
            if built != tag:
                raise SystemExit(
                    f"{dir_} was built as {built!r}, requested {tag!r} — "
                    "remove the dir (or pass a different out_dir) to rebuild"
                )
        else:
            build_scaled(spark, k_, dir_, multifile=multifile)
            with open(marker, "w") as fh:
                fh.write(tag)

    ensure_scaled(k, out_dir)
    qs = entrymod.queries()
    run_list = subset if subset else QUERIES
    unknown = sorted(set(run_list) - set(qs))
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    # warmup
    best_of_2(qs["pricing_summary"], spark, BASE)
    base_dir = BASE
    if multifile:
        # both scales through the SAME writer/layout (a 1x replica of
        # every fact, 32 files each) so the ratio isolates data growth
        base_dir = out_dir.rstrip("/") + "_base1"
        ensure_scaled(1, base_dir)
    results = {}
    for name in run_list:
        base_s = best_of_2(qs[name], spark, base_dir)
        big_s = best_of_2(qs[name], spark, out_dir)
        results[name] = {
            "base_sec": base_s,
            f"x{k}_sec": big_s,
            "ratio": round(big_s / base_s, 2),
        }
        print(f"## {name}: {base_s}s -> {big_s}s  ratio {results[name]['ratio']}"
              f" (data x{k})", flush=True)
    print(json.dumps({"k": k, "layout": "multifile" if multifile else "singlefile", "results": results}))


if __name__ == "__main__":
    main()
