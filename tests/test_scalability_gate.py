"""Registry-wide deploy gate: every registered query's physical plan
must pass the plan doctor (plans/doctor.py) — no cartesian products,
no unpartitioned windows, no nested-loop joins — except the
explicitly-allowlisted cases below, each with its design
justification. A new query (or a refactor of an old one) that
introduces a scale anti-pattern fails here even while its correctness
oracle stays green."""

import pytest

import __spark_entry__ as entry
from smartbots_etl_facturas_spark.plans.doctor import plan_report

# query name -> (allowed flags, why this is intentional)
ALLOW: dict[str, tuple[set, str]] = {
    "edit_distance_pairs": (
        {"bnlj"},
        "short-string side channel of edit_distance_join: a broadcast "
        "crossJoin over DISTINCT VALUES of length <= max_dist vs "
        "length <= 2*max_dist — bounded by the tiny string DOMAIN "
        "(alphabet^(2d)), not the row count; the main candidate path "
        "is the keyed (length, segment, substring) equi-join",
    ),
    "edit_distance_pairs_d2": (
        {"bnlj"},
        "short-string side channel, domain-bounded (see "
        "edit_distance_pairs)",
    ),
    "ann_bruteforce": (
        {"bnlj"},
        "exact-scoring tier: repartitioned broadcast crossJoin IS the "
        "algorithm (oracle-checkable ground truth; LSH/IVF are the scale path)",
    ),
    "dedup_embedding": (
        {"bnlj"},
        "exact all-pairs tier kept solely as oracle ground truth; "
        "bucket_bits>0 flips to the hyperplane-bucket join",
    ),
    "ann_lsh_recall": (
        {"bnlj"},
        "recall HARNESS: compares the bucketed ANN against the "
        "brute-force ground truth, which needs the exact tier",
    ),
    "ann_ivf_recall": (
        {"bnlj"},
        "recall harness vs brute-force ground truth (see ann_lsh_recall)",
    ),
    "ann_pq_recall": (
        {"bnlj"},
        "recall harness vs brute-force ground truth (see ann_lsh_recall)",
    ),
    "ann_pq_prebuilt_recall": (
        {"bnlj"},
        "recall harness vs brute-force ground truth (see ann_lsh_recall)",
    ),
    "minhash_precision": (
        {"bnlj"},
        "precision harness: joins LSH candidates against the exact "
        "n-gram-Jaccard ground truth",
    ),
    "minhash_incremental_precision": (
        {"bnlj"},
        "precision harness vs exact ground truth (see minhash_precision)",
    ),
    "minhash_incremental": (
        {"bnlj"},
        "broadcast of the 1-row hash-seed grid on the DELTA sketch "
        "(IdentityBroadcastMode crossJoin, see minhash_lsh_pairs); the "
        "candidate join is keyed on (band, bucket) against the stored "
        "postings",
    ),
    "minhash_lsh_pairs": (
        {"bnlj"},
        "broadcast of the 1-row hash-seed grid (IdentityBroadcastMode "
        "crossJoin); the candidate join itself is keyed on (band, bucket) "
        "— asserted by test_minhash_join_keys_are_band_buckets",
    ),
    "events_sliding": (
        {"bnlj"},
        "broadcast of the k-offsets seed frame (window multiplicity); "
        "the aggregation is hash-partitioned on the window key",
    ),
    "dormant_high_balance": (
        {"bnlj"},
        "broadcast of the 1-row (sum, count) scalar frame — the house "
        "normalizer pattern for decorrelated scalar subqueries; the "
        "NOT EXISTS is a keyed left-anti join",
    ),
    "fixed_cells": (
        {"bnlj"},
        "S3 fixed-cell scan: broadcast 1-row crossJoin by design "
        "(SURVEY §2.1)",
    ),
    "lm_quality": (
        {"bnlj"},
        "broadcast of the 1-row training-corpus token total T onto the "
        "per-bigram score frame (the stupid-backoff denominator); the "
        "count-table joins themselves are shuffled equi joins on token "
        "keys",
    ),
    "source_mixture": (
        {"bnlj"},
        "broadcast of the 1-row global normalizer C onto the per-group "
        "mass frame (group count rows); the corpus-side join is a "
        "broadcast equi join on grp",
    ),
    "gap_fill": (
        {"bnlj"},
        "broadcast of the 1-row [min,max] bucket bounds onto the "
        "distinct-type frame to generate the dense hour spine; the "
        "sparse-counts join is a hash equi join on (type, hour)",
    ),
    "bigram_pmi": (
        {"bnlj"},
        "broadcast of the 1-row corpus totals (U, T) onto the filtered "
        "bigram-count frame (the PMI normalizer); the unigram joins are "
        "shuffled equi joins on the word key",
    ),
    "psi_drift": (
        {"bnlj"},
        "broadcast of the 1-row per-cohort totals onto the bin-count "
        "frame (bin-count rows, fixed at nbins); the binning itself is "
        "one hash aggregation",
    ),
    "chi_square_cells": (
        {"bnlj"},
        "broadcast of the 1-row grand total onto the contingency-cell "
        "frame (category-scale rows); row/column totals join as "
        "broadcast equi joins",
    ),
    "mi_cells": (
        {"bnlj"},
        "broadcast of the 1-row grand total onto the contingency-cell "
        "frame (category-scale rows), same shape as chi_square_cells",
    ),
    "key_skew_topk": (
        {"bnlj"},
        "broadcast of the 1-row table total onto the TakeOrdered "
        "top-k frame (k rows, k=20)",
    ),
    "seasonal_dow": (
        {"bnlj"},
        "broadcast of the 1-row table total onto the 7-row period-count "
        "frame",
    ),
    "ar_aging": (
        {"bnlj"},
        "broadcast of the 1-row ledger date (max order day) onto the "
        "open-orders scan before the bounded bucket aggregation",
    ),
    "benford_digits": (
        {"bnlj"},
        "broadcast of the 1-row total onto the 9-row digit-count frame",
    ),
    "decayed_revenue": (
        {"bnlj"},
        "broadcast of the 1-row ledger date (max order day) onto the "
        "scan before the priority-scale decayed aggregation",
    ),
    "embedding_drift": (
        {"bnlj"},
        "broadcast of the 1-row sufficient-stats frame (dot/norms over "
        "the dim-scale sum vectors) onto the 1-row cohort counts",
    ),
    "exact_quantiles_qty": (
        {"gwin", "bnlj"},
        "histogram selection: the cumulative window and the 5-row "
        "rank broadcast run on the DISTINCT-VALUE frame (50 quantity "
        "levels), not the corpus — the corpus is touched by exactly "
        "one keyed count aggregation (vocab_coverage discipline)",
    ),
    "important_parts": (
        {"bnlj"},
        "1-row global-revenue broadcast onto the per-part aggregate "
        "(share-of-total HAVING; temperature_resample normalizer "
        "pattern)",
    ),
    "idle_customers": (
        {"bnlj"},
        "1-row (sum, count) scalar-subquery broadcast onto customers "
        "(cross-multiplied avg threshold); the orders probe is a "
        "keyed left-anti join",
    ),
    "bm25_prebuilt": (
        {"bnlj"},
        "1-row corpus-stats broadcast onto the term-filtered "
        "postings (lm_quality normalizer pattern); the postings scan "
        "itself is term-pruned",
    ),
    "bm25_incremental": (
        {"bnlj"},
        "same 1-row corpus-stats broadcast as bm25_prebuilt, over the "
        "monoid-merged (stored union delta) index",
    ),
    "rrf_fusion": (
        {"gwin", "bnlj"},
        "the two rank windows run on the MATCHED-CANDIDATE frame "
        "(docs containing a query term — index-bounded, like every "
        "top-N retrieval), never the corpus; the bnlj is the 1-row "
        "corpus-stats (n_docs, total_len) broadcast onto the "
        "candidates (lm_quality normalizer pattern)",
    ),
    "time_to_convert": (
        {"gwin", "bnlj"},
        "exact_quantiles on the per-USER conversion-delta frame: "
        "cumulative window + 5-row rank broadcast on a user-bounded "
        "reduced frame (see exact_quantiles_qty)",
    ),
    "token_drift": (
        {"bnlj"},
        "broadcast of the 1-row (total_en, total_rest) token-mass "
        "normalizer onto the VOCABULARY-scale counts frame (same "
        "pattern as lm_quality/vocab_coverage); the token counts "
        "themselves are one keyed aggregation",
    ),
    "token_drift_total": (
        {"bnlj"},
        "same 1-row token-mass normalizer as token_drift, folded to "
        "the single TV-distance row",
    ),
    "temperature_resample": (
        {"bnlj"},
        "broadcast of the 1-row (sum(w_s), N) normalizer onto the "
        "per-source count frame (one row per source); the corpus-side "
        "join is a broadcast equi join on source",
    ),
    "embedding_normalize": (
        {"bnlj"},
        "broadcast of the ONE-ROW sorted per-dimension bounds array "
        "(d structs) onto the corpus — the standard 1-row normalizer "
        "pattern (see source_mixture); the stats agg itself is keyed "
        "on pos",
    ),
    "hll_distinct": (
        {"bnlj"},
        "crossJoin of two ONE-ROW aggregates (exact countDistinct + "
        "the 64-register HLL estimate) into the single report row",
    ),
    "hll_incremental": (
        {"bnlj"},
        "crossJoin of two ONE-ROW aggregates (exact countDistinct + "
        "the merged-register HLL estimate) into the single report row",
    ),
    "bm25_search": (
        {"bnlj"},
        "broadcast of the ONE-ROW corpus-stats frame (n_docs, "
        "total_len) onto the matched postings — Catalyst folds the "
        "constant-key equi-join into a 1-row broadcast",
    ),
    "kmv_set_cardinality": (
        {"bnlj"},
        "crossJoins of five ≤64-row sketch/count frames (two KMV "
        "minima estimates, the union-minima set stats and two exact "
        "1-row counts) into the single report row — every frame is "
        "sketch-sized, the corpus is touched only by the map-side "
        "minima passes and two distinct aggregations",
    ),
    "join_cardinality_estimate": (
        {"bnlj"},
        "crossJoin of four ONE-ROW frames (three 64-register HLL "
        "estimates + the exact-intersection count) into the report row",
    ),
    "bloom_join_prune": (
        {"bnlj"},
        "broadcast of the ONE-ROW Bloom bitmap frame (≤ m/64 int64s, "
        "~8 KB at m=2^16) onto the fact scan — the runtime-filter "
        "pattern itself; the actual join is a keyed broadcast hash join",
    ),
    "bloom_prune_invariants": (
        {"bnlj"},
        "same 1-row bitmap broadcast, plus crossJoins of four 1-row "
        "count aggregates into the single invariants row",
    ),
    "invoice_extract_golden": (
        {"gwin"},
        "P8 take-while over ONE sheet: the global window IS the "
        "reference's sequential break semantics; the multi-file plan "
        "(invoice_extract_multi) partitions it by source_file",
    ),
    "invoice_extract_errors": (
        {"gwin"},
        "error side-channel of the same one-sheet take-while",
    ),
}


def _flags(report) -> set:
    flags = set()
    if report.cartesian_products:
        flags.add("cart")
    if report.global_windows:
        flags.add("gwin")
    if report.broadcast_nested_loop_joins:
        flags.add("bnlj")
    return flags


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_plan_is_scalable(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    flags = _flags(plan_report(df))
    allowed = ALLOW.get(name, (set(), ""))[0]
    assert flags <= allowed, (
        f"{name}: plan contains scale anti-patterns {sorted(flags - allowed)} "
        f"(allowed: {sorted(allowed) or 'none'}) — fix the plan or add an "
        "explicit allowlist entry with its design justification"
    )
    # Ship-boundary discipline: no DecimalType may leave a registered
    # query. The harness compares results through pandas, where DuckDB
    # renders decimals as float64 ('123.5') while Spark keeps
    # decimal.Decimal ('123.50') — a guaranteed hash mismatch. Exact
    # decimal math stays INSIDE the plan; the shipped column casts to
    # double (money) or string digits (exact >2^53 integer ratios).
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    def _has_decimal(dt) -> bool:
        # recurse: a decimal nested inside a struct/array/map leaks
        # through the harness's pandas compare just as surely as a
        # top-level one
        if isinstance(dt, DecimalType):
            return True
        if isinstance(dt, StructType):
            return any(_has_decimal(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return _has_decimal(dt.elementType)
        if isinstance(dt, MapType):
            return _has_decimal(dt.keyType) or _has_decimal(dt.valueType)
        return False

    leaked = [f.name for f in df.schema.fields if _has_decimal(f.dataType)]
    assert not leaked, (
        f"{name}: decimal column(s) {leaked} at the ship boundary — cast "
        "to double (money) or string (exact big-int ratios) in BOTH the "
        "Spark query and its oracle SQL"
    )


def test_allowlist_has_no_stale_entries(spark, sf_dir):
    """An allowlist entry whose query no longer trips the flag is
    stale — prune it so the gate stays tight."""
    stale = []
    for name, (allowed, _why) in ALLOW.items():
        flags = _flags(plan_report(entry.queries()[name](spark, sf_dir)))
        if not (allowed & flags):
            stale.append((name, sorted(allowed), sorted(flags)))
    assert not stale, f"stale allowlist entries: {stale}"
