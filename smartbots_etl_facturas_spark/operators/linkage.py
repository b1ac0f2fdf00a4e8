"""Set-similarity join (entity matching / record linkage): all pairs
across two tables with token-set Jaccard >= tau.

Algorithm: PREFIX-FILTERED candidate generation (the AllPairs/PPJoin
family — Bayardo et al. 2007 "Scaling up all pairs similarity
search"; Xiao et al. 2008 PPJoin): order every record's distinct
tokens by one GLOBAL canonical order (corpus frequency ascending, so
prefixes carry the rarest — most selective — tokens), index only each
record's first ``len - ceil(tau*len) + 1`` tokens, and join on those
prefix tokens. The filter is LOSSLESS: two sets with Jaccard >= tau
must share a token within each other's prefix under a common total
order, so candidates ⊇ all answers and the exact verify step makes
the operator EXACT — which is why it can carry a full brute-force
oracle, unlike the LSH tiers.

Scale design: token frequencies are one map-side-combine count; the
candidate join is an equi-join on the prefix token (narrow shuffle,
candidate count bounded by prefix postings — orders of magnitude
below the cross product at realistic tau); verification touches only
candidate pairs. No driver participation, no cross join anywhere.

Determinism: Jaccard = |A∩B| / |A∪B| over integer set sizes — one
IEEE division, engine-exact. Candidate-stage bounds run on the
threshold floored to 6 decimals in EXACT integer arithmetic, so they
are provably never stricter than the final comparison (float
ceil(t·n) overshoots exact products and would drop boundary pairs).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_tokens(
    df: DataFrame, freq: DataFrame, id_col: str, tokens_col: str
) -> DataFrame:
    """(id, toks sorted by (corpus freq asc, token asc), n) — distinct
    tokens in the shared canonical order, assembled WITHOUT a window:
    sort_array on (freq, token) structs."""
    exploded = (
        df.select(F.col(id_col), F.explode(F.array_distinct(tokens_col)).alias("tok"))
        .join(freq, "tok")
    )
    return (
        exploded.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("c"), F.col("tok")))
            ).alias("__st")
        )
        .select(
            id_col,
            F.transform("__st", lambda s: s["tok"]).alias("toks"),
            F.size("__st").cast("long").alias("n"),
        )
    )


def _prepare_canonical(left, right, id_col, tokens_col):
    freq = (
        left.select(F.explode(F.array_distinct(tokens_col)).alias("tok"))
        .unionAll(right.select(F.explode(F.array_distinct(tokens_col)).alias("tok")))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        _canonical_tokens(left, freq, id_col, tokens_col),
        _canonical_tokens(right, freq, id_col, tokens_col),
    )


def _candidates_from_canonical(lc, rc, threshold, id_col):
    # Candidate-stage bounds use EXACT integer arithmetic on the
    # threshold FLOORED to 6 decimals (t_num/1e6 <= threshold, so
    # every bound below is never STRICTER than the verify comparison
    # — lossless by construction). A float ceil(t*n) overshoots exact
    # integer products (0.34*150 -> 51.000000000000007 -> ceil 52,
    # exact 51) and silently dropped boundary-Jaccard pairs.
    t_num = math.floor(threshold * 1_000_000)

    def prefix(df, out_id):
        # prefix postings carry ONLY (id, token, set size) — no record
        # payloads ride the explode
        need = F.expr(f"-((-{t_num}L * n) div 1000000)")  # exact ceil(t_snap*n)
        plen = F.col("n") - need + 1
        return df.select(
            F.col(id_col).alias(out_id),
            F.col("n").alias(f"n_{out_id}"),
            F.explode(F.slice("toks", 1, plen.cast("int"))).alias("tok"),
        )

    # candidate pairs: prefix-token equi-join + the PPJoin LENGTH
    # filter (also lossless: Jaccard >= tau forces
    # tau*|A| <= |B| <= |A|/tau; integer form t_num*n_a <= 1e6*n_b),
    # applied BEFORE the dedup so incompatible pairs never reach the
    # aggregation. Set sizes ride through the distinct (functionally
    # dependent on the ids), so the verify stage never re-joins the
    # canonical frames just to recover them.
    return (
        prefix(lc, "left_id")
        .join(prefix(rc, "right_id"), "tok")
        .filter(
            (F.lit(1_000_000) * F.col("n_right_id") >= F.lit(t_num) * F.col("n_left_id"))
            & (F.lit(1_000_000) * F.col("n_left_id") >= F.lit(t_num) * F.col("n_right_id"))
        )
        .select("left_id", "right_id", "n_left_id", "n_right_id")
        .distinct()
    )


def prefix_candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
) -> DataFrame:
    """The CANDIDATE stage of the similarity join, exposed on its own
    so pruning effectiveness is measurable (candidate count vs the
    |L|·|R| pair space — see scripts/ppjoin_pruning_experiment.py):
    deduplicated (left_id, right_id, n_left_id, n_right_id) pairs
    surviving the lossless prefix filter + PPJoin length filter.
    ``jaccard_similarity_join`` = this + exact verification."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    lc, rc = _prepare_canonical(left, right, id_col, tokens_col)
    return _candidates_from_canonical(lc, rc, threshold, id_col)


def jaccard_similarity_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
) -> DataFrame:
    """All (left_id, right_id, jaccard) pairs with token-set Jaccard
    >= threshold. Exact (see module doc). Inputs carry a tokens array
    column; tokens are deduplicated internally."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    lc, rc = _prepare_canonical(left, right, id_col, tokens_col)
    cand = _candidates_from_canonical(lc, rc, threshold, id_col)
    # exact verification WITHOUT per-pair array ops (array_intersect is
    # interpreted O(|A|*|B|) per pair — measured 30 s vs 3 s on a
    # small-vocabulary corpus where candidates approach all pairs):
    # |A∩B| falls out of a codegen'd count aggregation over the
    # candidate pairs joined with both FULL posting lists
    pl = lc.select(F.col(id_col).alias("left_id"), F.explode("toks").alias("tok"))
    pr = rc.select(F.col(id_col).alias("right_id"), F.explode("toks").alias("tok"))
    inter = (
        cand.join(pl, "left_id")
        .join(pr, ["right_id", "tok"])
        .groupBy("left_id", "right_id", "n_left_id", "n_right_id")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("__inter").cast("double")
            / (F.col("n_left_id") + F.col("n_right_id") - F.col("__inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )


def edit_distance_join(
    df: "DataFrame",
    id_col: str,
    str_col: str,
    max_dist: int = 1,
) -> "DataFrame":
    """All pairs with Levenshtein distance <= ``max_dist`` — the
    STRING-similarity complement of the token-set join above, via the
    PassJoin pigeonhole scheme (Li, Deng, Feng 2011): partition every
    string into ``max_dist + 1`` contiguous segments; any string
    within edit distance d must contain one segment EXACTLY, at a
    start position shifted by at most d — so candidates come from an
    EQUI-JOIN on (target length, segment index, substring), never a
    cross join, and the exact Levenshtein verify touches only
    candidates (LOSSLESS filter => exact operator => brute-force
    oracle-checkable, the PPJoin discipline).

    This implementation fixes ``max_dist = 1`` (the common fuzzy-key
    case: one typo / one digit off), which keeps the probe fan-out a
    FIXED 15 substrings per row, all generated as pure Column
    expressions inside codegen. Strings must be length >= 2. Output:
    one row per unordered pair, ``(a_id, b_id, a_val, b_val, dist)``
    with a_id < b_id.

    Scale: |index| = 2 rows/string, |probe| <= 15 rows/string, both
    keyed by (L, seg, substring) — shuffle volume is linear in input
    with a segment-postings-bounded candidate count; at 100 TB the
    join hash-partitions like any equi-join and no task ever sees the
    cross product.
    """
    if max_dist != 1:
        raise NotImplementedError(
            "edit_distance_join implements the max_dist=1 tier; wider "
            "distances need d+1 segments and a (2d+1)-shift probe"
        )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.length(str_col).alias("__L"),
    ).filter(F.col("__L") >= 2)

    # index side: the d+1 = 2 segments of each string
    idx = base.select(
        F.col("__id").alias("a_id"),
        F.col("__s").alias("a_s"),
        F.col("__L").alias("L"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("seg"),
                    F.expr("substr(__s, 1, __L div 2)").alias("sub"),
                ),
                F.struct(
                    F.lit(1).alias("seg"),
                    F.expr(
                        "substr(__s, __L div 2 + 1, __L - __L div 2)"
                    ).alias("sub"),
                ),
            )
        ).alias("e"),
    ).select("a_id", "a_s", "L", F.col("e.seg").alias("seg"),
             F.col("e.sub").alias("sub"))

    # probe side: for every candidate partner length L in {M-1, M, M+1}
    # emit the substrings that could equal one of ITS segments — seg 0
    # starts within {0, 1}, seg 1 within {L1-1, L1, L1+1} (shift <= 1)
    entries = []
    for dl in (-1, 0, 1):
        L = f"(__M + ({dl}))"
        L1 = f"({L} div 2)"
        L2 = f"({L} - {L1})"
        for p in ("0", "1"):
            cond = f"{L} >= 2 AND {L1} >= 1 AND {p} + {L1} <= __M"
            entries.append(
                f"named_struct('L', {L}, 'seg', 0, 'sub', "
                f"IF({cond}, substr(__s, {p} + 1, {L1}), NULL))"
            )
        for p in (f"({L1} - 1)", L1, f"({L1} + 1)"):
            cond = f"{L} >= 2 AND {p} >= 0 AND {p} + {L2} <= __M"
            entries.append(
                f"named_struct('L', {L}, 'seg', 1, 'sub', "
                f"IF({cond}, substr(__s, {p} + 1, {L2}), NULL))"
            )
    probe = base.withColumnRenamed("__L", "__M").select(
        "__id",
        "__s",
        F.explode(
            F.expr(
                "filter(array(" + ", ".join(entries) + "), "
                "x -> x.sub IS NOT NULL)"
            )
        ).alias("e"),
    ).select(
        F.col("__id").alias("b_id"),
        F.col("__s").alias("b_s"),
        F.col("e.L").alias("L"),
        F.col("e.seg").alias("seg"),
        F.col("e.sub").alias("sub"),
    )

    # a_id < b_id at the JOIN is lossless: the pigeonhole holds for
    # either partner's partition, so every true pair appears in both
    # role orders — keeping one halves the candidate volume. The exact
    # verify runs BEFORE the distinct so the dedup shuffle carries
    # only true pairs (candidates can repeat per matching segment).
    return (
        idx.join(probe, ["L", "seg", "sub"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id",
            F.col("a_s").alias("a_val"),
            F.col("b_s").alias("b_val"),
            F.levenshtein("a_s", "b_s").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )
