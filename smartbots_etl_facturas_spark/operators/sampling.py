"""Deterministic corpus resampling operators.

Temperature-based source rebalancing is the standard multilingual /
multi-source pretraining mixture step (e.g. the T = 0.3–0.7 sampling
in multilingual LM corpora): raw source shares are flattened by
raising them to 1/T so small sources are over-represented relative to
their raw frequency, then documents are accepted by a deterministic
content-independent hash draw — reproducible across engines, cluster
sizes, partitionings and reruns (no RNG state, no ``sample()``).

Scale design: the per-source statistics frame is tiny (one row per
source) and joins back as a 1-row-per-source broadcast; the
acceptance test itself is a pure projection on the fact table, so the
whole operator is one narrow pass at any corpus size.

Cross-engine determinism: temperature is fixed at 0.5 so the
flattening is ``sqrt`` — IEEE-754 requires sqrt (unlike pow/ln) to be
correctly rounded, and the rounded weights are then snapped to 6
decimals and summed as exact decimals, so every intermediate is
bit-identical between Spark and the DuckDB oracle. The hash draw
parses 13 md5 hex chars (52 bits) into an exact double in [0, 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX_BITS = 52  # 13 hex chars -> exactly representable as double


def _uniform_hash(col):
    """Deterministic uniform in [0,1) from the first 13 hex chars of
    md5(col): k / 2^52 with k < 2^52, both exactly representable."""
    hx = F.substring(F.md5(col.cast("string")), 1, 13)
    return F.conv(hx, 16, 10).cast("double") / F.lit(float(2 ** HEX_BITS))


def temperature_resample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    target_frac: float = 0.5,
) -> DataFrame:
    """Rebalance a multi-source corpus toward temperature-0.5 shares.

    Per source s with n_s documents (N total): flattened weight
    w_s = round(sqrt(n_s), 6); mixture share w_s / sum(w_s); expected
    picks target_frac * N * share; acceptance probability
    a_s = min(1, expected / n_s). A document is kept iff its hash
    draw u(doc_id) < a_s.

    Returns the kept rows with ``accept_prob`` attached (audit
    column). Membership is deterministic: same doc ids survive on any
    engine or partitioning.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_s"))
    weighted = counts.select(
        source_col,
        "n_s",
        F.round(F.sqrt(F.col("n_s").cast("double")), 6)
        .cast("decimal(38,6)")
        .alias("w_s"),
    )
    norm = weighted.agg(
        F.sum("w_s").alias("w_sum"),
        F.sum("n_s").cast("long").alias("n_total"),
    )
    rates = (
        weighted.crossJoin(F.broadcast(norm))
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                (
                    (F.lit(float(target_frac)) * F.col("n_total").cast("double"))
                    * (F.col("w_s").cast("double") / F.col("w_sum").cast("double"))
                )
                / F.col("n_s").cast("double"),
            ).alias("accept_prob"),
        )
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(_uniform_hash(F.col(id_col)) < F.col("accept_prob"))
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsamp-v1",
    max_weight: int = 64,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the
    Efraimidis–Spirakis (A-ES, 2006) scheme — order by ``u^(1/w)``
    descending, take k — re-expressed in EXACT integer arithmetic so
    every engine picks the identical sample.

    The float-free trick: ``u^(1/w)`` ranks identically to the MAX of
    ``w`` independent uniforms (the max of w Exp(1) draws is Exp(w)
    in the inverted view), so for integer weights each row explodes
    into ``w`` replicas, each replica gets a 52-bit integer hash draw
    keyed on (salt, id, replica), and the row's sort key is the MAX
    draw — pure int64 comparisons, no pow/ln to round differently
    across engines. Rows with weight <= 0 are excluded (A-ES
    semantics: zero weight never sampled).

    ``max_weight`` bounds the explode fan-out (cost is O(Σw) rows
    through one narrow pass); weights are clamped into [1, max_weight]
    after the positivity filter. For unbounded float weights use the
    classic double-precision key — this operator trades that for
    cross-engine exactness.

    Plan: explode (narrow) → per-id max-agg (one keyed shuffle) →
    TakeOrderedAndProject(k) — per-partition top-k + a k-row merge,
    never a global sort.
    """
    rep = (
        df.filter(F.col(weight_col) > 0)
        .withColumn(
            "__w",
            # ceil, not truncate: a fractional weight in (0, 1) (e.g.
            # 0.9) passes the positivity filter but cast('long') would
            # round it to ZERO replicas and silently drop the row from
            # the sample — ceil maps it to 1 replica instead (integer
            # weights are unchanged: ceil(n) == n)
            F.least(
                F.ceil(F.col(weight_col)).cast("long"),
                F.lit(int(max_weight)),
            ),
        )
        .withColumn("__j", F.explode(F.sequence(F.lit(1), F.col("__w"))))
    )
    # the draw stays a fixed-length lowercase-hex STRING: 13 hex chars
    # compare lexicographically == numerically, so max/orderBy need no
    # base conversion and every engine sorts the identical bytes
    draw = F.substring(
        F.md5(
            F.concat(
                F.lit(salt + ":"),
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("__j").cast("string"),
            )
        ),
        1,
        13,
    )
    keys = (
        rep.withColumn("__draw", draw)
        .groupBy(id_col)
        .agg(F.max("__draw").alias("sample_key"))
    )
    return keys.orderBy(F.col("sample_key").desc(), F.col(id_col)).limit(k)
