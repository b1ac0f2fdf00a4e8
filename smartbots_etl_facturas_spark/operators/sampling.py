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
