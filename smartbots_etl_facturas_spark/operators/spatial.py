"""Spatial radius self-join via grid-cell bucketing — the JOIN
analog of the z-order LAYOUT work in sinks/layout.py: instead of a
quadratic all-pairs distance test, points hash into square cells of
side = radius, each point replicates to its 3×3 cell neighborhood
("border replication", the standard MapReduce spatial-join scheme),
and candidates meet through a plain (cell_x, cell_y) equi-join —
every pair within the radius shares at least one replicated cell, so
the join is LOSSLESS, and each surviving candidate is verified with
the exact distance predicate.

Coordinates are integer micro-degrees and the verify step compares
SQUARED planar distance (dx² + dy² ≤ r², pure int64) — no sqrt, no
trig, bit-identical on any engine. Planar semantics are the
documented contract (adequate for city-scale radii; a production
geodesic tier would pre-scale longitude by cos(lat) per band — same
plan shape, different constant).

Scale: replication is a fixed ×9 narrow projection; the shuffle is
keyed on cells whose population is load-bounded by data density, the
same guarantee LSH band-buckets give the dedup tiers. No cross join
at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_join(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All unordered pairs of ``points`` within ``radius`` (planar,
    integer units). Returns (id_a, id_b, dist_sq) with id_a < id_b.

    Coordinates must be NON-NEGATIVE integers (``div`` truncates
    toward zero, so a negative domain would need a floor-division
    cell function; shift the frame rather than widening the origin
    cell).

    One side replicates to its 9 neighboring cells; the other side
    stays single-cell — each true pair is generated exactly once per
    shared (replicated-cell == home-cell) meeting, and the id_a <
    id_b + distinct guard collapses the ≤9 meetings to one row.
    """
    r = int(radius)
    if r <= 0:
        raise ValueError("radius must be positive")
    cx = F.expr(f"{x_col} div {r}")
    cy = F.expr(f"{y_col} div {r}")
    home = points.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("xb"),
        F.col(y_col).alias("yb"),
        cx.alias("cell_x"),
        cy.alias("cell_y"),
    )
    rep = (
        points.select(
            F.col(id_col).alias("id_a"),
            F.col(x_col).alias("xa"),
            F.col(y_col).alias("ya"),
            cx.alias("__cx"),
            cy.alias("__cy"),
        )
        .withColumn("__dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("__dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "id_a",
            "xa",
            "ya",
            (F.col("__cx") + F.col("__dx")).alias("cell_x"),
            (F.col("__cy") + F.col("__dy")).alias("cell_y"),
        )
    )
    dist_sq = (
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    )
    return (
        rep.join(home, ["cell_x", "cell_y"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist_sq.cast("long").alias("dist_sq"))
        .filter(F.col("dist_sq") <= F.lit(r) * F.lit(r))
        .distinct()
    )
