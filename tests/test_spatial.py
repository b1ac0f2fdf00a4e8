"""Spatial radius join: grid-cell candidate generation must be
LOSSLESS against the all-pairs ground truth, including boundary
cells, and the plan must stay a keyed equi-join (no cross join)."""

import itertools

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.spatial import radius_join


def _brute(points: list[tuple[int, int, int]], r: int):
    out = set()
    for (ia, xa, ya), (ib, xb, yb) in itertools.combinations(points, 2):
        d = (xa - xb) ** 2 + (ya - yb) ** 2
        if d <= r * r:
            a, b = sorted((ia, ib))
            out.add((a, b, d))
    return out


def test_radius_join_matches_bruteforce_boundaries(spark):
    """Seeded set exercising every edge: pairs EXACTLY radius apart
    (closed predicate), pairs straddling a cell border, diagonal
    cell-corner neighbors, coincident points, and a far pair one unit
    past the radius."""
    r = 10
    pts = [
        (1, 5, 5),
        (2, 15, 5),     # exactly r from id 1, across the x cell border
        (3, 5, 15),     # exactly r from id 1, across the y cell border
        (4, 14, 14),    # diagonal corner neighbor of id 1 (dist_sq 162 > r²)
        (5, 5, 5),      # coincident with id 1
        (6, 16, 5),     # r+1 from id 1 — must NOT pair with it
        (7, 9, 9),      # interior, near the (0,0)/(0,1)/(1,0)/(1,1) corner
        (8, 10, 10),    # sits ON the cell corner
        (9, 0, 0),      # origin cell edge
        (10, 99, 99),   # far away, isolated
    ]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        (row.id_a, row.id_b, row.dist_sq)
        for row in radius_join(df, r).collect()
    }
    assert got == _brute(pts, r)


def test_radius_join_matches_bruteforce_random(spark):
    """Deterministic pseudo-random cloud (the same congruential map
    the registered query uses) against all-pairs."""
    r = 7
    pts = [(i, (i * 48271) % 50, (i * 69621) % 50) for i in range(1, 121)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        (row.id_a, row.id_b, row.dist_sq)
        for row in radius_join(df, r).collect()
    }
    expected = _brute(pts, r)
    assert got == expected
    assert len(expected) > 50  # the fixture actually exercises pairs


def test_radius_join_plan_is_keyed_equi_join(spark):
    """The candidate meeting must be a hash-partitioned equi-join on
    (cell_x, cell_y) — never a cartesian/nested-loop pair scan."""
    df = spark.range(1, 1000).select(
        F.col("id"),
        (F.col("id") * 7 % 100).alias("x"),
        (F.col("id") * 13 % 100).alias("y"),
    )
    plan = (
        radius_join(df, 5)
        ._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cell_x" in plan and "cell_y" in plan


def test_radius_join_rejects_bad_radius(spark):
    import pytest

    df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
    with pytest.raises(ValueError):
        radius_join(df, 0)


def test_registered_query_nonempty_at_test_scale(spark):
    """The driver-registered spatial_radius_join must return a
    NON-TRIVIAL row count at every test scale — a zero-row oracle
    match is vacuous and never exercises the grid join's
    losslessness (round-6 ADVICE)."""
    import __spark_entry__ as entry

    n = entry.queries()["spatial_radius_join"](
        spark, "/root/testdata/sf0.001"
    ).count()
    assert n == 111  # brute-force ground truth for the %10000 cloud
