"""Tests for integer nano-rank PageRank (operators/graph.py)."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.graph import NANO, pagerank


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return df.unionByName(df.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))


def test_hub_outranks_leaves(spark):
    # star graph: hub h connected to 5 leaves
    edges = _sym(spark, [("h", f"l{i}") for i in range(5)])
    ranks = {r.node: r.rank_nanos for r in pagerank(edges, iters=5).collect()}
    assert all(ranks["h"] > ranks[f"l{i}"] for i in range(5))
    leaf = {ranks[f"l{i}"] for i in range(5)}
    assert len(leaf) == 1  # symmetry: all leaves identical


def test_mass_conservation(spark):
    edges = _sym(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    out = pagerank(edges, iters=4)
    n = out.count()
    total = out.agg(F.sum("rank_nanos").alias("s")).head().s
    # exact conservation up to sub-nano truncation: each of the
    # iters x (edges + nodes) integer divisions loses < 1 nano
    assert 0 <= n * NANO - total < 4 * (8 + 4) * 20


def test_partition_invariance(spark):
    edges = _sym(spark, [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(20)])
    a = {r.node: r.rank_nanos for r in pagerank(edges, iters=3).collect()}
    b = {r.node: r.rank_nanos
         for r in pagerank(edges.repartition(13), iters=3).collect()}
    assert a == b


def test_checkpoint_mode_same_result(spark):
    edges = _sym(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    a = {r.node: r.rank_nanos for r in pagerank(edges, iters=4).collect()}
    b = {r.node: r.rank_nanos
         for r in pagerank(edges, iters=4, checkpoint_every=2).collect()}
    assert a == b


def test_isolated_pair_floor(spark):
    # two nodes pointing at each other keep rank 1.0 exactly-ish
    edges = _sym(spark, [("x", "y")])
    ranks = {r.node: r.rank_nanos for r in pagerank(edges, iters=6).collect()}
    for v in ranks.values():
        assert abs(v - NANO) < 10


# --- triangle_count ---------------------------------------------------------

from smartbots_etl_facturas_spark.operators.graph import triangle_count  # noqa: E402


def _und(spark, pairs):
    return spark.createDataFrame(pairs, ["a", "b"])


def test_triangle_single(spark):
    tri = _und(spark, [(1, 2), (2, 3), (1, 3)])
    assert triangle_count(tri).collect()[0].n_triangles == 1


def test_triangle_none_in_star(spark):
    star = _und(spark, [(0, i) for i in range(1, 6)])
    assert triangle_count(star).collect()[0].n_triangles == 0


def test_triangle_k5_complete(spark):
    # K5 has C(5,3) = 10 triangles
    k5 = _und(spark, [(i, j) for i in range(5) for j in range(i + 1, 5)])
    assert triangle_count(k5).collect()[0].n_triangles == 10


def test_triangle_duplicate_and_reversed_edges_deduped(spark):
    tri = _und(
        spark, [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3), (2, 2)]
    )
    assert triangle_count(tri).collect()[0].n_triangles == 1


def test_triangle_partition_invariance(spark):
    import random

    rng = random.Random(7)
    edges = list({(min(a, b), max(a, b))
                  for a, b in (sorted(rng.sample(range(30), 2))
                               for _ in range(120))})
    df = _und(spark, edges)
    n1 = triangle_count(df).collect()[0].n_triangles
    n2 = triangle_count(df.repartition(17)).collect()[0].n_triangles
    # brute-force reference on the driver
    es = set(edges)
    brute = sum(
        1
        for x in range(30)
        for y in range(x + 1, 30)
        for z in range(y + 1, 30)
        if (x, y) in es and (y, z) in es and (x, z) in es
    )
    assert n1 == n2 == brute
