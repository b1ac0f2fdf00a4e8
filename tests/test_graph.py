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
