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


# --- k_core -----------------------------------------------------------------

from smartbots_etl_facturas_spark.operators.graph import k_core  # noqa: E402


def test_kcore_path_cascades_to_empty(spark):
    # a path has min degree 1 — its 2-core peels away end-to-end,
    # but only ONE endpoint layer per synchronous round: rounds matter
    path = _und(spark, [(i, i + 1) for i in range(8)])
    assert k_core(path, k=2, rounds=4).count() == 0


def test_kcore_cycle_survives_k2(spark):
    cyc = _und(spark, [(i, (i + 1) % 6) for i in range(6)])
    rows = k_core(cyc, k=2, rounds=3).collect()
    assert sorted(r.node for r in rows) == list(range(6))
    assert all(r.deg == 2 for r in rows)


def test_kcore_lollipop_keeps_clique_drops_tail(spark):
    # K4 with a pendant path: the 3-core is exactly the K4
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    tail = [(3, 10), (10, 11), (11, 12)]
    rows = k_core(_und(spark, k4 + tail), k=3, rounds=4).collect()
    assert sorted(r.node for r in rows) == [0, 1, 2, 3]
    assert all(r.deg == 3 for r in rows)


def test_kcore_insufficient_rounds_is_partial_more_rounds_fixpoint(spark):
    # 6-node path at k=2: synchronous peeling removes one layer per
    # round from each end — 1 round leaves an inner remnant, 3 rounds
    # reach the (empty) fixpoint and further rounds stay there
    path = _und(spark, [(i, i + 1) for i in range(6)])
    # strict=False opts into the raw hop-bounded contract; the
    # default raises on a non-fixpoint exit (see TestBudgetExit)
    assert k_core(path, k=2, rounds=1, strict=False).count() > 0
    assert k_core(path, k=2, rounds=3).count() == 0
    assert k_core(path, k=2, rounds=10).count() == 0


def test_kcore_partition_invariance(spark):
    import random

    rng = random.Random(11)
    edges = list({(min(a, b), max(a, b))
                  for a, b in (rng.sample(range(40), 2) for _ in range(200))})
    df = _und(spark, edges)
    r1 = {(r.node, r.deg) for r in k_core(df, k=4, rounds=6).collect()}
    r2 = {(r.node, r.deg)
          for r in k_core(df.repartition(13), k=4, rounds=6).collect()}
    assert r1 == r2
    # every survivor has deg >= 4 within the surviving subgraph
    assert all(d >= 4 for _, d in r1)


# --- bfs_levels -------------------------------------------------------------

from smartbots_etl_facturas_spark.operators.graph import bfs_levels  # noqa: E402


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], ["node"])


def test_bfs_path_distances(spark):
    path = _und(spark, [(i, i + 1) for i in range(5)])
    rows = {r.node: r.dist for r in
            bfs_levels(path, _seeds(spark, [0]), max_depth=3).collect()}
    assert rows == {0: 0, 1: 1, 2: 2, 3: 3}  # 4,5 beyond max_depth


def test_bfs_multi_source_takes_min(spark):
    path = _und(spark, [(i, i + 1) for i in range(6)])
    rows = {r.node: r.dist for r in
            bfs_levels(path, _seeds(spark, [0, 6]), max_depth=3).collect()}
    assert rows[3] == 3 and rows[5] == 1 and rows[6] == 0


def test_bfs_cycle_no_infinite_loop_and_min_dist(spark):
    cyc = _und(spark, [(i, (i + 1) % 6) for i in range(6)])
    rows = {r.node: r.dist for r in
            bfs_levels(cyc, _seeds(spark, [0]), max_depth=3).collect()}
    assert rows == {0: 0, 1: 1, 5: 1, 2: 2, 4: 2, 3: 3}


def test_bfs_disconnected_component_unreached(spark):
    g = _und(spark, [(0, 1), (10, 11)])
    rows = {r.node: r.dist for r in
            bfs_levels(g, _seeds(spark, [0]), max_depth=3).collect()}
    assert set(rows) == {0, 1}


def test_bfs_partition_invariance(spark):
    import random

    rng = random.Random(5)
    edges = list({(min(a, b), max(a, b))
                  for a, b in (rng.sample(range(25), 2) for _ in range(60))})
    df = _und(spark, edges)
    r1 = {(r.node, r.dist) for r in
          bfs_levels(df, _seeds(spark, [0]), max_depth=4).collect()}
    r2 = {(r.node, r.dist) for r in
          bfs_levels(df.repartition(9), _seeds(spark, [0]), max_depth=4).collect()}
    assert r1 == r2


# --- budget-exit convergence flags ------------------------------------------

from smartbots_etl_facturas_spark.operators.graph import (  # noqa: E402
    GraphNotConverged,
    connected_components,
    connected_components_star,
)


class TestBudgetExit:
    """A bounded fixpoint loop that exhausts its round budget before
    converging must raise, never silently return partially propagated
    labels (which could emit conflicting component ids)."""

    def test_cc_raises_on_long_path(self, spark):
        # min-label needs ~diameter rounds; a 12-edge path at
        # max_rounds=3 cannot converge
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], ["a", "b"]
        )
        with pytest.raises(GraphNotConverged, match="connected_components"):
            connected_components(df, max_rounds=3).collect()

    def test_cc_converges_within_budget_no_raise(self, spark):
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], ["a", "b"]
        )
        got = {r.node: r.component
               for r in connected_components(df, max_rounds=32).collect()}
        assert set(got.values()) == {0} and len(got) == 13

    def test_star_cc_raises_on_budget_exhaustion(self, spark):
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], ["a", "b"]
        )
        with pytest.raises(GraphNotConverged, match="star"):
            connected_components_star(df, max_rounds=1).collect()

    def test_star_cc_no_conflicting_labels_at_fixpoint(self, spark):
        # the hazard the flag guards: a node emitted as both member
        # and root — at a true fixpoint every node has EXACTLY one
        # component label
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], ["a", "b"]
        )
        rows = connected_components_star(df, max_rounds=16).collect()
        assert len({r.node for r in rows}) == len(rows) == 65
        assert {r.component for r in rows} == {0}

    def test_kcore_strict_raises_before_fixpoint(self, spark):
        df = spark.createDataFrame(
            [(min(i, i + 1), max(i, i + 1)) for i in range(6)], ["a", "b"]
        )
        with pytest.raises(GraphNotConverged, match="k_core"):
            k_core(df, k=2, rounds=1)

    def test_kcore_strict_ok_at_fixpoint(self, spark):
        cyc = _und(spark, [(i, (i + 1) % 6) for i in range(6)])
        assert k_core(cyc, k=2, rounds=3).count() == 6
