"""Tests for the round-5 session-4 operators: weighted SSSP
(operators/graph.py:sssp), incremental join-view maintenance
(operators/incremental.py:join_view_delta), Markov transition matrix
(operators/events.py:transition_matrix), window-form CUSUM
(operators/timeseries.py:cusum), and integer-exact weighted sampling
(operators/sampling.py:weighted_sample_topk)."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.graph import sssp
from smartbots_etl_facturas_spark.operators.incremental import join_view_delta
from smartbots_etl_facturas_spark.operators.events import transition_matrix
from smartbots_etl_facturas_spark.operators.timeseries import cusum
from smartbots_etl_facturas_spark.operators.sampling import weighted_sample_topk


class TestSssp:
    def _edges(self, spark, triples):
        df = spark.createDataFrame(triples, ["s", "t", "w"])
        return df.unionByName(
            df.select(F.col("t").alias("s"), F.col("s").alias("t"), "w")
        )

    def test_path_vs_direct_edge(self, spark):
        # a-b-c costs 1+1=2, direct a-c edge costs 5 -> path wins
        e = self._edges(spark, [("a", "b", 1), ("b", "c", 1), ("a", "c", 5)])
        seeds = spark.createDataFrame([("a",)], ["node"])
        d = {r.node: r.dist for r in sssp(e, seeds, rounds=3).collect()}
        assert d == {"a": 0, "b": 1, "c": 2}

    def test_hop_bound_contract(self, spark):
        # chain a-b-c-d: rounds=2 reaches only <=2 edges out
        e = self._edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)])
        seeds = spark.createDataFrame([("a",)], ["node"])
        d = {r.node: r.dist for r in sssp(e, seeds, rounds=2).collect()}
        assert d == {"a": 0, "b": 1, "c": 2}

    def test_later_round_improves_distance(self, spark):
        # expensive direct edge found in round 1, cheap 3-hop path
        # found in round 3 must overwrite it
        e = self._edges(
            spark,
            [("a", "z", 10), ("a", "b", 1), ("b", "c", 1), ("c", "z", 1)],
        )
        seeds = spark.createDataFrame([("a",)], ["node"])
        d = {r.node: r.dist for r in sssp(e, seeds, rounds=3).collect()}
        assert d["z"] == 3

    def test_multi_seed_min(self, spark):
        e = self._edges(spark, [("a", "b", 2), ("b", "c", 2), ("c", "d", 2)])
        seeds = spark.createDataFrame([("a",), ("d",)], ["node"])
        d = {r.node: r.dist for r in sssp(e, seeds, rounds=3).collect()}
        assert d == {"a": 0, "d": 0, "b": 2, "c": 2}

    def test_partition_invariance(self, spark):
        e = self._edges(
            spark, [(f"n{i}", f"n{(i * 3 + 1) % 12}", i % 5 + 1) for i in range(12)]
        )
        seeds = spark.createDataFrame([("n0",)], ["node"])
        a = {r.node: r.dist for r in sssp(e, seeds, rounds=3).collect()}
        b = {
            r.node: r.dist
            for r in sssp(e.repartition(7), seeds, rounds=3).collect()
        }
        assert a == b


class TestJoinViewDelta:
    def _frames(self, spark):
        a = spark.createDataFrame(
            [(i, i % 4, i * 10) for i in range(12)], ["id", "k", "x"]
        )
        b = spark.createDataFrame(
            [(k, f"v{k}") for k in range(4)], ["k", "name"]
        )
        return a, b

    def test_delta_completes_view(self, spark):
        a, b = self._frames(spark)
        a_old, da = a.filter("id % 3 != 0"), a.filter("id % 3 = 0")
        b_old, db = b.filter("k % 2 != 0"), b.filter("k % 2 = 0")
        v_old = a_old.join(b_old, "k")
        delta = join_view_delta(a_old, da, b_old, db, "k")
        got = sorted(
            tuple(r) for r in v_old.unionByName(delta).collect()
        )
        want = sorted(tuple(r) for r in a.join(b, "k").collect())
        assert got == want

    def test_no_double_counting(self, spark):
        # multiset semantics: each joined row produced exactly once
        a, b = self._frames(spark)
        a_old, da = a.filter("id < 6"), a.filter("id >= 6")
        empty_b = b.filter("k < 0")
        delta = join_view_delta(a_old, da, b, empty_b, "k")
        assert delta.count() == da.join(b, "k").count()

    def test_cost_never_joins_old_with_old(self, spark):
        # ΔV with empty deltas is empty — the old×old recompute is
        # structurally absent
        a, b = self._frames(spark)
        none_a = a.filter("id < 0")
        none_b = b.filter("k < 0")
        assert join_view_delta(a, none_a, b, none_b, "k").count() == 0


class TestTransitionMatrix:
    def test_counts_and_probs(self, spark):
        rows = [
            (1, 1, 1, "a"), (1, 2, 2, "b"), (1, 3, 3, "a"), (1, 4, 4, "b"),
            (2, 1, 5, "a"), (2, 2, 6, "a"),
        ]
        df = spark.createDataFrame(
            rows, ["user_id", "ts", "event_id", "event_type"]
        )
        got = {
            (r.from_type, r.to_type): (r.n, r.prob_micros)
            for r in transition_matrix(df).collect()
        }
        # from 'a': a->b twice, a->a once => 666666 / 333333 micros
        assert got[("a", "b")] == (2, 666666)
        assert got[("a", "a")] == (1, 333333)
        assert got[("b", "a")] == (1, 1000000)

    def test_row_probs_sum_to_almost_one(self, spark, sf_dir):
        from __spark_entry__ import read_events

        ev = read_events(spark, sf_dir).select(
            "user_id", "ts", "event_id", "event_type"
        )
        rows = transition_matrix(ev).collect()
        by_from = {}
        for r in rows:
            by_from.setdefault(r.from_type, []).append(r.prob_micros)
        for probs in by_from.values():
            # integer div truncates: sum in (1e6 - |row|, 1e6]
            assert 1000000 - len(probs) < sum(probs) <= 1000000

    def test_tie_col_makes_order_total(self, spark):
        rows = [(1, 5, 1, "x"), (1, 5, 2, "y"), (1, 5, 3, "z")]
        df = spark.createDataFrame(
            rows, ["user_id", "ts", "event_id", "event_type"]
        )
        got = {(r.from_type, r.to_type) for r in transition_matrix(df).collect()}
        assert got == {("x", "y"), ("y", "z")}


class TestCusum:
    def _df(self, spark, xs):
        return spark.createDataFrame(
            [(1, i, i, x) for i, x in enumerate(xs)],
            ["user_id", "ts", "event_id", "x"],
        )

    def test_matches_sequential_recurrence(self, spark):
        xs = [5, -3, 10, -20, 4, 4, -1, 30, -2]
        target = 2
        out = (
            cusum(self._df(spark, xs), "x", target_units=target)
            .orderBy("ts")
            .collect()
        )
        s, want = 0, []
        for x in xs:
            s = max(0, s + (x - target))
            want.append(s)
        assert [r.cusum_units for r in out] == want

    def test_reset_floor_at_zero(self, spark):
        out = (
            cusum(self._df(spark, [-100, 1, 1]), "x", target_units=0)
            .orderBy("ts")
            .collect()
        )
        assert [r.cusum_units for r in out] == [0, 1, 2]

    def test_slack_shifts_target(self, spark):
        a = cusum(self._df(spark, [10, 10]), "x", target_units=4,
                  slack_units=2).orderBy("ts").collect()
        b = cusum(self._df(spark, [10, 10]), "x",
                  target_units=6).orderBy("ts").collect()
        assert [r.cusum_units for r in a] == [r.cusum_units for r in b]

    def test_per_key_isolation(self, spark):
        rows = [(1, 0, 0, 100), (2, 1, 1, 1)]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "x"])
        got = {r.user_id: r.cusum_units
               for r in cusum(df, "x", target_units=0).collect()}
        assert got == {1: 100, 2: 1}


class TestWeightedSample:
    def _docs(self, spark, n=200):
        return spark.createDataFrame(
            [(i, i % 16 + 1) for i in range(n)], ["doc_id", "w"]
        )

    def test_exact_k_and_deterministic(self, spark):
        d = self._docs(spark)
        a = [r.doc_id for r in weighted_sample_topk(d, "w", k=20).collect()]
        b = [r.doc_id
             for r in weighted_sample_topk(d.repartition(9), "w", k=20).collect()]
        assert len(a) == 20 and a == b

    def test_zero_weight_never_sampled(self, spark):
        d = spark.createDataFrame(
            [(i, 0 if i < 50 else 5) for i in range(60)], ["doc_id", "w"]
        )
        got = {r.doc_id for r in weighted_sample_topk(d, "w", k=10).collect()}
        assert all(i >= 50 for i in got)

    def test_weight_bias(self, spark):
        # weight-1000x rows should dominate a k=25 sample of 50+50
        d = spark.createDataFrame(
            [(i, 64 if i < 50 else 1) for i in range(100)], ["doc_id", "w"]
        )
        got = {r.doc_id for r in weighted_sample_topk(d, "w", k=25).collect()}
        assert sum(1 for i in got if i < 50) >= 20

    def test_max_weight_clamp(self, spark):
        # clamped weights: w=10**9 must not explode 10**9 rows
        d = spark.createDataFrame(
            [(i, 10**9) for i in range(5)], ["doc_id", "w"]
        )
        assert weighted_sample_topk(d, "w", k=3, max_weight=8).count() == 3


    def test_fractional_weight_rounds_up_not_out(self, spark):
        # regression: cast('long') truncated weight 0.9 to ZERO
        # replicas — the row passed the positivity filter then
        # silently vanished from the sample. ceil keeps it (1 replica)
        d = spark.createDataFrame(
            [(1, 0.9), (2, 0.4), (3, 2.7)], ["doc_id", "w"]
        )
        got = {r.doc_id for r in weighted_sample_topk(d, "w", k=3).collect()}
        assert got == {1, 2, 3}

    def test_integer_weights_unchanged_by_ceil(self, spark):
        d_int = self._docs(spark)
        d_dbl = d_int.select("doc_id", F.col("w").cast("double").alias("w"))
        a = [r.doc_id for r in weighted_sample_topk(d_int, "w", k=15).collect()]
        b = [r.doc_id for r in weighted_sample_topk(d_dbl, "w", k=15).collect()]
        assert a == b
