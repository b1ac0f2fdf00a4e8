"""Tests for reciprocal-rank fusion (operators/fusion.py) and the
SCD2 point-in-time lookup (operators/scd.py:scd2_lookup)."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.fusion import reciprocal_rank_fusion
from smartbots_etl_facturas_spark.operators.scd import (
    scd2_from_changelog,
    scd2_lookup,
)


class TestRrf:
    def _lists(self, spark):
        a = spark.createDataFrame(
            [("x", 1), ("y", 2), ("z", 3)], ["doc", "rank"]
        )
        b = spark.createDataFrame(
            [("y", 1), ("x", 2)], ["doc", "rank"]
        )
        return [("a", a), ("b", b)]

    def test_scores_and_ranks(self, spark):
        got = {
            r.doc: (r.rrf_micros, r.n_lists, r.rank_a, r.rank_b)
            for r in reciprocal_rank_fusion(
                self._lists(spark), "doc", k=60
            ).collect()
        }
        # 1e6//61 = 16393, 1e6//62 = 16129, 1e6//63 = 15873
        assert got["x"] == (16393 + 16129, 2, 1, 2)
        assert got["y"] == (16129 + 16393, 2, 2, 1)
        assert got["z"] == (15873, 1, 3, None)

    def test_single_list_identity_order(self, spark):
        [(_, a), _] = self._lists(spark)
        rows = (
            reciprocal_rank_fusion([("only", a)], "doc")
            .orderBy(F.desc("rrf_micros"))
            .collect()
        )
        assert [r.doc for r in rows] == ["x", "y", "z"]

    def test_empty_lists_rejected(self, spark):
        with pytest.raises(ValueError):
            reciprocal_rank_fusion([], "doc")


class TestScd2Lookup:
    def _hist(self, spark):
        log = spark.createDataFrame(
            [
                (1, 10, 1, "A"),
                (1, 20, 2, "B"),
                (1, 30, 3, "B"),   # collapsed duplicate
                (1, 40, 4, "C"),
                (2, 15, 5, "X"),
            ],
            ["k", "ts", "tie", "attr"],
        )
        return scd2_from_changelog(log, ["k"], "ts", ["attr"], "tie")

    def test_probe_hits_covering_interval(self, spark):
        hist = self._hist(spark)
        probes = spark.createDataFrame(
            [(1, 10), (1, 19), (1, 25), (1, 40), (1, 99), (2, 15)],
            ["k", "ts"],
        )
        got = {
            (r.k, r.ts): r.attr
            for r in scd2_lookup(hist, probes, ["k"], "ts").collect()
        }
        assert got == {
            (1, 10): "A", (1, 19): "A", (1, 25): "B",
            (1, 40): "C", (1, 99): "C", (2, 15): "X",
        }

    def test_probe_before_history_drops(self, spark):
        hist = self._hist(spark)
        probes = spark.createDataFrame([(1, 5)], ["k", "ts"])
        assert scd2_lookup(hist, probes, ["k"], "ts").count() == 0

    def test_exactly_one_version_per_probe(self, spark):
        hist = self._hist(spark)
        probes = spark.createDataFrame(
            [(1, t) for t in range(10, 60)], ["k", "ts"]
        )
        out = scd2_lookup(hist, probes, ["k"], "ts")
        assert out.count() == out.select("k", "ts").distinct().count()
