"""Bucketed range join semantics (operators/rangejoin.py):
boundary inclusivity, bucket-edge pairs, differential vs the O(n·m)
definition, and the equi-join plan contract."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.rangejoin import bucketed_range_join

L_SCHEMA = "k string, ts long, lid long"
R_SCHEMA = "k string, ts long, rid long"


def _pairs(spark, left_rows, right_rows, lower, upper):
    left = spark.createDataFrame(left_rows, L_SCHEMA)
    right = spark.createDataFrame(right_rows, R_SCHEMA)
    out = bucketed_range_join(left, right, on="k", ts_col="ts",
                              lower=lower, upper=upper)
    return {(r.lid, r.r_rid) for r in out.collect()}


def test_window_boundaries_inclusive(spark):
    # window [ts-10, ts]: both endpoints match, outside does not
    got = _pairs(
        spark,
        [("a", 100, 1)],
        [("a", 89, 1), ("a", 90, 2), ("a", 95, 3), ("a", 100, 4), ("a", 101, 5)],
        lower=-10, upper=0,
    )
    assert got == {(1, 2), (1, 3), (1, 4)}


def test_pairs_across_bucket_edge(spark):
    # width w=10; left at 99 probes buckets 8 and 9 — right at 91
    # (bucket 9) and at 90 (bucket 9) and at 89 (bucket 8) all match
    got = _pairs(
        spark,
        [("a", 99, 1)],
        [("a", 89, 1), ("a", 90, 2), ("a", 91, 3)],
        lower=-10, upper=0,
    )
    assert got == {(1, 1), (1, 2), (1, 3)}


def test_key_isolation_and_forward_window(spark):
    got = _pairs(
        spark,
        [("a", 10, 1), ("b", 10, 2)],
        [("a", 15, 1), ("b", 25, 2)],
        lower=0, upper=10,
    )
    assert got == {(1, 1)}                     # b's right row is out of range


def test_lower_gt_upper_rejected(spark):
    left = spark.createDataFrame([("a", 1, 1)], L_SCHEMA)
    right = spark.createDataFrame([("a", 1, 1)], R_SCHEMA)
    with pytest.raises(ValueError):
        bucketed_range_join(left, right, on="k", lower=5, upper=1)


def test_differential_vs_bruteforce(spark):
    left_rows = [(f"k{i % 4}", (i * 37) % 200, i) for i in range(50)]
    right_rows = [(f"k{i % 4}", (i * 53) % 200, i) for i in range(70)]
    lower, upper = -25, 5
    got = _pairs(spark, left_rows, right_rows, lower, upper)
    want = {
        (lid, rid)
        for lk, lts, lid in left_rows
        for rk, rts, rid in right_rows
        if lk == rk and lts + lower <= rts <= lts + upper
    }
    assert got == want


def test_equi_join_plan_no_nested_loop(spark):
    left = spark.createDataFrame([("a", 1, 1)], L_SCHEMA)
    right = spark.createDataFrame([("a", 1, 1)], R_SCHEMA)
    plan = (
        bucketed_range_join(left, right, on="k", lower=-10, upper=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


class TestEditDistanceJoin:
    """PassJoin pigeonhole edit-distance self-join (round 8) — the
    lossless-filter contract: candidates ⊇ all true pairs, verify is
    exact, so output == brute force on any input."""

    def _brute(self, rows, d=1):
        import duckdb

        return sorted(duckdb.sql(
            "SELECT least(a.id,b.id), greatest(a.id,b.id), "
            "levenshtein(a.s,b.s) "
            "FROM (SELECT unnest($i) id, unnest($s) s) a "
            "JOIN (SELECT unnest($i) id, unnest($s) s) b "
            f"ON a.id < b.id AND levenshtein(a.s,b.s) <= {d}",
            params={"i": [r[0] for r in rows], "s": [r[1] for r in rows]},
        ).fetchall())

    def test_matches_brute_force_varied_lengths(self, spark):
        from smartbots_etl_facturas_spark.operators.linkage import (
            edit_distance_join,
        )

        rows = [
            (1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "kitte"),
            (5, "kitten"), (6, "xy"), (7, "yy"), (8, "abcd"),
            (9, "abxd"), (10, "abcde"), (11, "zbcde"), (12, "ab"),
        ]
        df = spark.createDataFrame(rows, "id long, s string")
        got = sorted(
            (r.a_id, r.b_id, r.dist)
            for r in edit_distance_join(df, "id", "s").collect()
        )
        assert got == self._brute(rows)
        # insertion at the segment boundary and at both ends covered
        assert (1, 4, 1) in got and (10, 11, 1) in got

    def test_random_strings_match_brute_force(self, spark):
        from smartbots_etl_facturas_spark.operators.linkage import (
            edit_distance_join,
        )

        # deterministic pseudo-random short strings over a tiny
        # alphabet: dense distance-1 neighborhoods, many length pairs
        rows = [
            (i, "".join("abc"[(i * 7 + j * 13) % 3]
                        for j in range(2 + (i * 11) % 4)))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "id long, s string").repartition(7)
        got = sorted(
            (r.a_id, r.b_id, r.dist)
            for r in edit_distance_join(df, "id", "s").collect()
        )
        assert got == self._brute(rows) and len(got) > 50

    def test_max_dist_2_matches_brute_force(self, spark):
        """Round-9 generalization: d+1 segments, (2d+1)-shift probe —
        exact at max_dist=2 on a dense small-alphabet corpus with
        many length pairs (insertions/deletions across segment
        boundaries)."""
        from smartbots_etl_facturas_spark.operators.linkage import (
            edit_distance_join,
        )

        rows = [
            (i, "".join("abc"[(i * 7 + j * 13) % 3]
                        for j in range(3 + (i * 11) % 5)))
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "id long, s string").repartition(7)
        got = sorted(
            (r.a_id, r.b_id, r.dist)
            for r in edit_distance_join(df, "id", "s", max_dist=2).collect()
        )
        assert got == self._brute(rows, d=2) and len(got) > 100

    def test_short_strings_side_channel(self, spark):
        """Length <= d strings cannot be segmented; the distinct-value
        side channel must still pair them with every partner of
        length <= 2d (round-8 ADVICE: they were silently dropped)."""
        from smartbots_etl_facturas_spark.operators.linkage import (
            edit_distance_join,
        )

        rows = [
            (1, "a"), (2, "b"), (3, "ab"), (4, ""), (5, "a"),
            (6, "xyz"), (7, "xy"), (8, "x"), (9, "abc"),
        ]
        df = spark.createDataFrame(rows, "id long, s string")
        for d in (1, 2):
            got = sorted(
                (r.a_id, r.b_id, r.dist)
                for r in edit_distance_join(df, "id", "s", max_dist=d).collect()
            )
            assert got == self._brute(rows, d=d)
        # the len-1 / len-2 pair the round-8 tier missed
        assert (1, 3, 1) in got or (1, 3, 1) in self._brute(rows, 1)

    def test_hot_prefix_refinement_and_salt(self, spark):
        """Skew path: a shared-prefix corpus with a tiny hot threshold
        forces the recursive refinement AND the salted fallback;
        output must stay bit-identical to brute force (losslessness
        of the residual pigeonhole) and to the skew-free plan."""
        from smartbots_etl_facturas_spark.operators.linkage import (
            edit_distance_join,
        )

        rows = [(i, "Customer#%05d" % (i % 150)) for i in range(220)]
        rows += [(1000 + i, "ab") for i in range(20)]  # hot + infeasible
        df = spark.createDataFrame(rows, "id long, s string").repartition(5)
        want = self._brute(rows, d=1)
        got_hot = sorted(
            (r.a_id, r.b_id, r.dist)
            for r in edit_distance_join(
                df, "id", "s",
                hot_product=36, refine_levels=3, salt_buckets=4,
            ).collect()
        )
        got_cold = sorted(
            (r.a_id, r.b_id, r.dist)
            for r in edit_distance_join(
                df, "id", "s", hot_product=10_000_000_000,
            ).collect()
        )
        assert got_hot == want and got_cold == want and len(want) > 200
        # the d=2 recursion path on the same shared-prefix corpus
        want2 = self._brute(rows, d=2)
        got2 = sorted(
            (r.a_id, r.b_id, r.dist)
            for r in edit_distance_join(
                df, "id", "s", max_dist=2,
                hot_product=36, refine_levels=2, salt_buckets=4,
            ).collect()
        )
        assert got2 == want2 and len(want2) > len(want)

    def test_refine_budget_exhaustion_salts(self, spark):
        """refine_levels=0 sends every hot group straight to the
        salted pass — still exact."""
        from smartbots_etl_facturas_spark.operators.linkage import (
            edit_distance_join,
        )

        rows = [(i, "PFX%04d" % (i % 60)) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, s string")
        got = sorted(
            (r.a_id, r.b_id, r.dist)
            for r in edit_distance_join(
                df, "id", "s", hot_product=16, refine_levels=0,
                salt_buckets=3,
            ).collect()
        )
        assert got == self._brute(rows, d=1)

    def test_invalid_params_rejected(self, spark):
        import pytest as _pytest

        from smartbots_etl_facturas_spark.operators.linkage import (
            edit_distance_join,
        )

        df = spark.createDataFrame([(1, "ab")], "id long, s string")
        with _pytest.raises(ValueError):
            edit_distance_join(df, "id", "s", max_dist=0)
        with _pytest.raises(ValueError):
            edit_distance_join(df, "id", "s", max_dist=7)
        with _pytest.raises(ValueError):
            edit_distance_join(df, "id", "s", hot_product=0)


class TestEditDistanceProperties:
    """Hypothesis differential: edit_distance_join == brute force on
    random corpora across alphabets (incl. multibyte unicode), both
    distance tiers, and both the direct-join and forced-recursion
    regimes. Shrinking finds minimal counterexamples if the lossless
    pigeonhole chain ever breaks.

    The reference here is a pure-Python CHARACTER-level DP, not
    DuckDB: hypothesis found (round 9) that DuckDB's levenshtein is
    BYTE-based (levenshtein('', '€') = 3) while Spark's is
    character-based (= 1) — they agree exactly on ASCII, which is why
    the registered oracle corpora (TPC-H names) are sound, but a
    unicode differential must match Spark's semantics."""

    @staticmethod
    def _lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def _brute(self, rows, d):
        return sorted(
            (ia, ib, self._lev(sa, sb))
            for ia, sa in rows
            for ib, sb in rows
            if ia < ib and self._lev(sa, sb) <= d
        )

    def _check(self, spark, strings, d, **kw):
        from smartbots_etl_facturas_spark.operators.linkage import (
            edit_distance_join,
        )

        rows = list(enumerate(strings))
        df = spark.createDataFrame(rows, "id long, s string").repartition(3)
        got = sorted(
            (r.a_id, r.b_id, r.dist)
            for r in edit_distance_join(
                df, "id", "s", max_dist=d, **kw
            ).collect()
        )
        assert got == self._brute(rows, d)

    def test_random_corpora_match_brute_force(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=10, deadline=None)
        @given(
            strings=st.lists(
                st.text(alphabet="ab€界", min_size=0, max_size=7),
                min_size=2, max_size=18,
            ),
            d=st.sampled_from([1, 2]),
        )
        def prop(strings, d):
            self._check(spark, strings, d)

        prop()

    def test_random_corpora_forced_recursion(self, spark):
        """hot_product=2 forces (almost) every shared key through the
        residual recursion + salted fallback."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=6, deadline=None)
        @given(
            strings=st.lists(
                st.text(alphabet="ab", min_size=0, max_size=5),
                min_size=2, max_size=14,
            ),
            d=st.sampled_from([1, 2]),
        )
        def prop(strings, d):
            self._check(
                spark, strings, d,
                hot_product=2, refine_levels=2, salt_buckets=3,
            )

        prop()


def test_shuffle_width_falls_back_on_non_numeric_conf(spark):
    """'auto' shuffle-partition values (managed-platform auto-optimized
    shuffle) must not crash the candidate stage's width pinning."""
    from smartbots_etl_facturas_spark.operators.linkage import (
        _shuffle_width,
    )

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    assert _shuffle_width(spark) == int(orig)

    # OSS Spark rejects non-int values for this conf at set() time, so
    # the managed-platform 'auto' case is modeled with a stub session
    # exposing the same surface _shuffle_width touches.
    class _Conf:
        def get(self, key):
            return "auto"

    class _Ctx:
        defaultParallelism = 7

    class _Fake:
        conf = _Conf()
        sparkContext = _Ctx()

    assert _shuffle_width(_Fake()) == 7


def test_edit_distance_join_checkpoint_param_validation(spark):
    """checkpoint accepts only 'local'/'reliable'; 'reliable' works
    end-to-end once a checkpoint dir is set and matches 'local'."""
    import pytest
    from smartbots_etl_facturas_spark.operators.linkage import (
        edit_distance_join,
    )

    df = spark.createDataFrame(
        [(i, f"PRE{i % 4}X{i}") for i in range(40)], "id long, s string"
    )
    with pytest.raises(ValueError, match="checkpoint"):
        edit_distance_join(df, "id", "s", checkpoint="hdfs")
    local = {
        (r.a_id, r.b_id, r.dist)
        for r in edit_distance_join(
            df, "id", "s", hot_product=4, refine_levels=1
        ).collect()
    }
    import tempfile

    with tempfile.TemporaryDirectory() as ck:
        spark.sparkContext.setCheckpointDir(ck)
        reliable = {
            (r.a_id, r.b_id, r.dist)
            for r in edit_distance_join(
                df, "id", "s", hot_product=4, refine_levels=1,
                checkpoint="reliable",
            ).collect()
        }
    assert reliable == local
