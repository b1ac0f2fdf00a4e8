"""As-of join semantics (operators/asof.py): latest-at-or-before
match, left-outer nulls, equal-ts visibility, duplicate tiebreak, and
a brute-force differential check on random-ish data."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.asof import asof_join

L_SCHEMA = "k string, ts long, lv string"
R_SCHEMA = "k string, ts long, rv string, rid long"


def _join(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, L_SCHEMA)
    right = spark.createDataFrame(right_rows, R_SCHEMA)
    out = asof_join(left, right, on="k", ts_col="ts", **kw)
    return {(r.k, r.ts): r for r in out.collect()}


def test_latest_at_or_before_wins(spark):
    rows = _join(
        spark,
        [("a", 10, "L1"), ("a", 25, "L2")],
        [("a", 5, "R5", 1), ("a", 10, "R10", 2), ("a", 20, "R20", 3), ("a", 30, "R30", 4)],
    )
    assert rows[("a", 10)].matched_rv == "R10"      # equal ts is visible
    assert rows[("a", 10)].matched_ts == 10
    assert rows[("a", 25)].matched_rv == "R20"      # latest before, not first
    assert rows[("a", 25)].matched_ts == 20


def test_no_prior_row_is_null_and_keys_dont_leak(spark):
    rows = _join(
        spark,
        [("a", 1, "L"), ("b", 50, "L")],
        [("a", 5, "R", 1)],
    )
    assert rows[("a", 1)].matched_rv is None        # right row is later
    assert rows[("a", 1)].matched_ts is None
    assert rows[("b", 50)].matched_rv is None       # key has no right rows
    assert len(rows) == 2                           # left-outer: every left row kept


def test_duplicate_ts_tiebreak_max_wins(spark):
    rows = _join(
        spark,
        [("a", 10, "L")],
        [("a", 10, "first", 1), ("a", 10, "second", 9), ("a", 10, "mid", 5)],
        tiebreak="rid",
    )
    assert rows[("a", 10)].matched_rv == "second"


def test_differential_vs_bruteforce(spark):
    # deterministic pseudo-random fixture; compare against the O(n·m)
    # definition computed in plain Python
    left_rows = [(f"k{i % 5}", (i * 37) % 101, f"L{i}") for i in range(60)]
    right_rows = [(f"k{i % 5}", (i * 53) % 101, f"R{i}", i) for i in range(80)]
    got = _join(spark, left_rows, right_rows, tiebreak="rid")
    for k, ts, _ in left_rows:
        cands = [(rts, rid, rv) for rk, rts, rv, rid in right_rows
                 if rk == k and rts <= ts]
        row = got[(k, ts)]
        if not cands:
            assert row.matched_rv is None
        else:
            want = max(cands)[2]
            assert row.matched_rv == want, (k, ts, row.matched_rv, want)


def test_single_shuffle_plan(spark):
    # the 100 TB contract: ONE exchange (the window shuffle on the
    # key), no broadcast/range-join explosion
    left = spark.createDataFrame([("a", 1, "L")], L_SCHEMA)
    right = spark.createDataFrame([("a", 1, "R", 1)], R_SCHEMA)
    plan = asof_join(left, right, on="k", ts_col="ts")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_salted_identical_to_unsalted(spark):
    """Round-11: salt_partitions splits a low-cardinality key's merge
    across S buckets (right stream replicated per bucket) — the
    OUTPUT must be bit-identical to the unsalted merge, including
    tiebreak and left-outer nulls."""
    left_rows = [(f"k{i % 2}", (i * 37) % 101, f"L{i}") for i in range(80)]
    right_rows = [(f"k{i % 2}", (i * 53) % 101, f"R{i}", i) for i in range(60)]
    plain = _join(spark, left_rows, right_rows, tiebreak="rid")
    for s in (1, 7, 32):
        salted = _join(spark, left_rows, right_rows, tiebreak="rid",
                       salt_partitions=s)
        assert set(salted) == set(plain)
        for key in plain:
            assert (salted[key].matched_rv, salted[key].matched_ts) == (
                plain[key].matched_rv, plain[key].matched_ts), (key, s)
    # salt column must not leak into the output schema
    left = spark.createDataFrame(left_rows, L_SCHEMA)
    right = spark.createDataFrame(right_rows, R_SCHEMA)
    out = asof_join(left, right, on="k", ts_col="ts", salt_partitions=4)
    assert "__salt" not in out.columns


def test_salted_window_partitions_by_key_and_salt(spark):
    """The executed plan's window must partition by (key, salt), so
    parallelism is S x |keys| rather than |keys|."""
    left = spark.createDataFrame([("a", 1, "L")], L_SCHEMA)
    right = spark.createDataFrame([("a", 1, "R", 1)], R_SCHEMA)
    plan = asof_join(
        left, right, on="k", ts_col="ts", salt_partitions=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan.split("Window")[1][:400]
