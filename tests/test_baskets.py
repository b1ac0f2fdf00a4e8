"""Market-basket frequent_pairs: pair semantics (distinct baskets
containing both), dedup inside a basket, deterministic top-N cut."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.baskets import frequent_pairs


def test_frequent_pairs_counts_baskets_not_rows(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "b"),          # dup item in basket 1
        (2, "a"), (2, "b"), (2, "c"),
        (3, "b"), (3, "c"),
        (4, "a"),                               # singleton: no pairs
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r.item_a, r.item_b): r.support
        for r in frequent_pairs(df, "basket", "item", 10).collect()
    }
    assert got == {("a", "b"): 2, ("b", "c"): 2, ("a", "c"): 1}


def test_frequent_pairs_ordered_lt_and_topn_ties(spark):
    """Pairs are emitted with item_a < item_b exactly once, and the
    top-N boundary breaks count ties by the pair key."""
    rows = [(b, i) for b in range(6) for i in ("x", "y", "z")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = frequent_pairs(df, "basket", "item", 2).collect()
    assert [(r.item_a, r.item_b, r.support) for r in out] == [
        ("x", "y", 6),
        ("x", "z", 6),
    ]
    for r in out:
        assert r.item_a < r.item_b


def test_frequent_pairs_wide_basket(spark):
    """A k-item basket yields C(k,2) pairs and the plan stays a
    generator over the basket array (no self-join of the fact)."""
    df = spark.createDataFrame(
        [(1, f"i{j:02d}") for j in range(10)], "basket long, item string"
    )
    out = frequent_pairs(df, "basket", "item", 100)
    assert out.count() == 45
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan and "SortMergeJoin" not in plan
