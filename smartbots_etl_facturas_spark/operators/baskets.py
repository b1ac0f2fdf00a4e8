"""Market-basket co-occurrence mining.

``frequent_pairs``: the top-N item pairs that appear together in the
same basket (order), with support counts — the candidate-generation
kernel of Apriori/FP-growth shaped for Spark.

Plan shape (why not a self-join): the textbook formulation
self-joins the fact on the basket key — two shuffles of the full
fact plus a join whose output is the pair fan-out. Here the fact is
shuffled ONCE (groupBy basket → sorted distinct item array) and the
pair generation is a pure-Column generator over each basket's array
(nested ``transform`` + ``flatten`` + ``explode`` — JVM-side, no
Python). The fan-out is Σ basket_size², bounded by the basket-size
distribution (TPC-H: ≤7 lines/order), NOT by table size — the plan
carries (item_a, item_b) pairs only. The pair count is a second hash
aggregation on the pair key, and the top-N is TakeOrdered
(per-partition heap + k-row merge), never a global sort.

Items inside a basket are deduplicated and sorted so each unordered
pair is generated exactly once as (a < b) — count semantics are
"number of baskets containing both", matching the SQL oracle's
DISTINCT self-join formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_pairs"]


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    top_n: int = 25,
) -> DataFrame:
    """Top-``top_n`` co-occurring item pairs: (item_a, item_b,
    support) where support = number of distinct baskets containing
    both items; ties broken by (item_a, item_b) so the cut is
    deterministic."""
    baskets = (
        df.groupBy(F.col(basket_col).alias("__b"))
        .agg(F.sort_array(F.collect_set(F.col(item_col))).alias("__items"))
    )
    # every (i, j>i) index pair of the sorted array, one struct each
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("__items"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("__items"),
                            i + 2,
                            F.size(F.col("__items")),
                        ),
                        lambda y: F.struct(
                            x.alias("item_a"), y.alias("item_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.item_a", "p.item_b")
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), "item_a", "item_b")
        .limit(top_n)
    )
