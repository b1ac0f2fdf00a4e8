"""Salted aggregation/join must equal the unsalted plans exactly."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.skew import salted_agg, salted_join


def _skewed_df(spark):
    # one hot key (~80% of rows) + a long tail
    hot = spark.range(0, 8000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(0, 2000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r.k: (r.s, r.n, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r.k: (r.s, r.n, r.mx)
        for r in salted_agg(
            df, ["k"], {"s": ("v", "sum"), "n": ("v", "count"), "mx": ("v", "max")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"k{i}", f"dim-{i}") for i in range(50)],
        "k string, label string",
    )
    plain = sorted((r.k, r.v, r.label) for r in big.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.label) for r in salted_join(big, dim, ["k"], 8).collect())
    assert salted == plain


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame([("HOT", "hot-dim")], "k string, label string")
    out = salted_join(big, dim, ["k"], 4, how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("label").isNull()).count() == 2000


def test_auto_salt_buckets_pinned_on_skew_fixture(spark):
    """Auto width on the committed bench fixture shape (one key = 30%
    of rows, 10k-key tail): ceil(0.3 * P). Pinned at P=32 -> 10; a
    uniform distribution must yield 1 (no fan-out without a
    straggler)."""
    from smartbots_etl_facturas_spark.operators.skew import auto_salt_buckets

    n = 100_000
    fact = spark.range(n, numPartitions=8).select(
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)))
        .alias("key"),
        F.col("id").alias("val"),
    )
    assert auto_salt_buckets(fact, ["key"], target_parallelism=32) == 10
    # sampled histogram lands on the same width (deterministic seed)
    assert auto_salt_buckets(fact, ["key"], target_parallelism=32,
                             sample_fraction=0.05) == 10
    uniform = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("key")
    )
    assert auto_salt_buckets(uniform, ["key"], target_parallelism=32) == 1
    # degenerate: every row one key -> full parallelism, clamped to P
    one_key = spark.range(1_000).select(F.lit(7).alias("key"))
    assert auto_salt_buckets(one_key, ["key"], target_parallelism=32) == 32
    assert auto_salt_buckets(one_key.filter("key > 99"), ["key"],
                             target_parallelism=32) == 1   # empty input


def test_salted_join_auto_equals_plain(spark):
    """salt_buckets='auto' stays a pure physical rewrite — results
    bit-identical to the plain join on the skew fixture shape."""
    from smartbots_etl_facturas_spark.operators.skew import salted_join

    fact = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(500)))
        .alias("key"),
        F.col("id").alias("val"),
    )
    dim = spark.range(500).select(F.col("id").alias("key"),
                                  (F.col("id") * 2).alias("w"))
    plain = sorted((r.key, r.val, r.w) for r in fact.join(dim, "key").collect())
    salted = sorted(
        (r.key, r.val, r.w)
        for r in salted_join(fact, dim, ["key"], salt_buckets="auto").collect()
    )
    assert salted == plain


def test_salted_agg_rejects_bad_width(spark):
    from smartbots_etl_facturas_spark.operators.skew import salted_agg

    df = spark.range(10).select(F.lit("a").alias("k"), F.col("id").alias("v"))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        salted_agg(df, ["k"], {"s": ("v", "sum")}, salt_buckets=0)
    with _pytest.raises(ValueError):
        salted_agg(df, ["k"], {"s": ("v", "sum")}, salt_buckets="wide")


def test_similarity_join_stages_not_width_collapsed(spark, sf_dir):
    """Round-10 width-pin regression (the edit-distance r9 pathology
    applied to PPJoin): the candidate and verify stages must not run
    at AQE-coalesced width 1 while emitting heavy row volumes. The
    probe executes the registered query and reads the FINAL adaptive
    plan's shuffle widths + metrics; a narrow-but-heavy stage means
    the explicit repartition pins were lost in a refactor."""
    import __spark_entry__ as entry
    from scripts.check_stage_width import stage_widths

    df = entry.queries()["similarity_join"](spark, sf_dir)
    agg = df.groupBy().count()
    n = agg.collect()[0][0]
    assert n > 0
    stages = stage_widths(agg)
    # the pinned exchanges exist and carry the session width
    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pinned = [s for s in stages
              if s["node"] == "ShuffleExchangeExec" and s["width"] == sp]
    assert len(pinned) >= 2, (
        f"expected the repartition pins at width {sp}; stages={stages}"
    )
