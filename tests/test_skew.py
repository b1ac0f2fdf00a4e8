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
