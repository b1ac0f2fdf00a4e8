"""Bigram stupid-backoff LM quality scoring (operators/lm.py)."""

import math

from smartbots_etl_facturas_spark.operators.lm import (
    score_bigram_lm,
    train_bigram_lm,
)


def test_bigram_lm_hand_computed(spark):
    """Every backoff tier against a hand-computed reference: seen
    bigram (c12/c1), unseen bigram with seen word (alpha*c2/T), OOV
    word (alpha/T)."""
    train = spark.createDataFrame(
        [(0, "a b a c"), (2, "a b x")], "doc_id long, text string")
    test = spark.createDataFrame(
        [(1, "a b q"), (3, "c a b")], "doc_id long, text string")
    uni, bi = train_bigram_lm(train)
    out = {r.doc_id: r for r in score_bigram_lm(test, uni, bi).collect()}
    # train tokens: a,b,a,c,a,b,x -> c(a)=3 c(b)=2 c(c)=1 c(x)=1, T=7
    # bigrams: (a,b):2 (b,a):1 (a,c):1 (b,x):1
    r1 = out[1]           # 'a b' seen; 'b q' OOV
    assert (r1.n_bigrams, r1.n_seen, r1.n_backoff, r1.n_oov, r1.sum_c12) == (2, 1, 0, 1, 2)
    exp1 = (round(math.log(2 / 3), 6) + round(math.log(0.4 / 7), 6)) / 2
    assert math.isclose(r1.avg_logprob, exp1, rel_tol=1e-12)
    r3 = out[3]           # 'c a' unseen but a known -> backoff; 'a b' seen
    assert (r3.n_bigrams, r3.n_seen, r3.n_backoff, r3.n_oov) == (2, 1, 1, 0)
    exp3 = (round(math.log(0.4 * 3 / 7), 6) + round(math.log(2 / 3), 6)) / 2
    assert math.isclose(r3.avg_logprob, exp3, rel_tol=1e-12)


def test_lm_score_ranks_reference_like_text_higher(spark, sf_dir):
    """The filter's point: reference-corpus-like text scores above
    scrambled-vocabulary noise."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    natural = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").limit(20)
    noise = natural.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),   # reversed chars = OOV soup
    )
    uni, bi = train_bigram_lm(train)
    scored = score_bigram_lm(natural.unionByName(noise), uni, bi)
    rows = scored.collect()
    nat = [r.avg_logprob for r in rows if r.doc_id < 1_000_000]
    noi = [r.avg_logprob for r in rows if r.doc_id >= 1_000_000]
    assert nat and noi
    assert sum(nat) / len(nat) > sum(noi) / len(noi) + 1.0


def test_lm_empty_inputs(spark):
    """Empty test set scores to an empty frame; a test doc whose every
    word is OOV still scores (alpha/T tier), it is not dropped."""
    import pyspark.sql.functions as F  # noqa: F401

    train = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    uni, bi = train_bigram_lm(train)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert score_bigram_lm(empty, uni, bi).count() == 0
    oov = spark.createDataFrame([(9, "zz qq zz")], "doc_id long, text string")
    row = score_bigram_lm(oov, uni, bi).collect()[0]
    assert (row.n_bigrams, row.n_oov, row.n_seen) == (2, 2, 0)
    assert row.avg_logprob < 0
