"""Corpus-level term statistics: TF-IDF term salience and bigram-PMI
collocation mining — the standard "what is this corpus made of"
diagnostics run before training-data curation decisions.

Scale design (both operators):

- tokenization + n-gram extraction are narrow projections
  (explode on each row, no Python);
- all counting is ``groupBy`` with map-side partial aggregation, so
  the hot shuffle carries (term, partial_count) pairs, not rows;
- the term-statistics join is a plain equi-join on the term key —
  broadcastable when the vocabulary is small, shuffle-hash otherwise;
  Catalyst/AQE picks the strategy from runtime sizes, nothing here
  pins a driver-side collect.

Determinism-across-engines note: scores are ratios of exact integer
counts evaluated as IEEE-754 double division (correctly rounded,
hence bit-identical in Spark and DuckDB); no transcendental functions
in the compare path. True log-scaled tf-idf / PMI is a monotone
re-scaling of the df-part only, so per-document term RANKINGS differ
only where log changes the tf/df trade — the exported integer counts
let any consumer re-derive the log-scaled score exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.functions.text import tokens


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` most salient terms per document.

    tf = occurrences of the term in the document; df = number of
    documents containing the term; salience = tf / df (the monotone
    log-free core of tf-idf — see module docstring). Ties broken by
    term text ascending, so the ranking is a total order.

    Output: ``(id_col, term, tf, df, salience, rank)``.
    """
    term = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = term.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = term.join(docfreq, "term").select(
        id_col,
        "term",
        "tf",
        "df",
        (F.col("tf").cast("double") / F.col("df").cast("double")).alias("salience"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("salience").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top: int = 50,
) -> DataFrame:
    """Collocation mining: adjacent word pairs ranked by PMI lift.

    lift = P(xy) / (P(x) * P(y)) = (c_xy * U * U) / (T * c_x * c_y)
    where c_xy is the corpus bigram count, c_x/c_y unigram counts,
    T total bigrams, U total unigrams. Each integer factor is cast to
    double FIRST and the products/division evaluate left-to-right —
    every IEEE op is correctly rounded, so with the identical
    expression shape both engines produce bit-identical lifts at ANY
    corpus size (an earlier int64-product formulation overflowed
    silently past ~3e6 tokens). PMI proper is ``ln(lift)``, a
    monotone map, so the ranking is identical.

    Output: top ``top`` rows ``(w1, w2, c_xy, c_x, c_y, lift)``
    ordered by (lift desc, w1 asc, w2 asc) — a total order.
    """
    toks = df.select(tokens(F.col(text_col)).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2)) "
                "ELSE array() END"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    # Both corpus totals fall out of ONE pass over the token arrays
    # (U = sum of doc lengths, T = sum of per-doc bigram counts), so
    # the normalizer is a single 1-row broadcast, not two.
    totals = toks.agg(
        F.sum(F.size("t")).cast("long").alias("u_total"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).cast("long").alias("t_total"),
    )
    scored = (
        big.filter(F.col("c_xy") >= min_count)
        .crossJoin(F.broadcast(totals))
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_x"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_y"), "w2")
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            (
                (
                    F.col("c_xy").cast("double")
                    * F.col("u_total").cast("double")
                    * F.col("u_total").cast("double")
                )
                / (
                    F.col("t_total").cast("double")
                    * F.col("c_x").cast("double")
                    * F.col("c_y").cast("double")
                )
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top)
