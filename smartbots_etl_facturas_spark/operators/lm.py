"""N-gram language-model quality scoring — the CCNet-style
"perplexity filter" step of a pretraining data pipeline (Wenzek et
al. 2020 score documents with a KenLM model; the distributed analogue
trains count tables on a reference split of the corpus itself and
scores with stupid backoff, Brants et al. 2007 — the smoothing
designed for exactly this setting: web-scale counts, no held-out
tuning, trivially distributable).

Shapes at 100 TB:

- Training is two count aggregations (unigrams, bigrams) — narrow
  shuffles on token keys with map-side combine; count tables live as
  DataFrames, never on the driver.
- Scoring is a per-document bigram explode joined against the count
  tables (equi-joins on token keys) and re-aggregated per doc_id.
  Only the corpus-total token count (one scalar) is broadcast.
- Everything is integer counts until the final per-document log
  score, so the count pipeline is exactly reproducible by a SQL
  oracle; the float score is a single expression over per-doc
  integer aggregates (no cross-row float accumulation ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.functions.text import tokens


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__w"))


def _doc_bigrams(tok: DataFrame, id_col: str) -> DataFrame:
    bigrams = F.expr(
        "CASE WHEN size(__w) >= 2 THEN "
        "transform(sequence(1, size(__w) - 1), "
        "i -> struct(__w[i-1] AS w1, __w[i] AS w2)) "
        "ELSE array() END"
    )
    return tok.select(
        F.col(id_col), F.explode(bigrams).alias("__b")
    ).select(id_col, F.col("__b.w1").alias("w1"), F.col("__b.w2").alias("w2"))


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Count tables from a reference corpus: (unigrams(w1, c1),
    bigrams(w1, w2, c12)). Two groupBy aggregations — map-side
    combine collapses hot tokens before the shuffle, so a Zipfian
    vocabulary does not straggle."""
    tok = _doc_tokens(docs, text_col, id_col)
    uni = (
        tok.select(F.explode("__w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        _doc_bigrams(tok, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    return uni, bi


def score_bigram_lm(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Score documents against trained count tables with stupid
    backoff: S(w2|w1) = c12/c1 when the bigram was seen, else
    alpha·c2/T when w2 was seen, else alpha/T (OOV word); T = total
    training tokens.

    Output per document: ``n_bigrams``, ``n_seen``, ``n_backoff``,
    ``n_oov``, ``sum_c12`` (integer-exact — the oracle-checkable
    audit of the count pipeline) and ``avg_logprob`` (mean ln S —
    computed per ROW then summed as a rounded decimal so the result
    is independent of partition/accumulation order; higher = more
    reference-corpus-like; the quality-filter threshold operates on
    this)."""
    tok = _doc_tokens(docs, text_col, id_col)
    doc_bi = _doc_bigrams(tok, id_col)
    total = uni.agg(F.sum("c1").alias("__t"))
    uni2 = uni.select(F.col("w1").alias("w2"), F.col("c1").alias("c2"))
    scored = (
        doc_bi.join(bi, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .join(uni2, "w2", "left")
        .crossJoin(F.broadcast(total))     # 1-row scalar
    )
    prob = (
        F.when(
            F.col("c12").isNotNull(),
            F.col("c12").cast("double") / F.col("c1").cast("double"),
        )
        .when(
            F.col("c2").isNotNull(),
            F.lit(alpha) * F.col("c2").cast("double") / F.col("__t").cast("double"),
        )
        .otherwise(F.lit(alpha) / F.col("__t").cast("double"))
    )
    # round each bigram's logprob BEFORE the exact decimal sum: the
    # per-doc aggregate is then independent of accumulation order (and
    # the 1e-6 grain absorbs any last-ULP ln() divergence between
    # engines, same contract as the IVF centroid rounding)
    lp = F.round(F.log(prob), 6).cast("decimal(28,6)")
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.when(F.col("c12").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_seen"),
        F.sum(
            F.when(F.col("c12").isNotNull(), 0)
            .when(F.col("c2").isNotNull(), 1)
            .otherwise(0)
        ).cast("long").alias("n_backoff"),
        F.sum(
            F.when(F.col("c12").isNull() & F.col("c2").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_oov"),
        F.sum(F.coalesce(F.col("c12"), F.lit(0))).cast("long").alias("sum_c12"),
        F.sum(lp).alias("__lp_sum"),
    )
    # exact decimal -> double FIRST, then double/int division: both
    # steps are engine-portable (decimal division scale rules differ
    # between engines; double division does not)
    return out.withColumn(
        "avg_logprob",
        F.col("__lp_sum").cast("double") / F.col("n_bigrams"),
    ).drop("__lp_sum")
