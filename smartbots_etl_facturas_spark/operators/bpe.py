"""Distributed BPE merge training — tokenizer induction on the
corpus (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units"), the step that turns a cleaned corpus
into a subword vocabulary before an LLM pretraining run.

Classic BPE iterates on the WORD-FREQUENCY table, not the corpus:

1. ``words = corpus.groupBy(word).count()`` — the only corpus-scale
   pass (narrow shuffle, map-side combine absorbs the Zipfian head).
2. Each merge round aggregates adjacent-symbol-pair counts weighted
   by word frequency (explode + groupBy + global top-1, which Spark
   executes as TakeOrdered — no full sort), then rewrites the symbol
   arrays with the winning merge applied (greedy leftmost,
   non-overlapping — the reference semantics) via one Arrow batch
   pass over the vocab frame.

At 100 TB the vocab table is orders of magnitude smaller than the
corpus (distinct words, not tokens), so the per-round iteration cost
is bounded by vocabulary size; ``localCheckpoint`` per round keeps
the plan from re-deriving all previous merges each time (same
pattern as the label-propagation clustering).

Determinism: ties on pair count break lexicographically on (left,
right), so the merge table is a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smartbots_etl_facturas_spark.functions.text import tokens

MERGES_SCHEMA = "rank int, left string, right string, merged string, pair_count long"


def word_frequency(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) from whitespace tokenization — the only
    corpus-sized aggregation BPE needs."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _char_symbols(word_col: str) -> "F.Column":
    return F.expr(
        f"transform(sequence(1, length({word_col})), "
        f"i -> substring({word_col}, i, 1))"
    )


_SYMS_SCHEMA = T.StructType([
    T.StructField("wc", T.LongType(), False),
    T.StructField("syms", T.ArrayType(T.StringType()), False),
])


def _apply_merge(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every symbol array with (left, right) -> left+right,
    greedy leftmost non-overlapping — the BPE reference semantics."""

    def _batches(batches):
        for pdf in batches:
            def merge_one(arr):
                out, i, n = [], 0, len(arr)
                while i < n:
                    if i + 1 < n and arr[i] == left and arr[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(arr[i])
                        i += 1
                return out

            yield pdf.assign(syms=pdf["syms"].map(lambda a: merge_one(list(a))))

    return syms.mapInPandas(_batches, _SYMS_SCHEMA)


def adjacent_pair_counts(syms: DataFrame) -> DataFrame:
    """(l, r, n): frequency-weighted counts of adjacent symbol pairs."""
    pairs = F.expr(
        "CASE WHEN size(syms) >= 2 THEN "
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(syms[i-1] AS l, syms[i] AS r)) ELSE array() END"
    )
    return (
        syms.select("wc", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("wc").alias("n"))
    )


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn up to ``num_merges`` BPE merges from the corpus; returns
    a DataFrame (rank, left, right, merged, pair_count) in merge
    order. Stops early when no pair reaches ``min_pair_count``.

    Driver state is one (left, right, count) row per round plus the
    final merge list — never the vocabulary.
    """
    spark = docs.sparkSession
    syms = word_frequency(docs, text_col).select(
        F.col("wc").cast("long").alias("wc"),
        _char_symbols("word").alias("syms"),
    ).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        top = (
            adjacent_pair_counts(syms)
            .orderBy(F.desc("n"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0].n < min_pair_count:
            break
        l, r, n = top[0].l, top[0].r, int(top[0].n)
        merges.append((rank, l, r, l + r, n))
        syms = _apply_merge(syms, l, r).localCheckpoint(eager=False)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def segment_words(words: DataFrame, merges: list[tuple[str, str]],
                  word_col: str = "word") -> DataFrame:
    """Apply a learned merge list to segment words into subword
    tokens (adds ``pieces`` array column) — the inference side of the
    trained tokenizer, one Arrow pass, merges applied in rank order
    per word exactly as in training."""
    merge_list = list(merges)

    out_schema = T.StructType(
        words.schema.fields + [T.StructField("pieces", T.ArrayType(T.StringType()))]
    )

    def _batches(batches):
        for pdf in batches:
            def seg(w):
                arr = list(w)
                for left, right in merge_list:
                    out, i, n = [], 0, len(arr)
                    while i < n:
                        if i + 1 < n and arr[i] == left and arr[i + 1] == right:
                            out.append(left + right)
                            i += 2
                        else:
                            out.append(arr[i])
                            i += 1
                    arr = out
                return arr

            yield pdf.assign(pieces=pdf[word_col].map(seg))

    return words.mapInPandas(_batches, out_schema)
