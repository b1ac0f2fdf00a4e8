"""Sliding-window document chunking for training-data preparation.

Splits each document's whitespace tokens into fixed-size windows with
a configurable stride (overlap = chunk_tokens - stride), the standard
context-window preparation step between cleaning and sequence packing
(see operators/packing.py for the packing stage that follows).

Scale design: chunk starts are generated EXECUTOR-SIDE with
``sequence``/``explode`` on each row — no driver participation, no
shuffle, no Python; a 100 TB corpus chunks as a single narrow
projection stage and the output inherits the input partitioning.

Reference parity note: the reference engine has no chunking operator
(its unit of work is an invoice row); this is part of the
training-data surface extension mandated by BASELINE.json's north
star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Window spec (deterministic, fully covering):

    - starts are ``1, 1+stride, 1+2*stride, ...`` while
      ``start <= max(n_tokens - overlap, 1)`` where
      ``overlap = chunk_tokens - stride`` — so every token lands in at
      least one chunk, consecutive chunks share exactly ``overlap``
      tokens, and the final chunk may be shorter than ``chunk_tokens``
      (it is never fully contained in its predecessor);
    - a document shorter than one window yields exactly one chunk.

    Output: ``(id_col, chunk_idx, n_chunk_tokens, chunk_text)`` with
    ``chunk_idx = (start - 1) / stride`` (0-based, dense per doc).
    """
    if not (0 < stride <= chunk_tokens):
        raise ValueError("require 0 < stride <= chunk_tokens")
    overlap = chunk_tokens - stride
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(stride)
    )
    piece = F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(starts).alias("__start"),
        )
        .select(
            id_col,
            ((F.col("__start") - 1) / stride).cast("long").alias("chunk_idx"),
            F.size(piece).cast("long").alias("n_chunk_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )
