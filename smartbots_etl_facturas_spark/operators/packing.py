"""Sequence packing — greedy token-budget bin packing of documents
into fixed-size training sequences (engine extension; the standard
step between a cleaned corpus and an LLM pretraining dataloader).

Global bin packing is NP-hard and inherently sequential, so the
scalable formulation is HASH-BUCKETED greedy packing: documents land
in ``num_buckets`` deterministic hash buckets, and each bucket is
packed independently with the classic next-fit rule (walk docs in id
order, start a new pack when the budget would overflow). Properties:

- Fully distributed: one Arrow-batched ``applyInPandas`` group per
  bucket; adding data adds buckets/partitions, never a serial pass.
- Deterministic: bucket = pmod(xxhash64(id), B); walk order = id.
- Quality: next-fit wastes < 1 doc per pack boundary on average —
  the accepted trade for O(n) distributed packing (exactly what
  per-shard packers in real pretraining pipelines do).
- Oversized documents (> budget alone) get a single-doc pack; they
  are reported, not dropped (truncation is a downstream choice).

``pack_id`` is globally unique: bucket * 2^32 + local pack index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = (
    "doc_id long, bucket int, pack_id long, n_tokens long, pack_fill long"
)


def pack_greedy(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
    num_buckets: int = 32,
    bucket_col: str | None = None,
) -> DataFrame:
    """Assign each document to a pack of total tokens <= ``budget``
    (next-fit greedy per hash bucket, walk order = ``id_col``).

    Output: (doc_id, bucket, pack_id, n_tokens, pack_fill) where
    ``pack_fill`` is the pack's running total AFTER this document —
    the last doc of a pack carries the pack's final fill.

    ``bucket_col`` overrides the default xxhash64 bucketing with a
    caller-supplied bucket column (e.g. a hash both an oracle engine
    and Spark can compute identically). It must be NON-NEGATIVE —
    ``pack_id = bucket * 2^32 + local index`` needs that for global
    uniqueness, and a plain ``hash % B`` can go negative — so the
    column is pmod'd into [0, 2^31) defensively rather than trusted.
    """
    bucket = (
        F.pmod(F.col(bucket_col).cast("long"), F.lit(1 << 31)).cast("int")
        if bucket_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)).cast("int")
    )
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        bucket.alias("bucket"),
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        packs, fills = [], []
        pack, fill = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill > 0 and fill + t > budget:
                pack += 1
                fill = 0
            fill += t
            packs.append(pack)
            fills.append(fill)
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "bucket": pdf["bucket"],
                "pack_id": [bucket * (1 << 32) + p for p in packs],
                "n_tokens": pdf["n_tokens"],
                "pack_fill": fills,
            }
        )

    return src.groupBy("bucket").applyInPandas(_pack, PACKED_SCHEMA)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Pack-level utilization report: one row per pack with fill,
    doc count, and whether the pack is a single oversized document."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("fill"),
        (F.max("n_tokens") > budget).alias("oversized"),
    )
