"""Reciprocal-rank fusion (RRF) of ranked retrieval lists
(Cormack, Clarke & Büttcher, SIGIR 2009): the standard way to merge
heterogeneous rankers (lexical BM25 + dense ANN + recency, …) without
score calibration — each list contributes 1/(k + rank), summed per
item.

Contributions are exact integer micro-units (``1e6 div (k + rank)``)
so the fused ordering is bit-identical across engines — float
reciprocals would round non-portably right where fused scores tie.
Items missing from a list simply contribute nothing (the standard RRF
convention).

Scale design: each input list is already small (top-N per ranker); the
fuse is one unionByName + one keyed sum — no corpus access at all.
The rankers themselves bound the work, exactly how a production
retrieval stack layers a fuser over per-modality indexes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reciprocal_rank_fusion(
    lists: Sequence[tuple[str, DataFrame]],
    id_col: str,
    k: int = 60,
) -> DataFrame:
    """Fuse ranked lists into one scored ranking.

    ``lists`` is (name, frame) pairs where each frame carries
    ``id_col`` and an integer 1-based ``rank`` column. Returns one row
    per distinct item: ``id_col``, ``rrf_micros`` (the fused score),
    ``n_lists`` (how many lists ranked it), and one ``rank_<name>``
    column per input (null when absent).
    """
    if not lists:
        raise ValueError("need at least one ranked list")
    parts = []
    names = [name for name, _ in lists]
    for name, df in lists:
        cols = [F.col(id_col)]
        for other in names:
            cols.append(
                (F.col("rank") if other == name else F.lit(None))
                .cast("long")
                .alias(f"rank_{other}")
            )
        cols.append(
            F.expr(f"1000000 div ({int(k)} + rank)")
            .cast("long")
            .alias("__contrib")
        )
        parts.append(df.select(*cols))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(
        F.sum("__contrib").cast("long").alias("rrf_micros"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
        *[F.min(f"rank_{n}").alias(f"rank_{n}") for n in names],
    )
