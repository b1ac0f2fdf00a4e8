"""Mergeable KLL-style quantile sketches with MAP-SIDE partials.

The 100 TB shape for grouped percentiles. The exact path
(``exact_quantiles_qty``: per-group sort + value-at-rank) shuffles
every raw value to its group's reducer — O(n) shuffle volume and a
full per-group sort. Spark's own ``approx_percentile`` avoids that but
its sketch bytes are engine-private: they can't be persisted, merged
by another engine, or value-checked across engines.

This module rebuilds the compactor-hierarchy quantile summary of
Karnin, Lang & Liberty 2016 ("Optimal quantile approximation in
streams", KLL) in its DETERMINISTIC variant (the Manku-Rajagopalan-
Lindsay-style alternating compaction instead of coin flips) so that

  * the sketch for a given (data, partitioning, k) is bit-reproducible
    — merge order is pinned by sorting partials on partition id;
  * per-(group, partition) partials are built MAP-SIDE in one Arrow
    pass (``mapInPandas``); only the bounded sketches — O(k·log(n/k))
    doubles each — cross the wire. Shuffle volume is
    O(groups × k log n), independent of row count: at 100 TB the
    exchange carries megabytes, not the table;
  * merge is level-wise concatenation + the same compaction rule, so
    per-partition / per-day / per-shard sketches roll up exactly like
    the HLL/CMS family (operators/sketches.py) and can be persisted
    as plain ``array<array<double>>`` columns.

Accuracy: deterministic alternating compaction keeps each level's
contribution to rank error ≤ half its weight per compaction, giving
the classic MRL additive-rank bound eps·n with
eps ≈ 1.5·log2(n/k)/k. k=256 ⇒ eps < 0.01 well past 10^12 rows;
``tests/test_quantiles.py`` pins empirical rank error and
``kll_quantiles_invariants`` value-checks it against the exact ranks
at the correctness scale.

Parity note: the reference engine has no quantile operator — this is
part of the §2.10 extension surface (training-data pipeline tier),
sibling to hll_registers/cms_cells.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["KllSketch", "kll_group_partials", "kll_group_quantiles"]


class KllSketch:
    """Driver/executor-side compactor hierarchy. Level i holds items
    of weight 2^i; when a level exceeds ``k`` items it is sorted and
    every other item (alternating start parity per level) is promoted
    to level i+1. Pure python + floats — runs inside Arrow batches.
    """

    __slots__ = ("k", "n", "levels", "parity")

    def __init__(self, k: int = 256):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.n = 0
        self.levels: list[list[float]] = [[]]
        self.parity: list[int] = [0]

    # -- build ------------------------------------------------------
    def add_many(self, values) -> None:
        buf = [float(v) for v in values]
        if not buf:
            return
        self.levels[0].extend(buf)
        self.n += len(buf)
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            lvl = self.levels[i]
            if len(lvl) > self.k:
                lvl.sort()
                start = self.parity[i] & 1
                self.parity[i] += 1
                promoted = lvl[start::2]
                if i + 1 == len(self.levels):
                    self.levels.append([])
                    self.parity.append(0)
                self.levels[i + 1].extend(promoted)
                self.levels[i] = []
            i += 1

    # -- merge ------------------------------------------------------
    def merge(self, other: "KllSketch") -> "KllSketch":
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self.parity.append(0)
        for i, lvl in enumerate(other.levels):
            self.levels[i].extend(lvl)
        self.n += other.n
        self._compress()
        return self

    # -- query ------------------------------------------------------
    def _weighted_items(self) -> list[tuple[float, int]]:
        out: list[tuple[float, int]] = []
        for i, lvl in enumerate(self.levels):
            w = 1 << i
            out.extend((v, w) for v in lvl)
        out.sort()
        return out

    def quantile(self, q: float) -> float:
        """Value whose estimated rank is closest to q·n (q in [0,1]).
        Matches the SQL value-at-rank convention used by
        ``exact_quantiles_qty``: smallest retained value with
        cumulative weight ≥ q·n."""
        if self.n == 0:
            raise ValueError("empty sketch")
        items = self._weighted_items()
        target = q * self.n
        cum = 0
        for v, w in items:
            cum += w
            if cum >= target:
                return v
        return items[-1][0]

    # -- (de)serialization for Spark rows ---------------------------
    def to_row(self) -> tuple[int, list[list[float]]]:
        return self.n, [list(l) for l in self.levels]

    @classmethod
    def from_row(cls, k: int, n: int, levels: Sequence[Sequence[float]]) -> "KllSketch":
        s = cls(k)
        s.n = int(n)
        s.levels = [list(l) for l in levels]
        s.parity = [0] * len(s.levels)
        s._compress()
        return s


_PARTIAL_FIELDS = "__pid int, n long, levels array<array<double>>"


def kll_group_partials(
    df: DataFrame, key_col: str, value_col: str, k: int = 256
) -> DataFrame:
    """One sketch row per (group, partition): ``key, __pid, n,
    levels``. Built in a single Arrow pass over each input partition —
    the raw values never leave the map side. Output size is
    O(partitions × groups-per-partition), each row O(k·log(n/k))
    doubles."""
    key_type = dict(df.dtypes)[key_col]
    schema = f"`{key_col}` {key_type}, {_PARTIAL_FIELDS}"
    src = df.select(key_col, value_col).withColumn(
        "__pid", F.spark_partition_id()
    )

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        acc: dict = {}
        pid = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            for key, vals in pdf.groupby(key_col, sort=False)[value_col]:
                sk = acc.get(key)
                if sk is None:
                    sk = acc[key] = KllSketch(k)
                sk.add_many(vals.dropna().to_numpy())
        rows = []
        for key in sorted(k_ for k_ in acc if acc[k_].n > 0):
            n, levels = acc[key].to_row()
            rows.append((key, pid, n, levels))
        if rows:
            yield pd.DataFrame(rows, columns=[key_col, "__pid", "n", "levels"])

    return src.mapInPandas(_batches, schema)


def kll_group_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    qs: Sequence[float],
    k: int = 256,
    partials: DataFrame | None = None,
) -> DataFrame:
    """Per-group quantile estimates ``key, n, q, est`` from map-side
    KLL partials merged per group. The only shuffle carries the
    bounded sketch rows (grouped by ``key``); merge order is pinned by
    ``__pid`` so the result is deterministic for a fixed input
    partitioning. Pass ``partials`` to probe a persisted partials
    table instead of rebuilding (build-once/probe-many, like
    ann_index/hll_incremental)."""
    qs = [float(q) for q in qs]
    if partials is None:
        partials = kll_group_partials(df, key_col, value_col, k)
    key_type = dict(partials.dtypes)[key_col]
    out_schema = f"`{key_col}` {key_type}, n long, q double, est double"

    def _merge(pdf):
        import pandas as pd

        pdf = pdf.sort_values("__pid", kind="mergesort")
        merged: KllSketch | None = None
        for _, row in pdf.iterrows():
            if row["n"] == 0:
                continue
            s = KllSketch.from_row(k, row["n"], row["levels"])
            merged = s if merged is None else merged.merge(s)
        key = pdf[key_col].iloc[0]
        if merged is None:
            return pd.DataFrame(columns=[key_col, "n", "q", "est"])
        rows = [(key, merged.n, q, merged.quantile(q)) for q in qs]
        return pd.DataFrame(rows, columns=[key_col, "n", "q", "est"])

    return partials.groupBy(key_col).applyInPandas(_merge, out_schema)
