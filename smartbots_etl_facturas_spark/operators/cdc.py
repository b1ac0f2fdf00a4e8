"""CDC changelog application — MERGE a stream of keyed
insert/update/delete changes into a snapshot table (the Debezium /
Delta ``MERGE INTO`` shape: the missing third verb over
operators/upsert.py, which models the reference's insert/update-only
consolidation, and the apply-side complement of
operators/scd.py:scd2_from_changelog, which keeps history instead of
collapsing to current state).

Semantics: per key, the LAST change in (ts, tie) order wins —
``D`` removes the key, ``I``/``U`` replace the row with the change's
payload; keys never mentioned keep their snapshot row. A total order
within a key is required for determinism, so ``tie_col`` is
mandatory (same contract as dedup_first_wins / scd2).

Scale design: one key-partitioned window over the CHANGELOG only
(sized by the delta, not the snapshot), one left-anti equi-join to
drop superseded snapshot rows, one union — O(Δ + touched keys) work
against an arbitrarily large snapshot, the same contract as
operators/incremental.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPS = ("I", "U", "D")


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tie_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Return the snapshot with the changelog applied (see module
    doc). ``changes`` must carry ``keys`` + ``op_col`` + ``ts_col`` +
    ``tie_col`` + exactly the snapshot's payload columns; the result
    has the snapshot's schema."""
    payload = [c for c in snapshot.columns if c not in keys]
    missing = set(list(keys) + payload) - set(changes.columns)
    if missing:
        raise ValueError(f"changelog lacks columns: {sorted(missing)}")
    w = Window.partitionBy(*keys).orderBy(F.desc(ts_col), F.desc(tie_col))
    last = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    survivors = (
        last.filter(F.col(op_col) != "D")
        .select(*keys, *payload)
    )
    untouched = snapshot.join(
        last.select(*keys), list(keys), "left_anti"
    )
    return untouched.unionByName(survivors)


def merge_published(
    spark,
    base: str,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tie_col: str,
    check=None,
) -> str:
    """The incremental-publish loop: apply a changelog batch to the
    CURRENT published version of a table and publish the result as a
    NEW version (sinks/staged.py — atomic pointer flip, prior
    snapshots retained, so a bad batch rolls back by pointer and
    readers never see partial state). This is the standing maintenance
    pattern for a long-lived consolidated table: per batch, compute is
    O(Δ + touched keys) and durability/atomicity come from the
    versioned sink, not from rewriting history. ``check`` gates the
    pointer flip on the WRITTEN data (reconcile-before-publish)."""
    from ..sinks.staged import publish, read_published

    snap = read_published(spark, base)
    merged = apply_changelog(snap, changes, keys, ts_col, tie_col)
    return publish(merged, base, check=check)
