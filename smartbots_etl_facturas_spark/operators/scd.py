"""Slowly-changing-dimension type-2 history derivation from a change
log — the standard warehouse operator for turning an event/CDC stream
of attribute observations into validity intervals
(valid_from, valid_to, is_current).

Scale design: everything is window functions PARTITIONED BY the
entity key (never global), so the plan is one hash shuffle on the key
followed by per-partition sorts — the same shape at 100 TB, with AQE
handling key skew. No Python, no driver participation.

Reference parity note: the reference engine keeps only a last-write
master table (upsert J1/J2); SCD2 is the natural history-preserving
extension of that surface for an analytics engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tie_col: str,
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    Per entity (``key_cols``), observations ordered by
    ``(ts_col, tie_col)`` (the tie column makes the order TOTAL —
    change logs carry same-timestamp rows):

    - consecutive observations with identical ``attr_cols`` are
      collapsed into one interval starting at the FIRST observation;
    - ``valid_from`` = the change row's timestamp, ``valid_to`` = the
      next change row's timestamp (null for the current row);
    - ``is_current`` marks each entity's open interval.

    Output: key_cols + attr_cols + (valid_from, valid_to, is_current).
    """
    keys = [F.col(k) for k in key_cols]
    order = [F.col(ts_col).asc(), F.col(tie_col).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)

    # a row is a CHANGE when any attribute differs from the previous
    # observation (null-safe: the first row is always a change)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    log = df.withColumn("__chg", changed | (F.row_number().over(w) == 1))

    changes = log.filter(F.col("__chg"))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return changes.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.lead(F.col(ts_col)).over(w2).isNull().alias("is_current"),
    )


def scd2_lookup(
    history: DataFrame,
    probes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Point-in-time lookup against an SCD2 history: for each probe
    row, attach the attribute version whose validity interval covers
    the probe's timestamp (``valid_from <= ts < valid_to``, open
    current interval matches everything from its valid_from).

    Plan: ONE equi-join on the entity key + an interval filter — each
    probe meets only its own entity's versions (bounded by per-entity
    change count, never corpus-scale), so this is a plain keyed
    shuffle join at any history size; no range-join machinery needed
    because the key carries all the selectivity. Probes before the
    entity's first interval drop out (inner-join semantics).

    ``probes``' ``ts_col`` must be the same type/scale as the
    history's ``valid_from``/``valid_to``.
    """
    cond = (F.col(ts_col) >= F.col("valid_from")) & (
        F.col("valid_to").isNull() | (F.col(ts_col) < F.col("valid_to"))
    )
    return probes.join(history, on=list(key_cols), how="inner").filter(cond)
