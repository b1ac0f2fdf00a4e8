"""User-defined aggregate (pandas UDAF) and table function (UDTF)
— completing the engine's UDF/UDAF/UDTF surface (SURVEY §2.9).

The engine's rule stands: built-ins first (everything in operators/
is Column expressions), Arrow-vectorized Python only where the
semantics genuinely need imperative code. These two are the canonical
shapes for that escape hatch:

- ``median_udaf`` — PandasUDFType GROUPED_AGG: whole-group vector in,
  scalar out, Arrow both ways. Spark plans it like any aggregate
  (partials are NOT possible for an exact median, so the group's
  values gather to one task — use approx_percentile when the group
  can be huge; that trade-off is the point of having both).
- ``split_sentences`` — Python UDTF (Spark 4): one row in, N rows
  out with a declared schema; the lateral-join shape
  (``F.explode``-of-computed-array is the built-in alternative and
  preferred when the logic fits an expression).
"""

# NOTE: no `from __future__ import annotations` — like functions/money.py,
# the pandas_udf/udtf type-hint inference needs LIVE (non-string) hints.
import re

from pyspark.sql import functions as F
from pyspark.sql import types as T


def median_udaf():
    """GROUPED_AGG pandas UDAF: exact median of a double column."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _median(v: pd.Series) -> float:  # whole group's vector -> scalar
        return float(v.median())

    return _median


# portable sentence-boundary pattern: no lookbehind (RE2-safe so the
# DuckDB oracle can reproduce the split exactly)
SENTENCE_SPLIT_RE = r"[.!?]+\s+"


def split_sentences_udtf():
    """Python UDTF: (doc_id, text) -> one row per sentence with its
    ordinal and whitespace token count."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id long, sent_idx long, sentence string, n_tokens long")
    class SplitSentences:
        def eval(self, doc_id, text):
            if text is None:
                return
            parts = re.split(SENTENCE_SPLIT_RE, text.strip())
            idx = 0
            for p in parts:
                p = p.strip()
                if not p:
                    continue
                yield doc_id, idx, p, len(p.split())
                idx += 1

    return SplitSentences


def split_sentences_expr(text_col):
    """The built-in-expression twin of the UDTF (posexplode of a
    computed split array) — the preferred form when no imperative
    logic is needed; kept for differential testing."""
    arr = F.split(F.trim(text_col), SENTENCE_SPLIT_RE)
    return F.filter(arr, lambda s: F.trim(s) != "")


def event_runs_udtf():
    """TABLE-argument Python UDTF (Spark 4 §2.9 surface): run-length
    encode an ORDERED event partition — consecutive same-type events
    collapse to one row with length and time bounds. Called as
    ``event_runs(TABLE(v) PARTITION BY user_id ORDER BY ts, ...)``:
    each partition streams through ONE UDTF instance in order, state
    is a single open run, terminate() flushes it — the
    gaps-and-islands problem as imperative per-partition logic, with
    the pure-window formulation as its oracle-shared twin."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id long, event_type string, run_len long, "
                     "start_ts long, end_ts long")
    class EventRuns:
        def __init__(self):
            self.cur = None

        def eval(self, row):
            u, t, ts = row["user_id"], row["event_type"], row["ts"]
            if self.cur is not None and self.cur[0] == u and self.cur[1] == t:
                c = self.cur
                self.cur = (u, t, c[2] + 1, c[3], ts)
            else:
                if self.cur is not None:
                    yield self.cur
                self.cur = (u, t, 1, ts, ts)

        def terminate(self):
            if self.cur is not None:
                yield self.cur

    return EventRuns
