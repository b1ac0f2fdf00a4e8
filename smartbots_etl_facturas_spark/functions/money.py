"""F1 — locale-aware money parsing as a pure Column expression.

Semantics (reference: smartbots-etl/src/application/transformers.py:70-101,
golden cases tests/unit/test_transformers.py:16-47):

Given a string (after stripping ``$`` and spaces):

1. both ``.`` and ``,`` present → the *last* separator is the decimal
   mark: ``1,234.56`` (US) drops commas; ``1.234,56`` (Chilean/EU)
   drops dots and turns the comma into a dot.
2. exactly one ``,`` and no dot-rule hit → decimal comma (``1234,56``).
3. more than one ``.`` → dots are thousands separators (``1.234.567``).
4. exactly one ``.`` with exactly three trailing characters → Chilean
   thousands (``12.345`` → ``12345``).
5. otherwise the string is already a plain decimal.

Invalid input raises in the reference; Spark computes errors as data,
so the expression yields NULL and callers pair it with
``money_parse_ok`` to split an error channel (SURVEY §2.2 P10).

Everything is ANSI-mode safe (``try_cast``) because the engine does
not own the SparkSession configuration.
"""

# NOTE: no `from __future__ import annotations` here — the pandas_udf
# return-type inference needs live (non-string) type hints.
from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL_T = "decimal(18,2)"


def _normalized_money_string(col: Column) -> Column:
    # Codegen-size note: every reference to ``s`` below inlines the
    # whole strip subtree into the generated Java (Spark's codegen CSE
    # skips expressions under conditional branches), and this tree is
    # instantiated once per money column per consuming operator in the
    # invoice-extract plans. The branch structure is therefore written
    # to touch ``s`` as few times as possible (~9 refs; a naive
    # count-based formulation needs ~18 and pushed the extract stages
    # past janino's 64 KB method limit, silently disabling whole-stage
    # codegen on the hottest path).
    s = F.regexp_replace(F.trim(col.cast("string")), r"[$ ]", "")
    has_dot = s.contains(".")
    has_comma = s.contains(",")
    return (
        # no dot: exactly one comma → decimal comma. The anchored
        # regex rewrites iff it matches, so zero or 2+ commas pass
        # through unchanged (2+ yields an unparseable string, like the
        # reference's Decimal() raise).
        F.when(~has_dot, F.regexp_replace(s, r"^([^,]*),([^,]*)$", "$1.$2"))
        # dot only: thousands dots (2+ dots, or one dot with exactly
        # three trailing chars) are dropped; a lone decimal dot stays.
        .when(
            ~has_comma,
            F.when(
                s.rlike(r"^[^.]*\.(.*\..*|.{3})$"),
                F.regexp_replace(s, r"\.", ""),
            ).otherwise(s),
        )
        # both present: the later separator is the decimal mark
        # (rindex compare in the reference ⇔ which separator ends the
        # final run). US keeps dots, drops commas; EU drops dots and
        # turns every comma into a dot (2+ commas → unparseable, as in
        # the reference).
        .when(s.rlike(r"\.[^.,]*$"), F.regexp_replace(s, ",", ""))
        .otherwise(F.regexp_replace(F.regexp_replace(s, r"\.", ""), ",", "."))
    )


def parse_money(col: Column, scale_type: str = DECIMAL_T) -> Column:
    """Parse a locale-formatted money string/number into a decimal.

    NULL on unparseable input (pair with :func:`money_parse_ok`).
    """
    return _normalized_money_string(col).try_cast(scale_type)


def money_parse_ok(col: Column) -> Column:
    """True when ``parse_money`` succeeds and input is non-null."""
    return col.isNotNull() & parse_money(col).isNotNull()


def parse_money_pandas_udf():
    """Arrow-vectorized fidelity twin of :func:`parse_money`.

    Returns a ``pandas_udf`` with identical semantics, used to
    cross-check the expression tree and as the fallback if a future
    locale rule stops being expressible as Column logic.
    """
    from decimal import ROUND_HALF_UP, Decimal, InvalidOperation

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _parse_one(v):
        if v is None:
            return None
        s = str(v).strip().replace("$", "").replace(" ", "")
        if "." in s and "," in s:
            if s.rindex(".") > s.rindex(","):
                s = s.replace(",", "")
            else:
                s = s.replace(".", "").replace(",", ".")
        elif "," in s and s.count(",") == 1:
            s = s.replace(",", ".")
        elif "." in s and s.count(".") > 1:
            s = s.replace(".", "")
        elif "." in s and s.count(".") == 1:
            if len(s.split(".")[1]) == 3:
                s = s.replace(".", "")
        try:
            # HALF_UP: Spark's decimal cast rounding (default Python
            # quantize is HALF_EVEN and diverges on ties like 0.005)
            return Decimal(s).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        except (InvalidOperation, ValueError):
            return None

    @pandas_udf(DECIMAL_T)
    def _parse(series: pd.Series) -> pd.Series:
        return series.map(_parse_one)

    return _parse
