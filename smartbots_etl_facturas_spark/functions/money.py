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
    s = F.regexp_replace(F.trim(col.cast("string")), r"[$ ]", "")
    has_dot = s.contains(".")
    has_comma = s.contains(",")
    n_dots = F.length(s) - F.length(F.regexp_replace(s, r"\.", ""))
    n_commas = F.length(s) - F.length(F.regexp_replace(s, ",", ""))
    rev = F.reverse(s)
    # rindex(".") > rindex(",")  ⇔  the last dot sits closer to the end
    us_format = has_dot & has_comma & (F.instr(rev, ".") < F.instr(rev, ","))
    eu_format = has_dot & has_comma & (F.instr(rev, ".") > F.instr(rev, ","))
    return (
        F.when(us_format, F.regexp_replace(s, ",", ""))
        .when(eu_format, F.regexp_replace(F.regexp_replace(s, r"\.", ""), ",", "."))
        .when(has_comma & (n_commas == 1), F.regexp_replace(s, ",", "."))
        .when(has_dot & (n_dots > 1), F.regexp_replace(s, r"\.", ""))
        .when(has_dot & (n_dots == 1) & s.rlike(r"^[^.]*\..{3}$"), F.regexp_replace(s, r"\.", ""))
        .otherwise(s)
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
