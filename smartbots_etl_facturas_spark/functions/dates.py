"""F2/F3 — multi-format date parsing and Excel serial-date decode.

Reference semantics:
- F2: try formats in order — config default ``%d-%m-%Y`` then
  ``%Y-%m-%d``, ``%d/%m/%Y``, ``%d-%m-%Y``
  (smartbots-etl/src/application/transformers.py:57-68); the extractor
  additionally accepts ``%d-%m-%y``, ``%Y-%m-%d %H:%M:%S`` and ISO-T
  timestamps (official_format_extractor.py:499-525). First format that
  parses wins; invalid raises → here: NULL (error-as-data).
- F3: Excel 1900-epoch serial number → date with the −2 leap-bug
  offset, i.e. day 0 = 1899-12-30
  (smartbots-etl/src/infrastructure/calamine_extractor.py:122-128).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_FORMATS = ("dd-MM-yyyy", "yyyy-MM-dd", "dd/MM/yyyy")
EXTRACTOR_FORMATS = DEFAULT_FORMATS + ("dd-MM-yy", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss")


def parse_date_multi(col: Column, formats=DEFAULT_FORMATS) -> Column:
    """First-matching-format date parse; NULL when nothing matches.

    ``try_to_timestamp`` never raises under ANSI mode, mirroring the
    reference's try/except-per-format loop as one ``coalesce``.
    """
    s = F.trim(col.cast("string"))
    attempts = [F.try_to_timestamp(s, F.lit(fmt)).cast("date") for fmt in formats]
    return F.coalesce(*attempts)


def excel_serial_to_date(col: Column) -> Column:
    """Excel 1900-system serial number → date (day 0 = 1899-12-30)."""
    return F.date_add(F.to_date(F.lit("1899-12-30")), col.try_cast("int"))
