"""Composed mixed-format invoice-sheet extraction (the reference's
single entry point for reading one sheet, re-expressed as a Spark
dataflow).

Reference: official_format_extractor.py:91-125 (entry + runtime format
detection :111-121), :130-246 (mixed path: fixed cells + tabular
detail), :248-326 (simple tabular path), :455-476 (fixed-cell read),
:479-495 (A6 total derivation), :499-525 (F2 date formats).

Input contract: ONE sheet as a positional cell grid —
``DataFrame(row_idx long, c0..cN string)`` — the shape produced by
``sources.xlsx`` (both the driver shim and the distributed
binaryFile+mapInPandas reader emit it per file).

Detection (official_format_extractor.py:111-121): both the
``numero_factura`` (C8) and ``empresa_transporte`` (C6) fixed cells
non-blank → MIXED layout (fixed header cells broadcast onto the
tabular detail); otherwise SIMPLE tabular (header discovered/row 11,
stop at first blank invoice). The fixed-cell read is ONE 1-row
aggregation job and the detection branch is a driver-side decision on
that row — the same schema-metadata contract as
``readers.discover_header`` (per-file scalars, never data rows).

Both paths normalize into ONE StructType (the InvoiceRecord shape,
entities.py:19-111) plus the P10 error side-channel
``(source_file, row_idx, error)`` — Spark cannot raise per row, so the
reference's try/except-per-row becomes a predicate split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.functions.dates import (
    EXTRACTOR_FORMATS,
    parse_date_multi,
)
from smartbots_etl_facturas_spark.functions.money import parse_money
from smartbots_etl_facturas_spark.operators.ordered import (
    drop_all_null_rows,
    filter_nonblank_key,
    filter_summary_rows,
    take_while,
)
from smartbots_etl_facturas_spark.operators.rollup import derived_total
from smartbots_etl_facturas_spark.sources.readers import discover_header

# cell coordinate -> logical name (official_format_extractor.py:77-84)
FIXED_CELLS = {
    "C6": "empresa_transporte",
    "G3": "fecha_emision",
    "C8": "numero_factura",
    "H6": "nave",
    "H7": "puerto_embarque",
    "F4": "responsable",
}

# header-row discovery markers (official_format_extractor.py:384-396)
MIXED_KNOWN_HEADERS = (
    "Órdenes de Embarque",
    "Fecha Servicio",
    "Unidad",
    "Conductor",
    "Contenedor",
    "Guías de Despacho",
)

SIMPLE_KNOWN_HEADERS = (
    "N° Factura",
    "N° Referencia",
    "Transportista",
    "Monto Neto",
    "IVA",
    "Monto Total",
    "Fecha Factura",
)

# the 7 money components of the A6 total derivation
# (official_format_extractor.py:480-488; column aliases :39-68)
MONEY_COMPONENT_COLS = (
    "Flete ($)",
    "Underslung ($)",
    "Planta Adicional ($)",
    "Retiro Cruzado ($)",
    "Porteo ($)",
    "Sobre Estadía Planta ($)",
    "Sobre Estadía Puerto ($)",
)

TOTAL_COL = "Total Servicio ($)"
ORDENES_COL = "Órdenes de Embarque"

DEC = "decimal(18,2)"


def _cell_ref(ref: str) -> tuple[int, str]:
    """Excel A1-style reference → (0-based row_idx, grid column name).
    ``"C6"`` → ``(5, "c2")``."""
    letters = "".join(ch for ch in ref if ch.isalpha()).upper()
    row = int("".join(ch for ch in ref if ch.isdigit())) - 1
    ci = 0
    for ch in letters:
        ci = ci * 26 + (ord(ch) - 64)
    return row, f"c{ci - 1}"


def read_fixed_cells(raw: DataFrame, cells: dict[str, str] | None = None) -> DataFrame:
    """S3 fixed-cell scan over the grid: one 1-row aggregation pulling
    each named cell (max of an at-most-one-match conditional — no
    shuffle wider than the 1-row result). Missing grid columns yield
    NULL, like an out-of-range worksheet read."""
    cells = cells or FIXED_CELLS
    aggs = []
    for ref, name in cells.items():
        r, c = _cell_ref(ref)
        if c in raw.columns:
            aggs.append(F.max(F.when(F.col("row_idx") == r, F.col(c))).alias(name))
        else:
            aggs.append(F.max(F.lit(None).cast("string")).alias(name))
    return raw.agg(*aggs)


def _nonblank(v) -> bool:
    return v is not None and str(v).strip() != ""


OUT_COLS = (
    "row_idx",
    "invoice_number",
    "reference_number",
    "carrier_name",
    "ship_name",
    "invoice_date",
    "net_amount",
    "tax_amount",
    "total_amount",
    "currency",
    "description",
    "source_file",
)


def _error_frame(df: DataFrame, source_file: str, cond: Column, msg: Column) -> DataFrame:
    return df.filter(cond).select(
        F.lit(source_file).alias("source_file"),
        F.col("row_idx").cast("long").alias("row_idx"),
        msg.alias("error"),
    )


def _money_or_err(data: DataFrame, col: str) -> tuple[Column, Column]:
    """(parsed decimal, error predicate) for one money column: missing
    column or NULL cell → 0 (official_format_extractor.py:275-281
    to_decimal default); non-blank unparseable → per-row error, like
    the reference's Decimal(str(v)) InvalidOperation."""
    if col not in data.columns:
        return F.lit(0).cast(DEC), F.lit(False)
    raw = F.col(col)
    parsed = parse_money(raw)
    bad = raw.isNotNull() & (F.trim(raw) != "") & parsed.isNull()
    return F.coalesce(parsed, F.lit(0).cast(DEC)), bad


def extract_mixed(raw: DataFrame, fixed, source_file: str) -> tuple[DataFrame, DataFrame]:
    """Mixed layout: fixed header cells broadcast onto the detail rows
    (official_format_extractor.py:130-246). P5 all-null drop, P6
    non-blank 'Órdenes de Embarque', P7 NETO/IVA/TOTAL summary-row
    drop, A6 component-sum-with-override, F2 date parse of the G3
    fixed cell (a bad/empty fixed date errors EVERY row, mirroring the
    per-record _parse_date raise at :191)."""
    data = discover_header(raw, MIXED_KNOWN_HEADERS)
    cols = [c for c in data.columns if c != "row_idx"]
    data = drop_all_null_rows(data, cols)
    if ORDENES_COL not in data.columns:
        empty = raw.sparkSession.createDataFrame(
            [], "source_file string, row_idx long, error string"
        )
        return _empty_valid(raw), empty
    data = filter_nonblank_key(data, ORDENES_COL)
    data = filter_summary_rows(data, cols)

    comps, money_errs = [], []
    for c in MONEY_COMPONENT_COLS:
        parsed, bad = _money_or_err(data, c)
        comps.append(parsed)
        money_errs.append((c, bad))
    if TOTAL_COL in data.columns:
        total_raw = parse_money(F.col(TOTAL_COL))
        total_bad = (
            F.col(TOTAL_COL).isNotNull()
            & (F.trim(F.col(TOTAL_COL)) != "")
            & total_raw.isNull()
        )
    else:
        total_raw, total_bad = F.lit(None).cast(DEC), F.lit(False)
    total = derived_total(total_raw, comps).cast(DEC)

    date_lit = parse_date_multi(F.lit(fixed["fecha_emision"]), EXTRACTOR_FORMATS)
    date_all_bad = not _nonblank(fixed["fecha_emision"])

    err_cond = total_bad
    err_msg = F.when(total_bad, F.lit(f"unparseable money: {TOTAL_COL}"))
    for c, bad in money_errs:
        err_cond = err_cond | bad
        err_msg = err_msg.when(bad, F.lit(f"unparseable money: {c}"))
    if date_all_bad:
        err_cond = F.lit(True)
        err_msg = F.lit("invalid invoice date: " + repr(fixed["fecha_emision"]))
    else:
        err_cond = err_cond | date_lit.isNull()
        err_msg = F.coalesce(
            err_msg,
            F.when(
                date_lit.isNull(),
                F.lit("invalid invoice date: " + repr(fixed["fecha_emision"])),
            ),
        )

    errors = _error_frame(data, source_file, err_cond, err_msg)
    obs = (
        F.coalesce(F.col("Observaciones").cast("string"), F.lit(""))
        if "Observaciones" in data.columns
        else F.lit("")
    )
    guias = (
        F.coalesce(F.col("Guías de Despacho").cast("string"), F.lit(""))
        if "Guías de Despacho" in data.columns
        else F.lit("")
    )
    _ = guias  # dispatch_guides is carried in description-adjacent metadata
    valid = data.filter(~err_cond).select(
        F.col("row_idx").cast("long").alias("row_idx"),
        F.lit(str(fixed["numero_factura"])).alias("invoice_number"),
        F.coalesce(
            F.when(F.trim(F.col(ORDENES_COL)) != "", F.trim(F.col(ORDENES_COL))),
            F.lit("N/A"),
        ).alias("reference_number"),
        F.lit(str(fixed["empresa_transporte"])).alias("carrier_name"),
        F.lit(str(fixed["nave"]) if fixed["nave"] is not None else "").alias("ship_name"),
        date_lit.alias("invoice_date"),
        total.alias("net_amount"),
        F.lit(0).cast(DEC).alias("tax_amount"),
        total.alias("total_amount"),
        F.lit("CLP").alias("currency"),
        obs.alias("description"),
        F.lit(source_file).alias("source_file"),
    )
    return valid, errors


def extract_simple(raw: DataFrame, source_file: str) -> tuple[DataFrame, DataFrame]:
    """Simple tabular layout (official_format_extractor.py:248-326):
    header discovered (reference hard-codes 'skip 10 rows, row 11 is
    header' — discovery with fallback_idx=10 is a strict
    generalization that agrees whenever the header row is findable),
    P8 take-while stop at the first blank 'N° Factura' (the reference
    ``break``), per-row money/date parses with the error channel."""
    data = discover_header(raw, SIMPLE_KNOWN_HEADERS)
    inv = "N° Factura"
    if inv not in data.columns:
        empty = raw.sparkSession.createDataFrame(
            [], "source_file string, row_idx long, error string"
        )
        return _empty_valid(raw), empty
    stop = F.col(inv).isNull() | (F.trim(F.col(inv)) == "")
    # one sheet = one file-sized frame: the global window is the
    # intended semantics (the reference's sequential break)
    data = take_while(data, "row_idx", stop, allow_global=True)
    cols = [c for c in data.columns if c != "row_idx"]
    data = drop_all_null_rows(data, cols)

    net, net_bad = _money_or_err(data, "Monto Neto")
    tax, tax_bad = _money_or_err(data, "IVA")
    total, total_bad = _money_or_err(data, "Monto Total")
    if "Fecha Factura" in data.columns:
        date = parse_date_multi(F.col("Fecha Factura"), EXTRACTOR_FORMATS)
        date_bad = date.isNull()  # empty AND unparseable both raise (:500-502)
    else:
        date, date_bad = F.lit(None).cast("date"), F.lit(True)

    err_cond = net_bad | tax_bad | total_bad | date_bad
    err_msg = (
        F.when(net_bad, F.lit("unparseable money: Monto Neto"))
        .when(tax_bad, F.lit("unparseable money: IVA"))
        .when(total_bad, F.lit("unparseable money: Monto Total"))
        .when(date_bad, F.lit("invalid invoice date"))
    )
    errors = _error_frame(data, source_file, err_cond, err_msg)

    def _opt(col: str, default: str = "") -> Column:
        if col not in data.columns:
            return F.lit(default)
        return F.coalesce(F.col(col).cast("string"), F.lit(default))

    valid = data.filter(~err_cond).select(
        F.col("row_idx").cast("long").alias("row_idx"),
        F.trim(F.col(inv)).alias("invoice_number"),
        F.coalesce(
            F.when(F.trim(_opt("N° Referencia")) != "", F.trim(_opt("N° Referencia"))),
            F.lit("N/A"),
        ).alias("reference_number"),
        _opt("Transportista").alias("carrier_name"),
        _opt("Nave").alias("ship_name"),
        date.alias("invoice_date"),
        net.alias("net_amount"),
        tax.alias("tax_amount"),
        total.alias("total_amount"),
        _opt("Moneda", "CLP").alias("currency"),
        _opt("Descripción").alias("description"),
        F.lit(source_file).alias("source_file"),
    )
    return valid, errors


def _empty_valid(raw: DataFrame) -> DataFrame:
    return raw.sparkSession.createDataFrame(
        [],
        "row_idx long, invoice_number string, reference_number string, "
        "carrier_name string, ship_name string, invoice_date date, "
        f"net_amount {DEC}, tax_amount {DEC}, total_amount {DEC}, "
        "currency string, description string, source_file string",
    )


def extract_invoice_sheet(
    raw: DataFrame, source_file: str
) -> tuple[DataFrame, DataFrame]:
    """The composed entry point (official_format_extractor.py:91-125):
    read the fixed cells (one 1-row job), detect the layout, run the
    matching path, and return ``(valid, errors)`` in the normalized
    InvoiceRecord schema.

    The ``collect()`` here fetches exactly one 6-column row of
    per-file header scalars — schema metadata, not data (the same
    budget class as ``discover_header``'s header probe)."""
    fixed = read_fixed_cells(raw).collect()[0]
    if _nonblank(fixed["numero_factura"]) and _nonblank(fixed["empresa_transporte"]):
        return extract_mixed(raw, fixed, source_file)
    return extract_simple(raw, source_file)
