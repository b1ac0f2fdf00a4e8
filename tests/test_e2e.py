"""End-to-end: the reference's ENTIRE workflow from real XLSX files —
distributed raw-grid scan → set-based extraction (format detection,
header discovery, parsing, error channel) → per-file consolidation
(validation, dedup, insert-only upsert, reconciliation, audit) →
staged atomic publish. A user of the reference could run their whole
pipeline through these pieces."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.plans.consolidation import consolidate
from smartbots_etl_facturas_spark.plans.extract import extract_invoice_files
from smartbots_etl_facturas_spark.sinks.audit import AuditWriter
from smartbots_etl_facturas_spark.sinks.staged import read_published
from smartbots_etl_facturas_spark.sources.xlsx import (
    read_xlsx_grid_distributed,
    write_xlsx,
)

CONSOL_COLS = [
    "row_idx", "invoice_number", "reference_number", "carrier_name",
    "net_amount", "tax_amount", "total_amount",
]


def _simple_workbook(path, rows):
    grid = [[None] * 7 for _ in range(10)]
    grid.append(["N° Factura", "N° Referencia", "Transportista",
                 "Monto Neto", "IVA", "Monto Total", "Fecha Factura"])
    grid.extend(rows)
    write_xlsx(str(path), {"Hoja1": grid})


def test_xlsx_to_published_consolidated(spark, tmp_path):
    src = tmp_path / "inbox"
    src.mkdir()
    _simple_workbook(src / "f1.xlsx", [
        ["F-1", "R-1", "CarA", "1000", "190", "1190", "2026-02-15"],
        ["F-2", "R-2", "CarB", "200", "38", "238", "2026-02-15"],
        ["F-9", "R-9", "CarX", "oops", "0", "1", "2026-02-15"],   # money error
    ])
    _simple_workbook(src / "f2.xlsx", [
        ["F-2", "R-2", "CarB", "200", "38", "238", "2026-02-15"],  # re-sent PK
        ["F-3", "R-3", "CarC", "50", "9", "59", "16/02/2026"],
    ])

    raw = read_xlsx_grid_distributed(spark, str(src / "*.xlsx"), n_cols=9)
    valid, errors = extract_invoice_files(raw)

    # extraction: error row captured, not silently dropped
    errs = errors.collect()
    assert len(errs) == 1 and errs[0].source_file.endswith("f1.xlsx")
    assert "Monto Neto" in errs[0].error

    # per-file transaction unit: one consolidation input per source file
    files = []
    for name in sorted(r.source_file for r in valid.select("source_file").distinct().collect()):
        frame = valid.filter(F.col("source_file") == name).select(*CONSOL_COLS)
        files.append((name.rsplit("/", 1)[-1], "t0", frame))

    base = str(tmp_path / "consolidated")
    audit = AuditWriter(spark, str(tmp_path / "audit"))
    report = consolidate(spark, files, base, audit)
    assert report.status == "SUCCESS"
    assert report.files_ok == 2 and report.inserted == 3   # F-2 re-send skipped

    out = {r.invoice_number: r for r in read_published(spark, base).collect()}
    assert set(out) == {"F-1", "F-2", "F-3"}
    assert float(out["F-1"].total_amount) == 1190.0
    assert out["F-2"].source_file == "f1.xlsx"             # first file won the PK

    # re-run over the same inbox: idempotency (J5) skips both files
    report2 = consolidate(spark, files, base, audit)
    assert report2.files_skipped == 2 and report2.inserted == 0
    assert read_published(spark, base).count() == 3
