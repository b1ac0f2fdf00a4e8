"""End-to-end consolidation pipeline — the engine twin of the
reference's integration suite
(tests/integration/test_consolidation_flow.py): fresh insert,
append-only proof (old value wins), validation-error audit trail,
reconciliation, idempotent re-run, NO_FILES.
"""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.plans.consolidation import consolidate
from smartbots_etl_facturas_spark.sinks.audit import AuditWriter
from smartbots_etl_facturas_spark.sinks.staged import read_published

SCHEMA = (
    "row_idx long, invoice_number string, reference_number string, "
    "carrier_name string, net_amount double, tax_amount double, total_amount double"
)


def _file(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def env(spark, tmp_path):
    return AuditWriter(spark, str(tmp_path / "audit")), str(tmp_path / "consolidated")


def test_fresh_insert_and_totals(spark, env):
    audit, base = env
    f1 = _file(spark, [
        (0, "F-1", "R-1", "TransCo", 100.0, 19.0, 119.0),
        (1, "F-2", "R-1", "TransCo", 200.0, 38.0, 238.0),
        (2, "F-3", "R-2", "OtherCo", 50.0, 9.5, 59.5),
    ])
    report = consolidate(spark, [("a.xlsx", "t1", f1)], base, audit)
    assert report.status == "SUCCESS"
    assert report.inserted == 3 and report.validation_errors == 0
    out = read_published(spark, base)
    assert out.count() == 3
    total = out.agg(F.sum(F.col("total_amount"))).collect()[0][0]
    assert total == Decimal("416.5")


def test_append_only_existing_wins(spark, env):
    audit, base = env
    f1 = _file(spark, [(0, "F-1", "R-1", "TransCo", 100.0, 19.0, 119.0)])
    consolidate(spark, [("a.xlsx", "t1", f1)], base, audit)
    # same PK arrives with a DIFFERENT carrier (amounts equal, so the
    # financial reconciliation still passes — the reference's
    # append-only proof changes non-amount fields) → old row wins
    f2 = _file(spark, [
        (0, "F-1", "R-1", "ChangedCo", 100.0, 19.0, 119.0),
        (1, "F-9", "R-9", "NewCo", 10.0, 0.0, 10.0),
    ])
    report = consolidate(spark, [("b.xlsx", "t2", f2)], base, audit)
    assert report.inserted == 1                       # only F-9
    rows = {r.invoice_number: (r.carrier_name, r.total_amount)
            for r in read_published(spark, base).collect()}
    assert rows["F-1"] == ("TransCo", Decimal("119.0"))   # old row retained
    assert rows["F-9"] == ("NewCo", Decimal("10.0"))


def test_validation_errors_logged_not_inserted(spark, env):
    audit, base = env
    f1 = _file(spark, [
        (0, "F-1", "R-1", "TransCo", 100.0, 19.0, 119.0),
        (1, "", "R-1", "TransCo", 1.0, 0.0, 1.0),           # blank PK
        (2, "F-3", "R-1", "TransCo", 100.0, 19.0, 500.0),   # total mismatch
        (3, "F-4", "R-1", "", 1.0, 0.0, 1.0),               # blank carrier
    ])
    report = consolidate(spark, [("a.xlsx", "t1", f1)], base, audit)
    assert report.status == "SUCCESS"
    assert report.inserted == 1 and report.validation_errors == 3
    rec = audit.table("record_log")
    errs = {r.error_message for r in rec.filter(F.col("action") == "VALIDATION_ERROR").collect()}
    assert any("vacío" in e for e in errs)
    assert any("no coincide" in e for e in errs)
    assert rec.filter(F.col("action") == "INSERT").count() == 1


def test_idempotent_rerun_skips(spark, env):
    audit, base = env
    f1 = _file(spark, [(0, "F-1", "R-1", "TransCo", 100.0, 19.0, 119.0)])
    consolidate(spark, [("a.xlsx", "t1", f1)], base, audit)
    report2 = consolidate(spark, [("a.xlsx", "t1", f1)], base, audit)
    assert report2.files_skipped == 1 and report2.inserted == 0
    assert read_published(spark, base).count() == 1
    # same name, NEW modified_time → reprocessed (but upsert inserts 0)
    report3 = consolidate(spark, [("a.xlsx", "t2", f1)], base, audit)
    assert report3.files_skipped == 0 and report3.inserted == 0


def test_partial_status_on_bad_schema(spark, env):
    audit, base = env
    good = _file(spark, [(0, "F-1", "R-1", "TransCo", 100.0, 19.0, 119.0)])
    bad = spark.createDataFrame([(1, "x")], "row_idx long, junk string")
    report = consolidate(spark, [("good.xlsx", "t1", good), ("bad.xlsx", "t1", bad)], base, audit)
    assert report.status == "PARTIAL"
    assert report.files_ok == 1 and report.files_error == 1
    fl = audit.table("file_log")
    assert fl.filter((F.col("file_name") == "bad.xlsx")
                     & (F.col("status") == "ERROR")).count() == 1
    assert read_published(spark, base).count() == 1


def test_many_files_bounded_lineage(spark, env):
    """Many-file run: the consolidated plan must stop growing (the
    localCheckpoint every N files cuts lineage); correctness of the
    accumulated upsert still holds."""
    audit, base = env
    files = [
        (
            f"f{i:03d}.xlsx",
            f"t{i}",
            _file(spark, [
                (0, f"F-{i}", "R-1", "TransCo", 10.0, 0.0, 10.0),
                (1, "F-dup", "R-0", "TransCo", 5.0, 0.0, 5.0),  # same PK every file
            ]),
        )
        for i in range(24)
    ]
    sizes: list[int] = []
    report = consolidate(spark, files, base, audit, checkpoint_every=4, plan_sizes=sizes)
    assert report.status == "SUCCESS" and report.files_ok == 24
    # 24 distinct F-i rows + one F-dup (first file wins)
    out = read_published(spark, base)
    assert out.count() == 25
    assert report.inserted == 25
    # plan size is cyclic with period 4, not monotonically growing:
    # every post-checkpoint size collapses to the flat baseline, and
    # the within-cycle peak late in the run is no bigger than the
    # first cycle's peak
    early_peak = max(sizes[:4])
    late_peak = max(sizes[-4:])
    assert late_peak <= early_peak * 1.5, (early_peak, late_peak, sizes)
    post_checkpoint = sizes[3::4]  # indices where a checkpoint just ran
    assert max(post_checkpoint) <= min(post_checkpoint) * 1.5, post_checkpoint


def test_no_files(spark, env):
    audit, base = env
    report = consolidate(spark, [], base, audit)
    assert report.status == "NO_FILES"
    runs = audit.table("execution_runs")
    assert runs.filter(F.col("status") == "NO_FILES").count() == 1
