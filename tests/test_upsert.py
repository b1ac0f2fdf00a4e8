"""J1/J2/J6 semantics, mirroring the reference's integration proofs
(tests/integration/test_consolidation_flow.py:230-306)."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.upsert import (
    audit_actions,
    new_rows_only,
    upsert_full,
    upsert_insert_only,
)

SCHEMA = "invoice_number string, reference_number string, carrier_name string, total_amount double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_insert_only_existing_wins(spark):
    existing = _df(spark, [("F1", "R1", "OldCarrier", 100.0)])
    incoming = _df(spark, [("F1", "R1", "NewCarrier", 999.0), ("F2", "R2", "C2", 50.0)])
    result = upsert_insert_only(existing, incoming)
    rows = {(r.invoice_number, r.reference_number): r for r in result.collect()}
    assert len(rows) == 2
    # the updated source row keeps the OLD value — append-only proof
    assert rows[("F1", "R1")].carrier_name == "OldCarrier"
    assert rows[("F1", "R1")].total_amount == 100.0
    assert rows[("F2", "R2")].carrier_name == "C2"


def test_new_rows_only_counts(spark):
    existing = _df(spark, [("F1", "R1", "A", 1.0)])
    incoming = _df(spark, [("F1", "R1", "B", 2.0), ("F2", "R2", "C", 3.0), ("F3", "R3", "D", 4.0)])
    assert new_rows_only(existing, incoming).count() == 2


def test_full_upsert_statuses(spark):
    existing = _df(spark, [("F1", "R1", "Same", 10.0), ("F2", "R2", "WillChange", 20.0),
                           ("F4", "R4", "ExistingOnly", 40.0)])
    incoming = _df(spark, [("F1", "R1", "Same", 10.0), ("F2", "R2", "Changed", 20.0),
                           ("F3", "R3", "Fresh", 30.0)])
    result = upsert_full(existing, incoming, compare_cols=["carrier_name", "total_amount"])
    rows = {(r.invoice_number, r.reference_number): r for r in result.collect()}
    assert rows[("F1", "R1")].status == "UNCHANGED"
    assert rows[("F2", "R2")].status == "UPDATED"
    assert rows[("F2", "R2")].carrier_name == "Changed"   # incoming wins on UPDATE
    assert rows[("F3", "R3")].status == "NEW"
    assert rows[("F4", "R4")].status == "UNCHANGED"       # untouched master row survives


def test_audit_actions(spark):
    existing = _df(spark, [("F1", "R1", "Same", 10.0), ("F2", "R2", "Old", 20.0)])
    incoming = _df(spark, [("F1", "R1", "Same", 10.0), ("F2", "R2", "New", 20.0),
                           ("F3", "R3", "Fresh", 30.0)])
    merged = upsert_full(existing, incoming, compare_cols=["carrier_name", "total_amount"])
    acts = {
        (r.invoice_number, r.reference_number): r.action
        for r in audit_actions(incoming, merged).collect()
    }
    assert acts == {("F1", "R1"): "UNCHANGED", ("F2", "R2"): "UPDATE", ("F3", "R3"): "INSERT"}
