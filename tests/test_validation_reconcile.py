"""P9/P10 validation rules incl. ±1 boundary semantics, and J3/J4/A1/A2
reconciliation with its *exclusive* tolerance.

Boundary proofs mirrored from the reference:
- row-level total≈net+tax is INCLUSIVE at 1 (entities.py:67,
  tests/unit/test_entities.py:77-92)
- reconciliation variance is EXCLUSIVE at 1
  (consolidate_invoices.py:570-572)
"""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.reconcile import reconcile
from smartbots_etl_facturas_spark.operators.validation import split_valid, with_validation

SCHEMA = ("invoice_number string, reference_number string, carrier_name string, "
          "net_amount double, tax_amount double, total_amount double")


def test_validation_rule_order_and_boundaries(spark):
    rows = [
        ("", "R", "C", 100.0, 19.0, 119.0),        # rule 1
        ("F", " ", "C", 100.0, 19.0, 119.0),       # rule 2 (blank, not just empty)
        ("F", "R", None, 100.0, 19.0, 119.0),      # rule 3
        ("F", "R", "C", 100.0, 19.0, -5.0),        # rule 4
        ("F", "R", "C", 100.0, 19.0, 121.0),       # rule 5: |121-119| = 2 > 1
        ("F", "R", "C", 100.0, 19.0, 120.0),       # |120-119| = 1 → VALID (inclusive)
        ("F", "R", "C", 100.0, 19.0, 119.0),       # exact
        ("", "", "", -1.0, 0.0, -1.0),             # multiple failures → FIRST rule wins
    ]
    df = with_validation(spark.createDataFrame(rows, SCHEMA))
    got = [r.error_reason for r in df.collect()]
    assert got[0] == "invoice_number no puede estar vacío"
    assert got[1] == "reference_number no puede estar vacío"
    assert got[2] == "carrier_name no puede estar vacío"
    assert got[3] == "total_amount no puede ser negativo"
    assert got[4] == "total_amount no coincide con net + tax"
    assert got[5] is None
    assert got[6] is None
    assert got[7] == "invoice_number no puede estar vacío"

    valid, errors = split_valid(df)
    assert valid.count() == 2
    assert errors.count() == 6


def test_reconcile_pass_and_exclusive_tolerance(spark):
    schema = "invoice_number string, reference_number string, total_amount double"
    source = spark.createDataFrame(
        [("F1", "R1", 100.0), ("F2", "R2", 200.0)], schema)
    # result contains both PKs; totals differ by exactly 1 → PASSES (exclusive)
    result = spark.createDataFrame(
        [("F1", "R1", 100.0), ("F2", "R2", 199.0), ("F9", "R9", 777.0)], schema)
    rep = reconcile(source, result).collect()[0]
    assert rep.missing_pk_count == 0
    assert rep.no_data_loss
    assert rep.variance == 1.0
    assert rep.amounts_match          # exactly 1 passes
    assert rep.reconciled
    # result_total must exclude F9 (semi-join restriction)
    assert rep.result_total == 299.0


def test_reconcile_insert_only_fusion_equals_composed_form(spark):
    """Round-14 fusion proof: reconcile_insert_only(existing, incoming)
    must equal reconcile(incoming, upsert_insert_only(existing,
    incoming)) row-for-row on adversarial inputs — duplicate PKs on
    BOTH sides (the driver's lineitem has ~24% dup (orderkey,
    linenumber) pairs), NULL amounts, existing-only / incoming-only /
    overlapping PKs, and each side empty."""
    from smartbots_etl_facturas_spark.operators.reconcile import (
        reconcile_insert_only,
    )
    from smartbots_etl_facturas_spark.operators.upsert import (
        upsert_insert_only,
    )

    schema = "invoice_number string, reference_number string, total_amount double"
    existing = spark.createDataFrame(
        [("F1", "R1", 100.0), ("F1", "R1", 50.0),   # dup PK in existing
         ("F2", "R2", 200.0),
         ("F5", "R5", None),                         # NULL amount
         ("F6", "R6", 66.0)],                        # existing-only
        schema)
    incoming = spark.createDataFrame(
        [("F1", "R1", 101.0),                        # overlaps (existing wins)
         ("F3", "R3", 300.0), ("F3", "R3", 301.0),   # dup PK, new
         ("F4", "R4", None),                         # NULL amount, new
         ("F5", "R5", 55.0)],                        # overlaps a NULL-amount PK
        schema)

    def rows(df):
        return sorted(df.collect(), key=str)

    for src, ex in [(incoming, existing),
                    (incoming, existing.limit(0)),
                    (incoming.limit(0), existing)]:
        composed = reconcile(src, upsert_insert_only(ex, src))
        fused = reconcile_insert_only(ex, src)
        assert fused.schema == composed.schema
        assert rows(fused) == rows(composed)


def test_reconcile_detects_loss_and_variance(spark):
    schema = "invoice_number string, reference_number string, total_amount double"
    source = spark.createDataFrame([("F1", "R1", 100.0), ("F2", "R2", 200.0)], schema)
    result = spark.createDataFrame([("F1", "R1", 97.0)], schema)
    rep = reconcile(source, result).collect()[0]
    assert rep.missing_pk_count == 1
    assert not rep.no_data_loss
    assert rep.variance == 203.0      # 300 - 97
    assert not rep.amounts_match
    assert not rep.reconciled


# --- data-quality suite + table diff (operators/quality.py) ------------------

def test_dq_checks_pass_and_fail_paths(spark):
    from smartbots_etl_facturas_spark.operators.quality import (
        check_accepted_values,
        check_not_null,
        check_referential,
        check_unique,
        run_checks,
    )

    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, None), (3, "Z")], ["k", "status"]
    )
    parent = spark.createDataFrame([(1,), (2,)], ["k"])
    rep = {r.check_name: (r.n_violations, r.passed)
           for r in run_checks([
               check_unique(df, ["k"]),            # k=1 duplicated once
               check_not_null(df, "status"),       # one null
               check_accepted_values(df, "status", ["A"]),  # None + 'Z'
               check_referential(df, "k", parent, "k"),     # k=3 orphan
           ]).collect()}
    assert rep["unique:k"] == (1, False)
    assert rep["not_null:status"] == (1, False)
    assert rep["accepted_values:status"] == (2, False)
    assert rep["referential:k"] == (1, False)
    clean = spark.createDataFrame([(1, "A"), (2, "A")], ["k", "status"])
    rep2 = {r.check_name: r.passed
            for r in run_checks([check_unique(clean, ["k"]),
                                 check_not_null(clean, "status")]).collect()}
    assert all(rep2.values())


def test_table_diff_statuses(spark):
    from smartbots_etl_facturas_spark.operators.quality import table_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(2, 21.0), (3, None), (4, 40.0)], "k long, v double"
    )
    got = {r.status: r.n_rows
           for r in table_diff(old, new, ["k"], ["v"]).collect()}
    # 1 removed, 4 added, 2 changed, 3 unchanged (null == null null-safely)
    assert got == {"added": 1, "removed": 1, "changed": 1, "unchanged": 1}
