"""Engine observability (sinks/observability.py): per-query run
reports with stable plan fingerprints — the reference's
logging_config.py / sqlite_tracker analog for the engine's OWN
executions."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.sinks.observability import (
    QueryRunReporter,
    normalize_plan,
    plan_fingerprint,
)


def _q(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


def test_run_emits_report_row(spark, sf_dir, tmp_path):
    rep = QueryRunReporter(spark, str(tmp_path))
    n = rep.run("status_counts", _q(spark, sf_dir))
    rows = rep.table().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.query_name == "status_counts" and r.status == "COMPLETED"
    assert r.n_rows == n and r.wall_seconds > 0
    assert len(r.plan_fingerprint) == 16 and r.created_at is not None


def test_fingerprint_stable_across_equivalent_frames(spark, sf_dir):
    # two independently built but logically identical frames carry
    # session-volatile expression ids — normalization must erase them
    a = plan_fingerprint(_q(spark, sf_dir))
    b = plan_fingerprint(_q(spark, sf_dir))
    assert a == b


def test_fingerprint_changes_when_plan_changes(spark, sf_dir):
    base = _q(spark, sf_dir)
    assert plan_fingerprint(base) != plan_fingerprint(
        base.filter(F.col("n") > 3)
    )


def test_normalize_masks_expression_ids():
    assert normalize_plan("Aggregate [o_orderstatus#42], [count(1) AS n#43L]") == \
        normalize_plan("Aggregate [o_orderstatus#7], [count(1) AS n#991L]")


def test_failed_run_reported_then_raised(spark, sf_dir, tmp_path):
    rep = QueryRunReporter(spark, str(tmp_path))
    # raise_error fires at execution time, not planning time, in any
    # session config
    # inside a FILTER so the count action cannot column-prune it away
    bad = spark.range(3).filter(
        F.length(
            F.when(F.col("id") > 1, F.raise_error(F.lit("boom")))
            .otherwise(F.lit("ok"))
        )
        > 0
    )
    with pytest.raises(Exception):
        rep.run("bad_query", bad)
    rows = rep.table().collect()
    assert len(rows) == 1 and rows[0].status == "ERROR"
    assert rows[0].error_message


def test_drift_report_between_runs(spark, sf_dir, tmp_path):
    base = str(tmp_path)
    r1 = QueryRunReporter(spark, base, run_uuid="r1")
    r1.run("q", _q(spark, sf_dir))
    # same logical plan again: no drift
    r2 = QueryRunReporter(spark, base, run_uuid="r2")
    r2.run("q", _q(spark, sf_dir))
    assert r2.drifted("r1").count() == 0
    # a changed plan shape: drift detected
    r3 = QueryRunReporter(spark, base, run_uuid="r3")
    r3.run("q", _q(spark, sf_dir).filter(F.col("n") > 0))
    drift = r3.drifted("r1").collect()
    assert [d.query_name for d in drift] == ["q"]
