"""The reference's whole use case as one composable pipeline.

Mirrors ConsolidateInvoicesUseCase.execute
(smartbots-etl/src/application/use_cases/consolidate_invoices.py:45-160)
re-expressed with the engine's operators: per source file —
idempotency skip (J5) → schema validation (U2) → clean (P2-P4) →
validate/split (P9/P10) → first-wins dedup (U4) → insert-only upsert
(J1) → reconciliation (J3/J4/A1/A2) → audit logging (S9/A3/A4/J6) —
then staged atomic publish with snapshot retention (S11) and the
run-level report with SUCCESS/PARTIAL/ERROR/NO_FILES derivation (A5).

The per-file driver loop is intentional fidelity to the reference's
transaction unit (file-level rollback + audit granularity); each
file's dataflow is fully distributed. When per-file audit granularity
is not needed, the all-files-at-once path is the flagship plan in
``__spark_entry__.q_flagship_consolidation`` (one Catalyst plan over
a union of inputs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.ordered import dedup_first_wins
from smartbots_etl_facturas_spark.operators.reconcile import reconcile
from smartbots_etl_facturas_spark.operators.upsert import upsert_insert_only
from smartbots_etl_facturas_spark.operators.validation import split_valid, with_validation
from smartbots_etl_facturas_spark.sinks.audit import AuditWriter
from smartbots_etl_facturas_spark.sinks.staged import current_version, publish, read_published
from smartbots_etl_facturas_spark.sources.readers import validate_schema

PK = ["invoice_number", "reference_number"]

EXPECTED_COLUMNS = [
    "row_idx", "invoice_number", "reference_number", "carrier_name",
    "net_amount", "tax_amount", "total_amount",
]


@dataclass
class RunReport:
    """A5 — ExecutionReport twin (dtos.py:21-88)."""

    status: str = "SUCCESS"
    total_files: int = 0
    files_ok: int = 0
    files_error: int = 0
    files_skipped: int = 0
    total_records: int = 0
    inserted: int = 0
    validation_errors: int = 0
    source_total: str = "0"
    output_total: str = "0"
    messages: list[str] = field(default_factory=list)


def _empty_consolidated(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [],
        "invoice_number string, reference_number string, carrier_name string, "
        "net_amount decimal(12,2), tax_amount decimal(18,6), "
        "total_amount decimal(18,6), source_file string",
    )


def consolidate(
    spark: SparkSession,
    files: list[tuple[str, str, DataFrame]],
    consolidated_base: str,
    audit: AuditWriter,
    checkpoint_every: int = 8,
    plan_sizes: list[int] | None = None,
) -> RunReport:
    """Run the consolidation over ``files`` = [(name, modified_time,
    frame)] and publish the new consolidated version.

    Returns the run report; the consolidated table is published (new
    version + pointer flip) only when every processed file reconciled
    — a failed file is logged ERROR and its rows excluded, matching
    the reference's per-file rollback unit.

    Lineage is BOUNDED: each iteration stacks an anti-join + union
    onto the consolidated plan, so every ``checkpoint_every`` files
    the frame is ``localCheckpoint``-ed (plan truncated to the
    materialized RDD) and the per-file caches released. Without this,
    hundreds of files make Catalyst re-analyze an ever-deeper tree
    and recompute the whole history on each action. On a real cluster
    at 100 TB, prefer publish-and-reread through the versioned sink
    (same effect, spill-safe, survives executor loss); localCheckpoint
    is the right size for the reference's tens-of-files transaction
    unit. ``plan_sizes``, when a list is supplied, collects
    len(plan-string) after each processed file (test observability).
    """
    report = RunReport()
    run_uuid = audit.start_run()

    try:
        consolidated = read_published(spark, consolidated_base)
    except FileNotFoundError:
        consolidated = _empty_consolidated(spark)

    live_caches: list[DataFrame] = []
    files_since_checkpoint = 0
    for file_name, modified_time, raw in files:
        report.total_files += 1
        # J5 — idempotent skip
        if current_version(consolidated_base) and audit.is_completed(file_name, modified_time):
            report.files_skipped += 1
            continue
        try:
            # U2 — declared schema
            validate_schema(raw, EXPECTED_COLUMNS)

            incoming = raw.select(
                "row_idx",
                F.trim(F.coalesce(F.col("invoice_number"), F.lit(""))).alias("invoice_number"),
                F.trim(F.coalesce(F.col("reference_number"), F.lit(""))).alias("reference_number"),
                F.trim(F.coalesce(F.col("carrier_name"), F.lit(""))).alias("carrier_name"),
                F.col("net_amount").cast("decimal(12,2)").alias("net_amount"),
                F.col("tax_amount").cast("decimal(18,6)").alias("tax_amount"),
                F.col("total_amount").cast("decimal(18,6)").alias("total_amount"),
                F.lit(file_name).alias("source_file"),
            )

            validated = with_validation(incoming).cache()
            live_caches.append(validated)
            valid, errors = split_valid(validated)
            valid = dedup_first_wins(valid, PK, ["row_idx"]).drop("valid", "error_reason")

            # one aggregation job for both per-file counters (A4),
            # instead of two separate count() jobs
            counts = validated.agg(
                F.count(F.lit(1)).alias("n_total"),
                F.sum(F.when(~F.col("valid"), 1).otherwise(0)).alias("n_errors"),
            ).collect()[0]
            n_total = counts.n_total
            n_errors = int(counts.n_errors or 0)
            result = upsert_insert_only(consolidated, valid.drop("row_idx"), PK)

            rec = reconcile(valid, result, PK, amount_type="decimal(27,6)").collect()[0]
            if not rec.reconciled:
                raise RuntimeError(
                    f"reconciliation failed: missing={rec.missing_pk_count} "
                    f"variance={rec.variance}"
                )

            # J6 + P10 → record_log
            new_pks = valid.join(consolidated.select(*PK).distinct(), PK, "left_anti")
            file_log_id = audit.log_file(
                run_uuid, file_name,
                file_modified_time=modified_time, schema_valid=True,
                rows_total=n_total, rows_valid=n_total - n_errors,
                rows_error=n_errors, status="COMPLETED",
            )
            actions = new_pks.select(
                F.lit(run_uuid).alias("run_uuid"),
                F.lit(file_log_id).alias("file_log_id"),
                F.col("row_idx").alias("row_index"),
                "invoice_number", "reference_number",
                F.lit("INSERT").alias("action"),
                F.lit(None).cast("string").alias("error_message"),
            ).unionByName(
                errors.select(
                    F.lit(run_uuid).alias("run_uuid"),
                    F.lit(file_log_id).alias("file_log_id"),
                    F.col("row_idx").alias("row_index"),
                    "invoice_number", "reference_number",
                    F.lit("VALIDATION_ERROR").alias("action"),
                    F.col("error_reason").alias("error_message"),
                )
            ).cache()
            # the INSERT-action count IS the A3 inserted counter —
            # derived from the already-needed audit frame, not a
            # separate anti-join count job
            n_inserted = actions.filter(F.col("action") == "INSERT").count()
            audit.log_records(actions)
            actions.unpersist()

            report.files_ok += 1
            report.total_records += n_total
            report.inserted += n_inserted
            report.validation_errors += n_errors
            consolidated = result
            files_since_checkpoint += 1
            if files_since_checkpoint >= checkpoint_every:
                # truncate lineage; only then are the per-file caches
                # safe to drop (the checkpointed RDD no longer
                # references them)
                consolidated = consolidated.localCheckpoint()
                for c in live_caches:
                    c.unpersist()
                live_caches.clear()
                files_since_checkpoint = 0
            if plan_sizes is not None:
                plan_sizes.append(
                    len(consolidated._jdf.queryExecution().toString())  # noqa: SLF001
                )
        except Exception as exc:  # per-file failure unit, like the reference
            report.files_error += 1
            report.messages.append(f"{file_name}: {exc}")
            audit.log_file(
                run_uuid, file_name,
                file_modified_time=modified_time,
                schema_valid="schema mismatch" not in str(exc),
                status="ERROR", error_message=str(exc),
            )

    # A5 — status derivation (consolidate_invoices.py:140-145)
    if report.total_files == 0:
        report.status = "NO_FILES"
    elif report.files_error == 0:
        report.status = "SUCCESS"
    elif report.files_ok > 0 or report.files_skipped > 0:
        report.status = "PARTIAL"
    else:
        report.status = "ERROR"

    # S11 — reconcile-before-publish: the check re-runs on the WRITTEN
    # bytes; a failure leaves the previous version current.
    if report.files_ok > 0:
        totals = consolidated.agg(
            F.sum(F.col("total_amount").cast("decimal(27,6)")).alias("t"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        expect_n = totals.n

        def check(written: DataFrame) -> None:
            if written.count() != expect_n:
                raise RuntimeError("published row count != computed row count")

        publish(consolidated, consolidated_base, check=check)
        report.output_total = str(totals.t)

    for c in live_caches:  # caches pinned since the last checkpoint
        c.unpersist()

    audit.finish_run(
        run_uuid,
        {
            "status": report.status,
            "total_files": report.total_files,
            "total_records": report.total_records,
            "inserted": report.inserted,
            "errors": report.validation_errors,
            "output_total_amount": report.output_total,
            "message": "; ".join(report.messages) or None,
        },
    )
    return report
