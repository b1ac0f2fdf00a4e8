"""S9 — append-only audit trail as three parquet tables.

Schemas mirror the reference's SQLite DDL
(smartbots-etl/src/infrastructure/sqlite_tracker.py:15-67):
execution_runs / file_log / record_log, FK-linked by run_uuid and
file_log_id. SQLite's WAL+executemany batching becomes one
``df.write.mode("append")`` per batch — Spark's native append is the
write-amortization the reference hand-rolled.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RUN_SCHEMA = T.StructType([
    T.StructField("run_uuid", T.StringType(), False),
    T.StructField("started_at", T.TimestampType(), True),
    T.StructField("finished_at", T.TimestampType(), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("total_files", T.LongType(), True),
    T.StructField("total_records", T.LongType(), True),
    T.StructField("inserted", T.LongType(), True),
    T.StructField("updated", T.LongType(), True),
    T.StructField("unchanged", T.LongType(), True),
    T.StructField("errors", T.LongType(), True),
    T.StructField("source_total_amount", T.StringType(), True),
    T.StructField("output_total_amount", T.StringType(), True),
    T.StructField("message", T.StringType(), True),
])

FILE_LOG_SCHEMA = T.StructType([
    T.StructField("file_log_id", T.StringType(), False),
    T.StructField("run_uuid", T.StringType(), False),
    T.StructField("file_name", T.StringType(), True),
    T.StructField("file_modified_time", T.StringType(), True),
    T.StructField("schema_valid", T.BooleanType(), True),
    T.StructField("missing_columns", T.StringType(), True),
    T.StructField("extra_columns", T.StringType(), True),
    T.StructField("rows_total", T.LongType(), True),
    T.StructField("rows_valid", T.LongType(), True),
    T.StructField("rows_error", T.LongType(), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("error_message", T.StringType(), True),
])

RECORD_LOG_ACTIONS = ("INSERT", "UPDATE", "UNCHANGED", "VALIDATION_ERROR", "TRANSFORM_ERROR")

RECORD_LOG_SCHEMA = T.StructType([
    T.StructField("run_uuid", T.StringType(), False),
    T.StructField("file_log_id", T.StringType(), True),
    T.StructField("row_index", T.LongType(), True),
    T.StructField("invoice_number", T.StringType(), True),
    T.StructField("reference_number", T.StringType(), True),
    T.StructField("action", T.StringType(), True),
    T.StructField("error_message", T.StringType(), True),
])


class AuditWriter:
    """Append-only audit sink rooted at ``base_dir`` (one parquet table
    per audit relation, each row stamped with current_timestamp — F8).

    At cluster scale the same API points at object-store paths; the
    appends are partition-parallel and never rewrite existing files.
    """

    def __init__(self, spark: SparkSession, base_dir: str) -> None:
        self.spark = spark
        self.base = base_dir

    def _append(self, df: DataFrame, table: str) -> None:
        df.withColumn("created_at", F.current_timestamp()).write.mode("append").parquet(
            os.path.join(self.base, table)
        )

    def start_run(self, run_uuid: str | None = None) -> str:
        run_uuid = run_uuid or str(uuid.uuid4())
        row = [(run_uuid, None, None, "RUNNING", None, None, None, None, None, None,
                None, None, None)]
        df = self.spark.createDataFrame(row, RUN_SCHEMA).withColumn(
            "started_at", F.current_timestamp()
        )
        self._append(df, "execution_runs")
        return run_uuid

    def finish_run(self, run_uuid: str, report_row: dict) -> None:
        row = [(
            run_uuid, None, None, report_row.get("status"),
            report_row.get("total_files"), report_row.get("total_records"),
            report_row.get("inserted"), report_row.get("updated"),
            report_row.get("unchanged"), report_row.get("errors"),
            str(report_row.get("source_total_amount", "")),
            str(report_row.get("output_total_amount", "")),
            report_row.get("message"),
        )]
        df = self.spark.createDataFrame(row, RUN_SCHEMA).withColumn(
            "finished_at", F.current_timestamp()
        )
        self._append(df, "execution_runs")

    def log_file(self, run_uuid: str, file_name: str, **fields) -> str:
        file_log_id = str(uuid.uuid4())
        row = [(
            file_log_id, run_uuid, file_name,
            str(fields.get("file_modified_time", "")),
            fields.get("schema_valid", True),
            str(fields.get("missing_columns", "[]")),
            str(fields.get("extra_columns", "[]")),
            fields.get("rows_total"), fields.get("rows_valid"),
            fields.get("rows_error"), fields.get("status", "COMPLETED"),
            fields.get("error_message"),
        )]
        self._append(self.spark.createDataFrame(row, FILE_LOG_SCHEMA), "file_log")
        return file_log_id

    def log_records(self, records: DataFrame) -> None:
        """J6 output → record_log append. ``records`` must carry the
        RECORD_LOG_SCHEMA columns (validated here, fail-fast)."""
        missing = set(f.name for f in RECORD_LOG_SCHEMA) - set(records.columns)
        if missing:
            raise ValueError(f"record_log append missing columns: {sorted(missing)}")
        self._append(records.select(*[f.name for f in RECORD_LOG_SCHEMA]), "record_log")

    def table(self, name: str) -> DataFrame:
        """Read one audit relation. Resolves any compaction interrupted
        by a crash FIRST (roll forward / roll back via the intent log),
        so a restart reader never double-counts rows from the step-4..6
        window — the same single-writer contract as compact() itself."""
        from .layout import recover_compactions

        path = os.path.join(self.base, name)
        if os.path.isdir(path):
            recover_compactions(path)
        return self.spark.read.parquet(path)

    def compact(self, table: str | None = None,
                target_files: int | None = None) -> dict[str, dict]:
        """Small-file maintenance for the audit tables (round-12
        verdict #3): every run/file/record append writes its own tiny
        parquet file; fold each table through the crash-safe
        intent-log protocol (sinks/layout.py:compact_append_dir).
        Rows are preserved exactly; pass ``table`` to compact one
        relation, default sweeps all three that exist on disk."""
        from .layout import compact_append_dir

        names = [table] if table else ["execution_runs", "file_log",
                                       "record_log"]
        out: dict[str, dict] = {}
        for name in names:
            path = os.path.join(self.base, name)
            if os.path.isdir(path):
                out[name] = compact_append_dir(self.spark, path,
                                               target_files=target_files)
        return out

    def is_completed(self, file_name: str, modified_time: str) -> bool:
        """J5 idempotency probe against file_log (False when the audit
        table does not exist yet — first-ever run)."""
        if not os.path.isdir(os.path.join(self.base, "file_log")):
            return False
        fl = self.table("file_log")
        return (
            fl.filter(
                (F.col("file_name") == file_name)
                & (F.col("file_modified_time") == str(modified_time))
                & (F.col("status") == "COMPLETED")
            ).limit(1).count() > 0
        )
