"""CSV ingestion sources/sinks (reference S1-S5, SURVEY §2.1).

The raw layer is stringly typed on purpose (init_schema.sql:26-101):
every CSV column is read as a string and typing happens during cleaning.
File pre-flight validation (existence / size cap / required header) runs
driver-side before any job is scheduled, exactly like
``operators/file_validation.py:10-36``; lineage columns (file name, row
number within file, batch id) are stamped with native expressions
replicating ``dags/file_ingestion_pipeline.py:88-92``.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The four reference datasets and their required headers
# (dags/file_ingestion_pipeline.py:110-172).
REQUIRED_COLUMNS: dict[str, list[str]] = {
    "students_enrollment": [
        "student_id", "full_name", "email", "phone", "dob", "gender", "city",
        "state", "enrollment_date", "program_id", "fee_paid", "payment_status",
    ],
    "student_progress": [
        "event_id", "student_id", "course_id", "event_type", "event_timestamp",
        "duration_seconds", "score", "module_id", "completion_percentage",
    ],
    "course_catalog": [
        "course_id", "course_name", "category", "difficulty", "duration_hours",
        "price", "instructor_name", "is_active",
    ],
    "support_tickets": [
        "ticket_id", "student_id", "subject", "description", "priority",
        "status", "category", "created_date", "resolved_date",
    ],
}

MAX_FILE_SIZE_MB = 25  # operators/file_validation.py:14


class FileValidationError(Exception):
    pass


@dataclass
class ValidationResult:
    path: str
    ok: bool
    problems: list[str] = field(default_factory=list)


def detect_new_files(input_dir: str, fallback_dir: str | None = None) -> list[str]:
    """S1 (dags/file_ingestion_pipeline.py:26-43): probe the fixed dataset
    list in input_dir (with a fallback dir), return found CSV paths."""
    found = []
    for name in REQUIRED_COLUMNS:
        for base in filter(None, [input_dir, fallback_dir]):
            path = os.path.join(base, f"{name}.csv")
            if os.path.exists(path):
                found.append(path)
                break
    return found


def validate_file(
    path: str,
    required_columns: list[str],
    max_size_mb: int = MAX_FILE_SIZE_MB,
) -> ValidationResult:
    """S3 pre-flight (operators/file_validation.py:20-36): exists, size cap,
    header present, required columns ⊆ header. Driver-side, no Spark job."""
    res = ValidationResult(path, True)
    if not os.path.exists(path):
        res.ok = False
        res.problems.append("missing-file")
        return res
    size_mb = os.path.getsize(path) / (1024 * 1024)
    if size_mb > max_size_mb:
        res.ok = False
        res.problems.append(f"file-too-large:{size_mb:.1f}MB>{max_size_mb}MB")
    with open(path, newline="") as f:
        header_line = f.readline().strip()
    if not header_line:
        res.ok = False
        res.problems.append("empty-header")
        return res
    header = [h.strip() for h in header_line.split(",")]
    missing = [c for c in required_columns if c not in header]
    if missing:
        res.ok = False
        res.problems.append(f"missing-columns:{missing}")
    return res


def read_raw_csv(
    spark: SparkSession,
    path: str,
    required_columns: list[str],
    validate: bool = True,
) -> DataFrame:
    """S2 (dags/file_ingestion_pipeline.py:46-57): all-string schema-on-read
    with header; the raw layer keeps every value as text."""
    if validate:
        res = validate_file(path, required_columns)
        if not res.ok:
            raise FileValidationError(f"{path}: {res.problems}")
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in required_columns]
    )
    return (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )


def with_lineage(df: DataFrame, batch_id: str | None = None) -> DataFrame:
    """S4 lineage stamping (dags/file_ingestion_pipeline.py:88-92):
    file_name, file_row_number (1-based within the source file), batch_id.

    Row numbers partition by the input file, ordered by the CSV's physical
    order — at scale each file's window is independent, so skew is bounded
    by the 25 MB file cap, not dataset size.
    """
    batch = batch_id or uuid.uuid4().hex
    # honor a pre-captured file_name (sources that cache the scan must
    # capture input_file_name() before materialization, e.g. jsonl_ingest)
    if "file_name" in df.columns:
        with_file = df
    else:
        with_file = df.withColumn(
            "file_name", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
    w = Window.partitionBy("file_name").orderBy(F.monotonically_increasing_id())
    return (
        with_file.withColumn("file_row_number", F.row_number().over(w))
        .withColumn("batch_id", F.lit(batch))
        .withColumn("ingested_at", F.current_timestamp())
    )


def append_raw(df: DataFrame, path: str) -> None:
    """S4 raw append sink: append-only parquet raw layer (the reference's
    INSERT-only raw tables, db.py:32-42)."""
    df.write.mode("append").parquet(path)


def read_with_corrupt_routing(
    spark: SparkSession,
    path: str,
    required_columns: list[str],
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE read with malformed rows routed to a DLQ frame.

    The reference drops records whose cleaning function raises and counts
    them (operators/data_cleaning.py:61-64); the Spark-first analog
    captures unparseable CSV rows in ``_corrupt_record`` at scan time and
    routes them out instead of failing the job. Returns (good, corrupt).

    Cache-lifecycle convention: both returned frames share ONE cached
    parse enrolled in the process-global tracked registry
    (``edu_data_pipeline_spark.caches``). The harnesses (bench, parity
    sweep, pipeline) call ``release_caches()`` after consuming each
    query's output; an AD-HOC caller owns that call itself — consume
    BOTH branches, then ``caches.release_caches()`` — and must not hold
    the frames across someone else's ``release_caches()`` (a later
    global flush unpersists this cache too; results stay correct but
    the full PERMISSIVE parse silently recomputes per branch).
    """
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in required_columns]
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    from ..caches import persist_tracked

    df = persist_tracked(  # required: corrupt-record column cannot be
        # filtered per-query without materializing the parse (Spark
        # constraint); tracked so release_caches() frees it after the
        # caller consumes both branches
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(path)
    )
    good = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, corrupt
