"""Declared schemas for every layer (SURVEY §7: explicit StructTypes from
init_db/init_schema.sql). The raw layer is all-string by design
(init_schema.sql:26-101); staging/warehouse types mirror the DDL
(§1.2 type mapping: VARCHAR->string, DATE->date, TIMESTAMPTZ->timestamp
with UTC session, DECIMAL kept exact, SERIAL->generated keys).

Conformance is enforced by tests/test_schemas.py against the live
pipeline outputs.
"""

from __future__ import annotations

from pyspark.sql import types as T

from .sources.csv_ingest import REQUIRED_COLUMNS


def raw_schema(dataset: str) -> T.StructType:
    """All-string raw schema + lineage columns."""
    return T.StructType(
        [T.StructField(c, T.StringType()) for c in REQUIRED_COLUMNS[dataset]]
        + [
            T.StructField("file_name", T.StringType()),
            T.StructField("file_row_number", T.IntegerType()),
            T.StructField("batch_id", T.StringType()),
            T.StructField("ingested_at", T.TimestampType()),
        ]
    )


STG_STUDENTS = T.StructType(
    [
        T.StructField("student_id", T.StringType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("dob", T.DateType()),
        T.StructField("gender", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("enrollment_date", T.DateType()),
        T.StructField("program_id", T.StringType()),
        T.StructField("fee_paid", T.DecimalType(15, 2)),
        T.StructField("payment_status", T.StringType()),
        T.StructField("is_email_valid", T.BooleanType()),
        T.StructField("is_phone_valid", T.BooleanType()),
        T.StructField("is_date_valid", T.BooleanType()),
        T.StructField("quality_score", T.IntegerType()),
        T.StructField("cleaning_notes", T.StringType()),
        T.StructField("batch_id", T.StringType()),
        T.StructField("is_duplicate", T.BooleanType()),
    ]
)

STG_PROGRESS = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("student_id", T.StringType()),
        T.StructField("course_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_timestamp", T.TimestampType()),
        T.StructField("duration_seconds", T.IntegerType()),
        T.StructField("score", T.DecimalType(5, 2)),
        T.StructField("module_id", T.StringType()),
        T.StructField("completion_percentage", T.DecimalType(5, 2)),
        T.StructField("is_student_valid", T.BooleanType()),
        T.StructField("is_timestamp_valid", T.BooleanType()),
        T.StructField("is_score_valid", T.BooleanType()),
        T.StructField("quality_score", T.IntegerType()),
        T.StructField("batch_id", T.StringType()),
        T.StructField("is_duplicate", T.BooleanType()),
    ]
)

STG_TICKETS = T.StructType(
    [
        T.StructField("ticket_id", T.StringType()),
        T.StructField("student_id", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("priority", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("created_date", T.DateType()),
        T.StructField("resolved_date", T.DateType()),
        T.StructField("is_student_valid", T.BooleanType()),
        T.StructField("quality_score", T.IntegerType()),
        T.StructField("batch_id", T.StringType()),
    ]
)

DIM_DATE = T.StructType(
    [
        T.StructField("date_key", T.IntegerType()),
        T.StructField("full_date", T.DateType()),
        T.StructField("day_of_week", T.IntegerType()),
        T.StructField("day_name", T.StringType()),
        T.StructField("day_of_month", T.IntegerType()),
        T.StructField("week_of_year", T.IntegerType()),
        T.StructField("month_number", T.IntegerType()),
        T.StructField("month_name", T.StringType()),
        T.StructField("quarter", T.IntegerType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("is_weekend", T.BooleanType()),
    ]
)


def conforms(df_schema: T.StructType, declared: T.StructType) -> list[str]:
    """Name+type conformance report (empty = conforms). Ordering is not
    significant; extra columns in the frame are reported."""
    problems = []
    declared_map = {f.name: f.dataType for f in declared.fields}
    actual_map = {f.name: f.dataType for f in df_schema.fields}
    for name, dtype in declared_map.items():
        if name not in actual_map:
            problems.append(f"missing column: {name}")
        elif actual_map[name].simpleString() != dtype.simpleString():
            problems.append(
                f"type mismatch {name}: {actual_map[name].simpleString()} "
                f"!= {dtype.simpleString()}"
            )
    for name in actual_map:
        if name not in declared_map:
            problems.append(f"undeclared column: {name}")
    return problems
