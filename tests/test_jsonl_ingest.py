from __future__ import annotations

from pyspark.sql import types as T

from edu_data_pipeline_spark.sources.jsonl_ingest import (
    ingest_jsonl,
    read_jsonl_with_dlq,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("student_id", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

LINES = [
    '{"event_id": "e1", "student_id": "STU001", "score": 88.5}',
    '{"event_id": "e2", "student_id": "STU002", "score": 42.0}',
    "this is not json at all",
    '{"event_id": "e3", "student_id": "STU003", "score": "not-a-number"}',
]


def _write(tmp_path):
    p = tmp_path / "events.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_read_jsonl_routes_corrupt(spark, tmp_path):
    good, corrupt = read_jsonl_with_dlq(spark, _write(tmp_path), SCHEMA)
    good_rows = {r.event_id for r in good.collect()}
    # PERMISSIVE JSON routes BOTH unparseable lines and type-mismatched
    # records (e3's string score vs DoubleType) to _corrupt_record
    assert good_rows == {"e1", "e2"}
    assert good.columns == ["event_id", "student_id", "score", "file_name"]
    assert {r.file_name for r in good.collect()} == {"events.jsonl"}
    bad = {r.raw_line for r in corrupt.collect()}
    assert bad == {"this is not json at all", LINES[3]}


def test_ingest_jsonl_counts_and_sinks(spark, tmp_path):
    raw = str(tmp_path / "raw")
    dlq = str(tmp_path / "dlq")
    n_good, n_bad = ingest_jsonl(
        spark, _write(tmp_path), SCHEMA, raw, dlq_path=dlq, batch_id="b1"
    )
    assert (n_good, n_bad) == (2, 2)
    stamped = spark.read.parquet(raw)
    assert {"file_name", "file_row_number", "batch_id", "ingested_at"} <= set(
        stamped.columns
    )
    assert stamped.count() == 2
    assert spark.read.parquet(dlq).count() == 2
