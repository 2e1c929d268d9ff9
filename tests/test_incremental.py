from __future__ import annotations

import os

from edu_data_pipeline_spark.sources.incremental import (
    ingest_incremental,
    pending_files,
)

COLS = ["student_id", "full_name"]


def _write_csv(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        f.write("student_id,full_name\n")
        for r in rows:
            f.write(",".join(r) + "\n")


def test_incremental_ingests_only_backlog(spark, tmp_path):
    src = str(tmp_path / "in")
    raw = str(tmp_path / "raw")
    ledger = str(tmp_path / "ledger")
    _write_csv(src, "a.csv", [("s1", "Alice"), ("s2", "Bob")])
    _write_csv(src, "b.csv", [("s3", "Cara")])

    first = ingest_incremental(spark, src, COLS, raw, ledger)
    assert first == {"a.csv": 2, "b.csv": 1}
    assert spark.read.parquet(raw).count() == 3

    # rerun with nothing new: no-op, raw unchanged
    assert ingest_incremental(spark, src, COLS, raw, ledger) == {}
    assert spark.read.parquet(raw).count() == 3

    # a new file arrives: only it is processed
    _write_csv(src, "c.csv", [("s4", "Dev"), ("s5", "Eve")])
    assert pending_files(spark, src, ledger) == [os.path.join(src, "c.csv")]
    third = ingest_incremental(spark, src, COLS, raw, ledger)
    assert third == {"c.csv": 2}
    assert spark.read.parquet(raw).count() == 5
    # ledger carries one row per processed file
    led = spark.read.parquet(ledger)
    assert led.count() == 3
    assert {r.file_name for r in led.collect()} == {"a.csv", "b.csv", "c.csv"}
