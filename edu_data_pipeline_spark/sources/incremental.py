"""Incremental file ingestion: process only files not yet in the ledger.

The reference's ``detect_new_files`` (dags/file_ingestion_pipeline.py:35-43)
probes a fixed path list and its ``update_ingestion_log`` task (:97-99)
records what ran — but nothing connects the two, so every DAG run
re-ingests every file and idempotence leans entirely on the staging
upsert. This module closes that loop Spark-first: a parquet ledger of
processed file names, a driver-side set difference to pick the backlog
(directory listings are bounded; the ledger read is one column of one
small table), and an append of both data and ledger rows per batch.
Re-running after success is a no-op — the batch twin of Structured
Streaming's checkpointed file source (which `streaming/jobs.py` uses for
the true streaming path).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .csv_ingest import read_raw_csv, with_lineage

__all__ = ["pending_files", "ingest_incremental"]

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("batch_id", T.StringType()),
        T.StructField("processed_at", T.TimestampType()),
    ]
)


def _processed_names(spark: SparkSession, ledger_path: str) -> set[str]:
    try:
        rows = (
            spark.read.schema(LEDGER_SCHEMA)
            .parquet(ledger_path)
            .select("file_name")
            .distinct()
            .collect()
        )
    except Exception:  # first run: no ledger yet
        return set()
    return {r.file_name for r in rows}


def pending_files(
    spark: SparkSession, input_dir: str, ledger_path: str, suffix: str = ".csv"
) -> list[str]:
    """Files in ``input_dir`` whose basename is not in the ledger, sorted
    for deterministic processing order. The distinct file-name pull is
    bounded by file count (ledger rows), never data size."""
    present = sorted(
        f for f in os.listdir(input_dir) if f.endswith(suffix)
    )
    done = _processed_names(spark, ledger_path)
    return [os.path.join(input_dir, f) for f in present if f not in done]


def ingest_incremental(
    spark: SparkSession,
    input_dir: str,
    required_columns: list[str],
    raw_path: str,
    ledger_path: str,
    batch_id: str | None = None,
) -> dict[str, int]:
    """Ingest only the backlog; returns {file_name: n_rows} for this run
    (empty dict == nothing new). Data append lands before the ledger
    append, so a crash between the two re-ingests rather than skips —
    at-least-once into an append-only raw layer, deduplicated by the
    staging upsert exactly like the reference's re-run story."""
    batch = batch_id or uuid.uuid4().hex
    backlog = pending_files(spark, input_dir, ledger_path)
    if not backlog:
        return {}
    counts: dict[str, int] = {}
    for path in backlog:
        df = with_lineage(read_raw_csv(spark, path, required_columns), batch)
        df.write.mode("append").parquet(raw_path)
        counts[os.path.basename(path)] = df.count()
    ledger_rows = [
        (name, n, batch) for name, n in counts.items()
    ]
    (
        spark.createDataFrame(
            ledger_rows, ["file_name", "n_rows", "batch_id"]
        )
        .withColumn("processed_at", F.current_timestamp())
        .write.mode("append")
        .parquet(ledger_path)
    )
    return counts
