"""Batch JSONL ingestion (SURVEY §2.1 source family, JSON-lines flavor).

The reference's event payloads are JSON dicts on Kafka topics
(``kafka/streaming.py:25-49``); the batch twin of that feed is a JSON-lines
file drop. Mirrors ``csv_ingest``: explicit schema (no sampling-based
inference job — at 100 TB a schema-inference pre-pass is a full extra
scan), PERMISSIVE parse with malformed lines routed to a DLQ frame, and
the same lineage stamping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .csv_ingest import with_lineage

__all__ = ["read_jsonl_with_dlq", "ingest_jsonl"]


def read_jsonl_with_dlq(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSON-lines read returning (good, corrupt).

    Malformed lines land in ``_corrupt_record`` at scan time and are
    routed out instead of failing the job (the DLQ policy the reference
    applies per-event in ``kafka/streaming.py:112-114``, applied at the
    batch scan); type-mismatched records count as malformed too. The
    parse is cached because Spark cannot filter on the corrupt-record
    column without materializing it first; ``good`` carries a
    ``file_name`` lineage column captured before the cache.

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
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    from ..caches import persist_tracked

    df = persist_tracked(  # tracked so release_caches() frees it after
        # the caller consumes both branches
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(full)
        .json(path)
        # input_file_name() must be captured BEFORE the cache: after
        # materialization rows come from InMemoryTableScan, where it
        # evaluates to "" (no file context)
        .withColumn(
            "file_name", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
    )
    good = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, corrupt


def ingest_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    raw_path: str,
    dlq_path: str | None = None,
    batch_id: str | None = None,
) -> tuple[int, int]:
    """JSONL → lineage-stamped raw append + DLQ sink; returns (good, bad)
    counts. The counts ride on the writes' own scans (no extra job when
    the caller needs only the side effect)."""
    good, corrupt = read_jsonl_with_dlq(spark, path, schema)
    stamped = with_lineage(good, batch_id)
    stamped.write.mode("append").parquet(raw_path)
    n_good = stamped.count()
    n_bad = corrupt.count()
    if dlq_path is not None and n_bad:
        corrupt.write.mode("append").parquet(dlq_path)
    return n_good, n_bad
