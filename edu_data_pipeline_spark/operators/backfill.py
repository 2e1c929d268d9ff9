"""Partition-scoped backfill: reprocess a date slice without touching the
rest of the table.

The reference reprocesses by re-running the whole DAG (idempotent
upserts carry it at 30-row scale); at 100 TB a correction to one day
must rewrite ONE partition, not the table. Spark's dynamic partition
overwrite does exactly that: with ``partitionOverwriteMode=dynamic``,
``mode("overwrite")`` on a partitioned table replaces only the
partitions present in the incoming DataFrame — the plain-parquet
equivalent of Delta's ``replaceWhere``. The conf is set per-write and
restored, so the session default (static = whole-table overwrite
semantics) is never silently changed for other writers.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_partitioned", "backfill_partitions"]

_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


@contextmanager
def _dynamic_overwrite(spark: SparkSession):
    previous = spark.conf.get(_MODE_KEY, "static")
    spark.conf.set(_MODE_KEY, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(_MODE_KEY, previous)


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Initial partitioned layout (one directory per partition value)."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def backfill_partitions(df: DataFrame, path: str, partition_col: str) -> None:
    """Overwrite ONLY the partitions present in ``df``.

    The caller filters ``df`` to the slice being corrected; partitions
    absent from ``df`` are untouched (dynamic overwrite), so the cost —
    and the blast radius — is bounded by the slice, not the table."""
    spark = df.sparkSession
    with _dynamic_overwrite(spark):
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
