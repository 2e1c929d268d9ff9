"""Physical layout management: compaction and sort-clustered writes.

The reference never manages files (single-node Postgres); at 100 TB the
table layout IS a first-class operator: thousands of small files from
incremental appends destroy scan throughput (per-file open cost, no
row-group skipping), and unclustered data defeats parquet min/max pruning.
``compact_sorted`` rewrites a table into N range-partitioned files sorted
within each file, so every file owns a disjoint key range — a filter on
the cluster key then prunes whole files via footer statistics before any
row is read (the poor man's Z-order; same mechanism Delta OPTIMIZE
ZORDER exploits, expressed with stock Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact_sorted(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    target_files: int,
) -> None:
    """Rewrite ``df`` as ``target_files`` parquet files range-clustered on
    ``cluster_by``: repartitionByRange gives each output file a disjoint
    key range (one global sample pass to pick boundaries — the only
    non-linear cost, and it's a sample, not a sort), sortWithinPartitions
    orders rows inside each file for row-group min/max skipping. No
    global sort: files are mutually ordered by range, rows only within
    files — exactly what footer-stats pruning needs, one shuffle
    cheaper than orderBy()."""
    (
        df.repartitionByRange(target_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_key_ranges(
    spark: SparkSession, path: str, key: str
) -> list[tuple[str, object, object]]:
    """Per-file (file, min(key), max(key)) of a parquet table — the ranges
    the scan planner prunes against. Driver-side result is one row per
    file (bounded by file count, not data size)."""
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(path)
        .groupBy(F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"))
        .agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
        .collect()
    )
    return sorted([(r.file, r.lo, r.hi) for r in rows], key=lambda t: (t[1], t[2]))
