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


def morton_key(col_a, col_b, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative integer columns —
    the cluster key that makes ONE sorted rewrite serve range predicates
    on EITHER dimension (Delta OPTIMIZE ZORDER's core, as a native
    column expression: shift/mask only, no UDF).

    Callers quantize each dimension into [0, 2^bits) first (e.g. rank or
    date_key bucket); the interleave places a[i] at bit 2i+1 and b[i]
    at bit 2i, so nearby (a, b) points share long key prefixes and land
    in the same files."""
    from pyspark.sql import functions as F

    a = col_a.cast("long")
    b = col_b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i + 1)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i)
        )
    return key


def compact_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    target_files: int,
    bits: int = 16,
) -> None:
    """compact_sorted on the Morton key of (col_a, col_b): each output
    file owns a compact 2-D region, so footer min/max stats prune files
    for range filters on either column — without writing the table twice
    (once per sort order)."""
    from pyspark.sql import functions as F

    keyed = df.withColumn(
        "_zkey", morton_key(F.col(col_a), F.col(col_b), bits)
    )
    (
        keyed.repartitionByRange(target_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
