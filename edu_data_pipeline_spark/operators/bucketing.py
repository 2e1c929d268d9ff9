"""Bucketed (pre-partitioned) tables for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Writing the tables bucketed on the join key (hash-partitioned
into a fixed number of files per partition, Hive-style) lets Spark plan
a SortMergeJoin with NO Exchange on either side — each task reads the
matching bucket pair. This module wraps the write/read pattern and a
plan assertion used by the tests.

Reference parity note: the reference's Postgres warehouse relies on
btree indexes for join locality (init_schema.sql:298-344); bucketing is
the Spark-native equivalent for the fact-fact case, as promised in
SCALE.md ("bucket facts by student_sk for co-located joins").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Save ``df`` as a managed table bucketed (and optionally sorted)
    by ``bucket_col``. Sorting within buckets lets SortMergeJoin skip
    its sort as well."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two bucketed tables on their bucket key. With matching bucket
    counts Spark plans this with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)


def shuffle_exchanges_in_plan(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan (AQE's
    initial plan — counted before execution). 0 means fully co-located."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
