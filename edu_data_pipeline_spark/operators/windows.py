"""Scale-safe running sums over low-cardinality window partitions.

A ``Window.partitionBy(k).orderBy(...)`` with a low-cardinality ``k``
(epoch, language, nation) concentrates EVERY row of a partition into one
sort task — fine on a laptop, a single-task OOM at 10⁹ rows per key.
When the windowed computation is a running SUM (row_number is a running
sum of 1), it decomposes exactly over any bucketing that is a PREFIX of
the intended ordering:

    running_sum(row) = sum over all earlier buckets + running sum within
                       the row's own bucket

so the plan becomes: one window per (partition, bucket) — task size
bounded by the bucket granularity, not the partition population — plus a
cumulative window over the per-bucket totals (one row per bucket) and a
co-partitioned join back. The per-nation Gini query inlines this shape
(`analytics_suite.customer_spend_gini`); this helper is the reusable
form for the epoch-shuffle and token-budget families.

Bucket-choice contract: rows in a lower bucket must sort strictly before
rows in a higher bucket under the intended order (i.e. the bucket is a
monotone function of the leading sort key(s)); within a bucket,
``order_cols`` must totally order rows. Granularity is the scale knob:
more buckets → smaller sort tasks but a longer per-bucket offset window
(one row per bucket — aggregated, so the offset window is cheap until
bucket counts themselves are huge).

Executed plan shape (verified at sf0.1): the big side shuffles ONCE on
(partition, bucket) for its window; the per-bucket-totals side is tiny
and broadcasts for the join-back, so the corpus is never re-shuffled —
AQE picks the broadcast automatically, keeping the helper valid even
for bucket domains too large to broadcast (it degrades to a
co-partitioned SMJ, never a corpus-wide single sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_running_sum(
    df: DataFrame,
    part_cols: list[str],
    bucket: Column,
    order_cols: list[str],
    value: Column,
    out_col: str,
) -> DataFrame:
    """Exact running sum of ``value`` over rows ordered by
    (bucket, *order_cols) within ``part_cols`` — without ever sorting a
    whole partition in one task. Returns ``df`` plus ``out_col``; the
    internal bucket column is dropped.

    For a global rank/row_number, pass ``value=F.lit(1)``.
    """
    b = "_rs_bucket"
    tagged = df.withColumn(b, bucket)
    w_in = (
        Window.partitionBy(*part_cols, b)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = tagged.withColumn("_rs_in", F.sum(value).over(w_in))
    totals = tagged.groupBy(*part_cols, b).agg(F.sum(value).alias("_rs_tot"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy(b)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_rs_off", F.coalesce(F.sum("_rs_tot").over(w_off), F.lit(0))
    ).drop("_rs_tot")
    return (
        within.join(offsets, [*part_cols, b])
        .withColumn(out_col, F.col("_rs_in") + F.col("_rs_off"))
        .drop(b, "_rs_in", "_rs_off")
    )
