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

#: Internal column names bucketed_running_sum injects into the caller's
#: frame. Guarded at entry: a caller frame already carrying one of these
#: would otherwise produce an ambiguous-column error or silently wrong
#: sums (ADVICE r5).
RESERVED_COLS = ("_rs_bucket", "_rs_part", "_rs_in", "_rs_off", "_rs_tot")


def hex_prefix_width(
    n_rows: int,
    *,
    target_bucket_rows: int = 4096,
    min_buckets: int = 16,
    max_width: int = 8,
) -> int:
    """Adaptive hex-prefix width for md5-keyed bucketed running sums.

    Picks the smallest width ``w`` (hex chars) such that ``16**w`` buckets
    keep the EXPECTED per-bucket sort at ``target_bucket_rows`` rows
    (md5 prefixes are uniform), with at least ``min_buckets`` buckets so
    the decomposition is exercised even on tiny inputs, capped at
    ``max_width`` (16^8 ≈ 4.3e9 buckets). Measured honestly (r6 probe,
    SCALE.md): width is worth only ~3% locally (w=2 0.619 s vs w=4
    0.641 s at 360k rows) — the ~1.8× cost vs a naive single window is
    the decomposition's second upstream pass + join-back, not bucket
    count, and is the accepted price of bounded sorts. The adaptive
    width's value is robustness: rows-per-bucket stays ~target at every
    corpus size instead of collapsing (~5 rows/bucket at 360k with the
    r5 fixed 65,536) or exploding (16M rows/bucket at 1e12 with 65,536
    buckets — a single-task-sort regression):

        rows      1e5  1e6  1e9   1e12
        width       2    2    5      7
        buckets   256  256  1M   268M
        rows/bkt ~390  ~4k  ~1k  ~3.7k

    Caveat recorded in SCALE.md: the per-bucket-totals offset window is
    one row per bucket, so at 1e12 rows its own partition is ~268M rows;
    past that the same decomposition applies recursively to the totals.
    """
    if n_rows < 0:
        raise ValueError(f"n_rows must be >= 0, got {n_rows}")
    want = max(min_buckets, -(-n_rows // target_bucket_rows))
    width = 1
    while 16**width < want and width < max_width:
        width += 1
    return width


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
    clash = sorted(set(RESERVED_COLS) & set(df.columns))
    if clash:
        raise ValueError(
            "bucketed_running_sum: input columns collide with reserved "
            f"internal names {clash}; rename them before calling"
        )
    b = "_rs_bucket"
    part = "_rs_part"
    # NULL-safe partition key (r14 fuzz find): a NULL part_col value
    # (e.g. a NULL-lang document) forms a window partition of its own in
    # both passes, but the offset join used to be a plain equi-join on
    # the raw columns and dropped every such row on the way back — the
    # naive single-window form keeps them. Fusing part_cols into ONE
    # STRUCT key fixes it without costing partitioning reuse: a struct
    # is never NULL at the top level, struct equality compares NULL
    # fields as equal (probed — the NULL-lang row survives a struct-key
    # join), and both window exchanges and the join hash the same
    # (part, bucket) pair, so Catalyst reuses the big side's exchange.
    # The eqNullSafe spelling kept the rows but re-keyed the SMJ on
    # coalesce/isnull pairs, forcing a second full-row shuffle of the
    # document side.
    tagged = df.withColumn(b, bucket).withColumn(
        part, F.struct(*part_cols) if part_cols else F.lit(0)
    )
    w_in = (
        Window.partitionBy(part, b)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = tagged.withColumn("_rs_in", F.sum(value).over(w_in))
    totals = tagged.groupBy(part, b).agg(F.sum(value).alias("_rs_tot"))
    w_off = (
        Window.partitionBy(part)
        .orderBy(b)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_rs_off", F.coalesce(F.sum("_rs_tot").over(w_off), F.lit(0))
    ).drop("_rs_tot")
    return (
        within.join(offsets, [part, b])
        .withColumn(out_col, F.col("_rs_in") + F.col("_rs_off"))
        .drop(b, part, "_rs_in", "_rs_off")
    )
