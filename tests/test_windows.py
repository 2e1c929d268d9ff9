"""operators.windows.bucketed_running_sum — exactness vs the naive window.

The helper replaces low-cardinality-partition running sums (epoch
shuffle, token budget) with a bounded bucket decomposition; these tests
pin bit-identity to the single-window form on crafted data, including
bucket-boundary and single-bucket edge cases.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from edu_data_pipeline_spark.operators.windows import bucketed_running_sum


def _crafted(spark):
    # two groups, values chosen so buckets split unevenly (0,1,7 in one
    # bucket of width 8; 9,15 in the next; 16 alone) and one group fits
    # a single bucket entirely
    rows = [
        ("a", 0, 10), ("a", 1, 20), ("a", 7, 30), ("a", 9, 40),
        ("a", 15, 50), ("a", 16, 60),
        ("b", 3, 7), ("b", 4, 11),
    ]
    return spark.createDataFrame(rows, "g string, k long, v long")


def test_matches_naive_running_sum(spark):
    df = _crafted(spark)
    got = bucketed_running_sum(
        df,
        part_cols=["g"],
        bucket=F.floor(F.col("k") / 8),
        order_cols=["k"],
        value=F.col("v"),
        out_col="cum",
    )
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_rank_via_sum_of_ones(spark):
    df = _crafted(spark)
    got = bucketed_running_sum(
        df,
        part_cols=["g"],
        bucket=F.floor(F.col("k") / 8),
        order_cols=["k"],
        value=F.lit(1),
        out_col="rn",
    )
    w = Window.partitionBy("g").orderBy("k")
    want = df.withColumn("rn", F.row_number().over(w))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_struct_bucket_prefix_order(spark):
    # the token-budget shape: order (q, k), bucket struct(q, k div 4)
    rows = [
        ("a", 0, 5, 1), ("a", 0, 9, 2), ("a", 1, 1, 4), ("a", 1, 2, 8),
        ("a", 2, 0, 16),
    ]
    df = spark.createDataFrame(rows, "g string, q long, k long, v long")
    got = bucketed_running_sum(
        df,
        part_cols=["g"],
        bucket=F.struct(F.col("q"), F.floor(F.col("k") / 4).alias("kg")),
        order_cols=["k"],
        value=F.col("v"),
        out_col="cum",
    )
    w = (
        Window.partitionBy("g")
        .orderBy("q", "k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_reserved_column_collision_raises(spark):
    df = _crafted(spark).withColumn("_rs_in", F.lit(0))
    try:
        bucketed_running_sum(
            df,
            part_cols=["g"],
            bucket=F.floor(F.col("k") / 8),
            order_cols=["k"],
            value=F.col("v"),
            out_col="cum",
        )
    except ValueError as exc:
        assert "_rs_in" in str(exc)
    else:
        raise AssertionError("expected ValueError on reserved-name collision")


def test_hex_prefix_width_formula():
    from edu_data_pipeline_spark.operators.windows import hex_prefix_width

    # min 16 buckets even on tiny inputs
    assert hex_prefix_width(0) == 1
    assert hex_prefix_width(100) == 1
    # 1e5 rows / 4096 ≈ 25 buckets -> width 2 (256 buckets)
    assert hex_prefix_width(100_000) == 2
    assert hex_prefix_width(1_000_000) == 2
    # 1e9 / 4096 ≈ 244k buckets -> width 5 (1M buckets)
    assert hex_prefix_width(10**9) == 5
    # 1e12 / 4096 ≈ 244M buckets -> width 8 hits... 16^7=268M covers it
    assert hex_prefix_width(10**12) == 7
    # cap at max_width
    assert hex_prefix_width(10**18) == 8
    # exact power-of-16 boundary must not over-shoot (no float log)
    assert hex_prefix_width(256 * 4096) == 2
    assert hex_prefix_width(256 * 4096 + 1) == 3


def test_epoch_shuffle_width_invariance(spark):
    """Positions are bit-identical at any prefix width (the width is a
    physical-plan knob, not a semantic one) — and the adaptive default
    matches a pinned width."""
    from edu_data_pipeline_spark.suite.curation_suite import (
        epoch_shuffle_positions,
    )

    ids = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    base = sorted(
        map(tuple, epoch_shuffle_positions(ids, 2, prefix_width=1).collect())
    )
    for width in (2, 4):
        got = sorted(
            map(
                tuple,
                epoch_shuffle_positions(ids, 2, prefix_width=width).collect(),
            )
        )
        assert got == base
    adaptive = sorted(map(tuple, epoch_shuffle_positions(ids, 2).collect()))
    assert adaptive == base
