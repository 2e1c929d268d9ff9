"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting handles most observed skew automatically
(enabled in session.py); these helpers are the explicit tools for the
cases AQE cannot fix — a single aggregation key so hot its partial state
exceeds one executor (the "one student with 100M events" case at 100 TB).

Semantics are proven identical to the unsalted operators by tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase decomposable aggregation: salt -> partial agg -> final agg.

    Phase 1 aggregates on (keys + salt) spreading one hot key over
    ``salt_buckets`` reducers; phase 2 re-aggregates the (tiny) partials on
    the real keys. Works for any decomposable aggregate expressed as
    sums/counts; avg = final_sum / final_count at the call site.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[F.sum(expr).alias(f"__s_{name}") for name, expr in sums.items()],
        F.count(F.lit(1)).alias("__n"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__s_{name}").alias(name) for name in sums],
        F.sum("__n").alias("n_rows"),
    )


def salted_broadcast_left_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Left join where one `big`-side key is pathologically hot: replicate
    the small side across salt buckets and join on (key, salt) so the hot
    key's rows land on ``salt_buckets`` tasks instead of one.

    (When `small` genuinely fits in memory a plain broadcast join is
    better — this is the shuffle-join fallback shape for mid-size right
    sides.)
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = salted_big.join(exploded_small, [key, "__salt"], "left")
    return joined.drop("__salt")
