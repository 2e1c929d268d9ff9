"""One-pass table profiling: per-column stats as a single aggregate.

The engine-grade form of "SELECT every quality number I care about":
for N columns the profile is one scan producing 4-5 counters per column
(nulls, distincts, min/max, mean for numerics) — at 100 TB adding a
column to the profile adds counters to the same hash aggregate, never a
pass. Distinct counts use HLL (approx_count_distinct): exact distinct
per column would need a shuffle per column; the sketch keeps the whole
profile shuffle-free except the final 1-row reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_table"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(df: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Long-form profile: one row per column with
    (column, dtype, n_rows, n_nulls, approx_distinct, min, max, mean).

    min/max/mean are strings so heterogeneous column types fit one
    result schema; numeric-only stats are NULL for other types."""
    aggs: list = [F.count(F.lit(1)).alias("_n_rows")]
    for f in df.schema.fields:
        c, safe = f.name, f.name.replace(".", "_")
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{safe}__nulls"),
            F.approx_count_distinct(c, rsd).alias(f"{safe}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{safe}__min"),
            F.max(F.col(c).cast("string")).alias(f"{safe}__max"),
            (
                F.avg(F.col(c)).cast("string")
                if isinstance(f.dataType, _NUMERIC)
                else F.lit(None).cast("string")
            ).alias(f"{safe}__mean"),
        ]
    row = df.agg(*aggs)
    stacks = []
    for f in df.schema.fields:
        safe = f.name.replace(".", "_")
        stacks.append(
            "'{0}', '{1}', _n_rows, {2}__nulls, {2}__distinct, "
            "{2}__min, {2}__max, {2}__mean".format(
                f.name, f.dataType.simpleString(), safe
            )
        )
    return row.selectExpr(
        f"stack({len(stacks)}, {', '.join(stacks)}) AS "
        "(column, dtype, n_rows, n_nulls, approx_distinct, min, max, mean)"
    )
