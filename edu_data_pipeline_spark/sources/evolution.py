"""Schema-evolution-tolerant parquet reading.

A long-lived warehouse table accumulates files written under several
schema versions (columns added, widened, or retired). The reference
sidesteps this with fixed Postgres DDL; a lakehouse reader must align
whatever is on disk to the CURRENT contract:

- the scan runs with the CONTRACT as the explicit read schema: missing
  columns materialize as typed NULLs, retired columns are pruned at the
  footer, and parquet's supported upcasts (e.g. files written with INT32
  ids read as LongType) happen inside the scan. This beats
  ``mergeSchema``, which pays a footer-union pass and REFUSES numeric
  widening (CANNOT_MERGE_SCHEMAS on int vs long);
- incompatible type history (a column that changed representation, e.g.
  v0 wrote doubles as strings) cannot be fixed inside one scan — read
  those file groups with their own schema and re-align with
  :func:`align_to_schema`, whose ansi-off casts yield NULL on bad
  values, never a job failure (the cleaning rules' policy, SURVEY §2.2).

Pure projection + scan — predicate pushdown and column pruning are
unaffected, and alignment adds no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project/cast ``df`` to exactly ``target`` (order, names, types)."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for field in target.fields:
        if field.name in have:
            src = have[field.name]
            col = F.col(field.name)
            if src.dataType != field.dataType:
                col = col.cast(field.dataType)
            cols.append(col.alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def read_evolved_parquet(
    spark: SparkSession, path: str, target: T.StructType
) -> DataFrame:
    """Read a mixed-schema parquet directory aligned to ``target``."""
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in target.fields]
    )
    return align_to_schema(spark.read.schema(nullable).parquet(path), target)
