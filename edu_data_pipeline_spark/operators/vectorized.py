"""Scalar Pandas UDFs (Arrow-vectorized) — the LAST-RESORT tier of the
Python-interop matrix, demonstrated and fenced.

The matrix this engine ships:

- native Column expressions      -> everything in functions/rules.py
- mapInPandas                    -> operators/multimodal.py, enrich.py
- applyInPandas (grouped)        -> operators/groupwise.py
- applyInPandasWithState         -> streaming/jobs.count_bounded_metrics
- scalar @pandas_udf             -> THIS module

A scalar pandas_udf receives Arrow column batches as pandas Series, so a
numpy-vectorized body runs 10-100x faster than a row-at-a-time Python
UDF — but it still breaks whole-stage codegen and pays serialization, so
it is only justified when the computation needs a Python library on a
per-row numeric payload. The cosine kernel here exists as the measured
trade-off exhibit: tests prove it matches the native zip_with/aggregate
expression exactly, and the native form is what production paths use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def cosine_vectorized(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine over two array<double> columns.

    Each batch arrives as Series-of-ndarray; stacking gives one matmul
    per batch — numpy does the flops, not the Python interpreter.
    """
    am = np.stack(a.to_numpy())
    bm = np.stack(b.to_numpy())
    dots = np.einsum("ij,ij->i", am, bm)
    norms = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(norms > 0, dots / norms, 0.0)
    return pd.Series(out)


def cosine_native(a: Column, b: Column) -> Column:
    """The preferred JVM-side twin (identical math, stays in codegen)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm_a = F.sqrt(F.aggregate(F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v))
    norm_b = F.sqrt(F.aggregate(F.zip_with(b, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (norm_a * norm_b)


def score_against_query(embeddings: DataFrame, query_vec_id: int = 0,
                        use_pandas_udf: bool = False) -> DataFrame:
    """Score every vector against one query vector, via either tier."""
    e = embeddings.withColumn("v", F.col("embedding").cast("array<double>"))
    q = F.broadcast(
        e.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    )
    joined = e.where(F.col("vec_id") != query_vec_id).crossJoin(q)
    scorer = cosine_vectorized if use_pandas_udf else cosine_native
    return joined.select(
        "vec_id", "label", scorer(F.col("v"), F.col("qv")).alias("cos")
    )
