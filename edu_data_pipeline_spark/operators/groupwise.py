"""Group-wise Pandas operators (applyInPandas surface).

Completes the Python-interop matrix next to mapInPandas (multimodal) and
applyInPandasWithState (streaming): cogrouped per-key computations that
genuinely need whole-group vectors at once. Used sparingly — anything
expressible as window/agg expressions stays native (and the tests prove
the native twin matches where one exists).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("label", T.IntegerType()),
        T.StructField("dim", T.IntegerType()),
        T.StructField("z", T.DoubleType()),
    ]
)


def zscore_per_label_pandas(embeddings: DataFrame) -> DataFrame:
    """Per-label z-score normalization of embedding components via
    applyInPandas (one pandas frame per label group)."""
    pos = embeddings.select(
        "vec_id", "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )

    def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        grouped = out.groupby("dim")["x"]
        mean = grouped.transform("mean")
        std = grouped.transform("std").fillna(0.0)
        out["z"] = ((out["x"] - mean) / std.where(std > 0, 1.0)).fillna(0.0)
        return out[["vec_id", "label", "dim", "z"]]

    return pos.groupBy("label").applyInPandas(_normalize, ZSCORE_SCHEMA)


def zscore_per_label_native(embeddings: DataFrame) -> DataFrame:
    """The native-expression twin (window mean/std per (label, dim)) —
    preferred in production; exists to prove the pandas path correct."""
    pos = embeddings.select(
        "vec_id", "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    w = Window.partitionBy("label", "dim")
    mean = F.avg("x").over(w)
    std = F.stddev_samp("x").over(w)
    z = F.when(
        std.isNull() | (std <= 0), F.lit(0.0)
    ).otherwise((F.col("x") - mean) / std)
    return pos.select("vec_id", "label", "dim", z.alias("z"))
