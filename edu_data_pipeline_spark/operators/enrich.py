"""Pluggable batch enrichment (reference operators/ai_enrichment.py:51-131).

The reference tries a Groq LLM call (30 s timeout), then an HTTP
``LANGGRAPH_ENDPOINT`` POST, and falls back to a deterministic stub on any
failure. Re-expressed Spark-first:

- The DEFAULT path is the deterministic Column-expression enrichment
  (risk A9 + sentiment A10) — pure JVM, no Python, always available.
- The EXTERNAL path is an Arrow-batched ``mapInPandas`` stage that calls a
  user-supplied ``enrich_fn(pd.DataFrame) -> pd.DataFrame`` (the place an
  HTTP/LLM client goes). Per-batch try/except falls back to the stub
  values, mirroring the reference's swallow-and-degrade behavior — a batch
  failure degrades that batch, never the job.

No network client is bundled: this container has no LLM endpoint, so the
external path is exercised in tests with injected callables (success,
failure->fallback).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .transform import risk_score, ticket_sentiment

ENRICH_RESULT_FIELDS = [
    T.StructField("ai_risk_score", T.DoubleType()),
    T.StructField("ai_risk_category", T.StringType()),
]


def enrich_students_native(
    df: DataFrame,
    recent_activity: Column,
    completion_rate: Column,
    payment_status: Column,
) -> DataFrame:
    """Deterministic enrichment as native columns (the stub path, A9)."""
    score, bucket = risk_score(recent_activity, completion_rate, payment_status)
    return df.withColumn("ai_risk_score", score.cast("double")).withColumn(
        "ai_risk_category", bucket
    )


def enrich_tickets_native(df: DataFrame) -> DataFrame:
    """Deterministic ticket enrichment (A10)."""
    sentiment, sscore, category = ticket_sentiment(
        F.col("subject"), F.col("description")
    )
    return (
        df.withColumn("ai_sentiment", sentiment)
        .withColumn("ai_sentiment_score", sscore)
        .withColumn("ai_category_suggestion", category)
    )


def enrich_students_external(
    df: DataFrame,
    enrich_fn: Callable[[pd.DataFrame], pd.DataFrame],
    fallback_score: float = 42.0,
    fallback_category: str = "Medium",
) -> DataFrame:
    """External-enricher path with per-batch fallback.

    ``enrich_fn`` receives each Arrow batch as a pandas DataFrame and must
    return it with ``ai_risk_score``/``ai_risk_category`` columns added
    (where an HTTP/LLM call goes). Any exception inside a batch degrades
    that batch to the constant stub (the reference's fallback values,
    dags/data_transformation_pipeline.py:77-81).
    """
    result_schema = T.StructType(
        [*df.schema.fields, *ENRICH_RESULT_FIELDS]
    )

    def _enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            try:
                out = enrich_fn(pdf.copy())
                missing = {"ai_risk_score", "ai_risk_category"} - set(out.columns)
                if missing:
                    raise ValueError(f"enrich_fn missing columns: {missing}")
            except Exception:
                out = pdf.copy()
                out["ai_risk_score"] = fallback_score
                out["ai_risk_category"] = fallback_category
            yield out[[f.name for f in result_schema.fields]]

    return df.mapInPandas(_enrich, result_schema)
