"""Summary report formatting + applyInPandas groupwise equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edu_data_pipeline_spark.operators import groupwise, reports, transform


def test_summary_report(spark):
    counts = {"staging.stg_students": 30, "warehouse.dim_date": 2557}
    quality = spark.createDataFrame(
        [(30,)], "total int"
    ).select(
        F.lit(5).alias("records_with_issues"),
        F.col("total").alias("total_records"),
        F.lit(93.33333).alias("avg_quality_score"),
    )
    insights = spark.createDataFrame(
        [("High Risk Students", 2, "risk > 70")],
        "metric_name string, metric_value long, description string",
    )
    md = reports.summary_report(counts, quality, insights)
    assert "| staging.stg_students | 30 |" in md
    assert "average quality score: 93.33" in md
    assert "- High Risk Students: 2 (risk > 70)" in md
    assert "Remediate invalid emails" in md


def test_zscore_pandas_matches_native(spark):
    emb = spark.createDataFrame(
        [(i, i % 2, [float(i), float(i * 2), 7.0]) for i in range(12)],
        "vec_id long, label int, embedding array<double>",
    )
    pandas_rows = {
        (r.vec_id, r.dim): r.z for r in groupwise.zscore_per_label_pandas(emb).collect()
    }
    native_rows = {
        (r.vec_id, r.dim): r.z for r in groupwise.zscore_per_label_native(emb).collect()
    }
    assert set(pandas_rows) == set(native_rows)
    for k in pandas_rows:
        assert pandas_rows[k] == pytest.approx(native_rows[k], abs=1e-9)
    # constant dimension (7.0): std=0 -> z must be 0, not NaN/inf
    assert all(v == 0.0 for (vid, dim), v in native_rows.items() if dim == 2)
