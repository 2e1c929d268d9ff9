"""Schema-evolution reader: mixed-version parquet directories align to
the current contract without a job failure."""

from __future__ import annotations

from pyspark.sql import types as T

from edu_data_pipeline_spark.sources.evolution import (
    align_to_schema,
    read_evolved_parquet,
)

TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),     # added in v2
        T.StructField("tier", T.StringType()),      # added in v3
    ]
)


def test_mixed_version_directory(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # v1 files: no score/tier, id was INT
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string") \
        .write.mode("append").parquet(path)
    # v2 files: score added, id widened to long
    spark.createDataFrame([(3, "c", 0.5)], "id long, name string, score double") \
        .write.mode("append").parquet(path)
    # v3 files: tier added, plus a retired column that must be dropped
    spark.createDataFrame(
        [(4, "d", 1.5, "gold", "retired")],
        "id long, name string, score double, tier string, legacy string",
    ).write.mode("append").parquet(path)

    out = read_evolved_parquet(spark, path, TARGET)
    assert out.schema == TARGET
    rows = {r.id: (r.name, r.score, r.tier) for r in out.collect()}
    assert rows == {
        1: ("a", None, None),
        2: ("b", None, None),
        3: ("c", 0.5, None),
        4: ("d", 1.5, "gold"),
    }


def test_align_bad_cast_yields_null(spark):
    # contract says score is double; a v0 writer stored strings
    df = spark.createDataFrame([(1, "a", "3.5"), (2, "b", "oops")],
                               "id long, name string, score string")
    out = align_to_schema(df, TARGET)
    rows = {r.id: r.score for r in out.collect()}
    assert rows == {1: 3.5, 2: None}  # null-on-bad, never a failure
