from __future__ import annotations

from pyspark.sql import functions as F

from edu_data_pipeline_spark.operators.backfill import (
    backfill_partitions,
    write_partitioned,
)


def test_backfill_touches_only_its_partitions(spark, tmp_path):
    path = str(tmp_path / "daily")
    base = spark.createDataFrame(
        [("2024-01-01", "a", 1), ("2024-01-02", "b", 2), ("2024-01-03", "c", 3)],
        ["day", "k", "v"],
    )
    write_partitioned(base, path, "day")
    assert spark.read.parquet(path).count() == 3

    # corrected slice for day 2 only: two rows now, value fixed
    fix = spark.createDataFrame(
        [("2024-01-02", "b", 20), ("2024-01-02", "b2", 21)], ["day", "k", "v"]
    )
    backfill_partitions(fix, path, "day")
    out = spark.read.parquet(path)
    assert out.count() == 4  # 1 + 2 + 1
    day2 = {r.k: r.v for r in out.where(F.col("day") == "2024-01-02").collect()}
    assert day2 == {"b": 20, "b2": 21}
    # other days untouched
    assert out.where(F.col("day") == "2024-01-01").count() == 1
    assert out.where(F.col("day") == "2024-01-03").count() == 1


def test_backfill_restores_conf_mode(spark, tmp_path):
    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    df = spark.createDataFrame([("2024-01-01", 1)], ["day", "v"])
    backfill_partitions(df, str(tmp_path / "t"), "day")
    assert spark.conf.get(key) == "static"
