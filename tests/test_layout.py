from __future__ import annotations

import glob

from edu_data_pipeline_spark.operators.layout import compact_sorted, file_key_ranges


def test_compact_sorted_clusters_disjoint_ranges(spark, tmp_path):
    out = str(tmp_path / "compacted")
    df = spark.range(0, 10_000).selectExpr(
        "CAST(id * 2654435761 % 10000 AS BIGINT) AS k", "id AS v"
    )
    compact_sorted(df, out, ["k"], target_files=4)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == 4
    ranges = file_key_ranges(spark, out, "k")
    assert len(ranges) == 4
    # range clustering: each file owns a disjoint key interval
    for (_, _, hi_prev), (_, lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next
    # nothing lost in the rewrite
    assert spark.read.parquet(out).count() == 10_000


def test_compact_sorted_plan_uses_range_partitioning(spark, tmp_path):
    df = spark.range(0, 1000).selectExpr("id AS k", "id AS v")
    planned = df.repartitionByRange(4, "k").sortWithinPartitions("k")
    plan = planned._jdf.queryExecution().toString()
    assert "rangepartitioning" in plan.lower()
    # no global Sort above the exchange: ordering is per-partition only
    # (physical Sort prints as "Sort [<order>], <global>, <limit>")
    physical = planned._jdf.queryExecution().executedPlan().toString()
    assert "Sort [k" in physical and "], false, 0" in physical
