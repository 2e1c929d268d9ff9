from __future__ import annotations

from edu_data_pipeline_spark.cluster_profile import cluster_conf


def test_cluster_conf_scales_with_shape():
    c = cluster_conf(executors=1000, executor_cores=4, executor_mem_gb=28)
    assert c["spark.sql.shuffle.partitions"] == str(3 * 4000)
    assert c["spark.sql.adaptive.coalescePartitions.minPartitionNum"] == "4000"
    # 28 GB / 16 = 1792 MB, capped at 256 MB
    assert c["spark.sql.autoBroadcastJoinThreshold"] == str(256 * 1024 * 1024)
    small = cluster_conf(executors=2, executor_cores=2, executor_mem_gb=4)
    # 4 GB / 16 = 256 MB ... floor/cap band holds at the low end too
    assert c["spark.sql.files.maxPartitionBytes"] == "192m"
    assert small["spark.sql.shuffle.partitions"] == "12"


def test_cluster_conf_applies_to_session(spark):
    # the dict plugs into get_spark(extra_conf=...) — here just assert
    # the keys are valid runtime confs Spark accepts on a live session
    c = cluster_conf(executors=4, executor_cores=2, executor_mem_gb=8)
    for k, v in c.items():
        spark.conf.set(k, v)
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == "192m"
    # restore the test session's shuffle sizing
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.minPartitionNum")
