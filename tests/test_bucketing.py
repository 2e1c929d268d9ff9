"""Bucketed co-located join: the join of two tables bucketed on the key
must plan with zero shuffle Exchanges, and produce the same rows as the
plain (shuffled) join."""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_data_pipeline_spark.operators.bucketing import (
    bucketed_join,
    shuffle_exchanges_in_plan,
    write_bucketed,
)
from edu_data_pipeline_spark.sources.testdata import table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark):
    # disable broadcast so the join strategy is SortMergeJoin either way
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = table(spark, SF, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        lineitem = table(spark, SF, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        write_bucketed(orders, "bkt_orders", "o_orderkey", n_buckets=4)
        write_bucketed(lineitem, "bkt_lineitem", "o_orderkey", n_buckets=4)

        joined = bucketed_join(spark, "bkt_orders", "bkt_lineitem", "o_orderkey")
        assert shuffle_exchanges_in_plan(joined) == 0

        plain = orders.join(lineitem, "o_orderkey")
        assert shuffle_exchanges_in_plan(plain) > 0

        assert joined.count() == plain.count()
        a = joined.agg(F.sum("l_quantity")).first()[0]
        b = plain.agg(F.sum("l_quantity")).first()[0]
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
