"""Scale-linearity smoke: run headline aggregates on 1x and 8x self-unioned
lineitem/events and report the scaling ratio (expect ~linear; sub-linear
means fixed overhead still dominates at sf0.1).

Run: python scripts/scale_smoke.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edu_data_pipeline_spark.session import get_spark
from edu_data_pipeline_spark.sources.testdata import table
from pyspark.sql import functions as F


def timed(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main():
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    l1 = table(spark, sf, "lineitem")
    l8 = l1
    for _ in range(3):
        l8 = l8.unionByName(l8)  # 8x

    def q1(l):
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return l.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(disc.cast("string").cast("decimal(28,10)")).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )

    timed(q1(l1))  # warm
    t1 = timed(q1(l1))
    t8 = timed(q1(l8))
    rows1, rows8 = l1.count(), l8.count()
    print(f"lineitem agg: {rows1} rows in {t1}s; {rows8} rows in {t8}s; "
          f"8x data -> {round(t8 / max(t1, 1e-9), 1)}x time")
    spark.stop()


if __name__ == "__main__":
    main()
