"""The driver calls queries() with ITS OWN SparkSession, which may carry
Spark-4 defaults (ANSI on, local timezone, NTZ timestamps). Round 1's
events.ts bug was exactly this class. Every registered query wrapper runs
ensure_session_confs first; this test flips the runtime-settable confs to
hostile values and proves a query call self-heals and returns the same
result."""

from __future__ import annotations

from edu_data_pipeline_spark.suite import REQUIRED_RUNTIME_CONFS, load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"

HOSTILE = {
    "spark.sql.ansi.enabled": "true",
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.timestampType": "TIMESTAMP_NTZ",
}


def test_queries_self_heal_hostile_confs(spark):
    baseline = {
        name: REGISTRY[name].fn(spark, SF).count()
        for name in (
            "events_hourly",
            "clean_dates",
            "pricing_summary",
            # r5 bucketed-decomposition queries: conv/md5/struct-order
            # must be conf-independent too
            "docs_epoch_order",
            "customer_spend_gini",
        )
    }
    saved = {k: spark.conf.get(k) for k in HOSTILE}
    try:
        for k, v in HOSTILE.items():
            spark.conf.set(k, v)
        for name, want in baseline.items():
            got = REGISTRY[name].fn(spark, SF).count()
            assert got == want, (name, got, want)
        # the wrapper must have restored every required conf
        for k, v in REQUIRED_RUNTIME_CONFS.items():
            assert spark.conf.get(k) == v, k
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        for k, v in REQUIRED_RUNTIME_CONFS.items():
            spark.conf.set(k, v)
