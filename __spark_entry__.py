"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``edu_data_pipeline_spark.suite`` (one registry entry
per implemented operator from SURVEY.md §2); this module just adapts the
registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from edu_data_pipeline_spark.suite import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star join region->nation->customer->orders->lineitem with broadcast
    dims and a deterministic revenue aggregate (suite: region_revenue).
    """
    from edu_data_pipeline_spark.suite import ensure_session_confs, load_all

    ensure_session_confs(spark)
    return load_all()["region_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: e.fn for name, e in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every oracle-expressible query."""
    return {name: e.oracle for name, e in load_all().items() if e.oracle is not None}
