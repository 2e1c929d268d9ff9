"""Physical-plan inspection helpers.

Used by tests and the perf pass to assert the plans we designed for are
the plans we got: filters pushed to the parquet scan, small dims
broadcast, no Python evaluation in hot paths, codegen spanning the
pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final physical plan string (runs the query so AQE materializes)."""
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_python_eval(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BatchEvalPython" in plan or "ArrowEvalPython" in plan or "MapInPandas" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        if "PushedFilters" in line:
            out.append(line.strip())
    return out


def scan_columns(df: DataFrame) -> list[str]:
    """ReadSchema lines — verify column pruning reached the scan."""
    plan = formatted_plan(df)
    return [line.strip() for line in plan.splitlines() if "ReadSchema" in line]
