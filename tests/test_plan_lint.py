"""Registry-wide plan lint: structural rules every suite query must obey.

Complements test_plans.py's targeted assertions with an automatic sweep
over EVERY registered query, so a future query (or a refactor of a
shared helper) cannot silently reintroduce:

- row/batch Python evaluation in a hot path (the engine rule: the ONLY
  Python is the deliberate Arrow multimodal feature extractor), or
- an unbounded CartesianProduct (broadcast nested-loop joins against
  1-row/vocabulary-sized sides are fine and print differently).

Plans are built and analyzed, never executed — the lint costs seconds.
"""

from __future__ import annotations

import pytest

from edu_data_pipeline_spark.suite import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"

# The one deliberate Arrow path (mapInPandas codec stub).
PYTHON_ALLOWED = {"multimodal_features"}


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_python_eval_in_plan(spark, name):
    if name in PYTHON_ALLOWED:
        pytest.skip("deliberate Arrow path")
    plan = _physical(REGISTRY[name].fn(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        f"{name} contains Python evaluation in its plan"
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_raw_cartesian_product(spark, name):
    plan = _physical(REGISTRY[name].fn(spark, SF))
    # BroadcastNestedLoopJoin (broadcast small side) prints differently;
    # a raw CartesianProduct means both sides are full-size — forbidden.
    assert "CartesianProduct" not in plan, (
        f"{name} plans a non-broadcast cartesian product"
    )
