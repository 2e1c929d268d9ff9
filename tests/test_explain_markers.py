"""Headline-plan marker assertions (VERDICT r2 #8).

EXPLAIN.md documents the physical plans we committed to; this test makes
the load-bearing properties of those plans — predicate pushdown reaching
the parquet scan, broadcast joins on dims, column pruning — fail a test
instead of silently regressing into a bench mystery. Markers are checked
on the formatted plan string (stable across Spark 4 minor versions);
WholeStageCodegen is asserted via the codegen-mode explain, since the
pre-execution AQE plan string does not include codegen stage markers.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from edu_data_pipeline_spark.suite import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def _formatted(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_region_revenue_broadcasts_dims_and_pushes_filters(spark):
    plan = _formatted(spark, "region_revenue")
    assert "BroadcastHashJoin" in plan, "dim joins must broadcast"
    assert "SortMergeJoin" not in plan, "no dim join should sort-merge"
    assert "PushedFilters: [IsNotNull" in plan, "scan filters must push down"


def test_pricing_summary_pushdown_and_partial_agg(spark):
    plan = _formatted(spark, "pricing_summary")
    # date filter must reach the parquet scan, not evaluate post-scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # partial (map-side) + final hash aggregation
    assert plan.count("HashAggregate") >= 2


def test_pricing_summary_prunes_columns(spark):
    plan = _formatted(spark, "pricing_summary")
    # ReadSchema on the lineitem scan must not include unused wide cols
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, "expected a ReadSchema line on the parquet scan"
    assert all("l_comment" not in ln for ln in read), (
        "projection must prune l_comment from the scan"
    )


def test_top_orders_broadcasts_customer_side(spark):
    plan = _formatted(spark, "top_orders")
    assert "BroadcastHashJoin" in plan


def test_supplier_late_blame_no_shuffle_explosion(spark):
    # aggregation-first Q21 shape: no cartesian, no python, broadcast on
    # the small sides only
    plan = _formatted(spark, "supplier_late_blame")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("name", ["pricing_summary", "events_user_summary"])
def test_headline_aggregates_stay_in_codegen(spark, name):
    """Codegen stages only materialize in the FINAL adaptive plan, so run
    the query first; `*(N)` prefixes mark whole-stage-codegen spans."""
    import re

    df = REGISTRY[name].fn(spark, SF)
    # collect() (not .write) so THIS DataFrame's queryExecution finalizes
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert re.search(r"\*\(\d+\) HashAggregate", final), (
        f"{name}: aggregation fell out of whole-stage codegen:\n{final[:800]}"
    )


def test_bloom_screen_broadcasts_bitmap(spark):
    """The bloom probe must be a broadcast hash join against the bitmap
    words (4096 rows max), never a shuffle on the gram stream."""
    plan = _formatted(spark, "docs_bloom_screen")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_reuses_persisted_buckets(spark):
    """Both candidate-join sides must read the PERSISTED cluster-
    assignment frame — the 2-round Lloyd pipeline appears once, not per
    branch."""
    plan = _formatted(spark, "embedding_semantic_dedup")
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    assert "CartesianProduct" not in plan


def test_band_sweep_persists_shared_frames(spark):
    """Signatures and the distinct shingle frame each materialize once
    (persisted) across the three band configs and the verify join."""
    plan = _formatted(spark, "minhash_band_sweep")
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan


def test_contamination_broadcasts_eval_grams(spark):
    plan = _formatted(spark, "docs_contamination_frac")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
