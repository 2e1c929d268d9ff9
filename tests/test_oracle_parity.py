"""Every suite query must match its DuckDB oracle at sf0.001 (fast local
replica of the driver's CORRECTNESS gate; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from edu_data_pipeline_spark.parity import compare_query, duck_connection
from edu_data_pipeline_spark.suite import load_all

SF_DIR = "/root/testdata/sf0.001"

REGISTRY = load_all()


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    res = compare_query(spark, duck, REGISTRY[name], SF_DIR)
    assert res.ok, f"{name}: {res.problems}"


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 15
